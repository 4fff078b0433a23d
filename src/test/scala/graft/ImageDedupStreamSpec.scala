package graft

import graft.streaming.ImageDedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Streaming image near-dup dedup ≡ the sequential greedy fold over
 * dHash Hamming matches: images processed in (batch, id) order, each
 * kept iff no already-kept image is within maxHamming bits. The truth
 * side folds the REFERENCE hashes on the driver — it checks the
 * streaming orchestration (decode-once, persisted band-index probe,
 * intra-batch chain resolution, commit protocol); the decode→hash
 * kernel carries its own gates in Round12Spec / q_image_neardup.
 */
@SlowTest
class ImageDedupStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-ids-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Render a 9×8 PNG whose dHash is exactly `hash` (bits ≥ 60 must be
   * 0) — the renderDHashPng walk, parameterized by an arbitrary hash. */
  private def render(hash: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8) {
      var v = 128
      img.setRGB(0, y, (v << 16) | (v << 8) | v)
      for (x <- 0 until 8) {
        v += (if ((hash >>> (y * 8 + x) & 1L) == 1L) 1 else -1)
        img.setRGB(x + 1, y, (v << 16) | (v << 8) | v)
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("stream kept-set equals the sequential greedy fold over Hamming matches; replay no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("root")

    val base = 0x123456789ABCDEL
    val a = base
    val b = a ^ 0x7L        // Hamming 3 from a
    val c = b ^ 0x38L       // Hamming 3 from b, 6 from a: the chain case
    val far = base ^ 0xFFFFFFFF00L // ~32 bits away from everything
    // batch 0 chain: greedy drops 2 (pairs with kept 1), KEEPS 3 (its
    // only match, 2, was dropped) — CC semantics would drop 3 too
    val b0 = Seq((1L, render(a)), (2L, render(b)), (3L, render(c)))
    // batch 1: archive dups (exact + 1-bit) drop; new content + an
    // undecodable payload keep
    val b1 = Seq((10L, render(a)), (11L, render(c ^ 0x1L)),
      (12L, render(far)), (13L, Array[Byte](9, 9, 9)))
    // batch 2: everything drops — the service must survive an
    // all-dropped batch and keep committing
    val b2 = Seq((20L, render(far)))
    // batch 3: still alive after the all-dropped batch
    val b3 = Seq((21L, render(far ^ 0xFF00000000L)))
    val batches = Seq(b0, b1, b2, b3)

    // driver truth: sequential greedy over the reference hashes
    val hashes = Map(1L -> a, 2L -> b, 3L -> c, 10L -> a, 11L -> (c ^ 0x1L),
      12L -> far, 20L -> far, 21L -> (far ^ 0xFF00000000L))
    val keptTruth = scala.collection.mutable.ArrayBuffer[Long]()
    batches.foreach(_.map(_._1).sorted.foreach { id =>
      hashes.get(id) match {
        case Some(h) =>
          if (!keptTruth.exists(k => hashes.contains(k) &&
            java.lang.Long.bitCount(hashes(k) ^ h) <= 3)) keptTruth += id
        case None => keptTruth += id // undecodable: kept, matches nothing
      }
    })
    assert(keptTruth.contains(3L) && !keptTruth.contains(2L),
      "fixture lost its chain case — the greedy-vs-CC distinction is untested")

    val input = MemoryStream[(Long, Array[Byte])]
    val q = ImageDedupStream.start(
      input.toDS().toDF("doc_id", "media"), root, tmp("ckpt"))
    try {
      batches.foreach { bt => input.addData(bt: _*); q.processAllAvailable() }
    } finally q.stop()

    val kept = ImageDedupStream.keptImages(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === keptTruth.toSet,
      s"stream kept $kept, sequential greedy expects ${keptTruth.toSet}")
    // undecodable payload kept with a null hash
    assert(ImageDedupStream.keptImages(spark, root)
      .filter(col("doc_id") === 13L && col("dhash").isNull).count() === 1L)

    // replay of a committed batchId is a verbatim no-op
    val before = kept
    ImageDedupStream.processBatch(b1.toDF("doc_id", "media"), 1L, root,
      maxHamming = 3, maxIter = 10)
    assert(ImageDedupStream.keptImages(spark, root)
      .select("doc_id").as[Long].collect().toSet === before)
  }

  test("restart from checkpoint: the resumed query dedups against the prior run's archive") {
    val inputDir = tmp("in2")
    val root = tmp("root2")
    val ckpt = tmp("ckpt2")
    val h1 = 0xABCDEF0123456L
    def addFile(rows: (Long, Array[Byte])*): Unit =
      rows.toDF("doc_id", "media")
        .coalesce(1).write.mode("append").parquet(inputDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("media",
        org.apache.spark.sql.types.BinaryType)))
    def run() = ImageDedupStream.start(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inputDir), root, ckpt)

    addFile((1L, render(h1)))
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()

    // new query, same checkpoint: a near-dup of the pre-restart kept
    // image must drop against the persisted index, new content keeps
    addFile((2L, render(h1 ^ 0x3L)), (3L, render(h1 ^ 0xFFFF000000L)))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()

    assert(ImageDedupStream.keptImages(spark, root)
      .select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
  }
}
