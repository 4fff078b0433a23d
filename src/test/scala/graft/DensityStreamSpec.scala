package graft

import graft.operators.Similarity
import graft.streaming.DensityStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Streaming DBSCAN* ≡ batch DBSCAN* on the delivered input, after every
 * committed micro-batch — including the two transitions only a live
 * service faces: a cluster STRADDLING a batch boundary (archive points
 * promoted to core by arrivals) and two ARCHIVE clusters merged by a
 * later bridge. Restart leg runs from a real checkpoint over a file
 * source (the RestartRecoverySpec discipline: same batchIds re-deliver);
 * the committed-batch replay must be a verbatim no-op.
 */
class DensityStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-dens-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))

  // 2-D fixture, eps² = 1.0, k = 3:
  //  A (y=0): 3 points per batch — all NON-core after batch 0 (2
  //    neighbors each < k), one straddling cluster after batch 1
  //  B (y=50): lobe B1 in batch 0, lobe B2 in batch 1 (2.0 minimum gap
  //    > eps — two separate clusters), bridge pair in batch 2 merges them
  //  noise: one far point per batch
  private val b0: Seq[(Long, Seq[Double])] =
    Seq(0L -> 0.0, 1L -> 0.3, 2L -> 0.6).map { case (i, x) => (i, Seq(x, 0.0)) } ++
    Seq(100L -> 20.0, 101L -> 20.2, 102L -> 20.4, 103L -> 20.6)
      .map { case (i, x) => (i, Seq(x, 50.0)) } :+
    ((900L, Seq(500.0, 500.0)))
  private val b1: Seq[(Long, Seq[Double])] =
    Seq(3L -> 0.15, 4L -> 0.45, 5L -> 0.75).map { case (i, x) => (i, Seq(x, 0.0)) } ++
    Seq(110L -> 22.4, 111L -> 22.6, 112L -> 22.8, 113L -> 23.0)
      .map { case (i, x) => (i, Seq(x, 50.0)) } :+
    ((901L, Seq(600.0, -600.0)))
  private val b2: Seq[(Long, Seq[Double])] =
    Seq(121L -> 21.3, 122L -> 21.7).map { case (i, x) => (i, Seq(x, 50.0)) }

  private val (k, eps2) = (3, 1.0)

  private def batchTruth(delivered: Seq[(Long, Seq[Double])])
      : Map[Long, (Option[Long], Boolean)] =
    Similarity.dbscanStar(delivered.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = k, eps2 = eps2, sampleN = 10000)
      .as[(Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private def snapshot(root: String): Map[Long, (Option[Long], Boolean)] =
    DensityStream.clusterSnapshot(spark, root)
      .as[(Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("stream snapshot equals batch DBSCAN* after every batch; straddle, promote, merge; restart + replay legs") {
    val root = tmp("root")
    val in = tmp("in")
    val ckpt = tmp("ckpt")
    def addFile(rows: Seq[(Long, Seq[Double])]): Unit =
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("append").parquet(in)
    def stream() = DensityStream.start(
      spark.readStream.schema(schema).parquet(in).toDF(),
      root, ckpt, "vec_id", "embedding", k = k, eps2 = eps2, nCells = 4)

    addFile(b0)
    val q1 = stream()
    try {
      q1.processAllAvailable()
      val s0 = snapshot(root)
      assert(s0 === batchTruth(b0), "batch-0 snapshot drifted")
      // A all noise (2 neighbors each < k), B1 one cluster
      Seq(0L, 1L, 2L, 900L).foreach(i => assert(s0(i)._1.isEmpty))
      assert((100L to 103L).map(s0(_)._1).toSet === Set(Some(100L)))

      addFile(b1)
      q1.processAllAvailable()
      val s1 = snapshot(root)
      assert(s1 === batchTruth(b0 ++ b1), "batch-1 snapshot drifted")
      // the straddling cluster exists (batch-0 points PROMOTED to core);
      // B2 is its own cluster, B1 untouched
      assert((0L to 5L).map(s1(_)._1).toSet === Set(Some(0L)))
      assert((110L to 113L).map(s1(_)._1).toSet === Set(Some(110L)))
      assert((100L to 103L).map(s1(_)._1).toSet === Set(Some(100L)))
      assert(s1(900L)._1.isEmpty && s1(901L)._1.isEmpty)
    } finally q1.stop()

    // --- restart from the same checkpoint with more data ---
    addFile(b2)
    val q2 = stream()
    try q2.processAllAvailable() finally q2.stop()
    val s2 = snapshot(root)
    assert(s2 === batchTruth(b0 ++ b1 ++ b2), "post-restart snapshot drifted")
    // the bridge pair merged the two ARCHIVE clusters into one
    val merged = ((100L to 103L) ++ (110L to 113L) ++ Seq(121L, 122L))
      .map(s2(_)._1).toSet
    assert(merged === Set(Some(100L)), s"archive clusters failed to merge: $merged")
    assert((0L to 5L).map(s2(_)._1).toSet === Set(Some(0L)))

    // --- committed-batch replay is a verbatim no-op ---
    def state(): Set[(String, Long)] = {
      val p = new org.apache.hadoop.fs.Path(root)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def walk(x: org.apache.hadoop.fs.Path): Seq[(String, Long)] =
        f.listStatus(x).toSeq.flatMap(s =>
          if (s.isDirectory) walk(s.getPath)
          else Seq((s.getPath.toString, s.getModificationTime)))
      walk(p).toSet
    }
    val before = state()
    DensityStream.processBatch(b1.toDF("vec_id", "embedding"), 1L, root,
      "vec_id", "embedding", k, eps2, nCells = 4)
    assert(state() === before, "replayed committed batch rewrote state")
  }
}
