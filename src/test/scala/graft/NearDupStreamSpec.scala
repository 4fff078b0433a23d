package graft

import graft.streaming.NearDupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Streaming near-dup dedup ≡ the sequential greedy fold: docs processed
 * in (batch, id) order, each kept iff no already-kept doc shares a
 * MinHash band AND verifies at Jaccard ≥ t. The truth side recomputes
 * bands/shingles with the same public kernels on a static frame and
 * folds on the driver — it checks the streaming ORCHESTRATION (archive
 * probe, intra-batch chain resolution, commit protocol), while the
 * kernels carry their own oracle gates elsewhere.
 */
class NearDupStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-nds-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  // disjoint vocab per base → cross-base Jaccard 0; a variant edits
  // token positions → controlled near-dup similarity
  private def base(k: Int): Seq[String] = (0 until 20).map(j => s"b${k}t$j")
  private def variant(k: Int, edits: Map[Int, String]): String =
    base(k).zipWithIndex.map { case (t, j) => edits.getOrElse(j, t) }
      .mkString(" ")
  private def baseText(k: Int): String = base(k).mkString(" ")

  test("stream kept-set equals the sequential greedy fold; replay no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("root")

    // batch 0: bases 0..4, plus an intra-batch CHAIN on base 0:
    //   id 10 = base0 with pos-5 edit        (~base0: dup)
    //   id 11 = base0 with pos-5 + pos-12 edits (~id10 but NOT ~base0)
    // sequential greedy must DROP 10 (matches kept 0) and KEEP 11
    // (its only matches, 10, was dropped) — CC-representative
    // semantics would wrongly drop 11 too.
    val b0: Seq[(Long, String)] =
      (0L to 4L).map(k => (k, baseText(k.toInt))) ++ Seq(
        (10L, variant(0, Map(5 -> "x1"))),
        (11L, variant(0, Map(5 -> "x1", 12 -> "x2"))))
    // batch 1: archive dups (base 1 variant, base 3 exact) + new base 5
    val b1: Seq[(Long, String)] = Seq(
      (20L, variant(1, Map(19 -> "y1"))),
      (21L, baseText(3)),
      (22L, baseText(5)))
    // batch 2: everything drops (exact copies of kept docs)
    val b2: Seq[(Long, String)] = Seq(
      (30L, baseText(5)), (31L, variant(0, Map(5 -> "x1", 12 -> "x2"))))
    // batch 3: after an all-dropped batch the service still works
    val b3: Seq[(Long, String)] = Seq((40L, baseText(6)))
    val batches = Seq(b0, b1, b2, b3)

    // --- truth: driver-side sequential greedy over the same kernels ---
    val allDocs = batches.flatten
    val sig = allDocs.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.Hashing.hashedShingles(col("text"), 3).as("shh"))
      .withColumn("bands",
        graft.functions.Hashing.minhashBands(col("shh"), 128, 32))
      .as[(Long, Seq[Long], Seq[Long])].collect()
      .map { case (id, sh, bn) => id -> (sh.toSet, bn) }.toMap
    def near(a: Long, b: Long): Boolean = {
      val (sa, ba) = sig(a); val (sb, bb) = sig(b)
      sa.nonEmpty && sb.nonEmpty &&
        ba.indices.exists(i => ba(i) == bb(i)) && {
          val common = (sa intersect sb).size
          common.toDouble / (sa.size + sb.size - common) >= 0.7
        }
    }
    val keptTruth = scala.collection.mutable.ArrayBuffer[Long]()
    batches.foreach(_.sortBy(_._1).foreach { case (id, _) =>
      if (!keptTruth.exists(k => near(k, id))) keptTruth += id
    })
    assert(keptTruth.toSet.contains(11L) && !keptTruth.contains(10L),
      "fixture lost its chain case — the greedy-vs-CC distinction is untested")

    // --- stream ---
    val input = MemoryStream[(Long, String)]
    val q = NearDupStream.start(input.toDS().toDF("doc_id", "text"),
      root, tmp("ckpt"), "doc_id", "text")
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val keptGot = NearDupStream.keptCorpus(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(keptGot === keptTruth.toSet,
      s"stream-only: ${keptGot -- keptTruth}; truth-only: ${keptTruth.toSet -- keptGot}")

    // kept text survives verbatim
    val textGot = NearDupStream.keptCorpus(spark, root)
      .as[(Long, String)].collect().toMap
    allDocs.filter(d => keptGot(d._1)).foreach { case (id, t) =>
      assert(textGot(id) === t) }

    // --- replay: re-deliver batch 1 with the same id (recovery shape) ---
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
    NearDupStream.processBatch(b1.toDF("doc_id", "text"), 1L, root,
      "doc_id", "text", 3, 128, 32, 0.7, 10)
    assert(state() === before, "replayed committed batch rewrote state")
  }

  test("WEIGHTED stream kept-set equals the weighted greedy fold and discriminates 6x repetition; replay no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("wroot")

    // the discrimination fixture the SET version cannot make: id 50 is
    // base 0's token sequence repeated 6x — shingle SETS nearly equal
    // (set-Jaccard ≈ 0.86 over the wrap grams), tf-weighted Jaccard
    // ≈ 18/120 → the weighted service must KEEP it as its own doc
    val rep6 = Seq.fill(6)(baseText(0)).mkString(" ")
    val b0: Seq[(Long, String)] =
      (0L to 3L).map(k => (k, baseText(k.toInt))) :+ (50L, rep6)
    // batch 1: archive dup (base 1, one edit — high J_w), another rep6
    // copy (must drop against kept 50), and a fresh base
    val b1: Seq[(Long, String)] = Seq(
      (60L, variant(1, Map(19 -> "y1"))),
      (61L, Seq.fill(6)(baseText(0)).mkString(" ")),
      (62L, baseText(4)))
    val batches = Seq(b0, b1)

    // --- truth: driver-side sequential greedy over the WEIGHTED kernels ---
    val allDocs = batches.flatten
    val sig = allDocs.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.Hashing.hashedShingleCounts(col("text"), 3).as("shc"))
      .withColumn("bands",
        graft.functions.Hashing.icwsBands(col("shc"), 128, 32))
      .as[(Long, Seq[Long], Seq[Long])].collect()
      .map { case (id, shc, bn) =>
        // interleaved (hash, tf) pairs → map
        val m = shc.grouped(2).map(p => p(0) -> p(1)).toMap
        id -> (m, bn)
      }.toMap
    def nearW(a: Long, b: Long): Boolean = {
      val (ma, ba) = sig(a); val (mb, bb) = sig(b)
      val (ta, tb) = (ma.values.sum, mb.values.sum)
      ta > 0 && tb > 0 && ba.indices.exists(i => ba(i) == bb(i)) && {
        val smin = ma.keysIterator
          .map(k => math.min(ma(k), mb.getOrElse(k, 0L))).sum
        smin.toDouble / (ta + tb - smin) >= 0.7
      }
    }
    val keptTruth = scala.collection.mutable.ArrayBuffer[Long]()
    batches.foreach(_.sortBy(_._1).foreach { case (id, _) =>
      if (!keptTruth.exists(k => nearW(k, id))) keptTruth += id
    })
    assert(keptTruth.contains(50L),
      "fixture lost the repetition case — J_w must keep the 6x doc")
    assert(!keptTruth.contains(61L), "the rep6 copy must drop against 50")
    // and the SET near function from the other test would have dropped 50:
    val setSig = allDocs.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.Hashing.hashedShingles(col("text"), 3).as("shh"))
      .withColumn("bands",
        graft.functions.Hashing.minhashBands(col("shh"), 128, 32))
      .as[(Long, Seq[Long], Seq[Long])].collect()
      .map { case (id, sh, bn) => id -> (sh.toSet, bn) }.toMap
    val (s0, bn0) = setSig(0L); val (s50, bn50) = setSig(50L)
    val common = (s0 intersect s50).size
    assert(bn0.indices.exists(i => bn0(i) == bn50(i)) &&
      common.toDouble / (s0.size + s50.size - common) >= 0.7,
      "fixture drifted: the set measure no longer confuses 0 with 50")

    // --- stream ---
    val input = MemoryStream[(Long, String)]
    val q = NearDupStream.startWeighted(input.toDS().toDF("doc_id", "text"),
      root, tmp("wckpt"), "doc_id", "text")
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val keptGot = NearDupStream.keptCorpus(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(keptGot === keptTruth.toSet,
      s"stream-only: ${keptGot -- keptTruth}; truth-only: ${keptTruth.toSet -- keptGot}")

    // --- replay: committed batch re-delivery is a verbatim no-op ---
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
    NearDupStream.processBatch(b1.toDF("doc_id", "text"), 1L, root,
      "doc_id", "text", 3, 128, 32, 0.7, 10, weighted = true)
    assert(state() === before, "replayed committed weighted batch rewrote state")
  }
}
