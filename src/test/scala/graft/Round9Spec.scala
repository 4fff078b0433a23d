package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Round-9 hardening: SharedStage snapshot versioning — a rewritten input
 * dir must never serve stale cached frames in a long-lived session. */
class Round9Spec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-r9-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("SharedStage recomputes when the input dir's snapshot changes") {
    val dir = tmpDir("snap")
    val data = s"$dir/t.parquet"
    Seq(1, 2, 3).toDF("x").write.mode("overwrite").parquet(data)
    var computes = 0
    def read() = { computes += 1; spark.read.parquet(data) }
    try {
      assert(SharedStage.get(dir, "t")(read()).count() === 3L)
      // unchanged snapshot: second get is a pure cache hit
      assert(SharedStage.get(dir, "t")(read()).count() === 3L)
      assert(computes === 1, "unchanged dir recomputed")
      // re-land the table: the signature flips, the cache must NOT serve
      // the pre-overwrite rows
      Seq(10, 20, 30, 40, 50).toDF("x").write.mode("overwrite").parquet(data)
      val fresh = SharedStage.get(dir, "t")(read())
      assert(computes === 2, "rewritten dir served a stale cached frame")
      assert(fresh.count() === 5L)
      assert(fresh.agg(sum("x")).head.getLong(0) === 150L)
      // explicit writer-side invalidation also forces a recompute
      SharedStage.invalidate(dir)
      SharedStage.get(dir, "t")(read()): Unit
      assert(computes === 3, "invalidate(dir) did not drop the entry")
    } finally SharedStage.clear()
  }

  test("re-landed documents dir yields fresh q_dedup_cluster, not stale pairs") {
    val dir = tmpDir("docs")
    val doc = s"$dir/documents.parquet"
    val prose = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different words in this sentence about spark plans"
    def land(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").write.mode("overwrite").parquet(doc)
    def clusters(): Map[Long, Long] =
      SparkEntry.queries("q_dedup_cluster")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      // v1: docs 1 and 2 are exact near-dups; 3 is unrelated
      land(Seq((1L, prose), (2L, prose), (3L, other)))
      val c1 = clusters()
      assert(c1.keySet === Set(1L, 2L) && c1(1L) === c1(2L),
        s"v1 clustering wrong: $c1")
      // re-land the SAME path: now 2 and 3 are the duplicate pair. A
      // stale SharedStage would still report {1,2}.
      land(Seq((1L, prose), (2L, other), (3L, other)))
      val c2 = clusters()
      assert(c2.keySet === Set(2L, 3L) && c2(2L) === c2(3L),
        s"re-landed dir served stale clusters: $c2")
    } finally SharedStage.clear()
  }

  test("knnLabelAnn agrees with brute knnLabel on planted blobs") {
    // the Round8 blob fixture: 10 tight separated blobs of 40 vectors in
    // 16-d; within-blob neighbor ORDER is beyond PQ resolution, but the
    // propagated LABEL is a blob-level property both stages must agree on
    def blobVec(blob: Int, i: Int): Array[Double] =
      Array.tabulate(16)(j => (((i * 13 + j * 7) % 11) - 5) * 0.03 +
        (if (j == blob % 16) 10.0 else 1.0))
    val labeled = (for { b <- 0 until 10; i <- 0 until 40 }
      yield ((b * 100 + i).toLong, blobVec(b, i), s"blob$b"))
      .toDF("vec_id", "embedding", "label")
    val queries = labeled.filter(col("vec_id") % 100 === 7)
    def byQuery(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    val brute = byQuery(Similarity.knnLabel(labeled, queries, "vec_id",
      "embedding", "label", k = 10))
    val ann = byQuery(Similarity.knnLabelAnn(labeled, queries, "vec_id",
      "embedding", "label", k = 10, dim = 16, nCells = 8, nProbe = 4,
      m = 4, ks = 16, iters = 3))
    assert(ann.keySet === brute.keySet)
    // agreement gate: same predicted label AND a full neighbor set per
    // query — the ANN stage changes retrieval, never the vote contract
    ann.foreach { case (qid, (pred, total)) =>
      assert((pred, total) === brute(qid),
        s"query $qid: ann=($pred,$total) brute=${brute(qid)}")
      assert(pred === s"blob${qid / 100}", s"query $qid propagated $pred")
    }
  }

  test("versioned lake publish: torn writes invisible, snapshots resolve atomically") {
    val dir = tmpDir("vlake")
    val lake = s"$dir/lake"
    def docs(rows: (Int, Int, Int, String, Double)*) =
      rows.toSeq.toDF("year", "month", "day", "key", "v")
    def rows(before: Option[String] = None): Set[(Int, Int, Int, String, Double)] =
      sources.LakeWriter.readVersioned(spark, lake, before)
        .select("year", "month", "day", "key", "v")
        .as[(Int, Int, Int, String, Double)].collect().toSet
    val v1 = Set((2024, 1, 1, "a", 1.0), (2024, 1, 2, "b", 2.0))
    sources.LakeWriter.writePartitionedVersioned(
      docs(v1.toSeq: _*), lake, "001")
    assert(rows() === v1)
    // CRASH INJECTION: v=002 lands one partition's files and dies before
    // the marker — exactly the torn state a mid-write kill leaves
    docs((2024, 1, 1, "a", 9.0)).write
      .partitionBy("year", "month", "day").parquet(s"$lake/v=002")
    assert(rows() === v1, "reader saw a torn uncommitted snapshot")
    // the retry replaces the crashed attempt and commits; day=2 was not
    // recomputed, so it must still resolve to v=001 (newest-per-leaf)
    sources.LakeWriter.writePartitionedVersioned(
      docs((2024, 1, 1, "a", 9.0)), lake, "002")
    val v2 = Set((2024, 1, 1, "a", 9.0), (2024, 1, 2, "b", 2.0))
    assert(rows() === v2)
    // a committed version is never rewritten: re-running the window with
    // different data is an idempotent no-op
    sources.LakeWriter.writePartitionedVersioned(
      docs((2024, 1, 1, "a", 77.0)), lake, "002")
    assert(rows() === v2, "committed version was rewritten")
    // time travel: a read pinned before v=002 sees the v1 snapshot
    assert(rows(before = Some("002")) === v1)
  }

  test("LakeWriter.writePartitioned invalidates SharedStage frames over its path") {
    val dir = tmpDir("lake")
    val lake = s"$dir/lake"
    val v1 = Seq((2024, 1, 1, "k1", 1.0)).toDF("year", "month", "day", "key", "v")
    sources.LakeWriter.writePartitioned(v1, lake, keyCol = Some("key"))
    var computes = 0
    def read() = { computes += 1; sources.LakeWriter.read(spark, lake) }
    try {
      assert(SharedStage.get(lake, "lk")(read()).count() === 1L)
      // writer lands a new partition -> the shared frame over this path
      // is dropped at write time (not just on the next signature probe)
      val v2 = Seq((2024, 1, 2, "k2", 2.0)).toDF("year", "month", "day", "key", "v")
      sources.LakeWriter.writePartitioned(v2, lake, keyCol = Some("key"))
      assert(SharedStage.get(lake, "lk")(read()).count() === 2L)
      assert(computes === 2, "write did not invalidate the shared frame")
    } finally SharedStage.clear()
  }
}
