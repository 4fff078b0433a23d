package graft

import graft.operators.{Dedup, Similarity}
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
    // a zero-row incremental window publishes a committed but EMPTY
    // snapshot — it must contribute nothing, not poison every later
    // read with an unreadable marker-only leaf
    sources.LakeWriter.writePartitionedVersioned(
      docs().limit(0), lake, "003")
    assert(rows() === v2, "empty committed snapshot broke the read")
    sources.LakeWriter.writePartitionedVersioned(
      docs((2024, 1, 3, "c", 5.0)), lake, "004")
    assert(rows() === v2 + ((2024, 1, 3, "c", 5.0)),
      "post-empty-snapshot publish not visible")
  }

  test("pqIndexAppend: frozen-codebook delta encode ≡ re-encode of the union; appended vectors retrievable") {
    // the Round8 blob fixture: frozen codebooks trained on the base
    // corpus must place delta vectors landing in a known blob into that
    // blob's code region — a blob-level property within PQ resolution
    def blobVec(blob: Int, i: Int): Array[Double] =
      Array.tabulate(16)(j => (((i * 13 + j * 7) % 11) - 5) * 0.03 +
        (if (j == blob % 16) 10.0 else 1.0))
    val base = (for { b <- 0 until 10; i <- 0 until 40 }
      yield ((b * 100 + i).toLong, blobVec(b, i))).toDF("vec_id", "embedding")
    // delta: 10 fresh members of blob 3
    val delta = (0 until 10).map(j => ((5000 + j).toLong, blobVec(3, 40 + j)))
      .toDF("vec_id", "embedding")
    val idx = Similarity.pqIndexBuild(base, "vec_id", "embedding",
      dim = 16, m = 4, ks = 16, iters = 3)
    val appended = Similarity.pqIndexAppend(idx, delta, "vec_id", "embedding")
    // the union re-encoded under the SAME codebooks (NOT a retrain) must
    // produce the appended index's code table row-for-row: appending is
    // a pure delta encode, never a drift in how old rows are coded
    val reEncoded = Similarity.pqIndexAppend(
      idx.copy(codes = idx.codes.limit(0)), base.unionByName(delta),
      "vec_id", "embedding")
    val a = appended.codes.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
    val b = reEncoded.codes.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
    assert(a === b, "appended codes diverge from frozen-codebook re-encode")
    assert(a.map(_._1) ===
      ((for { b0 <- 0 until 10; i <- 0 until 40 } yield (b0 * 100 + i).toLong)
        .toSet ++ (5000L until 5010L)))
    // appended vectors are retrievable: a delta query's top-5 under the
    // grown index is entirely blob-3 members (base or delta)
    val q = Seq((5000L, blobVec(3, 40))).toDF("vec_id", "embedding")
    val top = Similarity.pqScore(appended, q, "vec_id", "embedding", k = 5)
      .collect().map(_.getLong(1))
    assert(top.length === 5 && top.forall(c => c / 100 === 3L || c >= 5000L),
      s"appended-index retrieval left blob 3: ${top.mkString(",")}")
    // UPSERT: re-appending an EXISTING id (retry, or a vector update —
    // here id 0 moves from blob 0 to blob 7) must REPLACE its codes,
    // never leave two rows per (id, sub) for pqScore to double-count
    val moved = Similarity.pqIndexAppend(appended,
      Seq((0L, blobVec(7, 3))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val id0 = moved.codes.filter(col("cand_id") === 0L)
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(id0.length === 4, s"duplicate code rows after re-append: ${id0.length}")
    assert(moved.codes.count() === appended.codes.count(),
      "upsert changed the index cardinality")
    val blob7codes = moved.codes.filter(col("cand_id") === 703L)
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(id0.toSet === blob7codes,
      s"re-encoded id 0 should carry blob-7 codes: ${id0.toSet} vs $blob7codes")
  }

  test("zone-map skipping: pruned read ≡ full-scan filter, with files actually skipped") {
    val dir = tmpDir("zonemap")
    val lake = s"$dir/t"
    // value-clustered files: repartitionByRange gives each file a tight
    // disjoint [min, max] value interval — the layout writeClustered
    // produces on real lakes, where zone maps bite
    spark.range(0, 10000).toDF("id")
      .withColumn("v", col("id") % 1000)
      .repartitionByRange(8, col("v"))
      .write.parquet(lake)
    val stats = sources.LakeWriter.statsIndex(spark, lake, Seq("v"))
    val (pruned, kept, total) =
      sources.LakeWriter.readPruned(spark, lake, stats, "v", 100L, 220L)
    val full = spark.read.parquet(lake)
      .filter(col("v") >= 100L && col("v") <= 220L)
    assert(total === 8, s"expected 8 files, saw $total")
    assert(kept < total, s"no files skipped: kept=$kept of $total")
    assert(pruned.select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      full.select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // an out-of-range predicate prunes everything and still answers
    val (none, kept0, _) =
      sources.LakeWriter.readPruned(spark, lake, stats, "v", 5000L, 6000L)
    assert(kept0 === 0 && none.count() === 0L)
  }

  test("incremental corpus e2e: delta-index dedup ≡ from-scratch pairs; re-landed dir curates byte-identically to a clean-room run") {
    def prose(seed: Int): String =
      (0 until 30).map(i => s"w${(seed * 17 + i * i) % 97}").mkString(" ")
    def rows(ids: Seq[Long], dupOf: Map[Long, Long] = Map.empty) = ids.map { i =>
      val text = dupOf.get(i).map(d => prose(d.toInt) + " tail")
        .getOrElse(prose(i.toInt))
      (i, text, "en", s"src${i % 3}", text.length)
    }
    val archive = rows(Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // delta: 10 near-dups archive doc 3; 11 is fresh; 12 near-dups 11
    val delta = rows(Seq(10L, 11L, 12L),
      dupOf = Map(10L -> 3L, 12L -> 11L))
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    def frame(r: Seq[(Long, String, String, String, Int)]) = r.toDF(cols: _*)
    def land(dir: String, r: Seq[(Long, String, String, String, Int)]): Unit =
      frame(r).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val incDir = tmpDir("inc") // re-landed in place (the long-lived-session shape)
    val cleanDir = tmpDir("clean") // from-scratch landing of the final union
    try {
      // ROUND 1: land the archive, index it once
      land(incDir, archive)
      val index = graft.CacheScope.persist(Dedup.minhashIndex(
        frame(archive), "doc_id", "text", n = 3))
      // ROUND 2: the delta dedups AGAINST THE INDEX — no archive re-pair
      val deltaPairs = Dedup.dedupAgainstIndex(frame(delta), index,
          frame(archive), "doc_id", "text", n = 3, threshold = 0.7)
        .select("new_id", "dup_id", "dup_src").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      // parity: the incremental pairs are EXACTLY the from-scratch pair
      // join over the union, restricted to pairs touching a delta id
      val scratch = Dedup.minhashLsh(frame(archive ++ delta), "doc_id",
          "text", n = 3, threshold = 0.7)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val deltaIds = delta.map(_._1).toSet
      val scratchDelta = scratch
        .filter(p => deltaIds(p._1) || deltaIds(p._2))
        .map(p => Set(p._1, p._2))
      assert(deltaPairs.map(p => Set(p._1, p._2)) === scratchDelta,
        s"delta-index pairs diverge: inc=$deltaPairs scratch=$scratchDelta")
      assert(deltaPairs.exists(p => p._3 === "old" && Set(p._1, p._2) === Set(10L, 3L)))
      assert(deltaPairs.exists(p => p._3 === "new" && Set(p._1, p._2) === Set(11L, 12L)))
      // ROUND 3: re-land the union INTO THE SAME DIR; every dir-keyed
      // query must see the new snapshot (SharedStage signature), and the
      // whole dedup family must agree byte-for-byte with a clean-room
      // landing of identical content in a fresh dir
      land(incDir, archive ++ delta)
      land(cleanDir, archive ++ delta)
      Seq("q_dedup_cluster", "q_dedup_canonical", "q_dedup_profile",
          "q_split_leakfree").foreach { qn =>
        val inc = SparkEntry.queries(qn)(spark, incDir).collect().map(_.toString).sorted
        val clean = SparkEntry.queries(qn)(spark, cleanDir).collect().map(_.toString).sorted
        assert(inc.sameElements(clean), s"$qn: re-landed dir diverges from clean-room run")
      }
      // and the curation pipeline over the re-landed frame equals the
      // clean-room curation row-for-row (same input bytes → same output)
      val cfg = graft.pipelines.CurateDocuments.Config("doc_id", "text",
        jaccardThreshold = 0.7, minQuality = -1.0)
      val incCur = graft.pipelines.CurateDocuments.run(
        spark.read.parquet(s"$incDir/documents.parquet"), cfg)
        .collect().map(_.toString).sorted
      val cleanCur = graft.pipelines.CurateDocuments.run(
        spark.read.parquet(s"$cleanDir/documents.parquet"), cfg)
        .collect().map(_.toString).sorted
      assert(incCur.sameElements(cleanCur),
        "curation over the re-landed dir diverges from clean-room")
      // the near-dup clusters the delta path flagged are exactly the
      // ones curation collapses: one survivor from {3,10}, one from
      // {11,12} (which member wins is the keep-best score's call), all
      // four never-flagged archive docs intact → 7 survivors total
      val keptIds = graft.pipelines.CurateDocuments.run(
        spark.read.parquet(s"$incDir/documents.parquet"), cfg)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(keptIds.intersect(Set(3L, 10L)).size === 1 &&
        keptIds.intersect(Set(11L, 12L)).size === 1 &&
        Set(1L, 2L, 4L, 5L, 6L).subsetOf(keptIds) && keptIds.size === 7,
        s"incremental dedup decisions don't match curation survivors: $keptIds")
    } finally SharedStage.clear()
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
