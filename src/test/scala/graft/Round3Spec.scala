package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-3 additions: the Analytics operator family, TF-IDF, label
  * centroids, and the blocklist scrub. */
class Round3Spec extends SparkSpecBase {
  import spark.implicits._

  private def events = Seq(
    // (user, tsSec, type, value)
    (1L, 100L, "a", 10.0), (1L, 200L, "b", 20.0), (1L, 400L, "a", 30.0),
    (2L, 100L, "b", 5.0), (2L, 150L, "b", 5.0))
    .toDF("user_id", "ts_sec", "event_type", "value")
    .withColumn("event_id", col("ts_sec"))

  test("topKPerGroup keeps exactly k rows per group in order") {
    val daily = Seq((1L, "d1", 5L), (1L, "d2", 9L), (1L, "d3", 9L), (2L, "d1", 1L))
      .toDF("user_id", "day", "n")
    val top = Analytics.topKPerGroup(daily, Seq("user_id"), 2,
      Seq(col("n").desc, col("day").asc)).collect()
    assert(top.length === 3)
    val u1 = top.filter(_.getLong(0) == 1L).sortBy(_.getInt(3))
    assert(u1.map(_.getString(1)).toSeq === Seq("d2", "d3")) // ties → day asc
  }

  test("transitions counts ordered consecutive pairs per user") {
    val t = Analytics.transitions(events, Seq("user_id"), "ts_sec", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(t === Set(("a", "b", 1L), ("b", "a", 1L), ("b", "b", 1L)))
  }

  test("zscore standardizes within group (explicit-sums stddev)") {
    val z = Analytics.zscore(events.filter(col("user_id") === 1), Seq("user_id"), "value")
      .orderBy("ts_sec").select("z").as[Double].collect()
    // values 10,20,30: mean 20, sample std 10 → z = -1, 0, 1
    assert(z.zip(Seq(-1.0, 0.0, 1.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("histogram buckets by fixed width with lower-bound labels") {
    val h = Analytics.histogram(events, "value", 10.0)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    assert(h === Map(10.0 -> 1L, 20.0 -> 1L, 30.0 -> 1L, 0.0 -> 2L))
  }

  test("pivotCounts emits one column per declared value, zero-filled") {
    val p = Analytics.pivotCounts(events, "user_id", "event_type", Seq("a", "b", "c"))
    assert(p.columns.toSeq === Seq("user_id", "a", "b", "c"))
    val u2 = p.filter(col("user_id") === 2).head()
    assert((u2.getLong(1), u2.getLong(2), u2.getLong(3)) === ((0L, 2L, 0L)))
  }

  test("interArrival reports gap stats; single-event users get null gaps") {
    val one = Seq((9L, 50L)).toDF("user_id", "ts_sec")
    val ia = Analytics.interArrival(events.select("user_id", "ts_sec").union(one),
      Seq("user_id"), "ts_sec")
    val r1 = ia.filter(col("user_id") === 1).head()
    assert((r1.getLong(2), r1.getLong(3), r1.getDouble(4)) === ((100L, 200L, 150.0)))
    assert(ia.filter(col("user_id") === 9).head().isNullAt(2))
  }

  test("ntileBucket assigns SQL-standard equal-frequency buckets") {
    val df = (1 to 8).map(i => (1L, i.toDouble)).toDF("k", "v")
    val b = Analytics.ntileBucket(df, Seq("k"), 4, Seq(col("v").asc))
      .groupBy("bucket").count().collect()
    assert(b.forall(_.getLong(1) == 2L))
  }

  test("rollingMean averages the trailing row frame per user") {
    val r = Analytics.rollingMean(events, Seq("user_id"), "ts_sec", "value", 2)
      .filter(col("user_id") === 1).orderBy("ts_sec")
      .select("rolling_avg").as[Double].collect()
    assert(r.toSeq === Seq(10.0, 15.0, 25.0))
  }

  test("cubeProfile emits every dimension subset in one pass") {
    val c = Analytics.cubeProfile(events, Seq("user_id", "event_type"), "value")
    // 3 present (user,type) cells + 2 user subtotals + 2 type subtotals + grand
    assert(c.count() === 8L)
    val total = c.filter(col("user_id").isNull && col("event_type").isNull).head()
    assert(total.getLong(2) === 5L && total.getDouble(3) === 70.0)
  }

  test("tfidf: corpus-wide tokens score zero, rare tokens dominate") {
    val docs = Seq((1L, "common rare1"), (2L, "common rare2"), (3L, "common rare3"))
      .toDF("doc_id", "text")
    val t = Text.tfidf(docs, "doc_id", "text")
    assert(t.filter(col("token") === "common" && col("tfidf") =!= 0.0).count() === 0)
    val top = Analytics.topKPerGroup(t, Seq("id"), 1,
      Seq(col("tfidf").desc, col("token").asc))
    assert(top.filter(col("id") === 1).head().getString(1) === "rare1")
  }

  test("labelCentroids: element-wise mean per label, 1-based dims") {
    val df = Seq((0, Seq(1.0f, 3.0f)), (0, Seq(3.0f, 5.0f)), (1, Seq(7.0f, 7.0f)))
      .toDF("label", "embedding")
    val c = Similarity.labelCentroids(df, "label", "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(c === Map((0, 1) -> 2.0, (0, 2) -> 4.0, (1, 1) -> 7.0, (1, 2) -> 7.0))
  }

  test("resampleForwardFill: full grid per entity, gaps carry last value") {
    val df = Seq((1L, 0L, 10.0, 1L), (1L, 5L, 11.0, 2L), (1L, 25L, 12.0, 3L))
      .toDF("user_id", "ts_sec", "value", "event_id")
    val r = Trajectory.resampleForwardFill(df, Seq("user_id"), "ts_sec",
        "value", stepSec = 10L, rowKeyCol = "event_id")
      .orderBy("slot")
      .collect().map(x => (x.getLong(1), x.getDouble(2)))
    // slots 0,10,20: slot 0 takes the LATER obs (ts=5), 10 forward-fills
    assert(r.toSeq === Seq((0L, 11.0), (10L, 11.0), (20L, 12.0)))
  }

  test("winsorize clips to the group quantile band, keeps inliers") {
    val df = ((1 to 9).map(i => (1L, i.toDouble)) :+ ((1L, 1000.0)))
      .toDF("user_id", "value")
    val w = Quality.winsorize(df, Seq("user_id"), "value", 0.0, 0.9)
    // p90 of 1..9,1000 at quantile_cont(0.9): rank 8.1 → 9 + 0.1*(1000-9)
    val clipped = w.filter(col("value") === 1000.0).head.getAs[Double]("winsorized")
    assert(math.abs(clipped - 108.1) < 1e-9)
    assert(w.filter(col("value") === 5.0).head.getAs[Double]("winsorized") === 5.0)
  }

  test("tokenEntropy: uniform tokens → ln(k); constant tokens → 0") {
    val df = Seq((1L, "a b c d"), (2L, "x x x x")).toDF("doc_id", "text")
    val e = Text.tokenEntropy(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(e(1L) - math.log(4)) < 1e-12)
    assert(math.abs(e(2L)) < 1e-12)
  }

  test("editDistancePairs: banding finds pairs across length-band walls") {
    val df = Seq(
      (1L, "abcdef"),    // len 6, band 1 (maxDist=5 → band size 6)
      (2L, "abcde"),     // len 5, band 0 — dist 1 from doc 1, crosses bands
      (3L, "abcdxf"),    // dist 1 from doc 1, same band
      (4L, "zzzzzzzzzzzzzzzz")) // far from everything
      .toDF("doc_id", "k")
    val pairs = Dedup.editDistancePairs(df, "doc_id", "k", maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs === Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 2)))
  }

  test("concatPacked assembles pack text in order-key order") {
    val df = Seq((1L, "en", 0L, "first"), (3L, "en", 0L, "third"), (2L, "en", 0L, "second"))
      .toDF("doc_id", "lang", "pack_id", "text")
    val out = Text.concatPacked(df, "lang", "pack_id", "doc_id", "text").head()
    assert(out.getAs[String]("packed_text") === "first second third")
    assert(out.getAs[Long]("n_docs") === 3L)
  }

  test("unigramLogProb: mean corpus log-probability per document") {
    val df = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val lp = Text.unigramLogProb(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val expected = (math.log(2.0 / 4) + math.log(1.0 / 4)) / 2
    assert(math.abs(lp(1L) - expected) < 1e-12)
    assert(math.abs(lp(2L) - expected) < 1e-12)
  }

  test("fileProfile detects small files; compact resolves them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-profile").toFile.getPath
    val rows = (1 to 100).map(i => (i.toLong, "2024", "01", f"${i % 2 + 1}%02d"))
      .toDF("id", "year", "month", "day")
    // two appends — the micro-batch pattern that accumulates small files
    for (_ <- 1 to 2)
      rows.write.mode("append")
        .partitionBy("year", "month", "day").parquet(dir)
    val before = graft.sources.LakeWriter.fileProfile(spark, dir)
    assert(before.count() === 2) // two day partitions
    assert(before.agg(max("n_files")).head.getLong(0) >= 2)
    assert(before.agg(sum("n_rows")).head.getLong(0) === 200L)
    graft.sources.LakeWriter.compact(spark, dir)
    val after = graft.sources.LakeWriter.fileProfile(spark, dir)
    assert(after.agg(max("n_files")).head.getLong(0) === 1L)
    assert(after.agg(sum("n_rows")).head.getLong(0) === 200L)
  }

  test("autocorr: alternating series → -1, trending series → +1") {
    val alt = (0 until 10).map(i => (1L, i.toLong, if (i % 2 == 0) 1.0 else -1.0))
    val trend = (0 until 10).map(i => (2L, i.toLong, i.toDouble))
    val df = (alt ++ trend).toDF("user_id", "ts_sec", "value")
    val ac = Analytics.autocorr(df, Seq("user_id"), "ts_sec", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(ac(1L) - (-1.0)) < 1e-9)
    assert(math.abs(ac(2L) - 1.0) < 1e-9)
  }

  test("cohortRetention: entities counted at their first-period cohort") {
    val df = Seq((1L, 10L), (1L, 11L), (1L, 13L), (2L, 11L), (2L, 13L))
      .toDF("user_id", "day_n")
    val r = Analytics.cohortRetention(df, "user_id", "day_n")
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(r === Map((10L, 0L) -> 1L, (10L, 1L) -> 1L, (10L, 3L) -> 1L,
      (11L, 0L) -> 1L, (11L, 2L) -> 1L))
  }

  test("funnel: strict in-order matching within the window") {
    val df = Seq(
      // u1 converts fully in order
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "buy"),
      // u2 clicks BEFORE viewing → stalls at stage 1
      (2L, 100L, "click"), (2L, 200L, "view"),
      // u3 converts but outside the window
      (3L, 100L, "view"), (3L, 99999L, "click"))
      .toDF("user_id", "ts_sec", "event_type")
    val f = Analytics.funnel(df, "user_id", "ts_sec", "event_type",
        Seq("view", "click", "buy"), windowSec = 1000L)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(f === Map(1 -> 3L, 2 -> 1L, 3 -> 1L))
  }

  test("clusterPairs on an empty pair set returns an empty frame (no NPE)") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.clusterPairs(empty, "id_a", "id_b").count() === 0)
  }

  test("blocklistAnti drops every row whose key matches the blocklist") {
    val docs = Seq((1L, "bad"), (2L, "good"), (3L, "bad"), (4L, "fine"))
      .toDF("doc_id", "text")
    val block = Seq("bad").toDF("t")
    val kept = Dedup.blocklistAnti(docs, block, "text", "t")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(2L, 4L))
  }
}
