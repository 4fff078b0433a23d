package graft

import graft.operators.Text
import org.apache.spark.sql.functions._

/** Round-10 hardening: packed vs fallback suffix-rank parity, plus the
 * distributed bloom-probe scale contract lives in ZOrderSpec. */
@SlowTest
class Round10Spec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-r10-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("suffixSpans packed-gid ranks equal the two-scalar fallback") {
    // long ids take the packed (id << posBits | pos) densified-rank
    // path; stringifying the SAME ids forces the (ra, rb) fallback —
    // the span output must be identical row for row
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val packed = Text.suffixSpans(docs, "doc_id", "text",
        minLen = 8, minCount = 2)
      .select("id", "span_start", "span_end", "n_seeds")
      .as[(Long, Long, Long, Long)].collect().toSet
    val fallback = Text.suffixSpans(
        docs.select(col("doc_id").cast("string").as("doc_id"), col("text")),
        "doc_id", "text", minLen = 8, minCount = 2)
      .select("id", "span_start", "span_end", "n_seeds")
      .as[(String, Long, Long, Long)].collect()
      .map { case (id, s, e, n) => (id.toLong, s, e, n) }.toSet
    assert(packed.nonEmpty, "fixture has no duplicated spans — gate is vacuous")
    assert(packed === fallback,
      s"packed-only: ${(packed -- fallback).take(4)}; " +
        s"fallback-only: ${(fallback -- packed).take(4)}")
  }

  test("QuantileBucket kernel matches the aggregate-HOF formulation (NaN, dup cuts)") {
    import org.apache.spark.sql.GraftBridge
    val cuts = Array(-3.0, -3.0, 0.0, 1.5, 1.5, 1.5, 7.25, 100.0)
    val xs = Seq[java.lang.Double](-10.0, -3.0, -2.9, 0.0, 1.5, 1.49, 7.25,
      99.9, 100.0, 1e9, Double.NaN, null)
    val df = xs.toDF("x")
    // null→0 guard is the caller's contract (LakeWriter.quantileBucket)
    val kernel = when(col("x").isNull, lit(0L))
      .otherwise(GraftBridge.column(graft.expressions.QuantileBucket(
        GraftBridge.expression(col("x").cast("double")), cuts)))
    val hof = aggregate(typedLit(cuts.toSeq), lit(0L),
      (acc, cut) => acc + when(col("x").cast("double") >= cut, 1L).otherwise(0L))
    val rows = df.select(col("x"), kernel.as("k"), hof.as("h")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null parity broke at ${r.get(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) === r.getLong(2),
          s"x=${r.get(0)}: kernel ${r.getLong(1)} != hof ${r.getLong(2)}")
    }
  }

  test("sketch store: cross-session landed sketches roll up == direct computation") {
    import graft.operators.SketchStore
    val root = tmpDir("skstore")
    val events = graft.Tables.events(spark, sfDir)
    val days = events.select(to_date(col("ts")).as("d")).distinct()
      .orderBy("d").collect().map(_.getDate(0).toString).toSeq
    assert(days.length >= 3, s"fixture too thin: ${days.length} days")
    // SESSION 1 lands the first half of the days, SESSION 2 (a later
    // merge version, fresh frames — the restart) lands the rest; each
    // landing scans ONLY its days' raw rows
    val (d1, d2) = days.splitAt(days.length / 2)
    def slice(ds: Seq[String]) =
      events.filter(to_date(col("ts")).isin(ds: _*))
    SketchStore.land(spark, root, "v1",
      SketchStore.dailySketches(slice(d1.toSeq), "ts", "user_id", "value",
        dims = Seq("event_type")), dims = Seq("event_type"))
    SketchStore.land(spark, root, "v2",
      SketchStore.dailySketches(slice(d2.toSeq), "ts", "user_id", "value",
        dims = Seq("event_type")), dims = Seq("event_type"))
    // retention vacuum keeps the store readable
    graft.sources.StateStore.vacuum(spark, root, asOf = "v2")
    val gates = SketchStore.rollupGate(spark, root, events, "ts",
      "user_id", "value", dims = Seq("event_type"))
    val rows = gates.collect()
    assert(rows.nonEmpty, "gate produced no (month, dim) rows")
    rows.foreach { r =>
      Seq("rows_ok", "hll_ok", "kmv_ok", "p50_ok", "p95_ok").foreach { g =>
        assert(r.getBoolean(r.fieldIndex(g)),
          s"$g false at ${r.get(0)}/${r.get(1)}: $r")
      }
    }
    // re-landing a day (explicit maintenance) REPLACES, never doubles:
    // land day-1's sketches again as a maintenance version and re-gate
    SketchStore.land(spark, root, "v3",
      SketchStore.dailySketches(slice(Seq(days.head)), "ts", "user_id",
        "value", dims = Seq("event_type")), dims = Seq("event_type"))
    val rows2 = SketchStore.rollupGate(spark, root, events, "ts",
      "user_id", "value", dims = Seq("event_type")).collect()
    rows2.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("rows_ok")),
        s"re-landed day doubled counts at ${r.get(0)}/${r.get(1)}")
    }
  }

  test("streaming sketch landing: union across batches, exactly-once under replay") {
    import graft.operators.SketchStore
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("skstream")
    def ts(day: Int, sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d 00:00:${sec % 60}%02d")
    // three batches; day 1 and day 2 rows arrive SPLIT across batches —
    // replace-landing would clobber, union-landing must accumulate
    val batches = Seq(
      (1 to 40).map(i => (ts(1, i), i.toLong % 7, i * 1.0)),
      (1 to 40).map(i => (ts(1, i + 40), (i + 3).toLong % 11, i * 2.0)) ++
        (1 to 20).map(i => (ts(2, i), i.toLong % 5, i * 3.0)),
      (1 to 30).map(i => (ts(2, i + 20), (i + 1).toLong % 9, i * 0.5)))
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val q = SketchStore.sink(input.toDS().toDF("ts", "user_id", "value"),
      root, tmpDir("skckpt"), "ts", "user_id", "value")
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val all = batches.flatten.toDF("ts", "user_id", "value")
    val gates = SketchStore.rollupGate(spark, root, all, "ts",
      "user_id", "value").collect()
    assert(gates.nonEmpty)
    gates.foreach { r =>
      Seq("rows_ok", "hll_ok", "kmv_ok", "p50_ok", "p95_ok").foreach { g =>
        assert(r.getBoolean(r.fieldIndex(g)), s"$g false: $r")
      }
    }
    // replay: re-deliver batch 1 with the SAME id (crash-recovery shape)
    // — the committed version no-ops, nothing double-counts
    val rowsBefore = SketchStore.rollup(spark, root)
      .agg(sum("n_rows")).head().getLong(0)
    SketchStore.landBatch(spark, root, 1L,
      batches(1).toDF("ts", "user_id", "value"), "ts", "user_id", "value")
    val rowsAfter = SketchStore.rollup(spark, root)
      .agg(sum("n_rows")).head().getLong(0)
    assert(rowsAfter === rowsBefore, "replayed batch double-counted")
  }

  test("suffixSpans packability probe rejects ids that would overflow the pack") {
    // ids near Long.MaxValue cannot shift left by posBits — the probe
    // must fall back (not overflow into colliding/negative gids)
    val big = Long.MaxValue - 1
    val docs = Seq(
      (big, "p q r s t u v w"),
      (big - 1, "p q r s t u v w"),
      (1L, "a b c d e f g h")
    ).toDF("doc_id", "text")
    val got = Text.suffixSpans(docs, "doc_id", "text", minLen = 8, minCount = 2)
      .select("id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((big, 0L, 7L), (big - 1, 0L, 7L)), s"got $got")
  }
}
