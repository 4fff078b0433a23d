package graft

import graft.functions.Geo
import graft.operators._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Cleansing, sessionization, geo, trajectory, state, rollup, dims. */
class CoreOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("parseTimestamps handles multiple formats and drops garbage") {
    val df = Seq(
      ("2024-01-02 03:04:05"),
      ("2024-01-02T03:04:05"),
      ("2024-01-02T03:04:05.123"),
      ("2024-01-02T03:04:05Z"),
      ("not a timestamp")).toDF("ts")
    val out = Cleanse.parseTimestamps(df, "ts")
    assert(out.count() === 4)
    assert(out.select("year").distinct().as[String].collect().toSeq === Seq("2024"))
    assert(out.select("day").distinct().as[String].collect().toSeq === Seq("02"))
  }

  test("normalizeColumns renames present sources, skips absent") {
    val df = Seq((1, "x")).toDF("RawA", "RawB")
    val out = Cleanse.normalizeColumns(df, Map("RawA" -> "a", "Missing" -> "m"))
    assert(out.columns.toSeq === Seq("a", "RawB"))
  }

  test("enforceSchema adds missing as null, drops extras, casts") {
    val df = Seq(("1", "junk")).toDF("a", "z")
    val out = Cleanse.enforceSchema(df, Seq("a" -> DoubleType, "b" -> DoubleType))
    assert(out.columns.toSeq === Seq("a", "b"))
    val row = out.head()
    assert(row.getDouble(0) === 1.0 && row.isNullAt(1))
  }

  test("emptyToNull nulls empty strings only") {
    val df = Seq(("", "keep"), ("x", "")).toDF("a", "b")
    val out = Cleanse.emptyToNull(df)
    assert(out.filter(col("a").isNull).count() === 1)
    assert(out.filter(col("b").isNull).count() === 1)
    assert(out.filter(col("a") === "x").count() === 1)
  }

  test("validSplit quarantines out-of-range and null coords") {
    val df = Seq((0.0, 0.0), (91.0, 0.0), (0.0, -181.0)).toDF("lat", "lon")
      .union(Seq((Option.empty[Double], Option(0.0))).toDF("lat", "lon"))
    val (valid, bad) = Cleanse.validSplit(df, Cleanse.validCoords(col("lat"), col("lon")))
    assert(valid.count() === 1)
    assert(bad.count() === 3)
  }

  test("clampUpper caps values") {
    val df = Seq(5.0, 150.0).toDF("v")
    val out = Cleanse.clampUpper(df, Map("v" -> 100.0)).as[Double].collect().sorted
    assert(out.toSeq === Seq(5.0, 100.0))
  }

  test("movement flag and state thresholds") {
    val df = Seq(0.0, 0.4, 0.6).toDF("sog")
    assert(Movement.flag(df, "sog", 0.5).filter(col("movement_flag") === 1).count() === 1)
    assert(Movement.state(df, "sog", 0.5).filter(col("movement_state") === "anchored").count() === 2)
  }

  test("sessionize splits on gap > threshold, per entity") {
    // user 1: gaps 100s, 4000s (split), 10s → sessions 0,0,1,1
    val df = Seq(
      (1L, 1000L, 1L), (1L, 1100L, 2L), (1L, 5100L, 3L), (1L, 5110L, 4L),
      (2L, 1000L, 5L)).toDF("user_id", "ts_sec", "event_id")
    val out = Sessionize(df, "user_id", "ts_sec", gapSeconds = 3600, tieBreak = Seq("event_id"))
    val ids = out.orderBy("event_id").select("session_id").as[Long].collect().toSeq
    assert(ids === Seq(0L, 0L, 1L, 1L, 0L))
  }

  test("seeded sessionize continues ids across windows (matches full history)") {
    val all = Seq(
      (1L, 1000L, 1L), (1L, 90000L, 2L), (1L, 90100L, 3L), (1L, 200000L, 4L))
      .toDF("user_id", "ts_sec", "event_id")
    val cut = 90050L
    val full = Sessionize(all, "user_id", "ts_sec", 3600, Seq("event_id"))
      .filter(col("ts_sec") >= cut)
      .orderBy("event_id").select("event_id", "session_id").as[(Long, Long)].collect()

    val w1 = Sessionize(all.filter(col("ts_sec") < cut), "user_id", "ts_sec", 3600, Seq("event_id"))
    val seeds = StateOps.latestPerKey(w1.select("user_id", "ts_sec", "event_id", "session_id"),
        Seq("user_id"), Seq("ts_sec", "event_id"))
      .withColumnRenamed("session_id", "seed_id").withColumn("is_seed", lit(true))
    val w2 = all.filter(col("ts_sec") >= cut)
      .withColumn("seed_id", lit(null).cast("long")).withColumn("is_seed", lit(false))
    val seeded = Sessionize.seeded(w2.unionByName(seeds), "user_id", "ts_sec", 3600,
        "seed_id", "is_seed", Seq("event_id"))
      .orderBy("event_id").select("event_id", "session_id").as[(Long, Long)].collect()
    assert(seeded.toSeq === full.toSeq)
  }

  test("haversine matches known Paris→London distance") {
    val d = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d")).as("km"))
      .as[Double].head()
    assert(math.abs(d - 343.5) < 1.5, s"got $d")
  }

  test("gridCell buckets to floor multiples") {
    val out = Seq(12.3, -12.3).toDF("x")
      .select(Geo.gridCell(col("x"), 5.0).as("g")).as[Int].collect().toSeq
    assert(out === Seq(10, -15))
  }

  test("segmentDistance: first point null, second = haversine") {
    val df = Seq((1L, 100L, 0.0, 0.0, 1L), (1L, 200L, 0.0, 1.0, 2L))
      .toDF("user_id", "ts_sec", "lat", "lon", "event_id")
    val out = Trajectory.segmentDistance(df, Seq("user_id"), "ts_sec", "lat", "lon", Seq("event_id"))
      .orderBy("event_id").select("segment_km").collect()
    assert(out(0).isNullAt(0))
    // 1 degree of longitude at the equator ≈ 111.19 km
    assert(math.abs(out(1).getDouble(0) - 111.19) < 0.5)
  }

  test("latestPerKey keeps max-order row per key") {
    val df = Seq((1L, 10L, "old"), (1L, 20L, "new"), (2L, 5L, "only"))
      .toDF("k", "o", "v")
    val out = StateOps.latestPerKey(df, Seq("k"), Seq("o"))
      .orderBy("k").select("v").as[String].collect().toSeq
    assert(out === Seq("new", "only"))
  }

  test("mergeDeltas adds sums, extends spans, handles one-sided keys") {
    val state = Seq((1L, 10L, 20L, 2.0), (2L, 5L, 6L, 1.0)).toDF("k", "lo", "hi", "n")
    val delta = Seq((1L, 15L, 30L, 3.0), (3L, 1L, 2L, 4.0)).toDF("k", "lo", "hi", "n")
    val out = StateOps.mergeDeltas(state, delta, Seq("k"),
        sumCols = Seq("n"), minCols = Seq("lo"), maxCols = Seq("hi"))
      .orderBy("k").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 10L, 30L, 5.0), (2L, 5L, 6L, 1.0), (3L, 1L, 2L, 4.0)))
  }

  test("dailySegments + monthlyRebuild restrict to active sessions") {
    val df = Seq(
      (1L, 0L, 100L, "d1"), (1L, 0L, 200L, "d2"),  // session (1,0) active on d2
      (2L, 0L, 150L, "d1")                           // not active on d2
    ).toDF("user_id", "session_id", "ts_sec", "day").withColumn("value", lit(1.0))
    val seg = Rollup.dailySegments(df, Seq("user_id", "session_id"), "ts_sec", "day")
    val met = Rollup.dailyMetrics(df, Seq("user_id", "session_id"), "day", Seq("value"))
    val out = Rollup.monthlyRebuild(seg, met, Seq("user_id", "session_id"), "day", "d2")
    val rows = out.select("user_id", "start_sec", "end_sec", "n_points").as[(Long, Long, Long, Long)].collect()
    assert(rows.toSeq === Seq((1L, 100L, 200L, 2L)))
  }

  test("buildUnionDim dedups across tagged sources; lookupJoin broadcasts") {
    val a = Seq(" x ", "y").toDF("name")
    val b = Seq("x", "z").toDF("name")
    val dim = Dims.buildUnionDim(Seq(a -> "s1", b -> "s2"),
      dedupKeys = Seq("name"), trimCols = Seq("name"))
    assert(dim.count() === 3) // x (first source wins), y, z

    val facts = Seq((1, "a"), (2, "b")).toDF("code", "payload")
    val lk = Seq((1, "one")).toDF("k", "v")
    val out = Dims.lookupJoin(facts, lk, "code", "k", "v", "label")
    assert(out.filter(col("label") === "one").count() === 1)
    assert(out.filter(col("label").isNull).count() === 1)
    assert(out.queryExecution.executedPlan.toString.contains("Broadcast"))
  }
}
