package graft

import java.sql.Timestamp

import graft.functions.Geo
import graft.streaming.{SessionStream, StreamEvent, WindowedCounts}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Geohash native expression + structured-streaming operators. */
@SlowTest
class ExpressionStreamingSpec extends SparkSpecBase {
  import spark.implicits._

  test("geohash matches published fixture values") {
    // (57.64911, 10.40744) → u4pruydqqvj is THE canonical geohash example
    val out = Seq((57.64911, 10.40744), (42.6, -5.6))
      .toDF("lat", "lon")
      .select(Geo.geohash(col("lat"), col("lon"), 11).as("gh11"),
        Geo.geohash(col("lat"), col("lon"), 5).as("gh5"))
      .as[(String, String)].collect()
    assert(out(0)._1 === "u4pruydqqvj")
    assert(out(1)._2 === "ezs42")
  }

  test("geohash: out-of-range coords yield null, not an error") {
    val out = Seq((91.0, 0.0), (0.0, 181.0), (Double.NaN, 0.0))
      .toDF("lat", "lon")
      .select(Geo.geohash(col("lat"), col("lon"), 6).as("gh"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("geohash is callable from SQL via GraftFunctions registration") {
    GraftFunctions.register(spark)
    val gh = spark.sql("SELECT geohash(57.64911, 10.40744, 6) AS gh").as[String].head()
    assert(gh === "u4pruy")
  }

  test("hashing kernels are callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT size(minhash_bands(array(1L, 2L, 3L), 128, 32)) AS nb,
        |       simhash64(array(-1L)) AS sh,
        |       dot_product(array(1.0, 2.0), array(3.0, 4.0)) AS dp""".stripMargin)
      .as[(Int, Long, Double)].head()
    assert(r._1 === 32)
    assert(r._2 === -1L) // single all-ones hash → every bit counter positive
    assert(r._3 === 11.0)
  }

  test("geohash prefix property: nearby points share prefixes") {
    val out = Seq((48.8566, 2.3522), (48.8570, 2.3530))
      .toDF("lat", "lon")
      .select(Geo.geohash(col("lat"), col("lon"), 6).as("gh")).as[String].collect()
    assert(out(0).take(5) === out(1).take(5))
  }

  test("streaming sessionization closes sessions on gap and on silence") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val sessions = SessionStream.sessionize(input.toDS(), gapSeconds = 3600,
      watermarkDelay = "0 seconds")
    val query = sessions.writeStream.format("memory")
      .queryName("sess_out").outputMode("append").start()
    try {
      def ts(sec: Long) = new Timestamp(sec * 1000)
      // session 0: two points; then a >1h gap → session 1
      input.addData(
        StreamEvent(1L, ts(1000), 2.0), StreamEvent(1L, ts(1500), 3.0),
        StreamEvent(1L, ts(10000), 4.0))
      query.processAllAvailable()
      // watermark advance far beyond session 1's horizon → timeout fires
      input.addData(StreamEvent(99L, ts(100000), 0.0))
      query.processAllAvailable()
      input.addData(StreamEvent(99L, ts(200000), 0.0))
      query.processAllAvailable()

      val out = spark.table("sess_out")
        .select("userId", "sessionId", "startSec", "endSec", "nPoints", "sumValue")
        .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      assert(out.contains((1L, 0L, 1000L, 1500L, 2L, 5.0)), s"got ${out.mkString(", ")}")
      assert(out.contains((1L, 1L, 10000L, 10000L, 1L, 4.0)), s"got ${out.mkString(", ")}")
    } finally query.stop()
  }

  test("windowed counts aggregate per tumbling window on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val counts = WindowedCounts.countsPerWindow(df, "ts", "event_type",
      windowLen = "1 hour", watermarkDelay = "0 seconds")
    val query = counts.writeStream.format("memory")
      .queryName("win_out").outputMode("append").start()
    try {
      def ts(sec: Long) = new Timestamp(sec * 1000)
      input.addData((ts(100), "a", 1.0), (ts(200), "a", 2.0), (ts(100), "b", 5.0))
      query.processAllAvailable()
      input.addData((ts(10000), "a", 9.0)) // advances watermark, closes window 0
      query.processAllAvailable()
      input.addData((ts(20000), "a", 9.0))
      query.processAllAvailable()

      val out = spark.table("win_out")
        .select("event_type", "n_events", "sum_value")
        .as[(String, Long, Double)].collect().toSet
      assert(out.contains(("a", 2L, 3.0)), s"got $out")
      assert(out.contains(("b", 1L, 5.0)), s"got $out")
    } finally query.stop()
  }

  test("stream-static enrichment broadcasts the dim, keeps unmatched rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "code")
    val dim = Seq((1L, "anchored"), (2L, "moving")).toDF("nav_code", "description")
    val enriched = graft.streaming.StaticEnrich.lookup(df, dim, "code", "nav_code",
      Seq("description"))
    val query = enriched.writeStream.format("memory")
      .queryName("enrich_out").outputMode("append").start()
    try {
      def ts(sec: Long) = new Timestamp(sec * 1000)
      input.addData((ts(100), 1L), (ts(200), 2L), (ts(300), 99L))
      query.processAllAvailable()
      val out = spark.table("enrich_out").select("code", "description")
        .as[(Long, Option[String])].collect().toSet
      assert(out === Set((1L, Some("anchored")), (2L, Some("moving")), (99L, None)),
        s"got $out")
    } finally query.stop()
  }

  test("sliding windows fan each event into windowLen/slideLen windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val counts = WindowedCounts.slidingCountsPerWindow(df, "ts", "event_type",
      windowLen = "100 seconds", slideLen = "50 seconds",
      watermarkDelay = "0 seconds")
    val query = counts.writeStream.format("memory")
      .queryName("slide_out").outputMode("append").start()
    try {
      def ts(sec: Long) = new Timestamp(sec * 1000)
      input.addData((ts(120), "a", 1.0))
      query.processAllAvailable()
      input.addData((ts(10000), "a", 1.0)) // advance watermark, close windows
      query.processAllAvailable()
      val out = spark.table("slide_out")
        .select(col("window_start").cast("long"), col("n_events"))
        .as[(Long, Long)].collect().toSet
      // event at t=120 belongs to [50,150) and [100,200)
      assert(out.contains((50L, 1L)) && out.contains((100L, 1L)), s"got $out")
    } finally query.stop()
  }

  test("streaming dedup keeps one row per key within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "id", "payload")
    // 1-hour horizon: all test events fall inside it, so every repeat of
    // the key must be suppressed (a 0s delay would expire the key's state
    // as soon as the watermark passed it, legitimately re-emitting)
    val deduped = graft.streaming.DedupStream.dedup(df, "ts", Seq("payload"),
      watermarkDelay = "1 hour")
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      def ts(sec: Long) = new Timestamp(sec * 1000)
      // same payload three times (two batches) → one row survives
      input.addData((ts(100), 1L, "dup"), (ts(200), 2L, "dup"), (ts(300), 3L, "uniq"))
      query.processAllAvailable()
      input.addData((ts(400), 4L, "dup"))
      query.processAllAvailable()

      val out = spark.table("dedup_out").select("payload")
        .as[String].collect().groupBy(identity).view.mapValues(_.length).toMap
      assert(out === Map("dup" -> 1, "uniq" -> 1), s"got $out")
    } finally query.stop()
  }

  test("native session_window agg matches the gap rule on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
    val agg = graft.streaming.SessionWindowAgg.aggregate(
      df, "ts", "user_id", "value", gap = "1 hour", watermarkDelay = "0 seconds")
    val query = agg.writeStream.format("memory")
      .queryName("sw_out").outputMode("append").start()
    try {
      def ts(sec: Long) = new Timestamp(sec * 1000)
      input.addData((ts(1000), 1L, 2.0), (ts(1500), 1L, 3.0), (ts(10000), 1L, 4.0))
      query.processAllAvailable()
      input.addData((ts(100000), 9L, 0.0)) // advance watermark, close sessions
      query.processAllAvailable()
      val out = spark.table("sw_out")
        .select("user_id", "start_sec", "n_points", "sum_value")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(out.contains((1L, 1000L, 2L, 5.0)), s"got $out")
      assert(out.contains((1L, 10000L, 1L, 4.0)), s"got $out")
    } finally query.stop()
  }

  test("stream-stream interval join matches keys within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    val posIn = MemoryStream[(Timestamp, Long, Double)]
    val statusIn = MemoryStream[(Timestamp, Long, String)]
    val pos = posIn.toDF().toDF("ts", "vessel", "sog")
    val status = statusIn.toDF().toDF("ts", "vessel", "nav")
    val joined = graft.streaming.StreamJoin.withinInterval(
      pos, status, "vessel", "ts", "ts",
      lookbackSec = 600, lookaheadSec = 600, watermarkDelay = "0 seconds")
    val query = joined.writeStream.format("memory")
      .queryName("ssj_out").outputMode("append").start()
    try {
      def ts(sec: Long) = new Timestamp(sec * 1000)
      posIn.addData((ts(1000), 1L, 9.0), (ts(5000), 1L, 3.0), (ts(1000), 2L, 1.0))
      statusIn.addData((ts(1200), 1L, "underway"), (ts(9000), 1L, "moored"))
      query.processAllAvailable()
      val out = spark.table("ssj_out").select("vessel", "sog", "r_nav")
        .as[(Long, Double, String)].collect().toSet
      // only vessel 1's position at t=1000 is within ±600s of a status
      assert(out === Set((1L, 9.0, "underway")), s"got $out")
    } finally query.stop()
  }

  test("windowed counts also run in batch mode (same code path)") {
    val df = Seq((new Timestamp(100000L), "a", 1.0), (new Timestamp(200000L), "a", 2.0))
      .toDF("ts", "event_type", "value")
    val out = WindowedCounts.countsPerWindow(df, "ts", "event_type")
    assert(out.agg(sum("n_events")).as[Long].head() === 2L)
  }
}
