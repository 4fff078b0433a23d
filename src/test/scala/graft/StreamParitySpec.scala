package graft

import java.sql.Timestamp

import graft.operators.Sessionize
import graft.streaming.{DedupStream, SessionStream, SessionWindowAgg, StreamEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Batch-parity gates for the streaming operators: randomized
 * out-of-order MemoryStream input, asserted EQUAL to the batch twin on
 * the same (non-late) events — including the late-past-watermark drop
 * rule, which is simulated alongside the stream and applied to the
 * batch side. These convert "the streaming op runs" specs into "the
 * streaming op computes the same answer as the batch op" proofs.
 */
class StreamParitySpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("SessionStream equals batch Sessionize on randomized out-of-order input with late drops") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(11)
    // 5 users x 30 points at 50s granularity over ~83 min, shuffled: plenty
    // of out-of-order delivery and some genuinely-late (dropped) points
    val all = rng.shuffle(for {
      u <- 1L to 5L
      _ <- 1 to 30
    } yield StreamEvent(u, ts(rng.nextInt(100) * 50L), rng.nextInt(10).toDouble))
    val batches = all.grouped((all.size + 2) / 3).toSeq
    val gapSec = 900L
    val delaySec = 600L

    // simulate Spark's watermark: rows with eventTime < watermark-at-
    // batch-start are dropped; watermark after a batch = max(seen) - delay
    var wmSec = Long.MinValue
    var maxSeen = Long.MinValue
    val kept = Seq.newBuilder[StreamEvent]
    batches.foreach { b =>
      kept ++= b.filter(_.ts.getTime / 1000 >= wmSec)
      maxSeen = math.max(maxSeen, b.map(_.ts.getTime / 1000).max)
      wmSec = maxSeen - delaySec
    }

    val input = MemoryStream[StreamEvent]
    val sessions = SessionStream.sessionize(input.toDS(), gapSec,
      watermarkDelay = s"$delaySec seconds")
    val query = sessions.writeStream.format("memory")
      .queryName("parity_sess").outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      // sentinel user far in the future: watermark passes every session's
      // gap horizon, so the event-time timeouts close them all
      input.addData(StreamEvent(999L, ts(1000000), 0.0)); query.processAllAvailable()
      input.addData(StreamEvent(999L, ts(2000000), 0.0)); query.processAllAvailable()

      val streamed = spark.table("parity_sess")
        .filter(col("userId") =!= 999L)
        .select("userId", "startSec", "endSec", "nPoints", "sumValue")
        .as[(Long, Long, Long, Long, Double)].collect().toSet

      // batch twin on the kept events (session ids are numbered
      // differently after mid-stream timeouts, so compare session CONTENT)
      val expected = Sessionize(
          kept.result().map(e => (e.userId, e.ts.getTime / 1000, e.value))
            .toDF("user_id", "ts_sec", "value"),
          "user_id", "ts_sec", gapSec)
        .groupBy("user_id", "session_id")
        .agg(min("ts_sec").as("s"), max("ts_sec").as("e"),
          count(lit(1)).as("n"), sum("value").as("v"))
        .select("user_id", "s", "e", "n", "v")
        .as[(Long, Long, Long, Long, Double)].collect().toSet

      assert(streamed === expected,
        s"stream-only: ${streamed -- expected}; batch-only: ${expected -- streamed}")
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("DedupStream equals batch dropDuplicates on randomized input within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(23)
    // 120 rows over 12 distinct payloads, shuffled out of order; the 2h
    // horizon covers the whole timeline so every repeat must be suppressed
    val all = rng.shuffle((1 to 120).map { i =>
      (ts(rng.nextInt(100) * 50L), i.toLong, s"payload-${rng.nextInt(12)}")
    })
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = DedupStream.dedup(input.toDF().toDF("ts", "id", "payload"),
      "ts", Seq("payload"), watermarkDelay = "2 hours")
    val query = deduped.writeStream.format("memory")
      .queryName("parity_dedup").outputMode("append").start()
    try {
      all.grouped(40).foreach { b => input.addData(b); query.processAllAvailable() }
      val streamed = spark.table("parity_dedup").select("payload")
        .as[String].collect().groupBy(identity).view.mapValues(_.length).toMap
      val batch = all.toDF("ts", "id", "payload").dropDuplicates("payload")
        .select("payload").as[String].collect().toSet
      assert(streamed.keySet === batch)
      assert(streamed.values.forall(_ === 1), s"duplicate emissions: $streamed")
    } finally query.stop()
  }

  test("SessionWindowAgg stream output equals its own batch run (same code path)") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(37)
    val all = rng.shuffle(for {
      u <- 1L to 4L
      _ <- 1 to 25
    } yield (ts(rng.nextInt(100) * 50L), u, rng.nextInt(100).toDouble))
    val input = MemoryStream[(Timestamp, Long, Double)]
    val agg = SessionWindowAgg.aggregate(
      input.toDF().toDF("ts", "user_id", "value"),
      "ts", "user_id", "value", gap = "15 minutes", watermarkDelay = "2 hours")
    val query = agg.writeStream.format("memory")
      .queryName("parity_sw").outputMode("append").start()
    try {
      all.grouped(30).foreach { b => input.addData(b); query.processAllAvailable() }
      // close every session: watermark far past all window ends
      input.addData((ts(10000000), 999L, 0.0)); query.processAllAvailable()
      input.addData((ts(20000000), 999L, 0.0)); query.processAllAvailable()

      val streamed = spark.table("parity_sw")
        .filter(col("user_id") =!= 999L)
        .select("user_id", "start_sec", "end_sec", "n_points", "sum_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      // 2h delay > the 83-min timeline: nothing is late, so the batch run
      // of the SAME function on the full input is the exact expectation
      val expected = SessionWindowAgg.aggregate(
          all.toDF("ts", "user_id", "value"), "ts", "user_id", "value",
          gap = "15 minutes")
        .select("user_id", "start_sec", "end_sec", "n_points", "sum_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(streamed === expected,
        s"stream-only: ${streamed -- expected}; batch-only: ${expected -- streamed}")
      assert(streamed.nonEmpty)
    } finally query.stop()
  }
}
