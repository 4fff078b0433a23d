package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.operators.Sessionize
import graft.sources.StateStore
import graft.streaming.{SessionStream, StateSink, StreamEvent}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Checkpoint-restart recovery: a streaming query is STOPPED mid-stream
 * and restarted from the same checkpoint with more data, and the final
 * result must equal a from-scratch batch run — the streaming twin of the
 * batch incremental re-run safety (reference: voyage_state_io.py:10-35
 * dated state round-trip). A replayed-batchId unit test proves the merge
 * is idempotent; THESE tests prove the whole checkpointed query is: the
 * offset log, the operator state store, and the sink all survive a real
 * stop/restart.
 */
@SlowTest
class RestartRecoverySpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private val deltaSchema = StructType(Seq(
    StructField("entity", StringType), StructField("dist", DoubleType),
    StructField("start_sec", LongType), StructField("end_sec", LongType)))

  test("StateSink survives stop + restart from checkpoint, incl. an uncommitted last batch") {
    val inputDir = tmp("graft-restart-in")
    val root = tmp("graft-restart-state")
    val ckpt = tmp("graft-restart-ckpt")
    def addFile(rows: (String, Double, Long, Long)*): Unit =
      rows.toDF("entity", "dist", "start_sec", "end_sec")
        .coalesce(1).write.mode("append").parquet(inputDir)
    def sink() = StateSink.start(
      spark.readStream.schema(deltaSchema)
        .option("maxFilesPerTrigger", "1").parquet(inputDir),
      root, ckpt, keys = Seq("entity"), sumCols = Seq("dist"),
      minCols = Seq("start_sec"), maxCols = Seq("end_sec"), nBuckets = 8)

    addFile(("a", 10.0, 100L, 200L), ("b", 5.0, 50L, 60L))
    addFile(("a", 1.5, 250L, 300L), ("c", 2.0, 10L, 20L))
    val q1 = sink()
    try q1.processAllAvailable() finally q1.stop()

    // crash window: the engine committed the merge but died BEFORE
    // writing the offset commit — delete the newest commit marker so the
    // restart genuinely RE-DELIVERS that batch (same batchId, same files)
    val commits = Paths.get(ckpt, "commits").toFile.listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.length >= 2, "expected one commit per input file")
    val crc = new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) crc.delete() // stale Hadoop checksum would block the rewrite

    addFile(("b", 4.0, 70L, 90L), ("a", 0.5, 400L, 410L))
    val q2 = sink()
    try q2.processAllAvailable() finally q2.stop()

    val got = StateStore.read(spark, root).get.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // from-scratch batch truth over the full input dir
    val truth = spark.read.parquet(inputDir)
      .groupBy("entity")
      .agg(min("start_sec").as("s"), max("end_sec").as("e"), sum("dist").as("d"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === truth, s"restarted state drifted from batch truth")
    assert(got("a") === ((100L, 410L, 12.0)))
    // the replayed batch produced no extra version: one per delivered batch
    assert(StateStore.committedVersions(spark, root).size === 3)
  }

  test("SessionStream state survives stop + restart: sessions spanning the restart stay whole") {
    val inputDir = tmp("graft-sess-in")
    val outDir = tmp("graft-sess-out")
    val ckpt = tmp("graft-sess-ckpt")
    val gapSec = 900L
    def addFile(rows: (Long, Long, Double)*): Unit =
      rows.map { case (u, sec, v) => StreamEvent(u, ts(sec), v) }
        .toDF().coalesce(1).write.mode("append").parquet(inputDir)
    def run() = SessionStream.sessionize(
        spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[StreamEvent]].schema)
          .option("maxFilesPerTrigger", "1").parquet(inputDir).as[StreamEvent],
        gapSec, watermarkDelay = "2 hours")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // pre-restart: user 1 has an OPEN session at stop time; user 2's
    // first session closes before the stop
    addFile((1L, 1000L, 1.0), (1L, 1500L, 2.0), (2L, 1000L, 5.0))
    addFile((2L, 2500L, 6.0), (1L, 2000L, 3.0)) // 2: gap 1500 > 900 → new session
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()

    // post-restart: user 1 continues the SAME session (gap 500 ≤ 900)
    // across the restart boundary; then sentinels close everything
    addFile((1L, 2500L, 4.0), (2L, 3000L, 7.0))
    addFile((999L, 10000000L, 0.0))
    addFile((999L, 20000000L, 0.0))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.read.parquet(outDir)
      .filter(col("userId") =!= 999L)
      .select("userId", "startSec", "endSec", "nPoints", "sumValue")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // nothing is late under the 2h delay: batch Sessionize over the full
    // replay is the exact expectation (compare session CONTENT)
    val all = spark.read.parquet(inputDir).filter(col("userId") =!= 999L)
      .select(col("userId").as("user_id"),
        (col("ts").cast("long")).as("ts_sec"), col("value"))
    val expected = Sessionize(all, "user_id", "ts_sec", gapSec)
      .groupBy("user_id", "session_id")
      .agg(min("ts_sec").as("s"), max("ts_sec").as("e"),
        count(lit(1)).as("n"), sum("value").as("v"))
      .select("user_id", "s", "e", "n", "v")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(streamed === expected,
      s"stream-only: ${streamed -- expected}; batch-only: ${expected -- streamed}")
    // the restart-spanning session is one row, not two fragments
    assert(streamed.contains((1L, 1000L, 2500L, 4L, 10.0)))
  }

  test("TrajectoryStream.stayPoints: a dwell spanning stop + restart is emitted whole") {
    import graft.streaming.{StayFix, TrajectoryStream}
    val inputDir = tmp("graft-stay-in")
    val outDir = tmp("graft-stay-out")
    val ckpt = tmp("graft-stay-ckpt")
    def addFile(rows: (Long, Long, Double, Double, Double)*): Unit =
      rows.map { case (u, sec, s, la, lo) => StayFix(u, ts(sec), s, la, lo) }
        .toDF().coalesce(1).write.mode("append").parquet(inputDir)
    def run() = TrajectoryStream.stayPoints(
        spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[StayFix]].schema)
          .option("maxFilesPerTrigger", "1").parquet(inputDir).as[StayFix],
        speedThreshold = 1.0, minDurationSec = 300L, watermarkDelay = "30 minutes")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // pre-restart: entity 1 anchored 1000-1600 — dwell OPEN at stop time
    addFile((1L, 1000L, 0.2, 10.0, 20.0), (1L, 1300L, 0.4, 10.2, 20.2),
      (1L, 1600L, 0.1, 10.4, 20.4))
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    assert(!new java.io.File(outDir).exists() ||
      spark.read.parquet(outDir).isEmpty, "dwell emitted before it closed")

    // post-restart: the dwell CONTINUES (1900-2200 anchored), then a
    // moving fix closes it; pushers advance the watermark past the close
    addFile((1L, 1900L, 0.3, 10.6, 20.6), (1L, 2200L, 0.5, 10.8, 20.8))
    addFile((1L, 2500L, 9.9, 11.0, 21.0))
    addFile((1L, 2500L + 1800L + 600L, 9.9, 0.0, 0.0))
    addFile((1L, 2500L + 2 * (1800L + 600L), 9.9, 0.0, 0.0))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.read.parquet(outDir)
      .select("userId", "startSec", "endSec", "nPoints")
      .as[(Long, Long, Long, Long)].collect().toSet
    // ONE whole dwell spanning the restart, matching the batch twin
    assert(streamed === Set((1L, 1000L, 2200L, 5L)),
      s"restart fragmented or dropped the dwell: $streamed")
    val batch = graft.operators.Trajectory.stayPoints(
        spark.read.parquet(inputDir)
          .select(col("userId").as("user_id"), col("ts").cast("long").as("ts_sec"),
            col("speed"), col("lat"), col("lon")),
        Seq("user_id"), "ts_sec", "speed", "lat", "lon",
        speedThreshold = 1.0, minDurationSec = 300L)
      .select("user_id", "start_sec", "end_sec", "n_points")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed === batch, s"stream $streamed != batch $batch")
  }

  test("TrajectoryStream.odVoyages: a voyage spanning stop + restart emits one row") {
    import graft.streaming.{OdFix, TrajectoryStream}
    val inputDir = tmp("graft-od-in")
    val outDir = tmp("graft-od-out")
    val ckpt = tmp("graft-od-ckpt")
    val gapSec = 900L
    def addFile(rows: (Long, Long, String, Long)*): Unit =
      rows.map { case (u, sec, c, e) => OdFix(u, ts(sec), c, e) }
        .toDF().coalesce(1).write.mode("append").parquet(inputDir)
    def run() = TrajectoryStream.odVoyages(
        spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[OdFix]].schema)
          .option("maxFilesPerTrigger", "1").parquet(inputDir).as[OdFix],
        gapSec, watermarkDelay = "2 hours")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // pre-restart: voyage open, origin cell A
    addFile((1L, 1000L, "A", 1L), (1L, 1400L, "B", 2L))
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()

    // post-restart: same voyage continues into cell C (gap 500 <= 900),
    // then sentinels close it via the event-time timeout
    addFile((1L, 1900L, "C", 3L))
    addFile((999L, 10000000L, "Z", 4L))
    addFile((999L, 20000000L, "Z", 5L))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir).filter(col("userId") =!= 999L)
      .select("userId", "origin", "dest", "startSec", "endSec", "nPoints")
      .as[(Long, String, String, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, "A", "C", 1000L, 1900L, 3L)),
      s"restart fragmented the voyage: $got")
  }

  test("Scd2Stream: a version spanning stop + restart closes as one interval") {
    import graft.streaming.{Scd2Fix, Scd2Stream}
    val inputDir = tmp("graft-scd2-in")
    val outDir = tmp("graft-scd2-out")
    val ckpt = tmp("graft-scd2-ckpt")
    def addFile(rows: (Long, Long, String, Long)*): Unit =
      rows.map { case (u, sec, a, e) => Scd2Fix(u, ts(sec), a, e) }
        .toDF().coalesce(1).write.mode("append").parquet(inputDir)
    def run() = Scd2Stream.versions(
        spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[Scd2Fix]].schema)
          .option("maxFilesPerTrigger", "1").parquet(inputDir).as[Scd2Fix],
        watermarkDelay = "30 minutes")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // pre-restart: version A opens (plus heartbeats)
    addFile((1L, 1000L, "A", 1L), (1L, 1400L, "A", 2L))
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()

    // post-restart: another heartbeat, then the change to B closes A;
    // pushers advance the watermark past the change
    addFile((1L, 1800L, "A", 3L), (1L, 2200L, "B", 4L))
    addFile((1L, 2200L + 1800L + 600L, "B", 5L))
    addFile((1L, 2200L + 2 * (1800L + 600L), "B", 6L))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir)
      .select("userId", "attr", "effStart", "effEnd", "nRows")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, "A", 1000L, 2200L, 3L)),
      s"restart fragmented the version: $got")
  }

  test("EncounterStream: a pair whose two fixes straddle a stop + restart is still found") {
    import graft.streaming.EncounterStream
    val inputDir = tmp("graft-enc-in")
    val outDir = tmp("graft-enc-out")
    val ckpt = tmp("graft-enc-ckpt")
    def addFile(rows: (Long, Long, Double, Double)*): Unit =
      rows.map { case (u, sec, la, lo) => (u, ts(sec), la, lo) }
        .toDF("user_id", "t", "lat", "lon")
        .coalesce(1).write.mode("append").parquet(inputDir)
    def run() = EncounterStream.encounters(
        spark.readStream.schema(StructType(Seq(
          StructField("user_id", LongType), StructField("t", TimestampType),
          StructField("lat", DoubleType), StructField("lon", DoubleType))))
          .option("maxFilesPerTrigger", "1").parquet(inputDir),
        "user_id", "t", "lat", "lon", maxKm = 50.0, maxGapSec = 600L,
        watermarkDelay = "30 minutes")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // pre-restart: vessel 1's fix is buffered in JOIN STATE, unmatched
    addFile((1L, 90000L, 10.00, 20.00))
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()

    // post-restart: vessel 2 appears 200 s later, ~8 km away — the pair
    // must match against the RECOVERED buffered fix; then pushers flush
    addFile((2L, 90200L, 10.07, 20.00))
    addFile((9L, 90200L + 3000L, -60.0, 100.0))
    addFile((9L, 90200L + 6000L, -60.0, 100.0))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)),
      s"restart lost the buffered join-state fix: $got")
  }

  test("WindowedCounts aggregation state survives stop + restart: windows spanning it stay whole") {
    val inputDir = tmp("graft-wc-in")
    val outDir = tmp("graft-wc-out")
    val ckpt = tmp("graft-wc-ckpt")
    def addFile(rows: (Long, String, Double)*): Unit =
      rows.map { case (sec, t, v) => (ts(sec), t, v) }
        .toDF("ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(inputDir)
    def run() = graft.streaming.WindowedCounts.countsPerWindow(
        spark.readStream.schema(StructType(Seq(
            StructField("ts", TimestampType), StructField("event_type", StringType),
            StructField("value", DoubleType))))
          .option("maxFilesPerTrigger", "1").parquet(inputDir),
        "ts", "event_type", windowLen = "600 seconds", watermarkDelay = "2 hours")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // window [600,1200) receives rows BEFORE and AFTER the restart: the
    // partial count must survive in the aggregation state store
    addFile((700L, "a", 1.0), (800L, "a", 2.0), (900L, "b", 5.0))
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()

    addFile((1000L, "a", 4.0), (1300L, "b", 8.0))
    addFile((10000000L, "sentinel", 0.0))
    addFile((20000000L, "sentinel", 0.0))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.read.parquet(outDir)
      .filter(col("event_type") =!= "sentinel")
      .select(col("window_start").cast("long"), col("event_type"),
        col("n_events"), col("sum_value"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed === Set(
      (600L, "a", 3L, 7.0), // 2 pre-restart rows + 1 post-restart row, one window row
      (600L, "b", 1L, 5.0),
      (1200L, "b", 1L, 8.0)))
  }

  test("DedupStream state survives stop + restart: a repeat sent after the restart is suppressed") {
    val inputDir = tmp("graft-dd-in")
    val outDir = tmp("graft-dd-out")
    val ckpt = tmp("graft-dd-ckpt")
    def addFile(rows: (Long, Long, String)*): Unit =
      rows.map { case (sec, id, p) => (ts(sec), id, p) }
        .toDF("ts", "id", "payload")
        .coalesce(1).write.mode("append").parquet(inputDir)
    def run() = graft.streaming.DedupStream.dedup(
        spark.readStream.schema(StructType(Seq(
            StructField("ts", TimestampType), StructField("id", LongType),
            StructField("payload", StringType))))
          .option("maxFilesPerTrigger", "1").parquet(inputDir),
        "ts", Seq("payload"), watermarkDelay = "2 hours")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    addFile((100L, 1L, "A"), (200L, 2L, "B"))
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    // the repeat of A arrives AFTER the restart: only surviving dedup
    // state can suppress it
    addFile((300L, 3L, "A"), (400L, 4L, "C"))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir).select("payload")
      .as[String].collect().groupBy(identity).view.mapValues(_.length).toMap
    assert(got === Map("A" -> 1, "B" -> 1, "C" -> 1),
      s"dedup state lost across restart: $got")
  }

  test("SessionStream on the RocksDB state store provider: same results, restart included") {
    // the 10^7-entities-per-node claim rests on RocksDB-backed state;
    // this proves the operators actually RUN on that provider (spill-to-
    // disk state) and that its checkpoints survive a stop/restart
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val inputDir = tmp("graft-rocks-in")
      val outDir = tmp("graft-rocks-out")
      val ckpt = tmp("graft-rocks-ckpt")
      def addFile(rows: (Long, Long, Double)*): Unit =
        rows.map { case (u, sec, v) => StreamEvent(u, ts(sec), v) }
          .toDF().coalesce(1).write.mode("append").parquet(inputDir)
      def run() = SessionStream.sessionize(
          spark.readStream
            .schema(implicitly[org.apache.spark.sql.Encoder[StreamEvent]].schema)
            .option("maxFilesPerTrigger", "1").parquet(inputDir).as[StreamEvent],
          gapSeconds = 900L, watermarkDelay = "2 hours")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      addFile((1L, 1000L, 1.0), (2L, 1000L, 5.0), (1L, 1500L, 2.0))
      val q1 = run()
      try q1.processAllAvailable() finally q1.stop()
      addFile((1L, 2000L, 3.0), (2L, 3000L, 7.0)) // u1 continues; u2 splits
      addFile((999L, 10000000L, 0.0))
      addFile((999L, 20000000L, 0.0))
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()

      val streamed = spark.read.parquet(outDir)
        .filter(col("userId") =!= 999L)
        .select("userId", "startSec", "endSec", "nPoints", "sumValue")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(streamed === Set(
        (1L, 1000L, 2000L, 3L, 6.0), // restart-spanning session, one row
        (2L, 1000L, 1000L, 1L, 5.0),
        (2L, 3000L, 3000L, 1L, 7.0)))
      // RocksDB actually backed the query: its working dir exists in ckpt
      val stateDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt, "state"))
        .filter(p => p.getFileName.toString == "rocksdb" ||
          p.getFileName.toString.endsWith(".zip")).toArray
      assert(stateDirs.nonEmpty, "no RocksDB artifacts under the checkpoint state dir")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // --- service streams (stateless scoring over a resident model/index):
  // restart recovery = source offsets survive, the restarted query scores
  // new batches against the (deterministically rebuilt) resident artifact
  // IDENTICALLY to batch, and a redelivered batch reproduces identical
  // rows — the idempotent-sink contract those streams document -----------------

  test("ClassifyStream survives stop + restart; a redelivered batch re-scores identically") {
    val inputDir = tmp("graft-cls-in")
    val ckpt = tmp("graft-cls-ckpt")
    val seed = Seq((1L, "good fine great", true), (2L, "bad awful poor", false),
      (3L, "good nice fine", true), (4L, "awful dire poor", false))
      .toDF("doc_id", "text", "is_pos")
    // the "resident model": rebuilt after the restart exactly as a
    // restarted service would re-fit it — training is deterministic, so
    // both query incarnations hold the same generation
    def model() = graft.operators.Text.linearClassifierTrain(
      seed, "text", col("is_pos"), buckets = 128)
    def addFile(rows: (Long, String)*): Unit =
      rows.toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(inputDir)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Double, Boolean)]()
    def run() = graft.streaming.ClassifyStream.classify(
      spark.readStream.schema(StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType))))
        .option("maxFilesPerTrigger", "1").parquet(inputDir),
      model(), "doc_id", "text", buckets = 128, ckpt) { out =>
      got.synchronized {
        got ++= out.select("id", "score", "pred_pos")
          .as[(Long, Double, Boolean)].collect()
      }
    }

    addFile((10L, "good fine story"), (11L, "awful poor tale"))
    addFile((12L, "great nice text"))
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()

    // crash window: drop the newest commit marker so the restart genuinely
    // REDELIVERS that batch — the stateless scorer must reproduce it
    // byte-identically (the documented idempotent-sink contract)
    val commits = Paths.get(ckpt, "commits").toFile.listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    val crc = new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) crc.delete()

    addFile((13L, "dire bad words"), (14L, "fine good poem"))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()

    // every docs scored at least once; the redelivered doc exactly twice
    val byId = got.groupBy(_._1)
    assert(byId.keySet === Set(10L, 11L, 12L, 13L, 14L))
    assert(byId(12L).size === 2, "commit-less batch was not redelivered")
    assert(byId.values.forall(_.distinct.size === 1),
      "a redelivered batch scored differently across the restart")
    // post-restart scores equal batch scoring against the same model
    val expected = graft.operators.Text.linearClassifierScore(
        spark.read.parquet(inputDir), model(), "doc_id", "text", buckets = 128)
      .select("id", "score", "pred_pos")
      .as[(Long, Double, Boolean)].collect().toSet
    assert(got.toSet === expected,
      s"stream-only: ${got.toSet -- expected}; batch-only: ${expected -- got.toSet}")
  }

  test("AnnStream.pqRetrieve survives stop + restart against a rebuilt resident index") {
    def vec(seed: Long): Seq[Double] =
      (0 until 16).map(j => (((seed * 31 + j * 17) % 19) - 9).toDouble)
    val corpus = (0L until 200L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    // index rebuild is deterministic (md5 init), so the restarted service
    // holds the same generation — post-restart scores must be byte-equal
    def index() = graft.operators.Similarity.pqIndexBuild(
      corpus, "vec_id", "embedding", dim = 16, m = 4, ks = 16, iters = 2)
    val inputDir = tmp("graft-annr-in")
    val ckpt = tmp("graft-annr-ckpt")
    def addFile(rows: (Long, Seq[Double])*): Unit =
      rows.toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(inputDir)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    def run() = graft.streaming.AnnStream.pqRetrieve(
      spark.readStream.schema(StructType(Seq(
          StructField("vec_id", LongType),
          StructField("embedding", ArrayType(DoubleType)))))
        .option("maxFilesPerTrigger", "1").parquet(inputDir),
      index(), "vec_id", "embedding", k = 5, ckpt) { out =>
      got.synchronized {
        got ++= out.select("query_id", "cand_id", "rank")
          .as[(Long, Long, Int)].collect()
      }
    }

    val queries = (1000L until 1012L).map(i => (i, vec(i * 7)))
    val (pre, post) = queries.splitAt(7)
    addFile(pre: _*)
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    addFile(post: _*)
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()

    val expected = graft.operators.Similarity.pqScore(index(),
        queries.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 5)
      .select("query_id", "cand_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got.toSet === expected,
      s"stream-only: ${(got.toSet -- expected).take(5)}; " +
        s"batch-only: ${(expected -- got.toSet).take(5)}")
    // exactly-once: the committed pre-restart batch was NOT redelivered
    assert(got.size === queries.size * 5,
      s"expected ${queries.size * 5} rows (each query once), got ${got.size}")
  }

  test("RetrieveStream.hybridRetrieveDiversified survives stop + restart (full stack)") {
    val words = Seq("spark", "scan", "join", "sort", "agg", "window",
      "table", "query", "batch", "stream", "merge", "filter")
    def text(seed: Int): String =
      (0 until 12).map(i => words((seed * 7 + i * i) % words.length)).mkString(" ")
    def vec(seed: Long): Seq[Double] =
      (0 until 16).map(j => (((seed * 31 + j * 17) % 19) - 9).toDouble)
    val corpusDocs = (0L until 80L).map(i => (i, text(i.toInt)))
      .toDF("doc_id", "text")
    val corpusVecs = (0L until 80L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    def index() = graft.streaming.RetrieveStream.DiversifiedIndex.of(
      graft.CacheScope.persist(
        graft.operators.Text.bm25Index(corpusDocs, "doc_id", "text")),
      graft.operators.Similarity.pqIndexBuild(corpusVecs, "vec_id", "embedding",
        dim = 16, m = 4, ks = 16, iters = 2))
    val inputDir = tmp("graft-divr-in")
    val ckpt = tmp("graft-divr-ckpt")
    def addFile(rows: (Long, String, Seq[Double])*): Unit =
      rows.toDF("query_id", "text", "embedding")
        .coalesce(1).write.mode("append").parquet(inputDir)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Double, Int)]()
    def run() = graft.streaming.RetrieveStream.hybridRetrieveDiversified(
      spark.readStream.schema(StructType(Seq(
          StructField("query_id", LongType), StructField("text", StringType),
          StructField("embedding", ArrayType(DoubleType)))))
        .option("maxFilesPerTrigger", "1").parquet(inputDir),
      new java.util.concurrent.atomic.AtomicReference(index()),
      "query_id", "text", "embedding",
      k = 5, perListK = 10, poolK = 10, mmrLambda = 0.5, ckpt) { out =>
      got.synchronized {
        got ++= out.as[(Long, Long, Double, Double, Int)].collect()
      }
    }

    val queries = (1000L until 1010L).map(i => (i, text(i.toInt), vec(i * 3)))
    val (pre, post) = queries.splitAt(6)
    addFile(pre: _*)
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    addFile(post: _*)
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()

    val expected = graft.streaming.RetrieveStream.diversifiedBatch(index(),
        queries.toDF("query_id", "text", "embedding"),
        "query_id", "text", "embedding",
        k = 5, perListK = 10, poolK = 10, mmrLambda = 0.5,
        scoreRoundDecimals = Some(3))
      .as[(Long, Long, Double, Double, Int)].collect().toSet
    assert(got.toSet === expected,
      s"stream-only: ${(got.toSet -- expected).take(5)}; " +
        s"batch-only: ${(expected -- got.toSet).take(5)}")
    assert(got.size === queries.size * 5,
      s"expected ${queries.size * 5} rows (each query once), got ${got.size}")
  }

  // --- RocksDB provider legs for the round-12 stateful streams --------------
  // SessionStream already proves the provider end to end (incl. the 10^7-
  // entity spill run in StressSpec); these run each NEWER stateful stream
  // on RocksDB with a mid-stream stop/restart — provider-specific state
  // (de)serialization bugs only surface on the provider itself.

  /** Run `body` with the RocksDB state-store provider, restoring the
    * previous provider afterwards; asserts RocksDB artifacts actually
    * landed under `ckpt` and prints their state size. */
  private def withRocksDB(ckpt: String)(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      body
      val stateRoot = Paths.get(ckpt, "state")
      val files = Files.walk(stateRoot).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => Files.isRegularFile(p))
      val rocks = files.filter(p => p.toString.contains("rocksdb") ||
        p.getFileName.toString.endsWith(".zip") ||
        p.getFileName.toString.endsWith(".sst"))
      assert(rocks.nonEmpty, "no RocksDB artifacts under the checkpoint state dir")
      info(f"RocksDB state under $ckpt: ${rocks.length} files, " +
        f"${rocks.map(Files.size).sum / 1024.0}%.1f KiB")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("WindowedCounts.quantilePerWindow on RocksDB: sketch state survives stop + restart") {
    val inputDir = tmp("graft-rqw-in")
    val outDir = tmp("graft-rqw-out")
    val ckpt = tmp("graft-rqw-ckpt")
    withRocksDB(ckpt) {
      def addFile(rows: (Long, Double)*): Unit =
        rows.map { case (sec, v) => (ts(sec), v) }.toDF("ts", "value")
          .coalesce(1).write.mode("append").parquet(inputDir)
      def run() = graft.streaming.WindowedCounts.quantilePerWindow(
          spark.readStream.schema(StructType(Seq(
              StructField("ts", TimestampType), StructField("value", DoubleType))))
            .option("maxFilesPerTrigger", "1").parquet(inputDir),
          "ts", "value", qs = Seq(0.5), windowLen = "600 seconds",
          watermarkDelay = "2 hours")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      // window [600,1200) gets values 1..4 pre-restart and 5..9 after:
      // the serialized KLL buffer must round-trip through RocksDB
      addFile((700L, 1.0), (800L, 2.0), (850L, 3.0), (900L, 4.0))
      val q1 = run()
      try q1.processAllAvailable() finally q1.stop()
      addFile((950L, 5.0), (1000L, 6.0), (1050L, 7.0), (1100L, 8.0), (1150L, 9.0))
      addFile((10000000L, 0.0))
      addFile((20000000L, 0.0))
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()

      val got = spark.read.parquet(outDir)
        .filter(col("window_start").cast("long") === 600L)
        .select(col("n_events"), col("est_p50")).as[(Long, Double)].collect()
      assert(got.length === 1 && got.head._1 === 9L,
        s"window fragmented or lost rows across restart: ${got.toSeq}")
      // 9 values < the k=200 KLL buffer: the sketch is still EXACT here
      assert(got.head._2 === 5.0, s"median over 1..9 must be 5: ${got.head}")
    }
  }

  test("Scd2Stream.versions on RocksDB: a version spanning stop + restart closes whole") {
    import graft.streaming.{Scd2Fix, Scd2Stream}
    val inputDir = tmp("graft-rscd-in")
    val outDir = tmp("graft-rscd-out")
    val ckpt = tmp("graft-rscd-ckpt")
    withRocksDB(ckpt) {
      def addFile(rows: (Long, Long, String, Long)*): Unit =
        rows.map { case (u, sec, a, e) => Scd2Fix(u, ts(sec), a, e) }
          .toDF().coalesce(1).write.mode("append").parquet(inputDir)
      def run() = Scd2Stream.versions(
          spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[Scd2Fix]].schema)
            .option("maxFilesPerTrigger", "1").parquet(inputDir).as[Scd2Fix],
          watermarkDelay = "30 minutes")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      addFile((1L, 1000L, "A", 1L), (1L, 1400L, "A", 2L))
      val q1 = run()
      try q1.processAllAvailable() finally q1.stop()
      addFile((1L, 1800L, "A", 3L), (1L, 2200L, "B", 4L))
      addFile((1L, 2200L + 1800L + 600L, "B", 5L))
      addFile((1L, 2200L + 2 * (1800L + 600L), "B", 6L))
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()

      val got = spark.read.parquet(outDir)
        .select("userId", "attr", "effStart", "effEnd", "nRows")
        .as[(Long, String, Long, Long, Long)].collect().toSet
      assert(got === Set((1L, "A", 1000L, 2200L, 3L)),
        s"restart fragmented the version on RocksDB: $got")
    }
  }

  test("AnomalyStream.flags on RocksDB: history + pending state survive stop + restart") {
    import graft.streaming.{AnomalyStream, MetricFix}
    val inputDir = tmp("graft-ranm-in")
    val outDir = tmp("graft-ranm-out")
    val ckpt = tmp("graft-ranm-ckpt")
    withRocksDB(ckpt) {
      val pre = (0 until 8).map(i => (1L, 86400L + i * 60L, 10.0 + (i % 3)))
      val post = (8 until 14).map(i =>
        (1L, 86400L + i * 60L, if (i == 11) 500.0 else 10.0 + (i % 3)))
      def addFile(rows: (Long, Long, Double)*): Unit =
        rows.map { case (u, sec, v) => MetricFix(u, ts(sec), v) }
          .toDF().coalesce(1).write.mode("append").parquet(inputDir)
      def run() = AnomalyStream.flags(
          spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[MetricFix]].schema)
            .option("maxFilesPerTrigger", "1").parquet(inputDir).as[MetricFix],
          alpha = 0.3, window = 5, k = 3.0, watermarkDelay = "10 minutes")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      addFile(pre: _*)
      val q1 = run()
      try q1.processAllAvailable() finally q1.stop()
      addFile(post: _*)
      addFile((99L, 10000000L, 0.0))
      addFile((99L, 20000000L, 0.0))
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()

      def r3(x: Double) = math.floor(x * 1000 + 0.5) / 1000
      val streamed = spark.read.parquet(outDir).filter(col("userId") =!= 99L)
        .select("userId", "tsSec", "residual", "anomaly")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.getAs[Any]("residual")).map(d => r3(d.asInstanceOf[Double])),
          Option(r.getAs[Any]("anomaly")))).toSet
      val expected = graft.operators.Analytics.anomalyFlags(
          (pre ++ post).toDF("user_id", "ts_sec", "value"),
          Seq("user_id"), "ts_sec", "value", alpha = 0.3, window = 5, k = 3.0)
        .select("user_id", "ts_sec", "residual", "anomaly")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.getAs[Any]("residual")).map(d => r3(d.asInstanceOf[Double])),
          Option(r.getAs[Any]("anomaly")))).toSet
      assert(streamed === expected,
        s"stream-only: ${(streamed -- expected).take(4)}; " +
          s"batch-only: ${(expected -- streamed).take(4)}")
      assert(streamed.exists(_._4.contains(true)),
        "the planted post-restart spike must flag (history crossed the restart)")
    }
  }

  test("TrajectoryStream.stayPoints on RocksDB: a dwell spanning stop + restart emits whole") {
    import graft.streaming.{StayFix, TrajectoryStream}
    val inputDir = tmp("graft-rstay-in")
    val outDir = tmp("graft-rstay-out")
    val ckpt = tmp("graft-rstay-ckpt")
    withRocksDB(ckpt) {
      def addFile(rows: (Long, Long, Double, Double, Double)*): Unit =
        rows.map { case (u, sec, s, la, lo) => StayFix(u, ts(sec), s, la, lo) }
          .toDF().coalesce(1).write.mode("append").parquet(inputDir)
      def run() = TrajectoryStream.stayPoints(
          spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[StayFix]].schema)
            .option("maxFilesPerTrigger", "1").parquet(inputDir).as[StayFix],
          speedThreshold = 1.0, minDurationSec = 300L, watermarkDelay = "30 minutes")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      addFile((1L, 1000L, 0.2, 10.0, 20.0), (1L, 1300L, 0.4, 10.2, 20.2),
        (1L, 1600L, 0.1, 10.4, 20.4))
      val q1 = run()
      try q1.processAllAvailable() finally q1.stop()
      addFile((1L, 1900L, 0.3, 10.6, 20.6), (1L, 2200L, 0.5, 10.8, 20.8))
      addFile((1L, 2500L, 9.9, 11.0, 21.0))
      addFile((1L, 2500L + 1800L + 600L, 9.9, 0.0, 0.0))
      addFile((1L, 2500L + 2 * (1800L + 600L), 9.9, 0.0, 0.0))
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()

      val got = spark.read.parquet(outDir)
        .select("userId", "startSec", "endSec", "nPoints")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === Set((1L, 1000L, 2200L, 5L)),
        s"restart fragmented or dropped the dwell on RocksDB: $got")
    }
  }
}
