package graft

import java.sql.Timestamp

import graft.operators.Sessionize
import graft.streaming.{DedupStream, EncounterStream, OdFix, SessionStream,
  SessionWindowAgg, StaticEnrich, StayFix, StreamEvent, StreamJoin,
  TrajectoryStream, WindowedCounts, ZoneStream}
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
@SlowTest
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

  test("WindowedCounts tumbling stream equals batch window() agg, with late drops") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(41)
    // 300 events at 50s granularity +5s offset: event times and the
    // watermark (max-600) never land ON a 600s window boundary, so the
    // drop rule below has no boundary ambiguity
    val all = rng.shuffle((1 to 300).map { i =>
      (ts(rng.nextInt(100) * 50L + 5), s"type-${rng.nextInt(4)}", i.toDouble)
    })
    val batches = all.grouped(100).toSeq
    val winSec = 600L
    val delaySec = 600L

    // a late row is dropped once its WINDOW is closed: window end <= the
    // watermark at batch start (aggregation state for it was evicted)
    var wmSec = Long.MinValue
    var maxSeen = Long.MinValue
    val kept = Seq.newBuilder[(Timestamp, String, Double)]
    batches.foreach { b =>
      kept ++= b.filter { e =>
        val windowEnd = (e._1.getTime / 1000 / winSec + 1) * winSec
        windowEnd > wmSec
      }
      maxSeen = math.max(maxSeen, b.map(_._1.getTime / 1000).max)
      wmSec = maxSeen - delaySec
    }

    val input = MemoryStream[(Timestamp, String, Double)]
    val counts = WindowedCounts.countsPerWindow(
      input.toDF().toDF("ts", "event_type", "value"), "ts", "event_type",
      windowLen = s"$winSec seconds", watermarkDelay = s"$delaySec seconds")
    val query = counts.writeStream.format("memory")
      .queryName("parity_wc").outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      // flush: watermark far past every window end
      input.addData((ts(10000000), "sentinel", 0.0)); query.processAllAvailable()
      input.addData((ts(20000000), "sentinel", 0.0)); query.processAllAvailable()

      val streamed = spark.table("parity_wc")
        .filter(col("event_type") =!= "sentinel")
        .select(col("window_start").cast("long"), col("event_type"),
          col("n_events"), col("sum_value"))
        .as[(Long, String, Long, Double)].collect().toSet
      // batch twin: the SAME function over the kept events, batch mode
      val expected = WindowedCounts.countsPerWindow(
          kept.result().toDF("ts", "event_type", "value"), "ts", "event_type",
          windowLen = s"$winSec seconds")
        .select(col("window_start").cast("long"), col("event_type"),
          col("n_events"), col("sum_value"))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(streamed === expected,
        s"stream-only: ${streamed -- expected}; batch-only: ${expected -- streamed}")
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("WindowedCounts sliding stream equals batch sliding window() agg") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(43)
    val all = rng.shuffle((1 to 240).map { i =>
      (ts(rng.nextInt(100) * 50L + 5), s"type-${rng.nextInt(3)}", i.toDouble)
    })
    val input = MemoryStream[(Timestamp, String, Double)]
    // 2h delay > the 83-min timeline: nothing is late, so the batch run
    // of the SAME function on the full input is the exact expectation
    // (a late row would need per-window drops — only its still-open
    // windows accept it — which this gate deliberately keeps out of scope)
    val counts = WindowedCounts.slidingCountsPerWindow(
      input.toDF().toDF("ts", "event_type", "value"), "ts", "event_type",
      windowLen = "600 seconds", slideLen = "200 seconds",
      watermarkDelay = "2 hours")
    val query = counts.writeStream.format("memory")
      .queryName("parity_swc").outputMode("append").start()
    try {
      all.grouped(80).foreach { b => input.addData(b); query.processAllAvailable() }
      input.addData((ts(10000000), "sentinel", 0.0)); query.processAllAvailable()
      input.addData((ts(20000000), "sentinel", 0.0)); query.processAllAvailable()

      val streamed = spark.table("parity_swc")
        .filter(col("event_type") =!= "sentinel")
        .select(col("window_start").cast("long"), col("event_type"), col("n_events"))
        .as[(Long, String, Long)].collect().toSet
      val expected = WindowedCounts.slidingCountsPerWindow(
          all.toDF("ts", "event_type", "value"), "ts", "event_type",
          windowLen = "600 seconds", slideLen = "200 seconds")
        .select(col("window_start").cast("long"), col("event_type"), col("n_events"))
        .as[(Long, String, Long)].collect().toSet
      assert(streamed === expected,
        s"stream-only: ${streamed -- expected}; batch-only: ${expected -- streamed}")
      // sliding fan-out really happened: more window rows than tumbling would make
      assert(streamed.size > streamed.map(_._2).size)
    } finally query.stop()
  }

  test("StreamJoin.withinInterval equals the batch interval join on full input") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(47)
    val lefts = rng.shuffle((1 to 120).map { i =>
      (rng.nextInt(6).toLong, ts(rng.nextInt(100) * 50L + 5), i.toLong)
    })
    val rights = rng.shuffle((1 to 80).map { i =>
      (rng.nextInt(6).toLong, ts(rng.nextInt(100) * 50L + 5), s"status-$i")
    })
    val lIn = MemoryStream[(Long, Timestamp, Long)]
    val rIn = MemoryStream[(Long, Timestamp, String)]
    // watermarks cover the whole timeline: no state eviction can drop a
    // qualifying pair, so the batch join of the full inputs is exact truth
    val joined = StreamJoin.withinInterval(
      lIn.toDF().toDF("key", "ts", "event_id"),
      rIn.toDF().toDF("key", "ts", "status"),
      keyCol = "key", tsLeft = "ts", tsRight = "ts",
      lookbackSec = 300, lookaheadSec = 300, watermarkDelay = "2 hours")
    val query = joined.writeStream.format("memory")
      .queryName("parity_sj").outputMode("append").start()
    try {
      val lb = lefts.grouped(40).toSeq
      val rb = rights.grouped(27).toSeq
      lb.zipAll(rb, Nil, Nil).foreach { case (l, r) =>
        if (l.nonEmpty) lIn.addData(l)
        if (r.nonEmpty) rIn.addData(r)
        query.processAllAvailable()
      }
      val streamed = spark.table("parity_sj")
        .select(col("key"), col("event_id"), col("r_status"))
        .as[(Long, Long, String)].collect().toSet
      // batch twin: the SAME function on static frames (the watermark and
      // interval condition compile to a plain range join in batch mode)
      val expected = StreamJoin.withinInterval(
          lefts.toDF("key", "ts", "event_id"),
          rights.toDF("key", "ts", "status"),
          keyCol = "key", tsLeft = "ts", tsRight = "ts",
          lookbackSec = 300, lookaheadSec = 300)
        .select(col("key"), col("event_id"), col("r_status"))
        .as[(Long, Long, String)].collect().toSet
      assert(streamed === expected,
        s"stream-only: ${(streamed -- expected).take(5)}; batch-only: ${(expected -- streamed).take(5)}")
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("StaticEnrich.lookup stream output equals the batch broadcast join") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(53)
    val events = rng.shuffle((1 to 90).map { i =>
      (i.toLong, rng.nextInt(8).toLong) // dim keys 0-7; dim only has 0-5
    })
    val dim = (0L to 5L).map(k => (k, s"name-$k", k * 10.0))
      .toDF("dim_key", "name", "weight")
    val input = MemoryStream[(Long, Long)]
    val enriched = StaticEnrich.lookup(
      input.toDF().toDF("event_id", "key"), dim,
      streamKey = "key", dimKey = "dim_key", payloadCols = Seq("name", "weight"))
    val query = enriched.writeStream.format("memory")
      .queryName("parity_se").outputMode("append").start()
    try {
      events.grouped(30).foreach { b => input.addData(b); query.processAllAvailable() }
      val streamed = spark.table("parity_se")
        .select("event_id", "key", "name")
        .as[(Long, Long, Option[String])].collect().toSet
      val expected = StaticEnrich.lookup(
          events.toDF("event_id", "key"), dim,
          streamKey = "key", dimKey = "dim_key", payloadCols = Seq("name", "weight"))
        .select("event_id", "key", "name")
        .as[(Long, Long, Option[String])].collect().toSet
      assert(streamed === expected)
      // left-join semantics survived streaming: unmatched keys kept with null
      assert(streamed.exists(_._3.isEmpty) && streamed.exists(_._3.nonEmpty))
    } finally query.stop()
  }

  test("AnnStream.pqRetrieve over a static index equals batch pqScore row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic 200-vector corpus in 16-d; queries are OUTSIDE the
    // corpus id space (no self-exclusion interplay with batch splits)
    def vec(seed: Long): Seq[Double] =
      (0 until 16).map(j => (((seed * 31 + j * 17) % 19) - 9).toDouble)
    val corpus = (0L until 200L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
    val index = operators.Similarity.pqIndexBuild(corpus, "vec_id", "embedding",
      dim = 16, m = 4, ks = 16, iters = 2)
    val queries = (1000L until 1012L).map(i => (i, vec(i * 7)))
    val input = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-annstream").toString
    val query = streaming.AnnStream.pqRetrieve(
      input.toDF().toDF("vec_id", "embedding"), index,
      "vec_id", "embedding", k = 5, ckpt) { out =>
      got.synchronized {
        got ++= out.select("query_id", "cand_id", "rank")
          .as[(Long, Long, Int)].collect()
      }
    }
    try {
      // shuffled batch splits: per-query results must not depend on
      // which micro-batch carried the query
      val rng = new scala.util.Random(59)
      rng.shuffle(queries).grouped(5).foreach { b =>
        input.addData(b); query.processAllAvailable()
      }
      val expected = operators.Similarity.pqScore(index,
          queries.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 5)
        .select("query_id", "cand_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(got.toSet === expected,
        s"stream-only: ${(got.toSet -- expected).take(5)}; " +
          s"batch-only: ${(expected -- got.toSet).take(5)}")
      assert(got.size === queries.size * 5) // every query filled its top-5 once
    } finally query.stop()
  }

  test("AnnStream index swap mid-stream: each batch matches its own generation") {
    implicit val sqlCtx = spark.sqlContext
    def vec(seed: Long): Seq[Double] =
      (0 until 16).map(j => (((seed * 31 + j * 17) % 19) - 9).toDouble)
    // two index GENERATIONS over different corpora (a grown corpus is
    // the realistic refresh trigger) — their top-5 sets genuinely differ
    val corpus1 = (0L until 120L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val corpus2 = (0L until 200L).map(i => (i, vec(i + 3))).toDF("vec_id", "embedding")
    val idx1 = operators.Similarity.pqIndexBuild(corpus1, "vec_id", "embedding",
      dim = 16, m = 4, ks = 16, iters = 2)
    val idx2 = operators.Similarity.pqIndexBuild(corpus2, "vec_id", "embedding",
      dim = 16, m = 4, ks = 16, iters = 2)
    val ref = new java.util.concurrent.atomic.AtomicReference(idx1)
    val queries = (1000L until 1012L).map(i => (i, vec(i * 7)))
    val (preQ, postQ) = queries.splitAt(6)
    val input = MemoryStream[(Long, Seq[Double])]
    // one result bucket per callback: batch boundaries stay observable
    val batches = scala.collection.mutable.ArrayBuffer[Set[(Long, Long, Int)]]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-annswap").toString
    val query = streaming.AnnStream.pqRetrieveSwappable(
      input.toDF().toDF("vec_id", "embedding"), ref,
      "vec_id", "embedding", k = 5, ckpt) { out =>
      batches.synchronized {
        batches += out.select("query_id", "cand_id", "rank")
          .as[(Long, Long, Int)].collect().toSet
      }
    }
    try {
      preQ.grouped(3).foreach { b => input.addData(b); query.processAllAvailable() }
      val nPre = batches.size
      // the swap lands BETWEEN batches; every later batch must score
      // against generation 2 only
      ref.set(idx2)
      postQ.grouped(3).foreach { b => input.addData(b); query.processAllAvailable() }
      def expected(idx: operators.Similarity.PqIndex, qs: Seq[(Long, Seq[Double])]) =
        operators.Similarity.pqScore(idx, qs.toDF("vec_id", "embedding"),
            "vec_id", "embedding", k = 5)
          .select("query_id", "cand_id", "rank")
          .as[(Long, Long, Int)].collect().toSet
      val (preGot, postGot) = batches.toSeq.splitAt(nPre)
      assert(preGot.flatten.toSet === expected(idx1, preQ),
        "pre-swap batches diverged from generation-1 batch pqScore")
      assert(postGot.flatten.toSet === expected(idx2, postQ),
        "post-swap batches diverged from generation-2 batch pqScore")
      // the two generations disagree on these queries — the swap was
      // observable, not vacuous
      assert(expected(idx1, postQ) !== expected(idx2, postQ),
        "fixture too weak: both generations rank identically")
    } finally query.stop()
  }

  test("AnnStream online ingest: pqIndexAppend swapped in mid-stream serves appended vectors") {
    implicit val sqlCtx = spark.sqlContext
    // the retrieval-service ingest lifecycle: a delta lands, the resident
    // index GROWS via frozen-codebook append (no retrain, no restart),
    // and the next micro-batch retrieves the appended vectors
    def vec(seed: Long): Seq[Double] =
      (0 until 16).map(j => (((seed * 31 + j * 17) % 19) - 9).toDouble)
    val corpus = (0L until 150L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val idx1 = operators.Similarity.pqIndexBuild(corpus, "vec_id", "embedding",
      dim = 16, m = 4, ks = 16, iters = 2)
    // delta vectors sit just off corpus lattice points (distinct values,
    // same neighborhoods) so they compete for, and win, some top-5 slots
    val delta = (500L until 540L)
      .map(i => (i, vec(i - 500L).map(_ * 0.9 + 0.3)))
      .toDF("vec_id", "embedding")
    val idx2 = operators.Similarity.pqIndexAppend(idx1, delta, "vec_id", "embedding")
    val ref = new java.util.concurrent.atomic.AtomicReference(idx1)
    val queries = (1000L until 1008L).map(i => (i, vec(i * 7)))
    val (preQ, postQ) = queries.splitAt(4)
    val input = MemoryStream[(Long, Seq[Double])]
    val batches = scala.collection.mutable.ArrayBuffer[Set[(Long, Long, Int)]]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-annappend").toString
    val query = streaming.AnnStream.pqRetrieveSwappable(
      input.toDF().toDF("vec_id", "embedding"), ref,
      "vec_id", "embedding", k = 5, ckpt) { out =>
      batches.synchronized {
        batches += out.select("query_id", "cand_id", "rank")
          .as[(Long, Long, Int)].collect().toSet
      }
    }
    try {
      preQ.grouped(2).foreach { b => input.addData(b); query.processAllAvailable() }
      val nPre = batches.size
      ref.set(idx2) // the append swaps in between batches
      postQ.grouped(2).foreach { b => input.addData(b); query.processAllAvailable() }
      def expected(idx: operators.Similarity.PqIndex, qs: Seq[(Long, Seq[Double])]) =
        operators.Similarity.pqScore(idx, qs.toDF("vec_id", "embedding"),
            "vec_id", "embedding", k = 5)
          .select("query_id", "cand_id", "rank")
          .as[(Long, Long, Int)].collect().toSet
      val (preGot, postGot) = batches.toSeq.splitAt(nPre)
      assert(preGot.flatten.toSet === expected(idx1, preQ),
        "pre-append batches diverged from the base index's batch pqScore")
      assert(postGot.flatten.toSet === expected(idx2, postQ),
        "post-append batches diverged from the grown index's batch pqScore")
      // the appended vectors actually surface in post-append retrievals
      assert(postGot.flatten.exists(_._2 >= 500L),
        "no appended vector reached any post-append top-5 — fixture too weak")
    } finally query.stop()
  }

  test("RetrieveStream.hybridRetrieve: streamed query batches equal the batch BM25+PQ fusion") {
    implicit val sqlCtx = spark.sqlContext
    val words = Seq("spark", "scan", "join", "sort", "agg", "window",
      "table", "query", "batch", "stream", "merge", "filter")
    def text(seed: Int): String =
      (0 until 12).map(i => words((seed * 7 + i * i) % words.length)).mkString(" ")
    def vec(seed: Long): Seq[Double] =
      (0 until 16).map(j => (((seed * 31 + j * 17) % 19) - 9).toDouble)
    val corpusDocs = (0L until 80L).map(i => (i, text(i.toInt)))
      .toDF("doc_id", "text")
    val corpusVecs = (0L until 80L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val ref = new java.util.concurrent.atomic.AtomicReference(
      streaming.RetrieveStream.HybridIndex(
        graft.CacheScope.persist(
          operators.Text.bm25Index(corpusDocs, "doc_id", "text")),
        operators.Similarity.pqIndexBuild(corpusVecs, "vec_id", "embedding",
          dim = 16, m = 4, ks = 16, iters = 2)))
    val queries = (1000L until 1010L).map(i => (i, text(i.toInt), vec(i * 3)))
    val input = MemoryStream[(Long, String, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Long, Int)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hybrid").toString
    val query = streaming.RetrieveStream.hybridRetrieve(
      input.toDF().toDF("query_id", "text", "embedding"),
      ref, "query_id", "text", "embedding",
      k = 5, perListK = 10, ckpt) { out =>
      got.synchronized {
        got ++= out.as[(Long, Long, Double, Long, Int)].collect()
      }
    }
    try {
      val rng = new scala.util.Random(61)
      rng.shuffle(queries).grouped(3).foreach { b =>
        input.addData(b); query.processAllAvailable()
      }
      // batch truth: the same composition over the full query frame
      val qdf = queries.toDF("query_id", "text", "embedding")
      val sparse = operators.Text.bm25ScoreIndex(ref.get().bm25, qdf,
          "query_id", "text", k = 10, scoreRoundDecimals = Some(3))
        .select(col("query_id"), col("doc_id"), col("rank"))
      val dense = operators.Similarity.pqScore(ref.get().pq, qdf,
          "query_id", "embedding", k = 10)
        .select(col("query_id"), col("cand_id").as("doc_id"), col("rank"))
      val expected = operators.Analytics.rrfFuse(Seq(sparse, dense), k = 5)
        .as[(Long, Long, Double, Long, Int)].collect().toSet
      assert(got.toSet === expected,
        s"stream-only: ${(got.toSet -- expected).take(5)}; " +
          s"batch-only: ${(expected -- got.toSet).take(5)}")
      // both retrievers contributed: some fused row was found by both
      // lists, some by exactly one — the fusion is non-vacuous
      assert(got.exists(_._4 === 2L) && got.exists(_._4 === 1L),
        "fixture too weak: fusion never mixed single- and double-list hits")
    } finally query.stop()
  }

  test("RetrieveStream.hybridRetrieveDiversified: stream ≡ batch retrieve→fuse→MMR") {
    implicit val sqlCtx = spark.sqlContext
    val words = Seq("spark", "scan", "join", "sort", "agg", "window",
      "table", "query", "batch", "stream", "merge", "filter")
    def text(seed: Int): String =
      (0 until 12).map(i => words((seed * 7 + i * i) % words.length)).mkString(" ")
    def vec(seed: Long): Seq[Double] =
      (0 until 16).map(j => (((seed * 31 + j * 17) % 19) - 9).toDouble)
    val corpusDocs = (0L until 80L).map(i => (i, text(i.toInt)))
      .toDF("doc_id", "text")
    val corpusVecs = (0L until 80L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val idx = streaming.RetrieveStream.DiversifiedIndex.of(
      graft.CacheScope.persist(
        operators.Text.bm25Index(corpusDocs, "doc_id", "text")),
      operators.Similarity.pqIndexBuild(corpusVecs, "vec_id", "embedding",
        dim = 16, m = 4, ks = 16, iters = 2))
    val ref = new java.util.concurrent.atomic.AtomicReference(idx)
    val queries = (1000L until 1010L).map(i => (i, text(i.toInt), vec(i * 3)))
    val input = MemoryStream[(Long, String, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Double, Int)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-divhybrid").toString
    val query = streaming.RetrieveStream.hybridRetrieveDiversified(
      input.toDF().toDF("query_id", "text", "embedding"),
      ref, "query_id", "text", "embedding",
      k = 5, perListK = 10, poolK = 10, mmrLambda = 0.5, ckpt) { out =>
      got.synchronized {
        got ++= out.as[(Long, Long, Double, Double, Int)].collect()
      }
    }
    try {
      val rng = new scala.util.Random(67)
      rng.shuffle(queries).grouped(4).foreach { b =>
        input.addData(b); query.processAllAvailable()
      }
      val expected = streaming.RetrieveStream.diversifiedBatch(idx,
          queries.toDF("query_id", "text", "embedding"),
          "query_id", "text", "embedding",
          k = 5, perListK = 10, poolK = 10, mmrLambda = 0.5,
          scoreRoundDecimals = Some(3))
        .as[(Long, Long, Double, Double, Int)].collect().toSet
      assert(got.toSet === expected,
        s"stream-only: ${(got.toSet -- expected).take(5)}; " +
          s"batch-only: ${(expected -- got.toSet).take(5)}")
      // diversification is non-vacuous: some later pick paid a real
      // redundancy penalty (mmr < λ·rel needs a POSITIVE max-cos)
      assert(got.exists(r => r._5 > 1 && r._4 < 0.5 * r._3 - 1e-12),
        "no pick ever paid an MMR penalty — pool has no redundancy to resist")
      // every query got exactly k ranked rows 1..5
      assert(got.groupBy(_._1).forall(_._2.map(_._5).sorted == (1 to 5)),
        "rank sequence broken")
    } finally query.stop()
  }

  test("WindowedCounts.distinctPerWindow stream equals its batch HLL twin, with late drops") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(43)
    val all = rng.shuffle((1 to 400).map { i =>
      (ts(rng.nextInt(100) * 50L + 5), rng.nextInt(60).toLong, 0.0)
    })
    val batches = all.grouped(130).toSeq
    val winSec = 600L
    val delaySec = 600L
    var wmSec = Long.MinValue
    var maxSeen = Long.MinValue
    val kept = Seq.newBuilder[(Timestamp, Long, Double)]
    batches.foreach { b =>
      kept ++= b.filter { e =>
        (e._1.getTime / 1000 / winSec + 1) * winSec > wmSec
      }
      maxSeen = math.max(maxSeen, b.map(_._1.getTime / 1000).max)
      wmSec = maxSeen - delaySec
    }

    val input = MemoryStream[(Timestamp, Long, Double)]
    val counts = WindowedCounts.distinctPerWindow(
      input.toDF().toDF("ts", "user_id", "value"), "ts", "user_id",
      windowLen = s"$winSec seconds", watermarkDelay = s"$delaySec seconds")
    val query = counts.writeStream.format("memory")
      .queryName("parity_dw").outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      input.addData((ts(10000000), 999L, 0.0)); query.processAllAvailable()
      input.addData((ts(20000000), 999L, 0.0)); query.processAllAvailable()

      val streamed = spark.table("parity_dw")
        .filter(col("window_start").cast("long") < 1000000L)
        .select(col("window_start").cast("long"), col("n_entities"))
        .as[(Long, Long)].collect().toSet
      // the HLL sketch is deterministic on a row set: batch mode over the
      // kept rows must land on the IDENTICAL estimates
      val expected = WindowedCounts.distinctPerWindow(
          kept.result().toDF("ts", "user_id", "value"), "ts", "user_id",
          windowLen = s"$winSec seconds")
        .select(col("window_start").cast("long"), col("n_entities"))
        .as[(Long, Long)].collect().toSet
      assert(streamed === expected,
        s"stream-only: ${streamed -- expected}; batch-only: ${expected -- streamed}")
      assert(streamed.nonEmpty && streamed.exists(_._2 > 10))
    } finally query.stop()
  }

  test("StaticEnrich.scd2AsOf enriches by event time and swaps history atomically") {
    implicit val sqlCtx = spark.sqlContext
    val hist1 = Seq((1L, 100L, "v1"), (1L, 500L, "v2"), (2L, 200L, "w1"))
      .toDF("user_id", "eff_start", "plan")
    val ref = new java.util.concurrent.atomic.AtomicReference(hist1)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    val input = MemoryStream[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scd2e").toString
    val query = graft.streaming.StaticEnrich.scd2AsOf(
      input.toDF().toDF("user_id", "ts_sec"), ref,
      Seq("user_id"), "ts_sec", Seq("plan"), ckpt) { out =>
        got ++= out.collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getString(2)))
      }
    try {
      // batch 1: as-of against hist1 — late event 150 gets v1, not v2
      input.addData((1L, 150L), (1L, 600L), (2L, 50L))
      query.processAllAvailable()
      assert(got.toSet === Set((1L, 150L, "v1"), (1L, 600L, "v2"),
        (2L, 50L, null)), s"pre-swap enrichment wrong: $got")
      // SCD2 rebuild lands: key 2 gains a version, key 1 a newer one
      ref.set(hist1.unionAll(Seq((2L, 40L, "w0"), (1L, 700L, "v3"))
        .toDF("user_id", "eff_start", "plan")))
      got.clear()
      input.addData((2L, 50L), (1L, 800L), (1L, 650L))
      query.processAllAvailable()
      // post-swap: same event (2, 50) now resolves; 650 still v2 —
      // event-time correctness, not latest-version
      assert(got.toSet === Set((2L, 50L, "w0"), (1L, 800L, "v3"),
        (1L, 650L, "v2")), s"post-swap enrichment wrong: $got")
    } finally query.stop()
  }

  test("WindowedCounts.quantilePerWindow lands in the exact rank band per window") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(47)
    // 4 windows x 500 values, uniform on [window*1000, window*1000+999]
    val all = rng.shuffle(for {
      w <- 0 until 4; i <- 0 until 500
    } yield (ts(w * 600L + rng.nextInt(590) + 5),
      (w * 1000 + rng.nextInt(1000)).toLong, 0.0))
    val input = MemoryStream[(Timestamp, Long, Double)]
    val out = WindowedCounts.quantilePerWindow(
      input.toDF().toDF("ts", "v", "value"), "ts", "v",
      qs = Seq(0.5, 0.95), windowLen = "600 seconds",
      // delay covers the whole shuffled timeline: no real row is ever
      // late, only the far-future pushers advance the watermark
      watermarkDelay = "2500 seconds")
    val query = out.writeStream.format("memory")
      .queryName("parity_qw").outputMode("append").start()
    try {
      all.grouped(400).foreach { b => input.addData(b); query.processAllAvailable() }
      input.addData((ts(10000000), 0L, 0.0)); query.processAllAvailable()
      input.addData((ts(20000000), 0L, 0.0)); query.processAllAvailable()
      val streamed = spark.table("parity_qw")
        .filter(col("window_start").cast("long") < 1000000L)
        .select(col("window_start").cast("long"),
          col("est_p50"), col("est_p95"), col("n_events"))
        .collect()
      assert(streamed.length === 4, s"expected 4 closed windows: ${streamed.toSeq}")
      // nothing was late (delay covers the timeline): each window holds
      // its full 500 values, so the exact rank band is known per window
      val byWin = all.groupBy(_._1.getTime / 1000 / 600).map { case (w, rows) =>
        w * 600 -> rows.map(_._2.toDouble).sorted
      }
      streamed.foreach { r =>
        val vals = byWin(r.getLong(0))
        def pct(q: Double) = vals((q * (vals.size - 1)).toInt)
        assert(r.getLong(3) === vals.size.toLong)
        assert(r.getDouble(1) >= pct(0.45) && r.getDouble(1) <= pct(0.55),
          s"p50 out of rank band: $r")
        assert(r.getDouble(2) >= pct(0.90) && r.getDouble(2) <= pct(1.0),
          s"p95 out of rank band: $r")
      }
    } finally query.stop()
  }

  test("TrajectoryStream.stayPoints equals batch stayPoints on randomized out-of-order input") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(61)
    // 6 entities alternating dwells (speed < 1) and transits, 40 fixes
    // each at 60s cadence, shuffled hard: late fast fixes MUST cut runs
    val real = for {
      u <- 1L to 6L
      i <- 0 until 40
    } yield {
      val anchored = (i / 8) % 2 == 0 // 8-point dwell, 8-point transit, ...
      StayFix(u, ts(86400L + i * 60L),
        if (anchored) rng.nextDouble() * 0.9 else 2.0 + rng.nextDouble() * 10,
        10.0 + rng.nextDouble() * 0.01, 20.0 + rng.nextDouble() * 0.01)
    }
    // per-entity closing moving fix, then one pusher far enough out that
    // the watermark (delay covers the real timeline) passes the closers
    val closers = (1L to 6L).map(u => StayFix(u, ts(86400L + 41 * 60L), 50.0, 0.0, 0.0))
    val pusher = StayFix(1L, ts(86400L + 41 * 60L + 7200L + 1000L), 50.0, 0.0, 0.0)
    val all = rng.shuffle(real ++ closers)

    val input = MemoryStream[StayFix]
    val stream = TrajectoryStream.stayPoints(input.toDS(),
      speedThreshold = 1.0, minDurationSec = 300L, watermarkDelay = "2 hours")
    val query = stream.writeStream.format("memory")
      .queryName("parity_stay").outputMode("append").start()
    try {
      all.grouped(60).foreach { b => input.addData(b); query.processAllAvailable() }
      input.addData(pusher); query.processAllAvailable()

      def r3(x: Double) = math.floor(x * 1000 + 0.5) / 1000
      val streamed = spark.table("parity_stay")
        .select("userId", "startSec", "endSec", "nPoints", "latMean", "lonMean")
        .as[(Long, Long, Long, Long, Double, Double)].collect()
        .map(t => (t._1, t._2, t._3, t._4, r3(t._5), r3(t._6))).toSet
      val expected = operators.Trajectory.stayPoints(
          (real ++ closers :+ pusher).map(f =>
            (f.userId, f.ts.getTime / 1000, f.speed, f.lat, f.lon))
            .toDF("user_id", "ts_sec", "speed", "lat", "lon"),
          Seq("user_id"), "ts_sec", "speed", "lat", "lon",
          speedThreshold = 1.0, minDurationSec = 300L)
        .select("user_id", "start_sec", "end_sec", "n_points", "lat_mean", "lon_mean")
        .as[(Long, Long, Long, Long, Double, Double)].collect()
        .map(t => (t._1, t._2, t._3, t._4, r3(t._5), r3(t._6))).toSet
      assert(streamed === expected,
        s"stream-only: ${(streamed -- expected).take(5)}; " +
          s"batch-only: ${(expected -- streamed).take(5)}")
      // every entity really dwelt at least twice — a fixture guard
      assert(streamed.size >= 12, s"fixture too thin: ${streamed.size} dwells")
    } finally query.stop()
  }

  test("stayPointsLive: progress snapshots grow monotonically, no re-emits, final row batch-equal") {
    implicit val sqlCtx = spark.sqlContext
    // one long dwell (anchored 0..3000s at 60s cadence), then a moving
    // fix closes it; watermark pushers advance finalization in stages
    val dwell = (0 to 50).map(i => StayFix(1L, ts(86400L + i * 60L), 0.2, 10.0, 20.0))
    val closer = StayFix(1L, ts(86400L + 3120L), 30.0, 10.5, 20.5)
    def pusher(sec: Long) = StayFix(99L, ts(sec), 30.0, 0.0, 0.0)

    val input = MemoryStream[StayFix]
    val stream = TrajectoryStream.stayPointsLive(input.toDS(),
      speedThreshold = 1.0, minDurationSec = 300L,
      progressEverySec = Some(600L), watermarkDelay = "10 minutes")
    val query = stream.writeStream.format("memory")
      .queryName("parity_live").outputMode("append").start()
    try {
      // stage 1: half the dwell + a pusher that finalizes most of it
      input.addData(dwell.take(26)); query.processAllAvailable()
      input.addData(pusher(86400L + 2000L)); query.processAllAvailable()
      val mid = spark.table("parity_live").filter(col("userId") === 1L).collect()
      assert(mid.nonEmpty && mid.forall(!_.getAs[Boolean]("closed")),
        s"expected open progress rows mid-dwell, got ${mid.toSeq}")
      // stage 2: rest of the dwell + closer + far pushers
      input.addData(dwell.drop(26) :+ closer); query.processAllAvailable()
      input.addData(pusher(86400L + 3120L + 700L)); query.processAllAvailable()
      input.addData(pusher(86400L + 100000L)); query.processAllAvailable()

      val rows = spark.table("parity_live").filter(col("userId") === 1L)
        .select("stayId", "startSec", "endSec", "nPoints", "closed")
        .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._3)
      val (open, closedRows) = rows.partition(!_._5)
      assert(open.nonEmpty, "no progress snapshots emitted")
      assert(closedRows.length === 1, s"expected one final row: ${rows.toSeq}")
      // one dwell → one stayId everywhere; starts identical; ends grow
      assert(rows.map(_._1).distinct.length === 1)
      assert(rows.map(_._2).distinct === Array(86400L))
      assert(open.map(_._3).distinct.length === open.length, "snapshot re-emitted")
      val ends = open.map(_._3)
      assert(ends.sorted.sameElements(ends) && ends.last <= closedRows.head._3)
      assert((ends.head +: ends.tail.zip(ends).map { case (b, a) => b - a })
        .tail.forall(_ >= 600L), s"snapshots closer than progressEverySec: ${ends.toSeq}")
      // the final row equals the batch dwell over the full input
      assert(closedRows.head === ((rows.head._1, 86400L, 86400L + 3000L, 51L, true)),
        s"final row: ${closedRows.head}")
    } finally query.stop()
  }

  test("AnomalyStream equals batch anomalyFlags row-for-row on out-of-order input") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{AnomalyStream, MetricFix}
    val rng = new scala.util.Random(79)
    // unique ts per entity (no tie ambiguity); a few planted spikes
    val all = rng.shuffle(for {
      u <- 1L to 4L
      i <- 0 until 40
    } yield MetricFix(u, ts(86400L + i * 60L),
      if (i == 25) 500.0 else 10.0 + rng.nextDouble()))
    val input = MemoryStream[MetricFix]
    val stream = AnomalyStream.flags(input.toDS(), alpha = 0.3, window = 10,
      k = 3.0, watermarkDelay = "2 hours")
    val query = stream.writeStream.format("memory")
      .queryName("parity_anom").outputMode("append").start()
    try {
      all.grouped(60).foreach { b => input.addData(b); query.processAllAvailable() }
      // pushers finalize every real row
      input.addData(MetricFix(99L, ts(10000000), 0.0)); query.processAllAvailable()
      input.addData(MetricFix(99L, ts(20000000), 0.0)); query.processAllAvailable()

      def r3(x: Double) = math.floor(x * 1000 + 0.5) / 1000
      val streamed = spark.table("parity_anom")
        .filter(col("userId") =!= 99L)
        .select("userId", "tsSec", "residual", "anomaly")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.getAs[Any]("residual")).map(d => r3(d.asInstanceOf[Double])),
          Option(r.getAs[Any]("anomaly")))).toSet
      val expected = graft.operators.Analytics.anomalyFlags(
          all.map(f => (f.userId, f.ts.getTime / 1000, f.value))
            .toDF("user_id", "ts_sec", "value"),
          Seq("user_id"), "ts_sec", "value", alpha = 0.3, window = 10, k = 3.0)
        .select("user_id", "ts_sec", "residual", "anomaly")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.getAs[Any]("residual")).map(d => r3(d.asInstanceOf[Double])),
          Option(r.getAs[Any]("anomaly")))).toSet
      assert(streamed === expected,
        s"stream-only: ${(streamed -- expected).take(4)}; " +
          s"batch-only: ${(expected -- streamed).take(4)}")
      // the planted spikes really flag
      assert(streamed.count(_._4.contains(true)) >= 4, "spikes not flagged")
    } finally query.stop()
  }

  test("Scd2Stream closed versions equal batch scd2 on randomized out-of-order input") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Scd2Fix, Scd2Stream}
    val rng = new scala.util.Random(73)
    val attrs = Array("A", "B", "C")
    // heartbeat-heavy change log: attr changes ~every 3rd row per entity
    val all = rng.shuffle(for {
      u <- 1L to 5L
      i <- 1 to 40
    } yield Scd2Fix(u, ts(86400L + rng.nextInt(100) * 50L),
      attrs(rng.nextInt(9) / 3), u * 1000L + i))
    val input = MemoryStream[Scd2Fix]
    // delay covers the whole timeline: nothing late, batch on full input
    val stream = Scd2Stream.versions(input.toDS(), watermarkDelay = "2 hours")
    val query = stream.writeStream.format("memory")
      .queryName("parity_scd2").outputMode("append").start()
    try {
      all.grouped(70).foreach { b => input.addData(b); query.processAllAvailable() }
      // pushers finalize every real row (strictly-below-watermark rule)
      input.addData(Scd2Fix(99L, ts(10000000), "Z", 1L)); query.processAllAvailable()
      input.addData(Scd2Fix(99L, ts(20000000), "Z", 2L)); query.processAllAvailable()

      val streamed = spark.table("parity_scd2")
        .filter(col("userId") =!= 99L)
        .select("userId", "attr", "effStart", "effEnd", "nRows")
        .as[(Long, String, Long, Long, Long)].collect().toSet
      val expected = graft.operators.Dims.scd2(
          all.map(f => (f.userId, f.ts.getTime / 1000, f.attr, f.eventId))
            .toDF("user_id", "ts_sec", "attr", "event_id"),
          Seq("user_id"), "ts_sec", Seq("attr"), tieBreak = Seq("event_id"))
        .filter(col("eff_end").isNotNull) // stream emits CLOSED versions
        .select("user_id", "attr", "eff_start", "eff_end")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(streamed.map(t => (t._1, t._2, t._3, t._4)) === expected,
        s"stream-only: ${streamed.map(t => (t._1, t._2, t._3, t._4)) -- expected}; " +
          s"batch-only: ${expected -- streamed.map(t => (t._1, t._2, t._3, t._4))}")
      assert(streamed.size > 10, s"fixture too thin: ${streamed.size} versions")
    } finally query.stop()
  }

  test("TrajectoryStream.odVoyages matrix equals batch Sessionize+odMatrix with late drops") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(67)
    val cells = Array("A", "B", "C", "D")
    val all = rng.shuffle(for {
      u <- 1L to 5L
      i <- 1 to 30
    } yield OdFix(u, ts(rng.nextInt(100) * 50L),
      cells(rng.nextInt(cells.length)), u * 1000L + i))
    val batches = all.grouped((all.size + 2) / 3).toSeq
    val gapSec = 900L
    val delaySec = 600L

    // simulate the watermark late-drop rule for the batch twin
    var wmSec = Long.MinValue
    var maxSeen = Long.MinValue
    val kept = Seq.newBuilder[OdFix]
    batches.foreach { b =>
      kept ++= b.filter(_.ts.getTime / 1000 >= wmSec)
      maxSeen = math.max(maxSeen, b.map(_.ts.getTime / 1000).max)
      wmSec = maxSeen - delaySec
    }

    val input = MemoryStream[OdFix]
    val stream = TrajectoryStream.odVoyages(input.toDS(), gapSec,
      watermarkDelay = s"$delaySec seconds")
    val query = stream.writeStream.format("memory")
      .queryName("parity_od").outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      // sentinel entity: watermark passes every voyage's gap horizon
      input.addData(OdFix(999L, ts(1000000), "Z", 1L)); query.processAllAvailable()
      input.addData(OdFix(999L, ts(2000000), "Z", 2L)); query.processAllAvailable()

      val streamed = spark.table("parity_od")
        .filter(col("userId") =!= 999L)
        .groupBy("origin", "dest").count()
        .as[(String, String, Long)].collect().toSet
      val expected = operators.Trajectory.odMatrix(
          operators.Sessionize(
            kept.result().map(f => (f.userId, f.ts.getTime / 1000, f.cell, f.eventId))
              .toDF("user_id", "ts_sec", "cell", "event_id"),
            "user_id", "ts_sec", gapSec, tieBreak = Seq("event_id")),
          Seq("user_id", "session_id"), "ts_sec", "cell", tieBreak = "event_id")
        .as[(String, String, Long)].collect().toSet
      assert(streamed === expected,
        s"stream-only: ${streamed -- expected}; batch-only: ${expected -- streamed}")
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("EncounterStream equals batch Trajectory.encounters on full input") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(53)
    // 10 entities drifting in a ~2°x2° box over ~50 min: dense enough for
    // real encounters at 50 km / 10 min, shuffled for out-of-order arrival.
    // Timeline starts one day AFTER epoch 0: Spark's initial event-time
    // watermark is 0, and join-state rows AT the watermark count as late —
    // an epoch-0 fix is dropped, which no real feed ever carries
    val all = rng.shuffle((1 to 150).map { i =>
      (rng.nextInt(10).toLong + 1, ts(86400L + rng.nextInt(50) * 60L),
        rng.nextDouble() * 2.0, rng.nextDouble() * 2.0)
    })
    val in = MemoryStream[(Long, Timestamp, Double, Double)]
    // watermark covers the whole timeline: no eviction can drop a pair,
    // so the batch operator on the full input is exact truth
    val stream = EncounterStream.encounters(
      in.toDF().toDF("user_id", "t", "lat", "lon"),
      "user_id", "t", "lat", "lon",
      maxKm = 50.0, maxGapSec = 600L, watermarkDelay = "2 hours")
    val query = stream.writeStream.format("memory")
      .queryName("parity_enc").outputMode("append").start()
    try {
      all.grouped(50).foreach { b => in.addData(b); query.processAllAvailable() }
      def key(idA: Long, idB: Long, tsA: Long, tsB: Long, km: Double) =
        (idA, idB, tsA, tsB, math.floor(km * 1000 + 0.5) / 1000)
      val streamed = spark.table("parity_enc")
        .select(col("id_a"), col("id_b"), unix_timestamp(col("ts_a")),
          unix_timestamp(col("ts_b")), col("dist_km"))
        .as[(Long, Long, Long, Long, Double)].collect()
        .map((key _).tupled).toSet
      val expected = operators.Trajectory.encounters(
          all.toDF("user_id", "t", "lat", "lon")
            .withColumn("ts_sec", unix_timestamp(col("t"))),
          "user_id", "ts_sec", "lat", "lon", maxKm = 50.0, maxGapSec = 600L)
        .as[(Long, Long, Long, Long, Double)].collect()
        .map((key _).tupled).toSet
      assert(streamed === expected,
        s"stream-only: ${(streamed -- expected).take(5)}; " +
          s"batch-only: ${(expected -- streamed).take(5)}")
      assert(streamed.nonEmpty, "fixture produced no encounters")
    } finally query.stop()
  }

  test("ZoneStream occupancy equals the batch geofence rollup, with late drops") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(47)
    val zones = Seq(("a", 0.0, 0.0, 300.0), ("b", 3.0, 0.0, 300.0))
      .toDF("zone", "zone_lat", "zone_lon", "radius_km")
    // positions hop between the two zone neighborhoods and open water;
    // 50s granularity +5s offset keeps times off the window boundaries
    val all = rng.shuffle((1 to 300).map { i =>
      val lat = rng.nextInt(3) match {
        case 0 => rng.nextDouble() * 2 - 1        // zone a
        case 1 => 3.0 + rng.nextDouble() * 2 - 1  // zone b
        case _ => 40.0 + rng.nextDouble()         // open water
      }
      (ts(rng.nextInt(100) * 50L + 5), (i % 7).toLong, lat, rng.nextDouble() * 0.5)
    })
    val batches = all.grouped(100).toSeq
    val (winSec, delaySec) = (600L, 600L)
    var wmSec = Long.MinValue
    var maxSeen = Long.MinValue
    val kept = Seq.newBuilder[(Timestamp, Long, Double, Double)]
    batches.foreach { b =>
      kept ++= b.filter { e =>
        (e._1.getTime / 1000 / winSec + 1) * winSec > wmSec
      }
      maxSeen = math.max(maxSeen, b.map(_._1.getTime / 1000).max)
      wmSec = maxSeen - delaySec
    }
    val input = MemoryStream[(Timestamp, Long, Double, Double)]
    val occ = ZoneStream.occupancy(
      input.toDF().toDF("t", "user_id", "lat", "lon"), zones, "t",
      "lat", "lon", "user_id",
      windowLen = s"$winSec seconds", watermarkDelay = s"$delaySec seconds")
    val query = occ.writeStream.format("memory")
      .queryName("parity_zones").outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      input.addData((ts(10000000), 999L, 0.0, 0.0)); query.processAllAvailable()
      input.addData((ts(20000000), 999L, 0.0, 0.0)); query.processAllAvailable()
      val streamed = spark.table("parity_zones")
        .filter(col("window_start").cast("long") < 5000000L)
        .select(col("window_start").cast("long"), col("zone"),
          col("n_points"), col("n_entities"))
        .as[(Long, String, Long, Long)].collect().toSet
      val expected = ZoneStream.occupancy(
          kept.result().toDF("t", "user_id", "lat", "lon"), zones, "t",
          "lat", "lon", "user_id", windowLen = s"$winSec seconds")
        .select(col("window_start").cast("long"), col("zone"),
          col("n_points"), col("n_entities"))
        .as[(Long, String, Long, Long)].collect().toSet
      assert(streamed === expected,
        s"stream-only: ${streamed -- expected}; batch-only: ${expected -- streamed}")
      assert(streamed.nonEmpty, "fixture produced no zone occupancy")
    } finally query.stop()
  }
  test("ClassifyStream equals batch scoring; a model swap takes effect at the next batch") {
    implicit val sqlCtx = spark.sqlContext
    val corpus1 = Seq((1L, "good fine great", true), (2L, "bad awful poor", false),
      (3L, "good nice fine", true), (4L, "awful dire poor", false))
      .toDF("doc_id", "text", "is_pos")
    // generation 2 flips the labels — predictions must visibly flip too
    val corpus2 = corpus1.withColumn("is_pos", !col("is_pos"))
    val m1 = operators.Text.linearClassifierTrain(corpus1, "text", col("is_pos"), buckets = 128)
    val m2 = operators.Text.linearClassifierTrain(corpus2, "text", col("is_pos"), buckets = 128)
    val ref = new java.util.concurrent.atomic.AtomicReference(m1)
    val docs = Seq((10L, "good fine story"), (11L, "awful poor tale"),
      (12L, "great nice text"), (13L, "dire bad words"))
    val (pre, post) = docs.splitAt(2)
    val input = MemoryStream[(Long, String)]
    val batches = scala.collection.mutable.ArrayBuffer[Set[(Long, Boolean)]]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-clsswap").toString
    val query = graft.streaming.ClassifyStream.classifySwappable(
      input.toDF().toDF("doc_id", "text"), ref, "doc_id", "text",
      buckets = 128, ckpt) { out =>
      batches.synchronized {
        batches += out.select("id", "pred_pos").as[(Long, Boolean)].collect().toSet
      }
    }
    try {
      input.addData(pre); query.processAllAvailable()
      val nPre = batches.size
      ref.set(m2)
      input.addData(post); query.processAllAvailable()
      def expected(m: org.apache.spark.sql.DataFrame, ds: Seq[(Long, String)]) =
        operators.Text.linearClassifierScore(ds.toDF("doc_id", "text"), m,
          "doc_id", "text", buckets = 128)
          .select("id", "pred_pos").as[(Long, Boolean)].collect().toSet
      val (preGot, postGot) = batches.toSeq.splitAt(nPre)
      assert(preGot.flatten.toSet === expected(m1, pre),
        "pre-swap batch diverged from generation-1 batch scoring")
      assert(postGot.flatten.toSet === expected(m2, post),
        "post-swap batch diverged from generation-2 batch scoring")
      // flipped-label generations disagree: the swap was observable
      assert(expected(m1, post) != expected(m2, post))
    } finally query.stop()
  }
}
