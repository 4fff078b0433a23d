package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Degenerate-input battery: every fan-out/iterative operator must
  * return an empty (or well-defined) result on empty or pathological
  * input instead of crashing — a 100 TB backfill WILL contain an empty
  * partition, an empty day, or an all-empty-text shard somewhere. */
@SlowTest
class DegenerateInputSpec extends SparkSpecBase {
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noEvents = Seq.empty[(Long, Long, Double)].toDF("user_id", "ts_sec", "value")

  test("similarity joins on an empty corpus return empty") {
    assert(Dedup.ngramJaccard(noDocs, "doc_id", "text", 3, 0.7).count() === 0)
    assert(Dedup.minhashLsh(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.simhashNearDup(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.editDistancePairs(noDocs, "doc_id", "text", 3).count() === 0)
  }

  test("similarity joins on all-empty texts return empty (no degenerate bucket)") {
    val blank = Seq((1L, ""), (2L, ""), (3L, "")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccard(blank, "doc_id", "text", 3, 0.7).count() === 0)
    assert(Dedup.minhashLsh(blank, "doc_id", "text").count() === 0)
  }

  test("sessionization and rollups on empty events return empty") {
    val s = Sessionize(noEvents, "user_id", "ts_sec", 10800L)
    assert(s.count() === 0)
    assert(Rollup.sessionSummary(s, Seq("user_id", "session_id"), "ts_sec", "value")
      .count() === 0)
  }

  test("resampleForwardFill on empty input returns empty") {
    val e = noEvents.withColumn("event_id", col("ts_sec"))
    assert(Trajectory.resampleForwardFill(e, Seq("user_id"), "ts_sec",
      "value", 60L, "event_id").count() === 0)
  }

  test("ANN over empty candidate set returns empty, not a crash") {
    val noVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val q = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(noVecs, q, "vec_id", "embedding", 5).count() === 0)
    assert(Similarity.ivfTopK(noVecs, q, "vec_id", "embedding", 5).count() === 0)
    assert(Similarity.ivfPqTopK(noVecs, q, "vec_id", "embedding", 5,
      dim = 2, m = 2, ks = 4, iters = 1).count() === 0)
  }

  test("round-8 composites on tiny/degenerate input stay well-defined") {
    // corpus smaller than k / nCells / ks: every stage must shrink
    // gracefully (fewer cells, fewer codes), never divide-by-zero or
    // produce phantom rows
    val tiny = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(1.0, 1.0))).toDF("vec_id", "embedding")
    val r = Similarity.ivfPqTopK(tiny, tiny, "vec_id", "embedding", k = 5,
      dim = 2, nCells = 16, nProbe = 4, m = 2, ks = 8, iters = 2)
    assert(r.count() === 6L) // 3 queries x 2 candidates (self excluded)
    assert(r.filter(col("query_id") === col("cand_id")).count() === 0)
    // zero-norm vectors: null cosine sorts last, never a DIVIDE_BY_ZERO
    val withZero = tiny.union(Seq((4L, Seq(0.0, 0.0))).toDF("vec_id", "embedding"))
    assert(Similarity.ivfPqTopK(withZero, withZero.filter(col("vec_id") === 4L),
      "vec_id", "embedding", k = 3, dim = 2, m = 2, ks = 4, iters = 1)
      .count() === 3L)
    // triplet miners: no anchor clears the positive threshold -> empty
    // output (nothing to contrast), not an error
    assert(Similarity.tripletMine(tiny, tiny.limit(1), "vec_id", "embedding",
      posThreshold = 0.9999, nNegatives = 2).count() === 0)
    assert(Similarity.tripletMineAnn(tiny, tiny.limit(1), "vec_id", "embedding",
      posThreshold = 0.9999, nNegatives = 2, candidateK = 3).count() === 0)
    // suffixSpans: docs shorter than minLen contribute nothing; an empty
    // corpus returns empty
    val shorts = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    assert(Text.suffixSpans(shorts, "doc_id", "text", minLen = 12).count() === 0)
    assert(Text.suffixSpans(noDocs, "doc_id", "text", minLen = 12).count() === 0)
    // map-only span dedup and the zipf fit: empty corpus / empty text
    assert(Text.docSpanDedup(noDocs, "doc_id", "text").count() === 0)
    val blank2 = Seq((1L, "")).toDF("doc_id", "text")
    val bd = Text.docSpanDedup(blank2, "doc_id", "text").head
    assert(bd.getLong(1) === 1L && bd.getString(2) === "") // [""] span survives
    assert(Text.zipfSlope(noDocs, "text").head.getLong(0) === 0L)
    assert(Text.zipfSlope(blank2, "text").head.getLong(0) === 0L)
  }

  test("round-9 sketch/batching operators stay well-defined on degenerate input") {
    val noElems = Seq.empty[String].toDF("e")
    // empty corpora: sketches empty, every exact count 0, estimates 0,
    // gates hold (0 within every band around 0)
    assert(Quality.kmvSketch(noElems, "e", 16).count() === 0)
    val ov = Quality.kmvOverlapGate(noElems, noElems, "e", k = 16).head
    assert(ov.getLong(ov.fieldIndex("n_union")) === 0L)
    assert(ov.getLong(ov.fieldIndex("union_est")) === 0L)
    assert(ov.getBoolean(ov.fieldIndex("union_ok")) &&
      ov.getBoolean(ov.fieldIndex("inter_ok")))
    // one-sided empty: intersection 0, union = the nonempty side
    val some = Seq("a", "b", "c").toDF("e")
    val half = Quality.kmvOverlapGate(some, noElems, "e", k = 16).head
    assert(half.getLong(half.fieldIndex("n_union")) === 3L)
    assert(half.getLong(half.fieldIndex("union_est")) === 3L)
    assert(half.getLong(half.fieldIndex("inter_est")) === 0L)
    // null elements are no elements
    val nulls = Seq[Option[String]](None, None).toDF("e")
    assert(Quality.kmvSketch(nulls, "e", 16).count() === 0)
    // quantile rollup: empty frame → no groups; constant values → every
    // percentile is the constant and the band is a point that contains it
    val noTs = Seq.empty[(java.sql.Timestamp, Double)].toDF("ts", "v")
    assert(Quality.quantileRollup(noTs, "ts", "v").count() === 0)
    val const = Seq.fill(100)((java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 7.0))
      .toDF("ts", "v")
    val qr = Quality.quantileRollup(const, "ts", "v").head
    assert(qr.getDouble(qr.fieldIndex("p50_exact")) === 7.0)
    assert(qr.getBoolean(qr.fieldIndex("p50_ok")) &&
      qr.getBoolean(qr.fieldIndex("p95_ok")))
    // length batching: empty input → no batches; a partial final batch
    // keeps its true size
    assert(Text.lengthBatches(noDocs.withColumn("l", length(col("text"))),
      "text", "doc_id", "l", 16).count() === 0)
    val five = (1L to 5L).map(i => (i, "x" * i.toInt)).toDF("doc_id", "text")
      .withColumn("l", length(col("text"))).withColumn("shard", lit("s"))
    val b = Text.lengthBatches(five, "shard", "doc_id", "l", 4).collect()
    assert(b.map(_.getAs[Long]("n_docs")).sorted.toSeq === Seq(1L, 4L))
    // NULL length (null text) is excluded, not sorted engine-dependently
    // (Spark NULLS FIRST asc vs DuckDB NULLS LAST would shift batches)
    val withNull = five.union(Seq((6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").withColumn("l", length(col("text")))
      .withColumn("shard", lit("s")))
    val bn = Text.lengthBatches(withNull, "shard", "doc_id", "l", 4).collect()
    assert(bn.map(_.getAs[Long]("n_docs")).sorted.toSeq === Seq(1L, 4L))
  }

  test("round-6 operators on empty input return empty, not a crash") {
    val e = noEvents.withColumn("event_id", col("ts_sec"))
    assert(Analytics.ewma(e, Seq("user_id"), "ts_sec", "value", 0.3, 10).count() === 0)
    assert(Analytics.anomalyFlags(e, Seq("user_id"), "ts_sec", "value").count() === 0)
    assert(Analytics.triangles(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b").head.getLong(0) === 0L)
    val noIv = Seq.empty[(Long, Long, Long)].toDF("k", "s", "en")
    assert(Intervals.mergeIntervals(noIv, Seq("k"), "s", "en").count() === 0)
    assert(Intervals.coverageGaps(noIv, Seq("k"), "s", "en").count() === 0)
    assert(Intervals.overlapJoin(noIv, "s", "en",
      noIv.toDF("k", "s2", "en2"), "s2", "en2", Seq("k")).count() === 0)
    assert(Dims.scd2(e, Seq("user_id"), "ts_sec", Seq("value")).count() === 0)
    assert(Text.gopherRules(noDocs, "doc_id", "text").count() === 0)
    assert(Quality.cmsHeavyHitters(e, "user_id", 5).count() === 0)
    val noVecs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    assert(Similarity.semanticDedup(noVecs, "vec_id", "embedding").count() === 0)
    assert(Similarity.kmeansCentroids(noVecs, "vec_id", "embedding",
      k = 4, iters = 2).count() === 0)
    assert(Trajectory.courseFeatures(e, Seq("user_id"), "ts_sec", "value", "value")
      .count() === 0)
  }

  test("round-6 operators on single-row input stay well-defined") {
    val one = Seq((1L, 100L, 2.0, 1L)).toDF("user_id", "ts_sec", "value", "event_id")
    val ew = Analytics.ewma(one, Seq("user_id"), "ts_sec", "value", 0.3, 10).head
    assert(ew.getAs[Double]("ewma") === 2.0, "single row's EWMA is itself")
    val an = Analytics.anomalyFlags(one, Seq("user_id"), "ts_sec", "value").head
    assert(an.isNullAt(an.fieldIndex("anomaly")), "no history → null flag")
    val sc = Dims.scd2(one, Seq("user_id"), "ts_sec", Seq("value")).head
    assert(sc.getAs[Boolean]("is_current") && sc.isNullAt(sc.fieldIndex("eff_end")))
    val gop = Text.gopherRules(Seq((1L, "")).toDF("doc_id", "text"), "doc_id", "text").head
    assert(!gop.getAs[Boolean]("gopher_pass"), "empty text must fail the battery")
    val iv = Seq((1L, 5L, 9L)).toDF("k", "s", "en")
    val m = Intervals.mergeIntervals(iv, Seq("k"), "s", "en").head
    assert(m.getAs[Long]("start") === 5L && m.getAs[Long]("end") === 9L)
  }

  test("single-row entity: lag-family operators emit null-gap rows, not errors") {
    val one = Seq((1L, 100L, 2.0)).toDF("user_id", "ts_sec", "value")
      .withColumn("event_id", lit(1L))
    val ia = Analytics.interArrival(one, Seq("user_id"), "ts_sec").head()
    assert(ia.getLong(1) === 1L && ia.isNullAt(2))
    assert(Analytics.transitions(
      one.withColumn("event_type", lit("a")),
      Seq("user_id"), "ts_sec", "event_type").count() === 0)
  }

  test("tfidf and entropy on empty corpus return empty") {
    assert(Text.tfidf(noDocs, "doc_id", "text").count() === 0)
    assert(Text.tokenEntropy(noDocs, "doc_id", "text").count() === 0)
    assert(Text.unigramLogProb(noDocs, "doc_id", "text").count() === 0)
  }

  test("null text rows flow through text operators without errors") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "real text here"))
      .toDF("doc_id", "text")
    // null text → no tokens → absent from token-keyed outputs, null metrics
    assert(Text.tfidf(docs, "doc_id", "text").filter(col("id") === 1).count() === 0)
    assert(Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.7).count() === 0)
    assert(Text.qualityScore(docs, "text").filter(col("doc_id") === 1)
      .head.isNullAt(2)) // n_chars null, not a crash
    assert(Dedup.editDistancePairs(docs, "doc_id", "text", 2).count() === 0)
  }

  test("round-9 retrieval stack on empty/degenerate input stays well-defined") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
      .toDF("doc_id", "text")
    // empty corpus and empty query batch both yield empty, not a crash
    assert(Text.bm25TopK(noDocs, docs, "doc_id", "text", "doc_id", "text",
      k = 5).count() === 0)
    assert(Text.bm25TopK(docs, noDocs, "doc_id", "text", "doc_id", "text",
      k = 5).count() === 0)
    // a query term absent from the corpus contributes nothing; a query
    // doc with NO matching terms retrieves nothing
    val q = Seq((9L, "zeta eta theta")).toDF("doc_id", "text")
    assert(Text.bm25TopK(docs, q, "doc_id", "text", "doc_id", "text",
      k = 5).count() === 0)
    // rrfFuse over empty rankings is empty; a doc in one list only fuses
    val empty = Seq.empty[(Long, Long, Int)].toDF("query_id", "doc_id", "rank")
    assert(Analytics.rrfFuse(Seq(empty, empty), k = 5).count() === 0)
    val one = Seq((1L, 2L, 1)).toDF("query_id", "doc_id", "rank")
    val fused = Analytics.rrfFuse(Seq(one, empty), k = 5).collect()
    assert(fused.length === 1 && fused.head.getLong(3) === 1L)
    // maxSim: zero-norm vectors null their cosines and drop from top-k
    // rather than throwing (ANSI divide-by-zero)
    val mv = Seq((1L, 10L, Array(0.0, 0.0)), (2L, 20L, Array(1.0, 0.0)),
      (3L, 30L, Array(0.0, 1.0))).toDF("mdoc", "vec_id", "embedding")
    val ms = Similarity.maxSimTopK(mv, mv.filter(col("mdoc") === 1),
      "mdoc", "vec_id", "embedding", k = 5, dim = 2).collect()
    assert(ms.forall(r => r.isNullAt(2)),
      s"zero-norm query cosines should be null: ${ms.mkString}")
    // sketchRollup on empty events returns empty
    val noTs = Seq.empty[(java.sql.Timestamp, Long)].toDF("ts", "user_id")
    assert(Quality.sketchRollup(noTs, "ts", "user_id").count() === 0)
    // a NULL dimension value is a legitimate group: the rollup-vs-direct
    // join must be null-safe or the NULL bucket silently vanishes
    val nulled = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "a"),
      (java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 2L, null.asInstanceOf[String]),
      (java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), 3L, null.asInstanceOf[String]))
      .toDF("ts", "user_id", "dim")
    val byDim = Quality.sketchRollup(nulled, "ts", "user_id", dims = Seq("dim"))
      .collect().map(r => Option(r.getString(1)) -> r.getLong(2)).toMap
    assert(byDim === Map(Some("a") -> 1L, None -> 2L),
      s"null-dim rollup group lost: $byDim")
    // temperature mixture: empty corpus → empty plan; single stratum →
    // p_raw = p_temp = boost = 1 exactly
    assert(Sampling.temperatureMixture(
      Seq.empty[(Long, String)].toDF("doc_id", "source"), "source", 0.7)
      .count() === 0)
    val single = Sampling.temperatureMixture(
      Seq((1L, "a"), (2L, "a")).toDF("doc_id", "source"), "source", 0.7)
      .collect()
    assert(single.length === 1 && single.head.getDouble(2) === 1.0 &&
      single.head.getDouble(3) === 1.0 && single.head.getDouble(4) === 1.0)
    // cross-corpus LM: empty reference → every target token is OOV and
    // scored from pure smoothing mass, never a crash; empty target → empty
    val ref = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val tgt = Seq((2L, "gamma delta")).toDF("doc_id", "text")
    val oov = Text.lmCrossScore(noDocs, tgt, "doc_id", "text").collect()
    assert(oov.length === 1 && oov.head.getLong(2) === 2L)
    assert(Text.lmCrossScore(ref, noDocs, "doc_id", "text").count() === 0)
  }

  test("round-10 operators stay well-defined on degenerate input") {
    import graft.sources.StateStore

    // IVM: empty feed leaves the base verbatim; feed against an empty
    // base builds from scratch (covered in Round10cSpec) — here: a feed
    // of pure no-op updates (diffStates emits nothing for same-row keys)
    val st = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "grp", "value")
    val noopFeed = StateStore.diffStates(st, st, Seq("id"))
    assert(noopFeed.count() === 0, "identical states produced CDF rows")
    val base = StateOps.aggTable(st, Seq("grp"), Seq("value"))
    val kept = StateOps.ivmAggregate(base, noopFeed, Seq("grp"), Seq("value"))
    assert(kept.collect().map(_.mkString("|")).sorted ===
      base.collect().map(_.mkString("|")).sorted)

    // binary ANN: empty corpus → empty; all-zero vectors (every sign
    // bit 0 → hamming 0 everywhere, cosine null) rank by cand_id, never
    // crash on the zero norm
    val noVecs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val q1 = Seq((100L, Seq.fill(8)(1.0))).toDF("vec_id", "embedding")
    assert(Similarity.binaryTopK(noVecs, q1, "vec_id", "embedding",
      k = 2, dim = 8, shortlist = 4).count() === 0)
    val zeros = Seq.tabulate(3)(i => (i.toLong, Seq.fill(8)(0.0)))
      .toDF("vec_id", "embedding")
    val z = Similarity.binaryTopK(zeros, q1, "vec_id", "embedding",
      k = 2, dim = 8, shortlist = 4).collect()
    assert(z.length === 2 && z.forall(_.isNullAt(3)),
      s"zero-norm rerank must yield null cosine rows: ${z.toSeq}")

    // kCore: empty edges and an all-self-loop graph are empty cores
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Analytics.kCore(noEdges, "a", "b", k = 2).count() === 0)
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("a", "b")
    assert(Analytics.kCore(loops, "a", "b", k = 1).count() === 0)

    // attribution: no touches at all → every conversion is 'direct';
    // empty events → empty
    val evs = Seq((1L, 10L, 100L, "purchase"), (1L, 20L, 101L, "purchase"))
      .toDF("user_id", "ts_sec", "event_id", "event_type")
    val att = Analytics.lastTouch(evs, "user_id", "ts_sec", "event_id",
      "event_type", Seq("click"), "purchase", 3600L).collect()
    assert(att.length === 1 && att.head.getString(0) === "direct" &&
      att.head.getLong(1) === 2L)
    assert(Analytics.lastTouch(
      Seq.empty[(Long, Long, Long, String)]
        .toDF("user_id", "ts_sec", "event_id", "event_type"),
      "user_id", "ts_sec", "event_id", "event_type",
      Seq("click"), "purchase", 3600L).count() === 0)

    // MMR: single-candidate pool and k > pool size both well-defined
    val pool = Seq((1L, 10L, 0.9, Seq(1.0, 0.0))).toDF("q", "c", "rel", "v")
    val m = Similarity.mmrRerank(pool, "q", "c", "rel", "v", k = 5).collect()
    assert(m.length === 1 && m.head.getInt(4) === 1)

    // topPc: dim-1 corpus (trivial direction) stays finite
    val d1 = Seq.tabulate(10)(i => (i.toLong, Seq(i.toDouble)))
      .toDF("id", "vec")
    val (mu1, pc1) = Similarity.topPc(d1, "vec", dim = 1, iters = 3)
    assert(mu1.length === 1 && math.abs(pc1.head) === 1.0,
      s"1-d pc must be ±1: ${pc1.toSeq}")

    // seasonal anomaly: a constant-valued season yields null z and a
    // FALSE flag (never a NaN pass); singleton seasons likewise
    val se = Seq((1L, 0L, 5.0), (2L, 86400L, 5.0), (3L, 3600L, 9.9))
      .toDF("id", "ts_sec", "value")
    val sa = Analytics.seasonalAnomaly(se, Seq.empty, "ts_sec", "value",
        86400L, 3600L).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(4)), r.getBoolean(5)))).toMap
    assert(sa.values.forall { case (z, fl) => z.isEmpty && !fl },
      s"degenerate seasons must be null-z/false: $sa")

    // first touch: touch in the conversion's own second is excluded by
    // the range bound; empty input → empty
    val ft = Analytics.firstTouch(
      Seq((1L, 100L, 1L, "click"), (1L, 100L, 2L, "purchase"))
        .toDF("user_id", "ts_sec", "event_id", "event_type"),
      "user_id", "ts_sec", "event_id", "event_type",
      Seq("click"), "purchase", 3600L).collect()
    assert(ft.length === 1 && ft.head.getString(0) === "direct",
      s"same-second touch must not credit: ${ft.toSeq}")

    // rolling distinct: single-day input → window of one, exact match
    val rd = graft.operators.Quality.rollingDistinct(
      Seq((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
        (java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 1L),
        (java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 2L))
        .toDF("ts", "user_id"), "ts", "user_id", windowDays = 7).collect()
    assert(rd.length === 1 && rd.head.getLong(1) === 1L &&
      rd.head.getLong(2) === 2L && rd.head.getBoolean(3),
      s"single-day rolling distinct wrong: ${rd.toSeq}")
  }

  test("round-11 operators on degenerate input") {
    // dim-keyed rolling distinct on empty events → empty, not a crash
    val noTs = Seq.empty[(java.sql.Timestamp, Long, String)]
      .toDF("ts", "user_id", "event_type")
    assert(Quality.rollingDistinct(noTs, "ts", "user_id",
      dims = Seq("event_type")).count() === 0)

    // domain profile on empty docs → empty; on null-text docs the md5
    // group is null-safe (null text hashes to null; such docs still
    // count, grouped together per domain)
    val noDom = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(Dedup.domainDedupProfile(noDom, "doc_id", "text", "source").count() === 0)

    // cap table with no overlap → empty keep set, no crash
    val rows = Seq((1L, "a")).toDF("k", "dom")
    val caps = Seq(("zzz", 5L)).toDF("dom", "cap")
    assert(Sampling.capPerStratumBy(rows, "k", "dom", caps).count() === 0)

    // classifier: single-class corpus still trains (log-odds lean one
    // way; every prediction lands on that class)
    val oneClass = Seq((1L, "a b c", true), (2L, "c d e", true))
      .toDF("doc_id", "text", "is_pos")
    val m = Text.linearClassifierTrain(oneClass, "text", col("is_pos"),
      buckets = 64)
    val preds = Text.linearClassifierScore(oneClass, m, "doc_id", "text",
      buckets = 64).collect()
    assert(preds.length === 2 && preds.forall(_.getBoolean(2)),
      s"single-class corpus must predict the one class: ${preds.toSeq}")

    // classifier: empty corpus → empty score frame, no crash
    val m0 = Text.linearClassifierTrain(noDocs.withColumn("p", lit(true)),
      "text", col("p"), buckets = 64)
    assert(Text.linearClassifierScore(noDocs, m0, "doc_id", "text",
      buckets = 64).count() === 0)
  }

  test("round-11b entity-resolution/changepoint/decontam on degenerate input") {
    import graft.operators.{Analytics, EntityResolution, Similarity}
    val noRecs = Seq.empty[(Long, String, Double)].toDF("id", "name", "bal")
    // empty records → no candidates, no profile rows
    assert(EntityResolution.blockCandidates(noRecs, "id", Seq("name")).count() === 0)
    assert(EntityResolution.blockProfile(noRecs, "id", Seq("name")).count() === 0)
    assert(EntityResolution.snmCandidates(noRecs, "id", Seq("name", "id"), 3)
      .count() === 0)
    // a single record can neither block-pair nor neighbor
    val one = Seq((1L, "solo", 1.0)).toDF("id", "name", "bal")
    assert(EntityResolution.blockCandidates(one, "id", Seq("name")).count() === 0)
    assert(EntityResolution.snmCandidates(one, "id", Seq("name", "id"), 3)
      .count() === 0)
    // empty candidate frame → empty scores; empty matches → every record
    // is its own entity (profile = all singletons)
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(EntityResolution.scorePairs(one, noPairs, "id",
      stringCols = Seq("name" -> 1.0)).count() === 0)
    val prof = EntityResolution.entityProfile(one, noPairs, "id")
      .as[(Long, Long, Long)].collect().toSet
    assert(prof === Set((1L, 1L, 1L)))
    // changepoint on empty / constant series → nothing fires
    val noEv = Seq.empty[(String, Long, Double)].toDF("k", "t", "v")
    assert(Analytics.meanShift(noEv, Seq("k"), "t", "v", 3, 1.0).count() === 0)
    val flat = (1 to 10).map(i => ("u", i.toLong, 7.0)).toDF("k", "t", "v")
    assert(Analytics.meanShift(flat, Seq("k"), "t", "v", 3, 0.001).count() === 0)
    // decontam: empty benchmark → nothing can be contaminated
    val corp = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val noBench = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.semanticDecontaminate(corp, noBench,
      "vec_id", "embedding", 0.5).count() === 0)
    // decontam: empty corpus against a real benchmark → empty
    assert(Similarity.semanticDecontaminate(noBench, corp,
      "vec_id", "embedding", 0.5).count() === 0)
  }

  test("round-11c statistics family survives empty and singleton input") {
    val noLife = Seq.empty[(String, Long, Boolean)].toDF("c", "dur", "ev")
    assert(Analytics.kaplanMeier(noLife, Seq("c"), "dur", "ev").count() === 0)
    // a single entity: one duration row, S = 0 (event) — no window blowup
    val one = Seq(("c", 4L, true)).toDF("c", "dur", "ev")
    val km = Analytics.kaplanMeier(one, Seq("c"), "dur", "ev")
      .select("n_risk", "survival").as[(Long, Double)].collect()
    assert(km.toSeq === Seq((1L, 0.0)))

    val noNum = Seq.empty[(Double, Double)].toDF("x", "y")
    assert(Analytics.spearmanMatrix(noNum, Seq("x", "y")).count() === 1)
    // constant column → null rho (zero rank variance), never NaN
    val const = (1 to 5).map(i => (i.toDouble, 3.0)).toDF("x", "y")
    val rho = Analytics.spearmanMatrix(const, Seq("x", "y"))
      .select(col("rho")).collect().head
    assert(rho.isNullAt(0))

    val noCat = Seq.empty[(String, String)].toDF("a", "b")
    val as = Analytics.association(noCat, "a", "b")
      .select(col("cramers_v")).collect()
    assert(as.length === 1 && as.head.isNullAt(0))

    val noVal = Seq.empty[(String, Double, Long)].toDF("g", "x", "id")
    assert(Analytics.gini(noVal, Seq("g"), "x", Seq("id")).count() === 0)
    val singleton = Seq(("g", 5.0, 1L)).toDF("g", "x", "id")
    val g1 = Analytics.gini(singleton, Seq("g"), "x", Seq("id"))
      .select("gini").as[Double].head()
    assert(g1 === 0.0, "a singleton group is perfectly equal")

    val noEdge = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Analytics.clusteringCoefficient(noEdge, "a", "b").count() === 0)
    // self-loops only → normalized away entirely
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("a", "b")
    assert(Analytics.clusteringCoefficient(loops, "a", "b").count() === 0)

    val noPos = Seq(("g", 0.0), ("g", -5.0)).toDF("g", "x")
    assert(Quality.benford(noPos, Seq("g"), "x").count() === 0,
      "non-positive values are outside Benford's domain")

    val noRows = Seq.empty[(Int, String)].toDF("q1", "q2")
    val ka = Quality.kAnonymity(noRows, Seq("q1", "q2"), k = 2)
      .select("n_classes").as[Long].collect()
    assert(ka.toSeq === Seq(0L))

    // MST: empty edges → empty forest; all-self-loop input normalizes away
    val noWEdges = Seq.empty[(Long, Long, Double)].toDF("a", "b", "w")
    assert(Analytics.minimumSpanningForest(noWEdges, "a", "b", "w")
      .count() === 0)
    val selfLoops = Seq((1L, 1L, 1.0), (2L, 2L, 2.0)).toDF("a", "b", "w")
    assert(Analytics.minimumSpanningForest(selfLoops, "a", "b", "w")
      .count() === 0)

    // Douglas-Peucker: empty / single-point / two-point trajectories
    val noPts = Seq.empty[(String, Long, Double, Double)]
      .toDF("traj", "seq", "x", "y")
    assert(Trajectory.simplify(noPts, Seq("traj"), "seq", "x", "y", 1.0)
      .count() === 0)
    val tiny = Seq(("a", 1L, 0.0, 0.0), ("b", 1L, 5.0, 5.0), ("b", 2L, 6.0, 6.0))
      .toDF("traj", "seq", "x", "y")
    assert(Trajectory.simplify(tiny, Seq("traj"), "seq", "x", "y", 1.0)
      .count() === 3, "≤2-point trajectories pass through whole")

    // Kneser-Ney on an empty corpus → empty result, no model blowup
    val noDocs2 = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Text.knBigramScore(noDocs2, "doc_id", "text").count() === 0)

    // Mann-Whitney / JSD with a missing side → null stats, 1 row
    val oneSide = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val mw = Quality.mannWhitneyU(oneSide, "v", "g", "a", "b")
      .select(col("u"), col("z")).collect().head
    assert(mw.isNullAt(0) && mw.isNullAt(1))
    val jd = Quality.jsDivergence(oneSide.withColumnRenamed("v", "k"),
      "k", "g", "a", "b").select(col("jsd")).collect().head
    assert(jd.isNullAt(0))

    // Theil-Sen: single point / all-equal x → no pairs, group drops
    val onePt = Seq(("g", 1.0, 1.0), ("h", 2.0, 1.0), ("h", 2.0, 9.0))
      .toDF("g", "x", "y")
    assert(Analytics.theilSen(onePt, Seq("g"), "x", "y").count() === 0,
      "no valid pair anywhere -> empty result")

    // Theil-Sen on EMPTY input: the max-group gate reads a null max —
    // must fold to 0 and return empty, not NPE (the isotonicFit pattern)
    val noTS = Seq.empty[(String, Double, Double)].toDF("g", "x", "y")
    assert(Analytics.theilSen(noTS, Seq("g"), "x", "y").count() === 0)
    val allNullTS = Seq(("g", null.asInstanceOf[java.lang.Double], 1.0))
      .toDF("g", "x", "y")
    assert(Analytics.theilSen(allNullTS, Seq("g"), "x", "y").count() === 0)

    // random walks on empty edges → empty corpus
    val noE = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Analytics.randomWalks(noE, "a", "b", 1, 2).count() === 0)

    // shortest paths: seeds only (no edges) → just the seeds at 0
    val noWE = Seq.empty[(Long, Long, Double)].toDF("a", "b", "w")
    val sp = Analytics.shortestPaths(noWE, "a", "b", "w", Seq(7L))
      .as[(Long, Double)].collect().toSeq
    assert(sp === Seq((7L, 0.0)))

    // seasonal decomposition: series shorter than one period → empty
    val short = (0 until 3).map(i => ("g", i.toLong, 1.0)).toDF("g", "t", "y")
    assert(Analytics.seasonalDecompose(short, Seq("g"), "t", "y", 7)
      .count() === 0)

    // isotonic / Huber on empty input → empty, no gate blowup
    val noXY = Seq.empty[(String, Double, Double)].toDF("g", "x", "y")
    assert(Quality.isotonicFit(noXY, "g", "x", "y").count() === 0)
    val noGV = Seq.empty[(String, Double)].toDF("g", "v")
    assert(Quality.huberMean(noGV, Seq("g"), "v").count() === 0)
    // Welch on a single-row side → null t (no variance estimate)
    val tiny2 = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    assert(Quality.welchTTest(tiny2, "v", "g", "a", "b")
      .select(col("t")).collect().head.isNullAt(0))
  }

  test("round-12 operators on empty/pathological input return empty, never crash") {
    // decayed features: empty events, and a frame where every event is
    // in the excluded future
    assert(Analytics.decayedAgg(noEvents, Seq("user_id"), "ts_sec", "value",
      asOfSec = 100L, halfLifeSec = 60L).count() === 0)
    val future = Seq((1L, 500L, 2.0)).toDF("user_id", "ts_sec", "value")
    assert(Analytics.decayedAgg(future, Seq("user_id"), "ts_sec", "value",
      asOfSec = 100L, halfLifeSec = 60L).count() === 0)
    // BFS: empty edge table, empty seed set
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Analytics.bfsHops(noEdges, "a", "b",
      Seq(1L).toDF("node"), "node", 4).count() === 1) // the seed ring alone
    assert(Analytics.bfsHops(Seq((1L, 2L)).toDF("a", "b"), "a", "b",
      Seq.empty[Long].toDF("node"), "node", 4).count() === 0)
    // distance profile: a 1-vector corpus has no pairs
    val oneVec = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.distanceProfile(oneVec, "vec_id", "embedding",
      sampleN = 100, bins = 20).count() === 0)
    // RBO: empty rankings yield an empty frame (no fake zero rows)
    val noRank = Seq.empty[(Long, Long, Int)].toDF("q", "item", "rank")
    assert(Analytics.rankBiasedOverlap(noRank, noRank, "q", "item", "rank",
      k = 5).count() === 0)
    // Mann-Kendall: empty input and single-point groups both yield empty
    val noXY2 = Seq.empty[(String, Double, Double)].toDF("g", "x", "y")
    assert(Analytics.mannKendall(noXY2, Seq("g"), "x", "y").count() === 0)
    assert(Analytics.mannKendall(Seq(("g", 1.0, 1.0)).toDF("g", "x", "y"),
      Seq("g"), "x", "y").count() === 0)
    // modularity: an all-self-loop graph canonicalizes to zero edges —
    // empty result, and critically no 0/0 division is ever planned
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("a", "b")
    val memb2 = Seq((1L, 0L), (2L, 0L)).toDF("node", "comm")
    assert(Analytics.modularity(loops, "a", "b", memb2, "node", "comm")
      .count() === 0)
    // ECE is a GLOBAL aggregate: SQL semantics give one row even on
    // empty input — assert the well-defined degenerate shape (null ece,
    // zero bins) rather than a crash or a fake 0.0 score
    val noProbs = Seq.empty[(Double, Boolean)].toDF("p", "pos")
    val eceRow = Analytics.expectedCalibrationError(noProbs, "p", "pos")
      .collect()
    assert(eceRow.length === 1 && eceRow.head.isNullAt(0) &&
      eceRow.head.getLong(1) === 0L)
    // audio: empty doc set flows through pack -> frames -> segments
    val noIds = Seq.empty[Long].toDF("doc_id")
    assert(Multimodal.speechSegments(
      Multimodal.audioFrames(Multimodal.packPcm(noIds, "doc_id"))).count() === 0)
  }

  test("round-14/15 density + graph family on degenerate input") {
    val noVecs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val twoVecs = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(9.0, 9.0)))
      .toDF("vec_id", "embedding")
    // dbscanStar with k > sample size: no point has a k-th neighbor →
    // nobody is core, everything is labeled noise, never a crash
    val ds = Similarity.dbscanStar(twoVecs, "vec_id", "embedding",
        k = 5, eps2 = 1.0, sampleN = 10)
      .as[(Long, Option[Long], Boolean)].collect()
    assert(ds.length === 2 && ds.forall(r => r._2.isEmpty && !r._3))
    // kmeansParallelInit: empty corpus → empty picks; k > distinct
    // points → the zero-coverage early stop returns ≤ distinct picks
    // (the Round14 duplicate-point case, locked here for empties)
    assert(Similarity.kmeansParallelInit(noVecs, "vec_id", "embedding",
      k = 3).count() === 0)
    val sameVecs = Seq((1L, Seq(2.0, 2.0)), (2L, Seq(2.0, 2.0)),
      (3L, Seq(2.0, 2.0))).toDF("vec_id", "embedding")
    val dup = Similarity.kmeansParallelInit(sameVecs, "vec_id", "embedding",
      k = 3, oversample = 2, rounds = 2).count()
    assert(dup === 1L, s"all-identical corpus must yield ONE pick, got $dup")
    // fitted Lloyd composition flows through the same degenerate inputs
    assert(Similarity.kmeansCentroidsFitted(noVecs, "vec_id", "embedding",
      k = 2, iters = 1).count() === 0)
    // singleLinkCut at a threshold below every weight: all singletons,
    // merge_dist null; the batched ladder agrees on the same rung
    val msf = Seq((1L, 2L, 5.0), (2L, 3L, 7.0)).toDF("u", "v", "w")
    val below = Analytics.singleLinkCut(msf, "u", "v", "w", 1.0)
      .as[(Long, Long, Option[Double])].collect()
    assert(below.length === 3 &&
      below.forall(r => r._1 === r._2 && r._3.isEmpty))
    val ladderBelow = Analytics
      .singleLinkCutLadder(msf, "u", "v", "w", Seq(1.0))
      .as[(Double, Long, Long, Option[Double])].collect()
    assert(ladderBelow.length === 3 &&
      ladderBelow.forall(r => r._2 === r._3 && r._4.isEmpty))
    // leiden on an edgeless graph: empty membership, never a crash
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Analytics.leidenCommunities(noEdges, "a", "b",
      moveRounds = 2, maxLevels = 2).count() === 0)
    // hdbscan: empty corpus, singleton, and all-identical (root-only
    // condensed tree → all noise) stay well-defined
    assert(Similarity.hdbscanClusters(noVecs, "vec_id", "embedding",
      k = 2, minClusterSize = 2).count() === 0)
    val one = Similarity.hdbscanClusters(
        Seq((7L, Seq(1.0, 1.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2, minClusterSize = 2)
      .as[(Long, Option[Long], Option[Double])].collect()
    assert(one.length === 1 && one.head._2.isEmpty)
    val ident = Similarity.hdbscanClusters(sameVecs, "vec_id", "embedding",
        k = 2, minClusterSize = 2)
      .as[(Long, Option[Long], Option[Double])].collect()
    assert(ident.length === 3 && ident.forall(_._2.isEmpty),
      "all-identical corpus condenses to the root only → all noise")
  }
}
