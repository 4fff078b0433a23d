package graft

import java.nio.file.Files

import graft.operators._
import graft.sources.StateStore
import org.apache.spark.sql.functions._

/**
 * Round-7 hardening: regression gates for the round-6 advice items —
 * the StateStore drift-guard bypass via untouched buckets, and the
 * NaN-variance hole in anomalyFlags.
 */
@SlowTest
class Round7Spec extends SparkSpecBase {
  import spark.implicits._

  // --- StateStore drift guard is independent of touched-bucket pruning ----

  test("StateStore.merge rejects a drifted delta even when its keys all hash to absent buckets") {
    val root = Files.createTempDirectory("graft-state").toString
    val nB = 8
    // seed the store with a single key
    StateStore.merge(spark, root, "2024-01-01",
      Seq(("a", 10.0)).toDF("entity", "dist"),
      keys = Seq("entity"), sumCols = Seq("dist"), nBuckets = nB)
    // pick a key landing in a DIFFERENT bucket than "a": with the old
    // guard (attached to the touched-bucket read) a drifted delta whose
    // buckets don't exist yet in the store read None and skipped the
    // check entirely, committing a mixed-schema snapshot
    val bucketOf = (k: String) =>
      Seq(k).toDF("entity")
        .select(pmod(xxhash64(col("entity")), lit(nB)).cast("int"))
        .head().getInt(0)
    val bA = bucketOf("a")
    val other = ('b' to 'z').map(_.toString).find(bucketOf(_) != bA).get
    val drifted = Seq((other, 2.0, 7L)).toDF("entity", "dist", "extra")
    val e = intercept[IllegalArgumentException] {
      StateStore.merge(spark, root, "2024-01-02", drifted,
        keys = Seq("entity"), sumCols = Seq("dist"), nBuckets = nB)
    }
    assert(e.getMessage.contains("schema drift"))
    // a conforming delta to that same fresh bucket still lands
    StateStore.merge(spark, root, "2024-01-03",
      Seq((other, 2.5)).toDF("entity", "dist"),
      keys = Seq("entity"), sumCols = Seq("dist"), nBuckets = nB)
    val got = StateStore.read(spark, root).get.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 10.0, other -> 2.5))
  }

  // --- anomalyFlags: negative fp variance must yield null, not false ------

  test("anomalyFlags: a prior window with negative fp variance flags null (not false)") {
    // five identical 100000000.1 values: the naive sum-of-squares
    // variance is -2.0 in double arithmetic; sqrt would be NaN, and
    // NaN > 0 is TRUE under Spark ordering semantics — the old guard
    // let that through as anomaly=false where the contract says null
    val base = 100000000.1
    val rows = ((1 to 5).map(i => ("k", i.toLong, base)) :+ (("k", 6L, 2.0 * base)))
      .toDF("k", "ts", "v")
    val r = Analytics.anomalyFlags(rows, Seq("k"), "ts", "v",
        alpha = 0.3, window = 10, k = 3.0, minHistory = 3)
      .filter(col("ts") === 6L).head()
    assert(r.isNullAt(r.fieldIndex("anomaly")),
      "constant-window (fp-negative variance) row must be null, not false")
  }

  // --- queryable-current SCD2 ---------------------------------------------

  test("scd2Current equals scd2.filter(is_current), and asOf equals the filtered prefix") {
    val rng = new scala.util.Random(41)
    val attrs = Array("A", "B", "C")
    val rows = for {
      u <- 1L to 8L
      i <- 1 to 50
    } yield (u, 86400L + rng.nextInt(200) * 30L, attrs(rng.nextInt(9) / 3),
      u * 1000L + i)
    val df = rows.toDF("user_id", "ts_sec", "attr", "event_id")
    val cur = Dims.scd2Current(df, Seq("user_id"), "ts_sec", Seq("attr"),
        tieBreak = Seq("event_id"))
      .select("user_id", "attr", "eff_start")
      .as[(Long, String, Long)].collect().toSet
    val fromHistory = Dims.scd2(df, Seq("user_id"), "ts_sec", Seq("attr"),
        tieBreak = Seq("event_id"))
      .filter(col("is_current"))
      .select("user_id", "attr", "eff_start")
      .as[(Long, String, Long)].collect().toSet
    assert(cur === fromHistory)
    assert(cur.size === 8)

    val cutSec = 86400L + 100 * 30L
    val asOf = Dims.scd2Current(df, Seq("user_id"), "ts_sec", Seq("attr"),
        tieBreak = Seq("event_id"), asOf = Some(lit(cutSec)))
      .select("user_id", "attr", "eff_start")
      .as[(Long, String, Long)].collect().toSet
    val prefix = Dims.scd2Current(df.filter(col("ts_sec") <= cutSec),
        Seq("user_id"), "ts_sec", Seq("attr"), tieBreak = Seq("event_id"))
      .select("user_id", "attr", "eff_start")
      .as[(Long, String, Long)].collect().toSet
    assert(asOf === prefix)
    // the cutoff really bites: at least one entity's current version differs
    assert(asOf !== cur, "fixture too thin: cutoff changed nothing")
  }

  test("scd2Current plans exactly one exchange (window partitioning reused by the agg)") {
    val df = (1L to 100L).map(i => (i % 7, i, if (i % 11 < 5) "A" else "B", i))
      .toDF("user_id", "ts_sec", "attr", "event_id")
    val p = Dims.scd2Current(df, Seq("user_id"), "ts_sec", Seq("attr"),
      tieBreak = Seq("event_id")).queryExecution.executedPlan.toString
    assert("(?<!Reused)Exchange (hash|range)".r.findAllIn(p).size === 1, p.take(2000))
  }

  test("streaming currentUpdates + StateSink store equals the batch current view") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Scd2Fix, Scd2Stream, StateSink}
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val rng = new scala.util.Random(59)
    val attrs = Array("A", "B", "C")
    val all = rng.shuffle(for {
      u <- 1L to 6L
      i <- 1 to 40
    } yield Scd2Fix(u, ts(86400L + rng.nextInt(120) * 50L),
      attrs(rng.nextInt(9) / 3), u * 1000L + i))
    val root = Files.createTempDirectory("graft-scd2cur").toString
    val ckpt = Files.createTempDirectory("graft-scd2cur-ck").toString
    val input = MemoryStream[Scd2Fix]
    // open-version snapshots packed into ONE orderable struct: a later
    // snapshot of the same entity never compares lower (new version ⇒
    // larger effStart; heartbeat ⇒ same effStart, larger nRows), so the
    // store's max-merge IS last-write-wins
    val query = Scd2Stream.currentUpdates(input.toDS(), watermarkDelay = "2 hours")
      .select(col("userId").as("user_id"),
        struct(col("effStart"), col("nRows"), col("attr")).as("cur"))
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StateSink.mergeBatch(b, id, root, keys = Seq("user_id"),
          sumCols = Nil, maxCols = Seq("cur"), nBuckets = 4)
      }.start()
    try {
      all.grouped(60).foreach { b => input.addData(b); query.processAllAvailable() }
      // watermark pushers finalize every real row (strictly-below rule)
      input.addData(Scd2Fix(99L, ts(10000000), "Z", 1L)); query.processAllAvailable()
      input.addData(Scd2Fix(99L, ts(20000000), "Z", 2L)); query.processAllAvailable()

      val stored = StateStore.read(spark, root).get
        .filter(col("user_id") =!= 99L)
        .select(col("user_id"), col("cur.attr"), col("cur.effStart"),
          col("cur.nRows"))
        .as[(Long, String, Long, Long)].collect().toSet
      // scala fold twin: the current run per entity, exact incl. nRows
      val expected = all.filter(_.userId != 99L).groupBy(_.userId).map {
        case (u, rs) =>
          val sorted = rs.sortBy(r => (r.ts.getTime / 1000, r.eventId))
          var attr = ""; var start = 0L; var n = 0L
          for (r <- sorted) {
            if (r.attr == attr) n += 1
            else { attr = r.attr; start = r.ts.getTime / 1000; n = 1 }
          }
          (u, attr, start, n)
      }.toSet
      assert(stored === expected,
        s"store-only: ${stored -- expected}; batch-only: ${expected -- stored}")
      // and the batch operator agrees on the same input
      val batchCur = Dims.scd2Current(
          all.filter(_.userId != 99L)
            .map(f => (f.userId, f.ts.getTime / 1000, f.attr, f.eventId))
            .toDF("user_id", "ts_sec", "attr", "event_id"),
          Seq("user_id"), "ts_sec", Seq("attr"), tieBreak = Seq("event_id"))
        .select("user_id", "attr", "eff_start")
        .as[(Long, String, Long)].collect().toSet
      assert(stored.map(t => (t._1, t._2, t._3)) === batchCur)
    } finally query.stop()
  }

  // --- suffix-rank exact substring dedup ----------------------------------

  test("suffixSpans finds exactly the planted duplicated windows (non-power-of-two L)") {
    // doc A and doc B share a 7-token run; doc C shares nothing; doc A
    // additionally repeats a 5-token run internally (below minLen=6 ⇒
    // only its 6+-token overlap region may appear — here none)
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      ("A", s"x1 x2 $shared y1 y2 y3"),
      ("B", s"z1 $shared w1"),
      ("C", "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")
    ).toDF("doc_id", "text")
    val got = Text.suffixSpans(docs, "doc_id", "text", minLen = 6, minCount = 2)
      .select("id", "span_start", "span_end")
      .as[(String, Long, Long)].collect().toSet
    // the shared run spans tokens [2,8] in A and [1,7] in B; duplicated
    // 6-windows start at its first two positions, merging to the full run
    assert(got === Set(("A", 2L, 8L), ("B", 1L, 7L)), s"got $got")
  }

  test("suffixSpans handles docs shorter than minLen and exact-length docs") {
    val docs = Seq(
      ("S", "one two"),                       // shorter than minLen
      ("E1", "p q r s"), ("E2", "p q r s"),   // exact-length full-doc dup
      ("N", "p q r t")                        // 3-token prefix only: below L
    ).toDF("doc_id", "text")
    val got = Text.suffixSpans(docs, "doc_id", "text", minLen = 4, minCount = 2)
      .select("id", "span_start", "span_end", "n_seeds")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("E1", 0L, 3L, 1L), ("E2", 0L, 3L, 1L)), s"got $got")
  }

  test("suffixSpans equals duplicatedSpans on real documents (md5-collision-free corpus)") {
    val docs = graft.Tables.documents(spark, sfDir)
    val viaRanks = Text.suffixSpans(docs, "doc_id", "text",
        minLen = 8, minCount = 2)
      .select("id", "span_start", "span_end", "n_seeds")
      .as[(String, Long, Long, Long)].collect().toSet
    val viaSeeds = Text.duplicatedSpans(docs, "doc_id", "text",
        n = 8, minCount = 2)
      .select("id", "span_start", "span_end", "n_seeds")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(viaRanks === viaSeeds,
      s"ranks-only: ${(viaRanks -- viaSeeds).take(4)}; " +
        s"seeds-only: ${(viaSeeds -- viaRanks).take(4)}")
    assert(viaRanks.nonEmpty, "fixture has no duplicated spans — gate is vacuous")
  }

  // --- canonical dedup + leakage-safe split -------------------------------

  test("canonicalDedup keeps the best-score member per cluster, ties to smallest id") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "b", 30L), (3L, "c", 30L), // cluster {1,2,3}: best=2 (30, min id)
      (4L, "d", 5L),                                  // singleton
      (5L, "e", 7L), (6L, "f", 2L)                    // cluster {5,6}: best=5
    ).toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.canonicalDedup(docs, "doc_id", pairs, "id_a", "id_b", "score")
      .select("cluster_id", "doc_id", "n_members")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 3L), (4L, 4L, 1L), (5L, 5L, 2L)))
  }

  test("leakFreeSplit: every near-dup cluster lands whole in one split") {
    val docs = graft.Tables.documents(spark, sfDir)
    val clusters = Dedup.clusterPairs(
      Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.7),
      "id_a", "id_b")
    val split = Sampling.leakFreeSplit(docs, "doc_id", clusters, 0.2, 0.2)
    // the leakage invariant itself
    val mixed = split.join(clusters.withColumnRenamed("id", "doc_id"), "doc_id")
      .groupBy("cluster_id").agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(mixed === 0L, s"$mixed clusters scattered across splits")
    // and the plain doc-hash split DOES scatter on this corpus — the
    // operator is load-bearing, not vacuously equal to splitAssign
    val naive = Sampling.splitAssign(docs, "doc_id", 0.2, 0.2)
    val naiveMixed = naive.join(clusters.withColumnRenamed("id", "doc_id"), "doc_id")
      .groupBy("cluster_id").agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(naiveMixed > 0L, "fixture can't distinguish leak-free from naive split")
    // all three splits are populated
    assert(split.select("split").distinct().count() === 3)
  }

  test("dedupProfile: size histogram accounts for every doc, removals = docs - clusters") {
    val docs = Seq(
      (1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L), // cluster of 3
      (4L, "d", 1L),                               // singleton
      (5L, "e", 1L), (6L, "f", 1L)                 // cluster of 2
    ).toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.dedupProfile(docs, "doc_id", pairs, "id_a", "id_b")
      .select("cluster_size", "n_clusters", "n_docs", "n_removed")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((3L, 1L, 3L, 2L), (1L, 1L, 1L, 0L), (2L, 1L, 2L, 1L)))
  }

  // --- geofence, triplets, snake shards ------------------------------------

  test("zoneTag: inside tagged, outside dropped, overlap tags twice, null coords drop") {
    val zones = Seq(("a", 0.0, 0.0, 200.0), ("b", 1.0, 0.0, 200.0))
      .toDF("zone", "zone_lat", "zone_lon", "radius_km")
    // ~111 km per degree of latitude: 0.5° is inside both circles,
    // 10° is outside both
    val pts = Seq((1L, 0.5, 0.0), (2L, 10.0, 10.0), (3L, -1.5, 0.0))
      .toDF("id", "lat", "lon")
      .union(Seq((4L, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(0.0)))
        .toDF("id", "lat", "lon"))
    val got = Trajectory.zoneTag(pts, zones, "lat", "lon")
      .select("id", "zone").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (1L, "b"), (3L, "a")))
  }

  test("tripletMine: known positive, margin-ordered negatives, anchor without positive drops") {
    // anchor 1: near-dup 2 (positive), then 3 and 4 progressively farther;
    // anchor 9 is orthogonal to everything (no positive -> dropped)
    val rows = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(0.99, 0.14, 0.0, 0.0)),   // cos ~0.990 -> positive
      (3L, Array(0.8, 0.6, 0.0, 0.0)),     // cos 0.8    -> neg rank 1
      (4L, Array(0.5, 0.866, 0.0, 0.0)),   // cos 0.5    -> neg rank 2
      (5L, Array(0.0, 1.0, 0.0, 0.0)),     // cos 0      -> neg rank 3
      (9L, Array(0.0, 0.0, 0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val got = Similarity.tripletMine(rows, rows.filter(col("vec_id").isin(1L, 9L)),
      "vec_id", "embedding", posThreshold = 0.9, nNegatives = 3)
    val trips = got.select("anchor_id", "pos_id", "neg_id", "neg_rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(trips === Set((1L, 2L, 3L, 1), (1L, 2L, 4L, 2), (1L, 2L, 5L, 3)),
      s"got $trips")
  }

  test("snakeShards: near-equal weight per shard, serpentine deal, deterministic") {
    // skewed weights: doc i weighs i^2 — hash sharding would scatter badly
    val docs = (1L to 101L).map(i => (i, "s", i * i)).toDF("id", "grp", "w")
    val got = Sampling.snakeShards(docs, "id", "w", Seq("grp"), nShards = 4)
    val sums = got.groupBy("shard").agg(sum("w").as("sw"), count(lit(1)).as("n"))
      .select("shard", "sw", "n").as[(Int, Long, Long)].collect()
    assert(sums.map(_._1).toSet === Set(0, 1, 2, 3))
    // counts per shard differ by at most 1
    assert(sums.map(_._3).max - sums.map(_._3).min <= 1)
    // weight balance: spread within one round's worth (the top row's
    // weight bounds any round's spread)
    val spread = sums.map(_._2).max - sums.map(_._2).min
    assert(spread <= 101L * 101L, s"shard weight spread $spread too wide: ${sums.toSeq}")
    // serpentine: ranks 0..7 (weights 101²..94²) deal 0,1,2,3 then 3,2,1,0
    val top8 = got.filter(col("id") >= 94L).orderBy(desc("w"))
      .select("shard").as[Int].collect().toSeq
    assert(top8 === Seq(0, 1, 2, 3, 3, 2, 1, 0), s"got $top8")
  }

  // --- product quantization ------------------------------------------------

  test("pqTopK: blob resolution, planted twin retrieved, codebook shape, determinism") {
    // 10 tight separated blobs of 40 vectors in 16-d. Within a tight
    // blob every member quantizes to the SAME codes, so within-blob
    // order is beyond PQ's resolution BY DESIGN — the honest structural
    // claim is that every retrieved neighbor comes from the query's own
    // blob (the q_ann_pq oracle gate measures the adversarial
    // random-vector recall floor instead)
    def vec(blob: Int, i: Int): Array[Double] =
      Array.tabulate(16)(j => (((i * 13 + j * 7) % 11) - 5) * 0.03 +
        (if (j == blob % 16) 10.0 else 1.0))
    val rows = (for { b <- 0 until 10; i <- 0 until 40 }
      yield ((b * 100 + i).toLong, vec(b, i))).toDF("vec_id", "embedding")
    val queries = rows.filter(col("vec_id") % 100 === 7 && col("vec_id") < 500)
    val pq = Similarity.pqTopK(rows, queries, "vec_id", "embedding", k = 5,
      dim = 16, m = 4, ks = 16, iters = 3)
    val wrongBlob = pq.filter(floor(col("cand_id") / 100) =!=
      floor(col("query_id") / 100)).count()
    assert(wrongBlob === 0L, s"$wrongBlob retrieved neighbors from a foreign blob")
    assert(pq.count() === 25L) // 5 queries x full top-5
    // planted near-twin in a RANDOM corpus: the twin shares every code
    // with its query, so ADC ranks it at/near the top
    val rng = new scala.util.Random(42)
    def rv() = Array.fill(64)(rng.nextDouble() * 2 - 1)
    val corpus = (0 until 500).map(i => (i.toLong, rv())).toDF("vec_id", "embedding")
    val twins = (0 until 10).map { i =>
      val src = i * 37
      (1000L + src, src.toLong)
    }
    val srcVecs = corpus.filter(col("vec_id").isin(twins.map(_._2): _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qdf = twins.map { case (qid, src) =>
      (qid, srcVecs(src).map(_ + 0.01)) }.toDF("vec_id", "embedding")
    val found = Similarity.pqTopK(corpus, qdf, "vec_id", "embedding", k = 5,
        dim = 64, m = 8, ks = 64, iters = 2)
      .select("query_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = twins.count { case (qid, src) => found.getOrElse(qid, Set()).contains(src) }
    assert(hits >= 8, s"planted twin retrieved for only $hits/10 queries")
    // codebook row form: m*ks cells max, each with dim/m dims, 1-based
    val cb = Similarity.pqCodebooks(rows, "vec_id", "embedding",
      m = 4, ks = 16, iters = 1, dim = 16)
    val shape = cb.groupBy("sub", "cell").count()
    assert(shape.filter(col("count") =!= 4).isEmpty, "a cell missing dims")
    assert(cb.agg(max("dim")).head.getInt(0) === 4)
    assert(cb.select("sub").distinct().count() === 4)
    // deterministic end to end
    val again = Similarity.pqTopK(rows, queries, "vec_id", "embedding", k = 5,
      dim = 16, m = 4, ks = 16, iters = 3)
    assert(pq.select("query_id", "cand_id", "rank").collect().toSet ===
      again.select("query_id", "cand_id", "rank").collect().toSet)
    // dim mismatch fails fast
    val bad = rows.withColumn("embedding", slice(col("embedding"), 1, 7))
    val e = intercept[Exception] {
      Similarity.pqCodebooks(bad, "vec_id", "embedding",
        m = 4, ks = 4, iters = 1, dim = 16).collect()
    }
    assert(e.getMessage.contains("embedding length"))
  }

  // --- DSIR importance resampling -----------------------------------------

  test("dsirSelect favors raw docs that look like the target domain") {
    // target speaks "alpha"; half the raw pool speaks "alpha", half "omega"
    val docs = (
      (1L to 10L).map(i => (i, ("alpha " * 20).trim, true)) ++
      (11L to 20L).map(i => (i, ("alpha " * 20).trim, false)) ++
      (21L to 30L).map(i => (i, ("omega " * 20).trim, false))
    ).toDF("doc_id", "text", "is_tgt")
    val got = Sampling.dsirSelect(docs, "doc_id", "text",
      isTarget = col("is_tgt"), k = 10)
    val ids = got.select("doc_id").as[Long].collect().toSet
    // never selects from the target pool
    assert(ids.forall(_ > 10L), s"target docs leaked into the draw: $ids")
    // alpha-speaking raw docs carry a strictly higher weight than omega
    val w = got.select("doc_id", "logw").as[(Long, Double)].collect().toMap
    val alphaW = w.filter(_._1 <= 20).values
    val omegaW = w.filter(_._1 > 20).values
    if (alphaW.nonEmpty && omegaW.nonEmpty)
      assert(alphaW.min > omegaW.max)
    // the gumbel draw still picked SOME alpha docs (weight dominates)
    assert(ids.count(_ <= 20L) >= 5, s"alpha raw docs under-drawn: $ids")
    // deterministic: a rerun selects the identical set
    val again = Sampling.dsirSelect(docs, "doc_id", "text",
      isTarget = col("is_tgt"), k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(again === ids)
  }
}
