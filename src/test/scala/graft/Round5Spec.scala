package graft

import graft.operators._
import graft.sources.StateStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-5 hardening: advisor-flagged semantics fixes (null-rank
  * keep-best, StateSink agg-list contract), the simhash certificate
  * size ceiling, and the StateStore schema-drift contract. */
@SlowTest
class Round5Spec extends SparkSpecBase {
  import spark.implicits._

  // --- exactKeepBest null-rank semantics (advisor fix) ---------------------

  test("exactKeepBest: a NULL rank LOSES to any scored duplicate (NULLS LAST)") {
    val docs = Seq(
      (1L, "same text", Some(3)),
      (2L, "same text", None), // scoreless copy must NOT win
      (3L, "same text", Some(7))
    ).toDF("doc_id", "text", "pri")
    val r = Dedup.exactKeepBest(docs, Seq("text"), "pri", "doc_id").head()
    assert(r.getAs[Long]("doc_id") === 3L)
    assert(r.getAs[Int]("pri") === 7)
    assert(r.getAs[Long]("n_dups") === 3L)
  }

  test("exactKeepBest: an all-null-rank group still resolves by tiebreak") {
    val docs = Seq(
      (9L, "t", None: Option[Int]),
      (4L, "t", None: Option[Int])
    ).toDF("doc_id", "text", "pri")
    val r = Dedup.exactKeepBest(docs, Seq("text"), "pri", "doc_id").head()
    assert(r.getAs[Long]("doc_id") === 4L) // smallest tiebreak wins
    assert(r.isNullAt(r.fieldIndex("pri")))
  }

  // --- simhashParity certificate ceiling ------------------------------------

  test("simhashParity refuses a corpus past the maxDocs ceiling (quadratic guard)") {
    val docs = (1L to 5L).map(i => (i, s"doc number $i with words")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashParity(docs, "doc_id", "text", maxHamming = 3, maxDocs = 3L)
    }
    assert(e.getMessage.contains("all-pairs"))
    // at or under the ceiling it certifies as before
    val ok = Dedup.simhashParity(docs, "doc_id", "text", maxHamming = 3, maxDocs = 5L).head()
    assert(ok.getAs[Long]("n_docs") === 5L)
    assert(ok.getAs[Long]("n_missed") === 0L && ok.getAs[Long]("n_extra") === 0L)
  }

  // --- StateSink agg-list contract ------------------------------------------

  test("StateSink.mergeBatch rejects an all-empty agg column list upfront") {
    val batch = Seq(("a", 1.0)).toDF("entity", "dist")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StateSink.mergeBatch(batch, 0L,
        Files.createTempDirectory("graft-sink").toString,
        keys = Seq("entity"), sumCols = Nil)
    }
    assert(e.getMessage.contains("sumCols"))
  }

  // --- StateStore schema-drift contract --------------------------------------

  test("StateStore.merge rejects a delta frame whose schema drifted from the store") {
    val root = Files.createTempDirectory("graft-state").toString
    def merge(day: String, d: org.apache.spark.sql.DataFrame, sums: Seq[String]): Unit =
      StateStore.merge(spark, root, day, d, keys = Seq("entity"),
        sumCols = sums, nBuckets = 8)
    merge("2024-01-01", Seq(("a", 10.0)).toDF("entity", "dist"), Seq("dist"))
    // added column: must be refused, not silently written as a mixed snapshot
    val drifted = Seq(("a", 2.0, 7L)).toDF("entity", "dist", "extra")
    val e = intercept[IllegalArgumentException] {
      merge("2024-01-02", drifted, Seq("dist"))
    }
    assert(e.getMessage.contains("schema drift"))
    // changed type: also refused
    val retyped = Seq(("a", 2L)).toDF("entity", "dist")
    intercept[IllegalArgumentException] { merge("2024-01-03", retyped, Seq("dist")) }
    // the store is intact and still merges conforming deltas
    merge("2024-01-04", Seq(("a", 2.5)).toDF("entity", "dist"), Seq("dist"))
    val got = StateStore.read(spark, root).get.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 12.5))
  }

  test("StateStore.merge evaluates the delta plan ONCE (probe and write share a materialization)") {
    // the hazard: an expensive or non-deterministic delta pipeline
    // evaluated once for the touched-bucket probe and AGAIN for the
    // write could land rows in buckets the probe never saw — prior state
    // there would be silently shadowed. One cached materialization must
    // feed both. The counting udf is marked non-deterministic so
    // Catalyst cannot inline a second copy of it.
    val root = Files.createTempDirectory("graft-state").toString
    val evals = spark.sparkContext.longAccumulator("delta-evals")
    val counting = udf { (x: Long) => evals.add(1L); x }.asNondeterministic()
    val deltas = spark.range(100).select(
      concat(lit("e"), counting(col("id"))).as("entity"),
      lit(1.0).as("dist"))
    StateStore.merge(spark, root, "2024-01-01", deltas,
      keys = Seq("entity"), sumCols = Seq("dist"), nBuckets = 8)
    assert(evals.value === 100L,
      s"delta plan evaluated ${evals.value / 100.0}x — probe and write diverged")
    assert(StateStore.read(spark, root).get.count() === 100L)
  }

  // --- new round-5 operators -------------------------------------------------

  test("linearFit recovers an exact linear relation per group") {
    val pts = Seq( // group g1: y = 2x + 1 exactly; g2: y constant
      ("g1", 0.0, 1.0), ("g1", 1.0, 3.0), ("g1", 2.0, 5.0), ("g1", 3.0, 7.0),
      ("g2", 0.0, 4.0), ("g2", 1.0, 4.0), ("g2", 2.0, 4.0)
    ).toDF("g", "x", "y")
    val out = Analytics.linearFit(pts, Seq("g"), "y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert(math.abs(g1.getAs[Double]("slope") - 2.0) < 1e-12)
    assert(math.abs(g1.getAs[Double]("intercept") - 1.0) < 1e-12)
    assert(math.abs(g1.getAs[Double]("pearson_r") - 1.0) < 1e-12)
    assert(g1.getAs[Long]("n") === 4L)
    // zero-variance y: correlation undefined → null, not NaN
    val g2 = out("g2")
    assert(g2.isNullAt(g2.fieldIndex("pearson_r")))
    assert(math.abs(g2.getAs[Double]("slope")) < 1e-12)
  }

  test("approxQuantileGate: sketch lands in the exact bracket; impossible tolerance refused") {
    val docs = (1 to 2000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = Quality.approxQuantileGate(docs, Seq("g"), "v", Seq(0.5, 0.9)).head()
    assert(r.getAs[Boolean]("ok_p50") && r.getAs[Boolean]("ok_p90"))
    assert(math.abs(r.getAs[Double]("p50") - 1000.5) < 1e-9)
    intercept[IllegalArgumentException] {
      Quality.approxQuantileGate(docs, Seq("g"), "v", Seq(0.5),
        accuracy = 100, tol = 0.001) // tighter than the sketch can promise
    }
  }

  test("cooccurrence counts adjacent bigrams and scores PMI exactly") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // bigrams: (a,b)x3, (b,a)x1, (b,c)x1; unigrams a:3 b:3 c:1, N=7
    val out = Text.cooccurrence(docs, "text", minCount = 2L).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "a" && r.getString(1) === "b")
    assert(r.getAs[Long]("n_xy") === 3L)
    assert(math.abs(r.getAs[Double]("pmi") - math.log(3.0 * 7 / (3 * 3))) < 1e-12)
  }

  test("keyProfile reports hot-key stats for salting decisions") {
    val rows = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val r = Skew.keyProfile(rows, "k", k = 2).head()
    assert(r.getAs[Long]("n_rows") === 10L)
    assert(r.getAs[Long]("n_keys") === 3L)
    assert(r.getAs[Long]("top1_rows") === 6L)
    assert(r.getAs[Long]("topk_rows") === 9L)
    assert(math.abs(r.getAs[Double]("skew_ratio") - 1.8) < 1e-12)
  }

  test("dedupAgainstIndex finds archive dups and intra-delta dups, skips clean docs") {
    val base = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
    val archive = Seq(
      (1L, base),
      (3L, "completely different archived text about maritime traffic and weather routing")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, base + " again"), // near-copy of archived doc 1
      (20L, "brand new unique content that matches nothing in the archive at all folks"),
      (30L, "two fresh documents that duplicate each other inside the same delta batch"),
      (40L, "two fresh documents that duplicate each other inside the same delta batch now")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupAgainstIndex(fresh,
        Dedup.minhashIndex(archive, "doc_id", "text"), archive,
        "doc_id", "text", threshold = 0.5)
      .select("new_id", "dup_id", "dup_src")
      .as[(Long, Long, String)].collect().toSet
    assert(out.contains((10L, 1L, "old")), s"archive dup missed: $out")
    assert(out.contains((30L, 40L, "new")), s"intra-delta dup missed: $out")
    assert(!out.exists(p => p._1 == 20L || p._2 == 20L), "clean doc flagged")
  }

  test("psiDrift: identical windows score ~0, a shifted window scores high") {
    val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = Quality.psiDrift(base, base, "v").head()
    assert(math.abs(same.getAs[Double]("psi")) < 1e-9)
    assert(same.getAs[Long]("n_base") === 1000L && same.getAs[Long]("n_cur") === 1000L)
    // hard shift: current mass concentrates where the baseline is thin
    val shifted = (1 to 1000).map(i => 90.0 + (i % 10)).toDF("v")
    val drift = Quality.psiDrift(base, shifted, "v").head().getAs[Double]("psi")
    assert(drift > 0.2, s"expected alarm-level PSI, got $drift") // conventional alarm line
  }

  test("psiDrift handles a constant baseline (degenerate single bin)") {
    val const = Seq.fill(50)(7.0).toDF("v")
    val psi = Quality.psiDrift(const, const, "v").head().getAs[Double]("psi")
    assert(math.abs(psi) < 1e-9)
  }

  test("tableDiff classifies only_left / only_right / changed / same in one pass") {
    val left = Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "x"), (4L, null, "x"))
      .toDF("id", "payload", "tag")
    val right = Seq((2L, "b", "x"), (3L, "CHANGED", "x"), (4L, null, "x"), (5L, "e", "x"))
      .toDF("id", "payload", "tag")
    val got = Quality.tableDiff(left, right, Seq("id"), Seq("payload", "tag"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("only_left" -> 1L, "only_right" -> 1L,
      "changed" -> 1L, "same" -> 2L)) // null <=> null counts as same
  }

  test("oovRate: docs made of top-vocab tokens score 0, junk scores 1") {
    val docs = Seq(
      (1L, "a a b b a b a b"),  // all top-2 vocab
      (2L, "zq1 zq2 zq3 zq4"), // all junk (each appears once)
      (3L, "a b zq5 zq6")      // half and half
    ).toDF("doc_id", "text")
    val out = Text.oovRate(docs, "doc_id", "text", topN = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) === 0.0 && out(2L) === 1.0 && out(3L) === 0.5)
  }

  test("int8 quantization: dequantized cosine stays within eps of float cosine") {
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(16)(d => (((i * 31 + d * 7) % 100) / 50.0f - 1.0f)))
    }.toDF("vec_id", "embedding")
    val out = Similarity.int8FidelityGate(vecs, "vec_id", "embedding",
      queryPred = col("vec_id") < 3, eps = 0.05).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_cands") === 49L)
      assert(r.getAs[Boolean]("ok"),
        s"int8 cosine deviated ${r.getAs[Double]("max_abs_err")} for query ${r.getLong(0)}")
    }
    // quantized codes really are 8-bit
    val q = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .select(explode(col("qvec"))).as[Int].collect()
    assert(q.forall(c => c >= 0 && c <= 255))
  }

  test("containmentJoin catches a quote inside a long doc that Jaccard misses") {
    val quote = "the five boxing wizards jump quickly over the lazy brown dog tonight"
    val filler = (1 to 40).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (1L, quote),                    // the short original
      (2L, s"$filler $quote $filler"), // embeds the quote in 80 filler words
      (3L, "an unrelated document about maritime navigation and port logistics")
    ).toDF("doc_id", "text")
    val contained = Dedup.containmentJoin(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(contained.contains((1L, 2L)), s"embedded quote missed: $contained")
    assert(!contained.exists(p => p._1 == 3L || p._2 == 3L))
    // the symmetric rule really does miss it (union dominated by doc 2)
    val jacc = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.8)
    assert(jacc.isEmpty, "jaccard unexpectedly caught the asymmetric pair")
  }

  // --- robust MAD outliers ---------------------------------------------------

  test("madOutliers flags the planted spike and spares the bulk") {
    // group g: nine values near 10, one at 1000. med=10, MAD small.
    val rows = (Seq.tabulate(9)(i => ("g", 100L + i, 9.0 + i * 0.25)) :+
      ("g", 200L, 1000.0)).toDF("grp", "id", "v")
    val out = Dedup.exact(rows, rows.columns.toSeq) // no-op guard: columns intact
    assert(out.columns.toSeq === rows.columns.toSeq)
    val flagged = Quality.madOutliers(rows, Seq("grp"), "v")
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(flagged(200L), "planted 1000.0 spike not flagged")
    assert((100L to 108L).forall(i => !flagged(i)), "bulk value falsely flagged")
  }

  test("madOutliers MAD=0 degenerates to 'anything off the median is out'") {
    val rows = (Seq.fill(5)(("g", 7.0)) :+ (("g", 7.1)))
      .zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
      .toDF("grp", "id", "v")
    val flagged = Quality.madOutliers(rows, Seq("grp"), "v")
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(flagged(5L), "7.1 should be an outlier when MAD = 0")
    assert((0L to 4L).forall(i => !flagged(i)))
  }

  // --- per-column profile ------------------------------------------------------

  test("columnProfile counts rows/nulls/distincts and summarizes per kind") {
    val rows = Seq(
      (Some(1.0), Some("aa")),
      (Some(3.0), None),
      (None, Some("dddd")),
      (Some(3.0), Some("aa"))
    ).toDF("x", "s")
    val prof = Quality.columnProfile(rows, numericCols = Seq("x"), stringCols = Seq("s"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val x = prof("x")
    assert(x.getAs[Long]("n_rows") === 4L && x.getAs[Long]("n_null") === 1L)
    assert(x.getAs[Long]("n_distinct") === 2L)
    assert(x.getAs[Double]("min_v") === 1.0 && x.getAs[Double]("max_v") === 3.0)
    val s = prof("s")
    assert(s.getAs[Long]("n_null") === 1L && s.getAs[Long]("n_distinct") === 2L)
    // string branch profiles LENGTH: min 2 ("aa"), max 4 ("dddd")
    assert(s.getAs[Double]("min_v") === 2.0 && s.getAs[Double]("max_v") === 4.0)
  }

  // --- deterministic weighted sampling ---------------------------------------

  test("weightedSample is a pure function of the keys (repartition-invariant)") {
    val docs = (1L to 300L).map(i => (i, s"s$i", (i % 17 + 1).toDouble))
      .toDF("id", "strat", "w")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(df, "id", "w", k = 25)
        .select("id").as[Long].collect().toSet
    val a = run(docs)
    val b = run(docs.repartition(13))
    assert(a === b, "selection changed under repartition")
    assert(a.size === 25)
  }

  test("weightedSample favors heavy rows and drops non-positive weights") {
    // 500 light rows (w=1) vs 20 heavy rows (w=1000): expect most picks heavy
    val light = (1L to 500L).map((_, 1.0))
    val heavy = (1001L to 1020L).map((_, 1000.0))
    val zero = Seq((2000L, 0.0), (2001L, -3.0)) // must never be selected
    val df = (light ++ heavy ++ zero).toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", "w", k = 20)
      .select("id").as[Long].collect().toSet
    assert(!picked.exists(_ >= 2000L), "non-positive weight selected")
    val nHeavy = picked.count(_ > 1000L)
    assert(nHeavy >= 15, s"only $nHeavy/20 picks were heavy (P ∝ w broken?)")
    // per-stratum draw caps each stratum at k
    val strat = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b", 1.0 + i))
      .toDF("id", "strat", "w")
    val per = Sampling.weightedSample(strat, "id", "w", k = 7, strataCols = Seq("strat"))
      .groupBy("strat").count().as[(String, Long)].collect().toMap
    assert(per === Map("a" -> 7L, "b" -> 7L))
  }

  // --- bigram LM fluency -------------------------------------------------------

  test("bigramLogProb ranks a repeated fluent phrase above scrambled tokens") {
    // corpus: 4 copies of the same sentence + 1 scramble of the same words.
    // unigram stats are IDENTICAL for all docs; only transitions differ.
    val fluent = "the quick brown fox jumps over the lazy dog"
    val scrambled = "dog the over quick lazy jumps fox brown the"
    val docs = ((1L to 4L).map((_, fluent)) :+ (5L, scrambled)).toDF("doc_id", "text")
    val scores = Text.bigramLogProb(docs, "doc_id", "text")
      .select("id", "logprob").as[(Long, Double)].collect().toMap
    assert((1L to 4L).forall(i => scores(i) > scores(5L)),
      s"scrambled doc did not score lowest: $scores")
  }

  test("bigramLogProb: a sub-2-token doc reports 0 bigrams and a null score") {
    val docs = Seq((1L, "solo"), (2L, "two words here")).toDF("doc_id", "text")
    val r = Text.bigramLogProb(docs, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("id") -> x).toMap
    assert(r(1L).getAs[Long]("n_bigrams") === 0L)
    assert(r(1L).isNullAt(r(1L).fieldIndex("logprob")))
    assert(r(2L).getAs[Long]("n_bigrams") === 2L)
  }

  // --- corpus novelty ----------------------------------------------------------

  test("noveltyRate: the original owns its grams, a verbatim copy owns none") {
    val original = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, original),                                // first occurrence: owns all
      (2L, original),                                // verbatim copy: owns nothing
      (3L, "iota kappa lambda mu nu xi omicron pi")  // fresh prose: owns all
    ).toDF("doc_id", "text")
    val nov = Text.noveltyRate(docs, "doc_id", "text", n = 3)
      .select("id", "novelty").as[(Long, Double)].collect().toMap
    assert(nov(1L) === 1.0 && nov(3L) === 1.0)
    assert(nov(2L) === 0.0, s"verbatim copy scored ${nov(2L)}")
  }

  // --- inverted index ----------------------------------------------------------

  test("invertedIndex posts sorted doc ids and applies both df cuts") {
    val docs = Seq(
      (3L, "common rare shared"),
      (1L, "common shared"),
      (2L, "common hapax")
    ).toDF("doc_id", "text")
    // common: df 3/3 = 1.0 > 0.9 → stop-token cut; hapax/rare: df 1 < 2 → cut
    val idx = Text.invertedIndex(docs, "doc_id", "text", minDf = 2L, maxDfFrac = 0.9)
      .collect().map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("df"), r.getAs[String]("postings"))).toMap
    assert(idx.keySet === Set("shared"))
    assert(idx("shared") === ((2L, "1,3"))) // sorted numerically, not by arrival
  }

  // --- JL random projection ----------------------------------------------------

  test("randomProject is deterministic and exact duplicates stay exact") {
    val rng = new scala.util.Random(3)
    val base = Array.fill(16)(rng.nextGaussian())
    val vecs = Seq(
      (0L, base.toSeq),                      // query
      (1L, base.toSeq),                      // exact duplicate of the query
      (2L, Array.fill(16)(rng.nextGaussian()).toSeq),
      (3L, Array.fill(16)(rng.nextGaussian()).toSeq)
    ).toDF("vec_id", "embedding")
    val p1 = Similarity.randomProject(vecs, "vec_id", "embedding",
      outDim = 4, dim = 16).select("vec_id", "pvec")
      .as[(Long, Seq[Double])].collect().toMap
    val p2 = Similarity.randomProject(vecs.repartition(5), "vec_id", "embedding",
      outDim = 4, dim = 16).select("vec_id", "pvec")
      .as[(Long, Seq[Double])].collect().toMap
    assert(p1 === p2, "projection changed under repartition")
    assert(p1(0L).size === 4)
    assert(p1(0L) === p1(1L), "identical inputs projected differently")
    // identical vectors keep cosine EXACTLY 1 → gate error 0 for that pair
    val gate = Similarity.jlFidelityGate(vecs, "vec_id", "embedding",
        outDim = 4, dim = 16, queryPred = col("vec_id") === 0, eps = 2.0)
      .head()
    assert(gate.getAs[Long]("n_cands") === 3L)
    assert(gate.getAs[Boolean]("ok"))
  }

  // --- PageRank ------------------------------------------------------------------

  test("pagerank: symmetric 2-cycle is the uniform fixpoint; mass is conserved") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val pr = Analytics.pagerank(edges, "src", "dst", iters = 5)
      .select("node", "pr").as[(String, Double)].collect().toMap
    assert(math.abs(pr("a") - 0.5) < 1e-12 && math.abs(pr("b") - 0.5) < 1e-12)
  }

  test("pagerank: dangling mass is redistributed, sum stays 1, sink outranks source") {
    // a -> b, b dangling. After 1 iter: pr(a)=0.2875, pr(b)=0.7125 by hand.
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val pr = Analytics.pagerank(edges, "src", "dst", iters = 1)
      .select("node", "pr").as[(String, Double)].collect().toMap
    assert(math.abs(pr("a") - 0.2875) < 1e-12, s"pr(a) = ${pr("a")}")
    assert(math.abs(pr("b") - 0.7125) < 1e-12, s"pr(b) = ${pr("b")}")
    assert(math.abs(pr.values.sum - 1.0) < 1e-12, "mass not conserved")
  }

  test("pagerank: edge weights shift mass toward the heavy target") {
    // c splits 9:1 between a and b; a and b both return to c
    val edges = Seq(("c", "a", 9.0), ("c", "b", 1.0), ("a", "c", 1.0),
      ("b", "c", 1.0)).toDF("src", "dst", "w")
    val pr = Analytics.pagerank(edges, "src", "dst", Some("w"), iters = 20)
      .select("node", "pr").as[(String, Double)].collect().toMap
    assert(pr("a") > pr("b"), s"weighted split ignored: $pr")
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  // --- chi-square independence ----------------------------------------------------

  test("chiSquare: perfect dependence computes the hand value incl. zero cells") {
    // (x,u)=10, (y,v)=10, zero cells (x,v),(y,u): exp=5 each, chi2 = 4*5 = 20
    val rows = (Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("y", "v")))
      .toDF("a", "b")
    val r = Analytics.chiSquare(rows, "a", "b").head()
    assert(math.abs(r.getAs[Double]("chi2") - 20.0) < 1e-12)
    assert(r.getAs[Long]("dof") === 1L)
    assert(r.getAs[Long]("n_total") === 20L)
  }

  test("chiSquare: a perfectly balanced table scores exactly 0") {
    val rows = (for { a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    assert(Analytics.chiSquare(rows, "a", "b").head().getAs[Double]("chi2") === 0.0)
  }

  // --- bloom-prefiltered join ----------------------------------------------------

  test("bloomJoin result is exactly the plain join; misses are pruned pre-join") {
    val big = (1L to 1000L).map(i => (i, s"p$i")).toDF("k", "payload")
    val small = Seq((20L, "a"), (40L, "b"), (999L, "c")).toDF("k", "attr")
    val got = operators.Skew.bloomJoin(big, small, "k", 100L, 4096L)
      .orderBy("k").collect().map(_.toSeq)
    val want = big.join(small, Seq("k")).orderBy("k").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
    // the pruning really happens before the join: the plan filters on
    // might_contain BELOW the join operator
    val p = operators.Skew.bloomJoin(big, small, "k", 100L, 4096L)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), "bloom pre-filter missing from plan")
  }

  // --- broadcast-matrix random projection ----------------------------------------

  test("randomProjectBig agrees bit-for-bit with the literal-matrix version") {
    val rng = new scala.util.Random(11)
    val vecs = (1L to 50L).map(i => (i, Seq.fill(16)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
    val lit = Similarity.randomProject(vecs, "vec_id", "embedding",
        outDim = 4, dim = 16).select("vec_id", "pvec")
      .as[(Long, Seq[Double])].collect().toMap
    val big = Similarity.randomProjectBig(vecs, "vec_id", "embedding",
        outDim = 4, dim = 16).select("vec_id", "pvec")
      .as[(Long, Seq[Double])].collect().toMap
    assert(big === lit, "broadcast-matrix projection diverged from plan literals")
  }

  // --- bucketed co-located join ---------------------------------------------------

  test("two same-bucketed tables equi-join with ZERO exchanges") {
    val a = (1L to 2000L).map(i => (i, i * 3)).toDF("k", "va")
    val b = (1L to 2000L).map(i => (i, s"s$i")).toDF("k", "vb")
    sources.LakeWriter.writeBucketed(a, "bkt_a", "k", nBuckets = 8)
    sources.LakeWriter.writeBucketed(b, "bkt_b", "k", nBuckets = 8)
    // pin sort-merge: tiny test tables would auto-broadcast, and a
    // BroadcastExchange would mask the co-location this test proves
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // reading the sortBy order off a bucketed scan is gated behind this
    // legacy flag since 3.0 (it is only sound with one file per bucket,
    // which writeBucketed guarantees via the pre-write repartition)
    val prevOrd = spark.conf
      .get("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("k"))
      assert(joined.count() === 2000L)
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "bucketed join still shuffles — co-location lost\n" + p.take(2000))
      assert(!p.contains("Sort ["),
        "bucket sortBy lost — join re-sorts\n" + p.take(2000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", prevOrd)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  // --- stay points / OD matrix -----------------------------------------------------

  test("stayPoints finds the anchored run, drops the mid-transit blip") {
    // user 1: anchored 0-2000s (3 pts), moving, anchored ONCE at 5000s
    // (span 0 → dropped), moving again
    val rows = Seq(
      (1L, 0L, 10L, 1.0, 0.0, 0.0),
      (1L, 1000L, 11L, 2.0, 1.0, 1.0),
      (1L, 2000L, 12L, 3.0, 2.0, 2.0),
      (1L, 3000L, 13L, 99.0, 3.0, 3.0), // moving
      (1L, 5000L, 14L, 1.0, 4.0, 4.0),  // lone slow fix: span 0, dropped
      (1L, 6000L, 15L, 99.0, 5.0, 5.0)  // moving
    ).toDF("user_id", "ts_sec", "event_id", "speed", "lat", "lon")
    val stays = Trajectory.stayPoints(rows, Seq("user_id"), "ts_sec", "speed",
      "lat", "lon", speedThreshold = 50.0, minDurationSec = 1500L,
      tieBreak = Seq("event_id")).collect()
    assert(stays.length === 1, s"expected exactly one stay: ${stays.toSeq}")
    val s0 = stays.head
    assert(s0.getAs[Long]("start_sec") === 0L && s0.getAs[Long]("end_sec") === 2000L)
    assert(s0.getAs[Long]("n_points") === 3L)
    assert(s0.getAs[Double]("lat_mean") === 1.0 && s0.getAs[Double]("lon_mean") === 1.0)
  }

  test("odMatrix counts session first->last cells with deterministic tie-break") {
    val rows = Seq(
      // session (1,0): A -> B; ts tie at origin broken by event_id
      (1L, 0L, 0L, 2L, "B"), (1L, 0L, 0L, 1L, "A"), (1L, 0L, 9L, 3L, "B"),
      // session (2,0): A -> B
      (2L, 0L, 0L, 1L, "A"), (2L, 0L, 5L, 2L, "B"),
      // session (2,1): C -> C (single point)
      (2L, 1L, 7L, 3L, "C")
    ).toDF("user_id", "session_id", "ts_sec", "event_id", "cell")
    val od = Trajectory.odMatrix(rows, Seq("user_id", "session_id"),
        "ts_sec", "cell", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_sessions"))
      .toMap
    assert(od === Map(("A", "B") -> 2L, ("C", "C") -> 1L))
  }

  // --- encounter detection ----------------------------------------------------------

  test("encounters: catches a band-straddling pair, rejects far/late pairs") {
    // maxKm=100 → band ≈ 0.9°. Pair (1,2) sits 0.05° apart but STRADDLES
    // a band boundary (0.88 vs 0.93 with bandDeg≈0.9009) — only the ±1
    // expansion finds it. Pair (1,3) is close in space but 2h late;
    // pair (1,4) is simultaneous but ~555 km away.
    val rows = Seq(
      (1L, 1000L, 0.88, 10.0),
      (2L, 1200L, 0.93, 10.0),   // ~5.6 km, 200 s apart → encounter
      (3L, 9000L, 0.88, 10.0),   // same spot, 8000 s later → too late
      (4L, 1000L, 5.88, 10.0)    // ~555 km away → too far
    ).toDF("user_id", "ts_sec", "lat", "lon")
    val got = Trajectory.encounters(rows, "user_id", "ts_sec", "lat", "lon",
        maxKm = 100.0, maxGapSec = 1800L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)), s"got $got")
    // band check: the two really do land in different bands
    val bandDeg = 100.0 / 111.0
    assert(math.floor(0.88 / bandDeg) !== math.floor(0.93 / bandDeg),
      "test fixture no longer straddles a band boundary")
  }

  test("encounters emits each qualifying point pair exactly once") {
    // two entities each with 2 points, all 4 cross-pairs qualify → 4 rows,
    // no duplicates from the 3x3 expansion
    val rows = Seq(
      (1L, 100L, 1.0, 1.0), (1L, 200L, 1.01, 1.0),
      (2L, 150L, 1.005, 1.0), (2L, 250L, 1.02, 1.0)
    ).toDF("user_id", "ts_sec", "lat", "lon")
    val got = Trajectory.encounters(rows, "user_id", "ts_sec", "lat", "lon",
      maxKm = 50.0, maxGapSec = 1800L).collect()
    assert(got.length === 4, s"expected 4 point pairs, got ${got.length}")
    assert(got.forall(_.getAs[Long]("id_a") === 1L))
  }

  // --- correlation matrix ------------------------------------------------------------

  test("corrMatrix: exact ±1 on linear pairs, one scan for all pairs") {
    val rows = (1 to 100).map { i =>
      (i.toDouble, i * 2.0, -3.0 * i + 7.0, if (i % 2 == 0) 1.0 else 5.0)
    }.toDF("a", "b", "c", "d")
    val m = Analytics.corrMatrix(rows, Seq("a", "b", "c", "d"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("r"))
      .toMap
    assert(m.size === 6)
    assert(math.abs(m(("a", "b")) - 1.0) < 1e-12)  // b = 2a
    assert(math.abs(m(("a", "c")) + 1.0) < 1e-12)  // c = -3a + 7
    assert(math.abs(m(("a", "d"))) < 0.2)          // alternating: ~uncorrelated
    // one aggregation pass: the plan has no Union of per-pair scans
    val p = Analytics.corrMatrix(rows, Seq("a", "b", "c", "d"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Union"), "corrMatrix degraded to one scan per pair")
  }

  // --- degenerate inputs for the round-5 operators --------------------------------

  test("round-5 operators survive empty and degenerate inputs") {
    val emptyEdges = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Analytics.pagerank(emptyEdges, "src", "dst", iters = 2).isEmpty)

    val emptyPts = Seq.empty[(Long, Long, Double, Double)]
      .toDF("user_id", "ts_sec", "lat", "lon")
    assert(Trajectory.encounters(emptyPts, "user_id", "ts_sec", "lat", "lon",
      10.0, 600L).isEmpty)

    // all-moving entity: zero stay points, not an error
    val moving = Seq((1L, 0L, 1L, 99.0, 0.0, 0.0), (1L, 10L, 2L, 98.0, 1.0, 1.0))
      .toDF("user_id", "ts_sec", "event_id", "speed", "lat", "lon")
    assert(Trajectory.stayPoints(moving, Seq("user_id"), "ts_sec", "speed",
      "lat", "lon", 50.0, 0L, Seq("event_id")).isEmpty)

    // constant column: corr is null (0/0), surfaced as null not NaN/error
    val const = (1 to 10).map(i => (i.toDouble, 5.0)).toDF("a", "b")
    val r = Analytics.corrMatrix(const, Seq("a", "b")).head()
    assert(r.isNullAt(r.fieldIndex("r")) ||
      r.getAs[Double]("r").isNaN, "constant-column corr should be null/NaN")

    // MAD on a single-row group: med = the value, mad = 0, not an outlier
    val single = Seq(("g", 7.0)).toDF("grp", "v")
    val m = Quality.madOutliers(single, Seq("grp"), "v").head()
    assert(!m.getAs[Boolean]("is_outlier"))

    // weighted sample with k larger than the frame returns everything
    val tiny = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "w")
    assert(Sampling.weightedSample(tiny, "id", "w", k = 100).count() === 2L)

    // bloom join with an EMPTY small side returns an empty result
    val big = (1L to 50L).map(i => (i, s"p$i")).toDF("k", "p")
    val emptyDim = Seq.empty[(Long, String)].toDF("k", "attr")
    assert(operators.Skew.bloomJoin(big, emptyDim, "k", 10L, 1024L).isEmpty)

    // a zero-norm embedding yields null cosine (dropped by ranking/
    // threshold), never an ANSI DIVIDE_BY_ZERO that kills the job
    val zvecs = Seq(
      (0L, Seq(1.0, 0.0), "x"), (1L, Seq(0.9, 0.1), "x"),
      (2L, Seq(0.0, 0.0), "x") // zero vector
    ).toDF("vec_id", "embedding", "label")
    val nd = Similarity.embeddingNearDup(zvecs, "vec_id", "embedding",
      Seq("label"), threshold = 0.5).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(nd === Set((0L, 1L)), s"zero vector leaked into pairs: $nd")
    val topk = Similarity.bruteForceTopK(zvecs, zvecs.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 2).select("cand_id").as[Long].collect().toSet
    assert(topk.contains(1L), "real neighbor missing")

    // constant series: autocorr null, not DIVIDE_BY_ZERO (the corr() trap);
    // a single-event entity still emits its (null, 0 pairs) row
    val flat = (Seq.tabulate(5)(i => (1L, i.toLong, 7.0)) :+ ((2L, 0L, 3.0)))
      .toDF("user_id", "ts_sec", "value")
    val ac = Analytics.autocorr(flat, Seq("user_id"), "ts_sec", "value")
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(ac(1L).isNullAt(ac(1L).fieldIndex("autocorr")))
    assert(ac(1L).getAs[Long]("n_pairs") === 4L)
    assert(ac(2L).getAs[Long]("n_pairs") === 0L)
  }

  // --- percentile rank ---------------------------------------------------------------

  test("percentileRank: ties share a rank, each group tops out at 1.0") {
    val rows = Seq(("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 5.0),
      ("h", 9.0)).toDF("grp", "v")
    val pr = Analytics.percentileRank(rows, Seq("grp"), "v")
      .select("grp", "v", "pct_rank").as[(String, Double, Double)].collect()
    val g = pr.filter(_._1 == "g").map(r => r._2 -> r._3).toMap
    assert(g(1.0) === 0.25 && g(2.0) === 0.75 && g(5.0) === 1.0)
    assert(pr.find(_._1 == "h").get._3 === 1.0, "singleton group must rank 1.0")
  }

  // --- Kolmogorov–Smirnov two-sample test ------------------------------------------

  test("ksTest: identical samples score 0, disjoint samples score 1, empty is null") {
    val same = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i.toDouble))).toDF("g", "v")
    assert(Quality.ksTest(same, "v", "g", "a", "b").head()
      .getAs[Double]("ks_d") === 0.0)
    val disjoint = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i + 1000.0))).toDF("g", "v")
    assert(Quality.ksTest(disjoint, "v", "g", "a", "b").head()
      .getAs[Double]("ks_d") === 1.0)
    val r = Quality.ksTest(same.filter($"g" === "a"), "v", "g", "a", "b").head()
    assert(r.isNullAt(r.fieldIndex("ks_d")), "empty group should yield null D")
    assert(r.getAs[Long]("n_b") === 0L)
  }

  test("lake read with mergeSchema sees a column added by a later partition") {
    // schema-evolution posture on plain parquet tables: old partitions
    // lack the column, a mergeSchema read surfaces it as null
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/day=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$dir/day=2")
    val df = spark.read.option("mergeSchema", "true").option("basePath", dir)
      .parquet(s"$dir/day=1", s"$dir/day=2")
    assert(df.columns.toSet === Set("id", "name", "score", "day"))
    val byId = df.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("score")))
    assert(byId(2L).getAs[Double]("score") === 9.5)
  }
}
