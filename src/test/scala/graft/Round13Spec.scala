package graft

import graft.operators.{Analytics, Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Round-13 operators. Louvain: the distributed synchronous local-move +
 * one-coarsening implementation must equal a sequential replay of the
 * SAME integer-score algorithm (pure function of the graph — engine-
 * and visit-order-independent), and must OPTIMIZE modularity: Q(louvain)
 * beats Q(LPA) on a fixture where label propagation degenerates.
 */
@SlowTest
class Round13Spec extends SparkSpecBase {
  import spark.implicits._

  // --- sequential Louvain reference ------------------------------------------

  /** Plain-Scala replay of [[Analytics.louvainCommunities]]: same
    * synchronous rounds, same exact-integer score 2m·k − d_i·d_c^{−i},
    * same smallest-label ties, same single coarsening. */
  private def louvainRef(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct

    def md5Parity(n: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(n.toString.getBytes("UTF-8"))
      // first hex nibble = high nibble of byte 0
      ((d(0) >> 4) & 0xf) % 2
    }

    def phase(adj: Map[Long, Seq[(Long, Long)]], self: Map[Long, Long],
              r: Int): Map[Long, Long] = {
      val nodes = adj.keySet ++ self.keySet
      val deg = nodes.map(n => n ->
        (adj.getOrElse(n, Nil).map(_._2).sum + 2 * self.getOrElse(n, 0L))).toMap
      val w2 = deg.values.sum
      var lbl = nodes.map(n => n -> n).toMap
      for (i <- 1 to r) {
        val cur = lbl
        val dc = cur.toSeq.groupBy(_._2)
          .map { case (c, ns) => c -> ns.map(x => deg(x._1)).sum }
        lbl = nodes.map { n =>
          val k = adj.getOrElse(n, Nil).groupBy(e => cur(e._1))
            .map { case (c, es) => c -> es.map(_._2).sum }
          val cands = k + (cur(n) -> k.getOrElse(cur(n), 0L))
          val best = cands.toSeq.minBy { case (c, kk) =>
            val dcx = dc(c) - (if (c == cur(n)) deg(n) else 0L)
            (-(w2 * kk - deg(n) * dcx), c)
          }._1
          // parity-alternated adoption (the anti-oscillation rule)
          n -> (if (md5Parity(n) == i % 2) best else cur(n))
        }.toMap
      }
      lbl
    }

    val adj1 = und.flatMap { case (a, b) => Seq((a, (b, 1L)), (b, (a, 1L))) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    val c1 = phase(adj1, Map.empty, rounds)
    val tagged = und.map { case (a, b) => (c1(a), c1(b)) }
    val adj2 = tagged.filter { case (x, y) => x != y }
      .flatMap { case (x, y) => Seq((x, (y, 1L)), (y, (x, 1L))) }
      .groupBy(_._1)
      .map { case (n, xs) =>
        n -> xs.groupBy(_._2._1).toSeq
          .map { case (m, es) => (m, es.map(_._2._2).sum) }
      }
    val self2 = tagged.filter { case (x, y) => x == y }
      .groupBy(_._1).map { case (c, xs) => c -> xs.size.toLong }
    val c2 = phase(adj2, self2, rounds)
    und.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(n => n -> c2.getOrElse(c1(n), c1(n))).toMap
  }

  private def modQ(edges: Seq[(Long, Long)], memb: Map[Long, Long]): Double =
    Analytics.modularity(edges.toDF("a", "b"), "a", "b",
        memb.toSeq.toDF("node", "comm"), "node", "comm")
      .agg(sum("q_contrib")).head.getDouble(0)

  test("louvainCommunities: separated cliques resolve to themselves at Q = 0.5") {
    val clique = (base: Long) => for {
      i <- 0 to 3; j <- (i + 1) to 3
    } yield (base + i, base + j)
    val edges = clique(0L) ++ clique(100L)
    val got = Analytics.louvainCommunities(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val comms = got.groupBy(_._2).values.map(_.keys.toSet).toSet
    assert(comms === Set((0L to 3L).toSet, (100L to 103L).toSet), got)
    assert(math.abs(modQ(edges, got) - 0.5) < 1e-12)
  }

  test("louvainCommunities matches the sequential reference on a random graph") {
    val rnd = new scala.util.Random(1313)
    val edges = Seq.fill(400)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val got = Analytics.louvainCommunities(edges.toDF("a", "b"), "a", "b",
      moveRounds = 3).as[(Long, Long)].collect().toMap
    assert(got === louvainRef(edges, 3))
  }

  test("louvainCommunities OPTIMIZES Q: recovers a planted partition LPA collapses") {
    // planted partition: four 8-cliques joined by LADDERED bridges (one
    // per node position between adjacent blocks). The dense inter-block
    // ladder is LPA's pathology — the smallest label invades across the
    // bridges round after round until everything is one community
    // (Q = 0 exactly); Louvain's ΔQ greedy refuses the merges and
    // recovers the four planted blocks
    val clique = (b: Long) => for {
      i <- 0 to 7; j <- (i + 1) to 7
    } yield (b + i, b + j)
    val blocks = Seq(0L, 100L, 200L, 300L)
    val ladder = for (b <- 0 until 3; i <- 0 to 7)
      yield (blocks(b) + i, blocks(b + 1) + i)
    val edges = blocks.flatMap(clique) ++ ladder
    val louv = Analytics.louvainCommunities(edges.toDF("a", "b"), "a", "b",
      moveRounds = 8).as[(Long, Long)].collect().toMap
    val lpa = Analytics.lpaCommunities(edges.toDF("a", "b"), "a", "b",
      iters = 8).as[(Long, Long)].collect().toMap
    val planted = blocks.map(b => (b to b + 7).toSet).toSet
    assert(louv.groupBy(_._2).values.map(_.keys.toSet).toSet === planted,
      s"louvain must recover the planted blocks: $louv")
    val (qLouv, qLpa) = (modQ(edges, louv), modQ(edges, lpa))
    info(s"Q(louvain) = $qLouv, Q(lpa) = $qLpa")
    assert(qLouv > qLpa && qLouv > 0.5,
      s"louvain must out-optimize LPA here: $qLouv vs $qLpa")
    assert(lpa.values.toSet.size === 1 && math.abs(qLpa) < 1e-12,
      "fixture sanity: LPA must actually collapse (else pick a denser ladder)")
  }

  // --- Leiden-style refinement ---------------------------------------------------

  test("refineCommunities splits disconnected communities, raises Q, and is idempotent") {
    // two K4s share ONE community label but have no connecting edge —
    // the disconnected-community artifact Louvain can emit
    val clique = (b: Long) => for { i <- 0 to 3; j <- (i + 1) to 3 } yield (b + i, b + j)
    val edges = (clique(0L) ++ clique(100L)).toDF("a", "b")
    val badMemb = ((0L to 3L) ++ (100L to 103L)).map((_, 7L)).toDF("node", "comm")
    val refined = Analytics.refineCommunities(edges, "a", "b",
      badMemb, "node", "comm").as[(Long, Long)].collect().toMap
    assert(refined.groupBy(_._2).values.map(_.keys.toSet).toSet ===
      Set((0L to 3L).toSet, (100L to 103L).toSet), refined)
    def q(m: Map[Long, Long]): Double =
      Analytics.modularity(edges, "a", "b", m.toSeq.toDF("node", "comm"),
        "node", "comm").agg(sum("q_contrib")).head.getDouble(0)
    val (qBad, qRef) = (
      Analytics.modularity(edges, "a", "b", badMemb, "node", "comm")
        .agg(sum("q_contrib")).head.getDouble(0), q(refined))
    assert(qRef > qBad, s"splitting a disconnected community must raise Q: $qRef vs $qBad")
    assert(math.abs(qRef - 0.5) < 1e-12)
    // idempotent: already-connected communities pass through (labels
    // renumber to component minima, the grouping is identical)
    val again = Analytics.refineCommunities(edges, "a", "b",
        refined.toSeq.toDF("node", "comm"), "node", "comm")
      .as[(Long, Long)].collect().toMap
    assert(again === refined)
    // membership nodes with no intra edge become singletons under
    // their own id (never silently dropped)
    val withIso = badMemb.union(Seq((999L, 7L)).toDF("node", "comm"))
    val iso = Analytics.refineCommunities(edges, "a", "b",
      withIso, "node", "comm").as[(Long, Long)].collect().toMap
    assert(iso(999L) === 999L && iso.size === 9)
  }

  // --- OPQ ---------------------------------------------------------------------

  private def assertOrthogonal(r: Seq[Array[Double]], tol: Double): Unit = {
    val n = r.size
    for (i <- 0 until n; j <- 0 until n) {
      val p = (0 until n).map(k => r(i)(k) * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(p - want) < tol, s"R·Rᵀ[$i][$j] = $p")
    }
  }

  test("rotationMatrix is orthogonal and seed-deterministic") {
    val r = Similarity.rotationMatrix(dim = 16, seed = 13L)
    assertOrthogonal(r, 1e-12)
    val r2 = Similarity.rotationMatrix(dim = 16, seed = 13L)
    assert(r.zip(r2).forall { case (a, b) => a.sameElements(b) })
    assert(!Similarity.rotationMatrix(16, 14L).head.sameElements(r.head))
  }

  /** Planted anisotropic corpus: variance concentrated in a few
    * directions, then mixed by a FIXED dense rotation so the energy
    * lands across every raw subspace — the shape where raw-basis PQ
    * wastes its code budget and a learned rotation wins it back. */
  private def anisotropic(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Double])] = {
    val mix = Similarity.rotationMatrix(dim, 5L)
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val z = Array.tabulate(dim)(d =>
        rnd.nextGaussian() * math.pow(0.6, d))
      i.toLong -> Seq.tabulate(dim)(j =>
        (0 until dim).map(k => mix(j)(k) * z(k)).sum)
    }
  }

  /** Mean squared PQ reconstruction error of a corpus in its own basis. */
  private def mse(corpus: DataFrame, dim: Int, m: Int, ks: Int,
                  iters: Int): Double = {
    val idx = Similarity.pqIndexBuild(corpus, "id", "v", dim, m, ks, iters)
    val dsub = dim / m
    val sl = corpus
      .select(col("id").as("cand_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("v").cast("array<double>").as("v"))
      .select(col("cand_id"), col("sub"),
        slice(col("v"), col("sub") * dsub + 1, lit(dsub)).as("vs"))
    val got = idx.codes.join(sl, Seq("cand_id", "sub"))
      .join(idx.codebooks.select(col("sub"), col("cell").as("code"), col("c")),
        Seq("sub", "code"))
      .select(aggregate(zip_with(col("vs"), col("c"),
        (a, b) => (a - b) * (a - b)), lit(0.0), (s, x) => s + x).as("e"))
      .agg(avg("e")).head.getDouble(0)
    idx.release()
    got
  }

  test("pqCodebooksOpq: learned rotation is orthogonal and cuts PQ error; recall@5 beats plain PQ") {
    val dim = 16; val m = 4; val ks = 16; val iters = 3
    val corpus = anisotropic(400, dim, seed = 99).toDF("id", "v")
    val (r, _) = Similarity.pqCodebooksOpq(corpus, "id", "v",
      m, ks, iters, dim, opqRounds = 3, sampleN = 400)
    assertOrthogonal(r, 1e-9)

    val rotated = Similarity.rotate(
      corpus.select(col("id"), col("v").cast("array<double>").as("v")),
      "v", r, dim)
    val (ePq, eOpq) = (mse(corpus, dim, m, ks, iters),
      mse(rotated, dim, m, ks, iters))
    info(s"reconstruction MSE: raw-basis $ePq, OPQ-rotated $eOpq")
    assert(eOpq < ePq * 0.9,
      s"the learned rotation must cut quantization error: $eOpq vs $ePq")

    def recall(cands: DataFrame): Double = {
      val q = cands.filter(col("id") <= 10)
      val approx = Similarity.pqTopK(cands, q, "id", "v", k = 5,
        dim = dim, m = m, ks = ks, iters = iters)
      // brute truth in the SAME basis (rotation preserves ranking;
      // computing it per basis keeps each pipeline self-contained)
      val brute = Similarity.bruteForceTopK(cands, q, "id", "v", k = 5)
      Similarity.recallAtK(approx, brute,
          q.select(col("id").as("query_id")), 5)
        .agg(avg("recall")).head.getDouble(0)
    }
    val (rPq, rOpq) = (recall(corpus), recall(rotated))
    info(s"recall@5: raw-basis PQ $rPq, OPQ $rOpq")
    assert(rOpq > rPq, s"OPQ recall must beat plain PQ: $rOpq vs $rPq")
  }

  // --- weighted MinHash (ICWS) -------------------------------------------------

  /** Exact tf-weighted 3-gram multiset Jaccard of two texts — the
    * sequential truth the kernels must reproduce. */
  private def wJaccard(a: String, b: String): Double = {
    def tf(t: String): Map[String, Int] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Map.empty
      else w.sliding(3).map(_.mkString(" ")).toSeq.groupBy(identity)
        .map { case (g, xs) => g -> xs.size }
    }
    val (ta, tb) = (tf(a), tf(b))
    val keys = ta.keySet ++ tb.keySet
    val mn = keys.toSeq.map(k => math.min(ta.getOrElse(k, 0), tb.getOrElse(k, 0))).sum
    val mx = keys.toSeq.map(k => math.max(ta.getOrElse(k, 0), tb.getOrElse(k, 0))).sum
    if (mx == 0) 0.0 else mn.toDouble / mx
  }

  test("hashedShingleCounts / weightedIntersection / weightedTotal reproduce exact tf math") {
    val a = "x y z x y z w q"   // 3-grams incl. a repeated "x y z ..." run
    val b = "x y z x y w"
    val df = Seq((1L, a), (2L, b)).toDF("id", "text")
      .select(col("id"),
        graft.functions.Hashing.hashedShingleCounts(col("text"), 3).as("shc"))
      .withColumn("tot", graft.functions.Hashing.weightedTotal(col("shc")))
    val tot = df.select("id", "tot").as[(Long, Long)].collect().toMap
    assert(tot(1L) === 6L && tot(2L) === 4L) // nTokens − 2
    val common = df.filter(col("id") === 1).select(col("shc").as("a"))
      .crossJoin(df.filter(col("id") === 2).select(col("shc").as("b")))
      .select(graft.functions.Hashing.weightedIntersection(col("a"), col("b")))
      .as[Long].head()
    val want = wJaccard(a, b)
    assert(common.toDouble / (6 + 4 - common) === want,
      s"kernel jaccard vs reference: common=$common want=$want")
    // short text: fewer than 3 tokens -> empty multiset, zero mass
    val short = Seq((9L, "one two")).toDF("id", "text")
      .select(graft.functions.Hashing.weightedTotal(
        graft.functions.Hashing.hashedShingleCounts(col("text"), 3))).as[Long].head()
    assert(short === 0L)
  }

  test("ICWS collision probability estimates the weighted Jaccard") {
    // two multisets with hand-computable J_w: overlap run + disjoint
    // tails, repeated tokens making the WEIGHTED measure differ from
    // the set one. bands = numPerms (r = 1) so each band hash IS one
    // sample — collision rate across 512 samples estimates J_w
    val a = (Seq.fill(8)("c o r e").mkString(" ")) + " a b d e f g"
    val b = (Seq.fill(4)("c o r e").mkString(" ")) + " p q r s t u"
    val jw = wJaccard(a, b)
    val perms = 512
    val df = Seq((1L, a), (2L, b)).toDF("id", "text")
      .select(col("id"), graft.functions.Hashing.icwsBands(
        graft.functions.Hashing.hashedShingleCounts(col("text"), 3),
        perms, perms).as("bh"))
    val rows = df.as[(Long, Seq[Long])].collect().toMap
    val hits = rows(1L).zip(rows(2L)).count { case (x, y) => x == y }
    val est = hits.toDouble / perms
    val sigma = math.sqrt(jw * (1 - jw) / perms)
    info(s"J_w = $jw, ICWS estimate = $est over $perms samples (σ=$sigma)")
    assert(math.abs(est - jw) < 4 * sigma + 1e-9,
      s"ICWS collision rate $est drifted from J_w $jw past 4σ")
  }

  test("minhashLshWeighted matches the exact weighted join and discriminates repetition") {
    val rnd = new scala.util.Random(77)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    def sentence(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = sentence(30)
    val nearDup = {              // two word substitutions: J_w stays high
      val w = base.split(" "); w(5) = "XX"; w(20) = "YY"; w.mkString(" ")
    }
    val spam = (base + " ") * 5 + base // 6x repetition of the same text
    val noise = (1 to 40).map(i => (100L + i, sentence(25)))
    val docs = (Seq((1L, base), (2L, nearDup), (3L, spam)) ++ noise)
      .toDF("id", "text")
    val got = Dedup.minhashLshWeighted(docs, "id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // exact truth over all pairs
    val all = (Seq((1L, base), (2L, nearDup), (3L, spam)) ++ noise)
    val exact = (for {
      (ia, ta) <- all; (ib, tb) <- all if ia < ib
      j = wJaccard(ta, tb) if j >= 0.5
    } yield (ia, ib) -> j).toMap
    info(s"exact pairs: ${exact.keySet}; LSH found: ${got.keySet}")
    assert(got.keySet === exact.keySet,
      s"weighted LSH must recover the exact weighted join here")
    exact.foreach { case (k, j) =>
      assert(math.abs(got(k) - j) < 1e-12, s"pair $k: ${got(k)} vs $j") }
    // the discrimination claim: (base, nearDup) is a weighted near-dup,
    // (base, spam) is NOT (J_w ≈ 1/6 despite near-identical shingle
    // SETS — the set-based minhashLsh DOES pair them)
    assert(got.contains((1L, 2L)) && !got.contains((1L, 3L)))
    val setPairs = Dedup.minhashLsh(docs, "id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(setPairs.contains((1L, 3L)),
      "fixture sanity: the SET version must pair base with its spam blowup")
  }
}
