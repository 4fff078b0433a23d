package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Quality, Text, Trajectory}

/** Round-11 third wave: the statistics family — Kaplan–Meier survival,
  * fractional ranks / Spearman, categorical association (MI + Cramér's
  * V), Gini concentration, power-law MLE, local clustering coefficient,
  * Benford screen, k-anonymity profile — plus the Borůvka minimum
  * spanning forest, Douglas–Peucker trajectory simplification, and
  * interpolated Kneser–Ney bigram scoring. */
@SlowTest
class Round11cSpec extends SparkSpecBase {
  import spark.implicits._

  private def r3(x: Double): Double = math.floor(x * 1000 + 0.5) / 1000

  // --- Kaplan–Meier -----------------------------------------------------------

  test("kaplanMeier: hand-computed product-limit curve with censoring") {
    // cohort A: event@1, censor@2, event@3
    //   t=1: n=3, d=1 → S = 2/3
    //   t=2: n=2, d=0 (censor) → S holds at 2/3
    //   t=3: n=1, d=1 → factor 0 → S = exactly 0.0
    val df = Seq(("A", 1L, true), ("A", 2L, false), ("A", 3L, true))
      .toDF("cohort", "dur", "ev")
    val got = Analytics.kaplanMeier(df, Seq("cohort"), "dur", "ev")
      .select("t", "n_risk", "n_event", "n_censor", "survival")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L).copy(_5 = 0.0) === ((1L, 3L, 1L, 0L, 0.0)))
    assert(math.abs(got(1L)._5 - 2.0 / 3.0) < 1e-12)
    assert(got(2L).copy(_5 = 0.0) === ((2L, 2L, 0L, 1L, 0.0)))
    assert(math.abs(got(2L)._5 - 2.0 / 3.0) < 1e-12)
    assert(got(3L)._5 === 0.0, "d = n at the last duration must give EXACT 0")
  }

  test("kaplanMeier: with no censoring, S(t) is the empirical tail fraction") {
    val durs = Seq(5L, 1L, 3L, 3L, 2L, 8L, 1L, 4L)
    val df = durs.map(("all", _, true)).toDF("cohort", "dur", "ev")
    val got = Analytics.kaplanMeier(df, Seq("cohort"), "dur", "ev")
      .select("t", "survival").as[(Long, Double)].collect().toMap
    durs.distinct.foreach { t =>
      val expected = durs.count(_ > t).toDouble / durs.size
      assert(math.abs(got(t) - expected) < 1e-12,
        s"S($t) = ${got(t)}, empirical tail = $expected")
    }
  }

  test("kaplanMeier: censored entities hold the curve but shrink the risk set") {
    // all censored → no events → S stays exactly 1.0 at every duration
    val df = Seq(("c", 1L, false), ("c", 2L, false), ("c", 5L, false))
      .toDF("cohort", "dur", "ev")
    val s = Analytics.kaplanMeier(df, Seq("cohort"), "dur", "ev")
      .select("survival").as[Double].collect()
    assert(s.forall(_ === 1.0))
  }

  // --- fractional ranks / Spearman -------------------------------------------

  test("fractionalRank: ties take the average rank") {
    val df = Seq(10, 20, 20, 30).toDF("v")
    val got = Analytics.fractionalRank(df, "v", "rk")
      .select("v", "rk").as[(Int, Double)].collect().toMap
    assert(got(10) === 1.0)
    assert(got(20) === 2.5)
    assert(got(30) === 4.0)
  }

  test("spearmanMatrix: monotone nonlinear relation scores exactly ±1") {
    val df = (1 to 50).map(i => (i.toDouble, i.toDouble * i * i, -i.toDouble))
      .toDF("a", "b", "c")
    val got = Analytics.spearmanMatrix(df, Seq("a", "b", "c"))
      .select("col_x", "col_y", "rho").as[(String, String, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(got(("a", "b")) - 1.0) < 1e-12)
    assert(math.abs(got(("a", "c")) + 1.0) < 1e-12)
    assert(math.abs(got(("b", "c")) + 1.0) < 1e-12)
  }

  test("spearmanMatrix matches a driver-side Pearson-over-average-ranks") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      (rnd.nextInt(10).toDouble, rnd.nextInt(10).toDouble)
    }
    val got = Analytics.spearmanMatrix(rows.toDF("x", "y"), Seq("x", "y"))
      .select("rho").as[Double].head()
    def avgRanks(vs: Seq[Double]): Seq[Double] = {
      val sorted = vs.sorted.zipWithIndex
      val avg = sorted.groupBy(_._1)
        .map { case (v, g) => v -> g.map(_._2 + 1.0).sum / g.size }
      vs.map(avg)
    }
    val (rx, ry) = (avgRanks(rows.map(_._1)), avgRanks(rows.map(_._2)))
    val n = rx.size
    val (mx, my) = (rx.sum / n, ry.sum / n)
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val sx = math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum)
    val sy = math.sqrt(ry.map(b => (b - my) * (b - my)).sum)
    val expected = cov / (sx * sy)
    assert(math.abs(got - expected) < 1e-9, s"spark $got vs driver $expected")
  }

  // --- association ------------------------------------------------------------

  test("association: identical columns give V = 1 and MI = entropy") {
    // b === a, 3 uniform classes over 30 rows: V = 1, MI = ln 3
    val df = (1 to 30).map(i => (s"c${i % 3}", s"c${i % 3}")).toDF("a", "b")
    val got = Analytics.association(df, "a", "b")
      .select("n_total", "mi", "cramers_v")
      .as[(Long, Double, Double)].head()
    assert(got._1 === 30L)
    assert(math.abs(got._2 - math.log(3.0)) < 1e-12)
    assert(math.abs(got._3 - 1.0) < 1e-12)
  }

  test("association: independent columns give MI = 0, V = 0") {
    // full product design: every (a, b) cell equally likely
    val df = (for { a <- 0 until 3; b <- 0 until 4 } yield (s"a$a", s"b$b"))
      .toDF("a", "b")
    val got = Analytics.association(df, "a", "b")
      .select("mi", "chi2", "cramers_v").as[(Double, Double, Double)].head()
    assert(math.abs(got._1) < 1e-12)
    assert(math.abs(got._2) < 1e-12)
    assert(math.abs(got._3) < 1e-12)
  }

  test("association: a constant column surfaces NULL V, not zero") {
    val df = (1 to 10).map(i => ("only", s"b${i % 2}")).toDF("a", "b")
    val got = Analytics.association(df, "a", "b")
      .select(col("cramers_v")).collect().head
    assert(got.isNullAt(0), "V with a constant margin is undefined")
  }

  // --- Gini --------------------------------------------------------------------

  test("gini: uniform values score 0, a single holder scores (n-1)/n") {
    val df = Seq(("even", 5.0, 1L), ("even", 5.0, 2L), ("even", 5.0, 3L),
      ("even", 5.0, 4L),
      ("mono", 0.0, 1L), ("mono", 0.0, 2L), ("mono", 0.0, 3L),
      ("mono", 10.0, 4L)).toDF("g", "x", "id")
    val got = Analytics.gini(df, Seq("g"), "x", Seq("id"))
      .select("g", "gini").as[(String, Double)].collect().toMap
    assert(math.abs(got("even")) < 1e-12)
    assert(math.abs(got("mono") - 0.75) < 1e-12)
  }

  test("gini: zero-sum group emits null, not a division blowup") {
    val df = Seq(("z", 0.0, 1L), ("z", 0.0, 2L)).toDF("g", "x", "id")
    val row = Analytics.gini(df, Seq("g"), "x", Seq("id"))
      .select(col("gini")).collect().head
    assert(row.isNullAt(0))
  }

  test("gini: a negative value fails loudly in-plan, never a silent out-of-range G") {
    val df = Seq(("n", 5.0, 1L), ("n", -1.0, 2L)).toDF("g", "x", "id")
    val e = intercept[Exception] {
      Analytics.gini(df, Seq("g"), "x", Seq("id")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("undefined below 0")), msgs(e).mkString(" | "))
  }

  test("fractionalRank: the maxDistinct gate refuses a corpus-sized broadcast") {
    // the gate is IN-PLAN (raise_error riding the rank window), so the
    // refusal surfaces as a runtime SparkException chain, not a submit-
    // time require — walk the causes for the contract message
    val cont = (1 to 5000).map(_.toDouble + 0.123).toDF("v")
    val e = intercept[Throwable] {
      Analytics.fractionalRank(cont, "v", "rk", maxDistinct = 100L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("maxDistinct")), msgs(e).mkString(" | "))
  }

  // --- power-law MLE -------------------------------------------------------------

  test("powerlawAlpha matches the hand-computed Clauset estimator") {
    val xs = Seq(5L, 7L, 12L, 30L, 5L, 9L)
    val df = (xs ++ Seq(1L, 2L, 3L)).toDF("x") // sub-xmin rows must drop
    val got = Analytics.powerlawAlpha(df, "x", xmin = 5L)
      .select("n", "alpha").as[(Long, Double)].head()
    val sl = xs.map(x => math.log(x / 4.5)).sum
    assert(got._1 === xs.size.toLong)
    assert(math.abs(got._2 - (1.0 + xs.size / sl)) < 1e-12)
  }

  test("powerlawAlpha: empty tail surfaces null alpha") {
    val row = Analytics.powerlawAlpha(Seq(1L, 2L).toDF("x"), "x", xmin = 10L)
      .select(col("alpha")).collect().head
    assert(row.isNullAt(0))
  }

  // --- local clustering coefficient ----------------------------------------------

  test("clusteringCoefficient: K4 is all-1, a pendant node is null") {
    // K4 on {1,2,3,4} plus pendant 5—1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L)).toDF("a", "b")
    val got = Analytics.clusteringCoefficient(edges, "a", "b")
      .select("node", "degree", "n_tri", "coef")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    // node 1 gains the pendant: deg 4, still 3 triangles → 3/C(4,2) = 0.5
    assert(got(1L) === ((1L, 4L, 3L, Some(0.5))))
    Seq(2L, 3L, 4L).foreach { n =>
      assert(got(n) === ((n, 3L, 3L, Some(1.0))))
    }
    assert(got(5L)._2 === 1L)
    assert(got(5L)._4.isEmpty, "degree-1 coefficient is undefined → null")
  }

  test("clusteringCoefficient per-node counts reconcile with the triangle total") {
    // deterministic pseudo-random graph
    val edges = (1 to 300)
      .map(i => ((i * 37) % 23).toLong -> ((i * i * 11 + 5) % 23).toLong)
      .toDF("a", "b")
    val total = Analytics.triangles(edges, "a", "b")
      .as[Long].head()
    val perNodeSum = Analytics.clusteringCoefficient(edges, "a", "b")
      .agg(sum("n_tri")).as[Long].head()
    assert(perNodeSum === 3 * total,
      "each triangle must be counted at exactly its three members")
  }

  // --- Benford ---------------------------------------------------------------------

  test("benford: digit extraction survives the IEEE log10 =10 wraparound") {
    // all values lead with digit 1 — including 1000, where floor(log10)
    // evaluates to 2 in doubles and the quotient hits 10
    val df = Seq(1.0, 10.0, 100.0, 1000.0, 0.1, 0.0125, 19.9)
      .map(("g", _)).toDF("g", "x")
    val got = Quality.benford(df, Seq("g"), "x")
      .select("n", "mad").as[(Long, Double)].head()
    assert(got._1 === 7L)
    // all mass on digit 1: mad = (|1 - e1| + Σ_{d>1} e_d) / 9
    val e = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
    val expectedMad = (math.abs(1.0 - e.head) + e.tail.sum) / 9.0
    assert(math.abs(got._2 - expectedMad) < 1e-12)
  }

  test("benford: chi2 matches a driver-side replay on a near-Benford multiset") {
    val counts = Map(1 -> 30, 2 -> 18, 3 -> 12, 4 -> 10, 5 -> 8, 6 -> 7,
      7 -> 6, 8 -> 5, 9 -> 5)
    val vals = counts.flatMap { case (d, n) => Seq.fill(n)(d * 1.0 + 0.01) }
    val got = Quality.benford(vals.map(("g", _)).toSeq.toDF("g", "x"),
        Seq("g"), "x")
      .select("chi2").as[Double].head()
    val n = counts.values.sum.toDouble
    val expected = counts.map { case (d, o) =>
      val e = math.log10(1.0 + 1.0 / d) * n
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(got - expected) < 1e-9)
  }

  // --- k-anonymity -------------------------------------------------------------------

  test("kAnonymity: class sizes, risky rows, and l-diversity are exact") {
    val df = Seq(
      // class (10, "a"): 3 rows, 1 distinct sensitive value → low diversity
      (10, "a", "s1"), (10, "a", "s1"), (10, "a", "s1"),
      // class (10, "b"): 1 row → risky at k=2, and trivially low-diversity
      (10, "b", "s2"),
      // class (20, "a"): 4 rows, 3 distinct sensitive values
      (20, "a", "s1"), (20, "a", "s2"), (20, "a", "s3"), (20, "a", "s1"),
      // null QI forms its own class: 2 rows
      (30, null.asInstanceOf[String], "s1"),
      (30, null.asInstanceOf[String], "s2")
    ).toDF("zip", "seg", "diag")
    val got = Quality.kAnonymity(df, Seq("zip", "seg"), k = 2,
        sensitiveCol = Some("diag"), l = 2)
      .select("n_rows", "n_classes", "risky_classes", "risky_rows",
        "min_class_size", "low_diversity_classes")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((10L, 4L, 1L, 1L, 1L, 2L)))
  }

  test("kAnonymity without a sensitive column leaves the diversity count null") {
    val df = Seq((1, "x"), (1, "x")).toDF("q1", "q2")
    val row = Quality.kAnonymity(df, Seq("q1", "q2"), k = 2)
      .select(col("low_diversity_classes")).collect().head
    assert(row.isNullAt(0))
  }

  // --- Borůvka minimum spanning forest -----------------------------------------

  test("minimumSpanningForest: hand-checked MST on a weighted graph") {
    //   1-2 w1, 2-3 w2, 1-3 w10 (cycle: the w10 edge must lose),
    //   3-4 w3; parallel 1-2 w5 collapses; self-loop 4-4 drops
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 1L, 10.0),
      (3L, 4L, 3.0), (2L, 1L, 5.0), (4L, 4L, 0.1)).toDF("a", "b", "w")
    val got = Analytics.minimumSpanningForest(edges, "a", "b", "w")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 4L, 3.0)))
  }

  test("minimumSpanningForest matches driver-side Kruskal on a random graph") {
    val rnd = new scala.util.Random(13)
    val raw = (1 to 400).map { _ =>
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
      (a, b, rnd.nextInt(1000).toDouble)
    }.filter(e => e._1 != e._2)
    val got = Analytics.minimumSpanningForest(
      raw.toDF("a", "b", "w"), "a", "b", "w")
      .as[(Long, Long, Double)].collect()
    // driver Kruskal with the SAME (w, u, v) tie order
    val norm = raw.map { case (a, b, w) =>
      (math.min(a, b), math.max(a, b), w)
    }.groupBy(e => (e._1, e._2)).map(_._2.minBy(_._3)).toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val kruskal = norm.sortBy(e => (e._3, e._1, e._2)).filter { case (u, v, _) =>
      val (ru, rv) = (find(u), find(v))
      if (ru == rv) false else { parent(ru) = rv; true }
    }
    assert(got.length === kruskal.length, "forest edge count (V - components)")
    assert(math.abs(got.map(_._3).sum - kruskal.map(_._3).sum) < 1e-9,
      "total forest weight must equal Kruskal's")
  }

  test("minimumSpanningForest: disconnected input yields one tree per component") {
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), // component A: 3 nodes
      (10L, 11L, 1.0)) // component B: 2 nodes
      .toDF("a", "b", "w")
    val got = Analytics.minimumSpanningForest(edges, "a", "b", "w").collect()
    assert(got.length === 3, "(3-1) + (2-1) forest edges")
  }

  // --- Douglas–Peucker simplification ------------------------------------------

  test("simplify: collinear interior points vanish, a real corner survives") {
    // y = 0 along x = 0..4 except a spike at x=2
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (2.0, 5.0), (3.0, 0.0), (4.0, 0.0))
      .zipWithIndex.map { case ((x, y), i) => ("t1", i.toLong, x, y) }
      .toDF("traj", "seq", "x", "y")
    val kept = Trajectory.simplify(pts, Seq("traj"), "seq", "x", "y",
      epsilon = 1.0).select("seq").as[Long].collect().sorted
    // endpoints + the spike + its shoulders (they deviate > 1 from the
    // post-split chords (0,0)->(2,5) and (2,5)->(4,0))
    assert(kept.contains(2L), "the spike must survive")
    assert(kept.head === 0L && kept.last === 4L, "endpoints always survive")
    val keptFlat = Trajectory.simplify(pts, Seq("traj"), "seq", "x", "y",
      epsilon = 100.0).select("seq").as[Long].collect().sorted
    assert(keptFlat.toSeq === Seq(0L, 4L), "epsilon above the spike keeps endpoints only")
  }

  test("simplify matches a driver-side recursive Douglas-Peucker") {
    val rnd = new scala.util.Random(29)
    val trajs = (1 to 5).map { t =>
      val n = 30 + rnd.nextInt(20)
      (s"t$t", (0 until n).map(i =>
        (i.toLong, i.toDouble, rnd.nextDouble() * 10)))
    }
    val df = trajs.flatMap { case (t, ps) =>
      ps.map(p => (t, p._1, p._2, p._3))
    }.toDF("traj", "seq", "x", "y")
    val eps = 2.0
    val got = Trajectory.simplify(df, Seq("traj"), "seq", "x", "y", eps)
      .select("traj", "seq").as[(String, Long)].collect()
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).toSet }
    def dp(ps: Vector[(Long, Double, Double)]): Set[Long] = {
      if (ps.length <= 2) ps.map(_._1).toSet
      else {
        val (s, e) = (ps.head, ps.last)
        val (dx, dy) = (e._2 - s._2, e._3 - s._3)
        val chord = math.sqrt(dx * dx + dy * dy)
        val devs = ps.tail.init.map { p =>
          val d = if (chord == 0)
            math.sqrt((p._2 - s._2) * (p._2 - s._2) +
              (p._3 - s._3) * (p._3 - s._3))
          else math.abs(dx * (s._3 - p._3) - (s._2 - p._2) * dy) / chord
          (p, d)
        }
        val (mp, md) = devs.maxBy { case (p, d) => (d, -p._1) }
        if (md <= eps) Set(s._1, e._1)
        else {
          val i = ps.indexWhere(_._1 == mp._1)
          dp(ps.take(i + 1)) ++ dp(ps.drop(i))
        }
      }
    }
    trajs.foreach { case (t, ps) =>
      assert(got(t) === dp(ps.toVector), s"trajectory $t diverged")
    }
  }

  test("simplify: epsilon 0 keeps every point of a strictly convex track") {
    // y = x² — no three points collinear, so nothing is droppable at ε=0
    val pts = (0 until 10).map(i => ("z", i.toLong, i.toDouble,
      (i * i).toDouble)).toDF("traj", "seq", "x", "y")
    val kept = Trajectory.simplify(pts, Seq("traj"), "seq", "x", "y", 0.0)
      .count()
    assert(kept === 10L)
  }

  // --- Kneser-Ney --------------------------------------------------------------

  test("knBigramScore: discounted probabilities sum to 1 per context") {
    // model property: Σ_w2 P_KN(w2 | w1) = 1 for every seen context —
    // verify by replaying the model tables driver-side on a tiny corpus
    val docs = Seq((1L, "a b a b c"), (2L, "a c a b")).toDF("doc_id", "text")
    val toks = Seq("a b a b c", "a c a b").flatMap(_.split(" ").sliding(2)
      .map(p => (p(0), p(1))))
    val big = toks.groupBy(identity).map { case (k, g) => k -> g.size.toDouble }
    val ctx = big.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> (m.values.sum, m.size) }
    val cont = big.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size }
    val types = big.size.toDouble
    val d = 0.75
    val vocab = big.keys.map(_._2).toSet ++ big.keys.map(_._1).toSet
    ctx.keys.foreach { w1 =>
      val (cSum, _) = ctx(w1)
      val mass = vocab.toSeq.map { w2 =>
        val c = big.getOrElse((w1, w2), 0.0)
        val n1pF = ctx(w1)._2
        val pCont = cont.getOrElse(w2, 0) / types
        (math.max(c - d, 0.0) + d * n1pF * pCont) / cSum
      }.sum
      assert(math.abs(mass - 1.0) < 1e-9, s"context $w1 mass $mass")
    }
    // and the Spark side scores every doc with a finite negative mean ln P
    val got = Text.knBigramScore(docs, "doc_id", "text")
      .select("kn_logprob").as[Double].collect()
    assert(got.forall(v => v < 0 && !v.isNaN && !v.isInfinite))
  }

  test("knBigramScore ranks a repeated-transition doc above word salad") {
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat"),
      (2L, "mat the on cat sat mat on the sat cat the")
    ).toDF("doc_id", "text")
    // corpus context: many docs sharing doc-1's transitions
    val corpus = (3L to 12L).map(i =>
      (i, "the cat sat on the mat")).toDF("doc_id", "text")
    val got = Text.knBigramScore(docs.union(corpus), "doc_id", "text")
      .select("id", "kn_logprob").as[(Long, Double)].collect().toMap
    assert(got(1L) > got(2L),
      "fluent transitions must outscore the same tokens shuffled")
  }

  test("knBigramScore: sub-2-token docs surface null score, not a crash") {
    val docs = Seq((1L, "single"), (2L, "a b")).toDF("doc_id", "text")
    val got = Text.knBigramScore(docs, "doc_id", "text")
      .select("id", "n_bigrams").as[(Long, Long)].collect().toMap
    assert(got(1L) === 0L)
    assert(got(2L) === 1L)
  }

  // --- Mann-Whitney U ------------------------------------------------------------

  test("mannWhitneyU matches the hand-worked rank-sum with ties") {
    // A = {1, 2, 2}, B = {2, 3}: ranks 1, 3, 3, 3, 5 (tie group of 3 at v=2)
    // R_a = 1 + 3 + 3 = 7; U = 7 - 3·4/2 = 1
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val got = Quality.mannWhitneyU(df, "v", "g", "a", "b")
      .select("u", "n_a", "n_b", "z").as[(Double, Long, Long, Double)].head()
    assert(got._1 === 1.0)
    assert((got._2, got._3) === ((3L, 2L)))
    // z: mu = 3, var = (6/12)·(6 − (27−3)/(5·4)) = 0.5·4.8 = 2.4
    val expectedZ = (1.0 - 3.0) / math.sqrt(2.4)
    assert(math.abs(got._4 - expectedZ) < 1e-12)
  }

  test("mannWhitneyU: a clean shift scores strongly negative z") {
    val df = ((1 to 50).map(i => ("lo", i.toDouble)) ++
      (1 to 50).map(i => ("hi", i + 100.0))).toDF("g", "v")
    val z = Quality.mannWhitneyU(df, "v", "g", "lo", "hi")
      .select("z").as[Double].head()
    assert(z < -8.0, s"complete separation must give extreme z, got $z")
  }

  test("mannWhitneyU: all-tied input surfaces null z") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val row = Quality.mannWhitneyU(df, "v", "g", "a", "b")
      .select(col("z")).collect().head
    assert(row.isNullAt(0))
  }

  // --- feature propagation ---------------------------------------------------------------

  test("featurePropagate matches a driver-side multi-hop reference") {
    import graft.operators.Similarity
    // path graph 1-2-3 plus isolated 4
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val feats = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)),
      (3L, Array(1.0, 1.0)), (4L, Array(5.0, 5.0)))
    val got = Similarity.featurePropagate(edges, "a", "b",
        feats.toDF("id", "v"), "id", "v", hops = 2, selfWeight = 0.5)
      .select("id", "v_out").as[(Long, Array[Double])].collect().toMap
    // driver reference
    val adj = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L))
    var cur = feats.toMap
    for (_ <- 1 to 2) {
      cur = cur.map { case (id, v) =>
        adj.get(id) match {
          case Some(ns) =>
            val m = ns.map(cur).transpose.map(c => c.sum / c.size)
            id -> v.zip(m).map { case (o, n) => 0.5 * o + 0.5 * n }
          case None => id -> v
        }
      }
    }
    got.foreach { case (id, v) =>
      v.zip(cur(id)).foreach { case (g, r) =>
        assert(math.abs(g - r) < 1e-12, s"node $id: ${v.toSeq} vs ${cur(id).toSeq}")
      }
    }
    assert(got(4L).toSeq === Seq(5.0, 5.0), "isolated node unchanged")
  }

  test("featurePropagate: a star hub averages all spokes, dim order preserved") {
    import graft.operators.Similarity
    val edges = (2L to 21L).map((1L, _)).toDF("a", "b")
    val feats = ((1L, Array(0.0, 0.0)) +:
      (2L to 21L).map(i => (i, Array(i.toDouble, -i.toDouble))))
      .toDF("id", "v")
    val got = Similarity.featurePropagate(edges, "a", "b", feats, "id", "v",
        hops = 1, selfWeight = 0.0)
      .filter(col("id") === 1L).select("v_out").as[Array[Double]].head()
    val m = (2L to 21L).map(_.toDouble).sum / 20
    assert(math.abs(got(0) - m) < 1e-12 && math.abs(got(1) + m) < 1e-12)
  }

  // --- negative sampling ---------------------------------------------------------------

  test("negativeSample: k draws per pair, frequency-proportional, deterministic") {
    val pairs = (1 to 50).map(i => (i.toLong, s"it${i % 3}"))
      .toDF("anchor", "item").distinct()
    val freqs = Seq(("it0", 1000L), ("it1", 100L), ("it2", 10L), ("dead", 0L))
      .toDF("item", "freq")
    def run() = graft.operators.Sampling.negativeSample(
      pairs, "anchor", "item", freqs, "item", "freq", k = 4)
    val got = run().collect()
    assert(got.length === pairs.count() * 4, "exactly k rows per pair")
    // zero-frequency items can never be drawn
    assert(!got.exists(_.getAs[String]("negative") == "dead"))
    // heavier items draw more often (freq^0.75 ordering preserved)
    val byNeg = got.groupBy(_.getAs[String]("negative")).view.mapValues(_.length)
    assert(byNeg.getOrElse("it0", 0) > byNeg.getOrElse("it1", 0))
    assert(byNeg.getOrElse("it1", 0) > byNeg.getOrElse("it2", 0))
    // deterministic rerun
    assert(run().collect().map(_.toString).sorted.toSeq ===
      got.map(_.toString).sorted.toSeq)
  }

  test("negativeSample: accidental hits are kept and flagged") {
    val pairs = Seq((1L, "only")).toDF("anchor", "item")
    val freqs = Seq(("only", 5L)).toDF("item", "freq")
    val got = graft.operators.Sampling.negativeSample(
      pairs, "anchor", "item", freqs, "item", "freq", k = 2)
      .select("negative", "accidental_hit").as[(String, Boolean)].collect()
    assert(got.length === 2)
    assert(got.forall(r => r._1 == "only" && r._2),
      "a 1-item vocab can only ever hit the positive — flagged, not dropped")
  }

  // --- CUPED / diff-in-diff ----------------------------------------------------------

  test("cuped: a metric predicted by its covariate collapses variance; lift survives") {
    val rnd = new scala.util.Random(5)
    // y = x + small noise + a +10 lift for variant 1
    val units = (1 to 400).map { i =>
      val x = rnd.nextDouble() * 100
      val v = i % 2
      (v.toLong, x + rnd.nextDouble() * 2 + (if (v == 1) 10.0 else 0.0), x)
    }.toDF("variant", "y", "x")
    val got = Analytics.cuped(units, "variant", "y", "x")
      .select("variant", "mean_raw", "mean_cuped", "var_raw", "var_cuped")
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // variance must collapse by ~corr² (here corr ≈ 1 → >50× reduction)
    got.values.foreach { r =>
      assert(r._5 < r._4 / 50,
        s"variant ${r._1}: var ${r._4} -> ${r._5} is not a real reduction")
    }
    // the lift is preserved by the adjustment (same theta both variants)
    val liftRaw = got(1L)._2 - got(0L)._2
    val liftAdj = got(1L)._3 - got(0L)._3
    assert(math.abs(liftAdj - 10.0) < 1.0, s"adjusted lift $liftAdj")
    assert(math.abs(liftRaw - liftAdj) < 5.0, "adjustment must not destroy the effect")
  }

  test("cuped: constant covariate degrades to a no-op, not a blowup") {
    val units = Seq((0L, 5.0, 1.0), (1L, 7.0, 1.0), (0L, 6.0, 1.0),
      (1L, 8.0, 1.0)).toDF("variant", "y", "x")
    val got = Analytics.cuped(units, "variant", "y", "x")
      .select("theta", "mean_raw", "mean_cuped")
      .as[(Double, Double, Double)].collect()
    got.foreach { r =>
      assert(r._1 === 0.0)
      assert(r._2 === r._3, "theta 0 → adjusted ≡ raw")
    }
  }

  test("diffInDiff cancels group offsets and period shocks exactly") {
    // control: pre 10, post 13 (shock +3); treated: pre 20, post 28
    // (offset +10, shock +3, effect +5) → did = 5
    val rows =
      Seq.fill(30)(("0", "pre", 10.0)) ++ Seq.fill(30)(("0", "post", 13.0)) ++
      Seq.fill(30)(("1", "pre", 20.0)) ++ Seq.fill(30)(("1", "post", 28.0))
    val got = Analytics.diffInDiff(rows.toDF("variant", "period", "v"),
        "variant", "1", "period", "post", "v")
      .select("did").as[Double].head()
    assert(math.abs(got - 5.0) < 1e-12)
  }

  test("diffInDiff: an empty cell nulls the estimate loudly") {
    val rows = Seq(("0", "pre", 1.0), ("0", "post", 2.0), ("1", "post", 9.0))
    val r = Analytics.diffInDiff(rows.toDF("variant", "period", "v"),
      "variant", "1", "period", "post", "v")
      .select(col("did")).collect().head
    assert(r.isNullAt(0))
  }

  // --- isotonic regression ---------------------------------------------------------

  test("isotonicFit matches a driver-side PAV on random data") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 200).map(i =>
      ("g", (i % 40).toDouble, rnd.nextDouble() * 10))
    val got = Quality.isotonicFit(pts.toDF("g", "x", "y"), "g", "x", "y")
      .select("x", "y_fit").as[(Double, Double)].collect().toMap
    // driver PAV over x-pooled means
    val pooled = pts.groupBy(_._2).toSeq.sortBy(_._1).map { case (x, g) =>
      (x, g.map(_._3).sum, g.size.toDouble)
    }
    val w = scala.collection.mutable.ArrayBuffer[Double]()
    val s = scala.collection.mutable.ArrayBuffer[Double]()
    val span = scala.collection.mutable.ArrayBuffer[Int]()
    pooled.foreach { case (_, sy, n) =>
      w += n; s += sy; span += 1
      while (w.length >= 2 &&
        s(s.length - 1) / w(w.length - 1) < s(s.length - 2) / w(w.length - 2)) {
        val i = w.length - 2
        w(i) += w.remove(i + 1); s(i) += s.remove(i + 1)
        span(i) += span.remove(i + 1)
      }
    }
    val ref = scala.collection.mutable.Map[Double, Double]()
    var idx = 0
    for (b <- w.indices; _ <- 0 until span(b)) {
      ref(pooled(idx)._1) = s(b) / w(b); idx += 1
    }
    assert(got.keySet === ref.keySet)
    got.foreach { case (x, f) =>
      assert(math.abs(f - ref(x)) < 1e-9, s"x=$x: $f vs ${ref(x)}")
    }
    // and the fit is nondecreasing in x
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    sorted.sliding(2).foreach(p =>
      assert(p(0) <= p(1) + 1e-12, "isotonic fit must be nondecreasing"))
  }

  test("isotonicFit: already-monotone means pass through untouched") {
    val pts = Seq(("g", 1.0, 1.0), ("g", 2.0, 3.0), ("g", 3.0, 7.0))
      .toDF("g", "x", "y")
    val got = Quality.isotonicFit(pts, "g", "x", "y")
      .select("x", "y_fit").as[(Double, Double)].collect().toMap
    assert(got === Map(1.0 -> 1.0, 2.0 -> 3.0, 3.0 -> 7.0))
  }

  // --- Huber robust mean -------------------------------------------------------------

  test("huberMean shrugs off an outlier that drags the plain mean") {
    val clean = (1 to 20).map(i => ("u", 10.0 + (i % 5)))
    val df = (clean :+ (("u", 100000.0))).toDF("g", "v")
    val got = Quality.huberMean(df, Seq("g"), "v")
      .select("huber_mean").as[Double].head()
    val mean = (clean.map(_._2).sum + 100000.0) / 21
    assert(got < 15.0, s"huber mean $got must stay near the clean data")
    assert(mean > 4000, "the plain mean is wrecked (sanity)")
  }

  test("huberMean matches a driver-side one-step W-estimator replay") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 100.0, 5.0, 2.5)
    val got = Quality.huberMean(vals.map(("g", _)).toDF("g", "v"), Seq("g"), "v")
      .select("median", "mad", "huber_mean")
      .as[(Double, Double, Double)].head()
    def posMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      (s(((n + 1) / 2) - 1) + s(n / 2)) / 2.0
    }
    val med = posMedian(vals)
    val mad = posMedian(vals.map(v => math.abs(v - med)))
    val ws = vals.map { v =>
      val r = math.abs(v - med)
      // k is calibrated in sigma units: scale = MAD/0.6745 (matches the op)
      if (mad == 0 || r == 0) 1.0 else math.min(1.0, 1.345 * (mad / 0.6745) / r)
    }
    val ref = ws.zip(vals).map { case (w, v) => w * v }.sum / ws.sum
    assert(math.abs(got._1 - med) < 1e-12)
    assert(math.abs(got._2 - mad) < 1e-12)
    assert(math.abs(got._3 - ref) < 1e-9, s"${got._3} vs $ref")
  }

  test("huberMean: an all-identical group returns the median, not NaN") {
    val df = Seq(("z", 7.0), ("z", 7.0), ("z", 7.0)).toDF("g", "v")
    val got = Quality.huberMean(df, Seq("g"), "v")
      .select("mad", "huber_mean").as[(Double, Double)].head()
    assert(got === ((0.0, 7.0)))
  }

  // --- Welch's t -------------------------------------------------------------------

  test("welchTTest matches a driver-side computation with unequal variances") {
    val a = Seq(10.0, 12.0, 9.0, 11.0, 13.0)
    val b = Seq(20.0, 30.0, 10.0, 40.0)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val got = Quality.welchTTest(df, "v", "g", "a", "b")
      .select("n_a", "n_b", "mean_a", "mean_b", "t", "dof")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    def stats(x: Seq[Double]) = {
      val n = x.size.toDouble; val m = x.sum / n
      (n, m, x.map(v => (v - m) * (v - m)).sum / (n - 1))
    }
    val (na, ma, va) = stats(a); val (nb, mb, vb) = stats(b)
    val se = va / na + vb / nb
    val tRef = (ma - mb) / math.sqrt(se)
    val dofRef = se * se /
      (math.pow(va / na, 2) / (na - 1) + math.pow(vb / nb, 2) / (nb - 1))
    assert((got._1, got._2) === ((5L, 4L)))
    assert(math.abs(got._3 - ma) < 1e-12 && math.abs(got._4 - mb) < 1e-12)
    assert(math.abs(got._5 - tRef) < 1e-9, s"t ${got._5} vs $tRef")
    assert(math.abs(got._6 - dofRef) < 1e-6, s"dof ${got._6} vs $dofRef")
  }

  test("welchTTest: singleton side and zero-variance pair surface null t") {
    val single = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r1 = Quality.welchTTest(single, "v", "g", "a", "b")
      .select(col("t")).collect().head
    assert(r1.isNullAt(0), "n_a = 1 has no variance estimate")
    val flat = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0))
      .toDF("g", "v")
    val r2 = Quality.welchTTest(flat, "v", "g", "a", "b")
      .select(col("t")).collect().head
    assert(r2.isNullAt(0), "zero pooled variance is undefined, not inf")
  }

  // --- Jensen-Shannon ------------------------------------------------------------

  test("jsDivergence: identical mixes 0, disjoint supports ln 2") {
    val same = Seq(("k1", "a"), ("k2", "a"), ("k1", "b"), ("k2", "b"))
      .toDF("k", "g")
    val js0 = Quality.jsDivergence(same, "k", "g", "a", "b")
      .select("jsd").as[Double].head()
    assert(math.abs(js0) < 1e-12)
    val disjoint = Seq(("k1", "a"), ("k2", "a"), ("k3", "b"), ("k4", "b"))
      .toDF("k", "g")
    val gotD = Quality.jsDivergence(disjoint, "k", "g", "a", "b")
      .select("jsd", "jsd_bits").as[(Double, Double)].head()
    assert(math.abs(gotD._1 - math.log(2.0)) < 1e-12)
    assert(math.abs(gotD._2 - 1.0) < 1e-12)
  }

  test("jsDivergence matches a driver-side replay on an uneven mix") {
    val rows = Seq.fill(30)(("x", "a")) ++ Seq.fill(10)(("y", "a")) ++
      Seq.fill(10)(("x", "b")) ++ Seq.fill(30)(("y", "b"))
    val got = Quality.jsDivergence(rows.toDF("k", "g"), "k", "g", "a", "b")
      .select("jsd").as[Double].head()
    val p = Map("x" -> 0.75, "y" -> 0.25); val q = Map("x" -> 0.25, "y" -> 0.75)
    val expected = Seq("x", "y").map { k =>
      val m = (p(k) + q(k)) / 2
      p(k) * math.log(p(k) / m) / 2 + q(k) * math.log(q(k) / m) / 2
    }.sum
    assert(math.abs(got - expected) < 1e-12)
  }

  // --- Theil-Sen -------------------------------------------------------------------

  test("theilSen recovers the clean slope through one wild outlier") {
    // y = 3x except one corrupted point; OLS would bend, the median won't
    val pts = (1 to 11).map(i =>
      ("u", i.toDouble, if (i == 6) 1000.0 else 3.0 * i))
      .toDF("g", "x", "y")
    val got = Analytics.theilSen(pts, Seq("g"), "x", "y")
      .select("slope").as[Double].head()
    assert(math.abs(got - 3.0) < 1e-12,
      s"median slope must ignore the outlier, got $got")
  }

  test("theilSen: even pair count averages the two middle slopes") {
    // 3 points, all x distinct -> 3 pairs (odd); use 4 points -> 6 pairs
    val pts = Seq(("g", 0.0, 0.0), ("g", 1.0, 1.0), ("g", 2.0, 4.0),
      ("g", 3.0, 9.0)).toDF("g", "x", "y")
    val got = Analytics.theilSen(pts, Seq("g"), "x", "y")
      .select("n_pairs", "slope").as[(Long, Double)].head()
    // slopes: 1, 2, 3 | 3, 4 | 5 -> sorted 1,2,3,3,4,5 -> median (3+3)/2 = 3
    assert(got === ((6L, 3.0)))
  }

  test("theilSen: the max-group gate refuses a quadratic blowup loudly") {
    // the gate is IN-PLAN (raise_error riding the self-join's own
    // shuffle-by-group), so the refusal surfaces as a runtime
    // SparkException chain, not a submit-time require
    val big = (1 to 100).map(i => ("g", i.toDouble, i.toDouble))
      .toDF("g", "x", "y")
    val e = intercept[Throwable] {
      Analytics.theilSen(big, Seq("g"), "x", "y", maxGroup = 50).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("maxGroup")), msgs(e).mkString(" | "))
  }

  // --- random walks ----------------------------------------------------------------

  test("randomWalks: every transition follows an edge, walks have full length") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    val walks = Analytics.randomWalks(edges, "a", "b",
      walksPerNode = 2, walkLen = 3)
      .select("walk_id", "step", "node").as[(String, Int, Long)].collect()
    val byWalk = walks.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3))
    assert(byWalk.size === 8, "4 nodes x 2 walks")
    val adj = Set((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .flatMap { case (a, b) => Set((a, b), (b, a)) }
    byWalk.foreach { case (id, path) =>
      assert(path.length === 4, s"walk $id must have walkLen+1 nodes")
      path.sliding(2).foreach { s =>
        assert(adj.contains((s(0), s(1))), s"walk $id jumped $s off-graph")
      }
    }
  }

  test("randomWalks: a rerun regenerates the identical corpus") {
    val edges = (1 to 200)
      .map(i => ((i * 7 % 17).toLong, (i * 13 % 17).toLong))
      .filter(e => e._1 != e._2).toDF("a", "b")
    def run() = Analytics.randomWalks(edges, "a", "b", 1, 4)
      .select("walk_id", "step", "node").as[(String, Int, Long)]
      .collect().toSet
    assert(run() === run(), "hash-argmin walks must be deterministic")
  }

  // --- shortest paths -------------------------------------------------------------

  test("shortestPaths matches driver-side Dijkstra on a random weighted graph") {
    val rnd = new scala.util.Random(41)
    val raw = (1 to 300).map { _ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong,
        (rnd.nextInt(20) + 1).toDouble)
    }.filter(e => e._1 != e._2)
    val got = Analytics.shortestPaths(raw.toDF("a", "b", "w"), "a", "b", "w",
      sources = Seq(0L))
      .as[(Long, Double)].collect().toMap
    // driver Dijkstra over the symmetric min-weight graph
    val adj = raw.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
      .groupBy(e => (e._1, e._2)).map { case ((a, b), g) =>
        (a, b, g.map(_._3).min) }
      .groupBy(_._1).map { case (a, g) => a -> g.map(e => (e._2, e._3)) }
    val distRef = scala.collection.mutable.Map(0L -> 0.0)
    val pq = scala.collection.mutable.PriorityQueue((0.0, 0L))(
      Ordering.by(-_._1))
    val doneSet = scala.collection.mutable.Set[Long]()
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (!doneSet(u)) {
        doneSet += u
        adj.getOrElse(u, Nil).foreach { case (v, w) =>
          if (d + w < distRef.getOrElse(v, Double.MaxValue)) {
            distRef(v) = d + w; pq.enqueue((d + w, v))
          }
        }
      }
    }
    assert(got.keySet === distRef.keySet, "reachable sets must agree")
    distRef.foreach { case (n, d) =>
      assert(math.abs(got(n) - d) < 1e-9, s"node $n: ${got(n)} vs $d")
    }
  }

  test("shortestPaths: multi-source gives distance to the NEAREST seed") {
    // path graph 1-2-3-4-5 with unit weights, seeds {1, 5}
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0),
      (4L, 5L, 1.0)).toDF("a", "b", "w")
    val got = Analytics.shortestPaths(edges, "a", "b", "w", Seq(1L, 5L))
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0, 4L -> 1.0, 5L -> 0.0))
  }

  test("shortestPaths: unreachable nodes are absent; negative weights refused") {
    val edges = Seq((1L, 2L, 1.0), (10L, 11L, 1.0)).toDF("a", "b", "w")
    val got = Analytics.shortestPaths(edges, "a", "b", "w", Seq(1L))
      .select("node").as[Long].collect().toSet
    assert(got === Set(1L, 2L), "the 10-11 island must be absent, not inf")
    val neg = Seq((1L, 2L, -1.0)).toDF("a", "b", "w")
    val e = intercept[IllegalArgumentException] {
      Analytics.shortestPaths(neg, "a", "b", "w", Seq(1L)).collect()
    }
    assert(e.getMessage.contains("negative"))
  }

  // --- seasonal decomposition -------------------------------------------------------

  test("seasonalDecompose: planted weekly pattern is recovered exactly") {
    // y = linear trend + exact period-7 seasonal, no noise
    val seasonal = Array(5.0, -3.0, 0.0, 2.0, -1.0, -4.0, 1.0) // sums to 0
    val pts = (0 until 70).map(i =>
      ("m", i.toLong, 100.0 + 0.0 * i + seasonal(i % 7)))
      .toDF("g", "t", "y")
    val got = Analytics.seasonalDecompose(pts, Seq("g"), "t", "y", period = 7)
      .select("t", "trend", "seasonal", "residual")
      .as[(Long, Double, Double, Double)].collect()
    assert(got.length === 70 - 6, "edge rows without a full window drop")
    got.foreach { case (t, trend, sea, resid) =>
      assert(math.abs(trend - 100.0) < 1e-9, s"flat trend at t=$t: $trend")
      assert(math.abs(sea - seasonal((t % 7).toInt)) < 1e-9)
      assert(math.abs(resid) < 1e-9, s"noiseless series → zero residual")
    }
  }

  test("seasonalDecompose: components reconstruct y exactly, even period works") {
    val rnd = new scala.util.Random(3)
    val pts = (0 until 48).map(i =>
      ("g", i.toLong, 10.0 + rnd.nextDouble() * 5))
      .toDF("g", "t", "y")
    val got = Analytics.seasonalDecompose(pts, Seq("g"), "t", "y", period = 4)
      .select("y", "trend", "seasonal", "residual")
      .as[(Double, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (y, tr, se, re) =>
      assert(math.abs(y - (tr + se + re)) < 1e-9, "additive identity")
    }
    // even-period trend: MA-2x4 of a LINEAR series is exact
    val lin = (0 until 20).map(i => ("l", i.toLong, 2.0 * i))
      .toDF("g", "t", "y")
    val linGot = Analytics.seasonalDecompose(lin, Seq("g"), "t", "y", 4)
      .select("t", "trend").as[(Long, Double)].collect()
    linGot.foreach { case (t, tr) =>
      assert(math.abs(tr - 2.0 * t) < 1e-9,
        s"2x4 MA must reproduce a linear trend exactly at t=$t")
    }
  }
}
