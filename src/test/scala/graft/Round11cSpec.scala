package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Quality}

/** Round-11 third wave: the statistics family — Kaplan–Meier survival,
  * fractional ranks / Spearman, categorical association (MI + Cramér's
  * V), Gini concentration, power-law MLE, local clustering coefficient,
  * Benford screen, k-anonymity profile. */
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
}
