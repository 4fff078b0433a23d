package graft

import graft.operators.{Analytics, Dedup, Quality, Text}
import org.apache.spark.sql.functions._

/** Randomized invariant tests for the Analytics family — seeded random
  * datasets (several shapes per invariant), asserting properties that
  * must hold for ANY input, not just the oracle tables. */
class AnalyticsProps extends SparkSpecBase {
  import spark.implicits._

  private def randomRows(seed: Long, n: Int): Seq[(Long, Double)] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)((rng.nextInt(4).toLong, rng.nextDouble() * 2000 - 1000))
  }

  test("zscore: per group, mean ≈ 0 and sample std ≈ 1 (non-degenerate groups)") {
    for (seed <- 1L to 3L) {
      val df = randomRows(seed, 40 + seed.toInt * 7).toDF("g", "v")
      val stats = Analytics.zscore(df, Seq("g"), "v")
        .groupBy("g")
        .agg(count(lit(1)).as("n"), avg("z").as("m"), stddev("z").as("s"))
        .filter(col("n") >= 2)
        .collect()
      stats.foreach { r =>
        assert(math.abs(r.getDouble(2)) < 1e-6, s"seed $seed: mean z != 0: $r")
        assert(math.abs(r.getDouble(3) - 1.0) < 1e-6, s"seed $seed: std z != 1: $r")
      }
    }
  }

  test("ewma: bounded by the window's min/max; constant series reproduces the constant") {
    for (seed <- 1L to 3L) {
      val rows = randomRows(seed, 60).zipWithIndex
        .map { case ((g, v), i) => (g, i.toLong, v) }
      val df = rows.toDF("g", "ts", "v")
      val w = 7
      val checked = Analytics.ewma(df, Seq("g"), "ts", "v", alpha = 0.4, window = w)
        .withColumn("lo", min("v").over(
          org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("ts")
            .rowsBetween(-(w - 1), 0)))
        .withColumn("hi", max("v").over(
          org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("ts")
            .rowsBetween(-(w - 1), 0)))
        .filter(col("ewma") < col("lo") - 1e-9 || col("ewma") > col("hi") + 1e-9)
      assert(checked.count() === 0, s"seed $seed: EWMA escaped its window's range")
      val const = (1 to 20).map(i => (1L, i.toLong, 42.5)).toDF("g", "ts", "v")
      val vals = Analytics.ewma(const, Seq("g"), "ts", "v", 0.3, 5)
        .select("ewma").as[Double].collect()
      assert(vals.forall(v => math.abs(v - 42.5) < 1e-9))
    }
  }

  test("mergeIntervals: spans disjoint+ordered, every input contained, mass preserved") {
    import graft.operators.Intervals
    for (seed <- 1L to 3L) {
      val rng = new scala.util.Random(seed)
      val iv = Seq.fill(80)((rng.nextInt(3).toLong, rng.nextInt(1000).toLong,
          rng.nextInt(200).toLong))
        .map { case (k, s, len) => (k, s, s + len) }.toDF("k", "s", "e")
      val spans = Intervals.mergeIntervals(iv, Seq("k"), "s", "e")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
      spans.values.foreach { ss =>
        ss.toSeq.sliding(2).foreach { pair =>
          if (pair.length == 2)
            assert(pair(1)._1 > pair(0)._2, s"seed $seed: spans overlap/touch")
        }
      }
      iv.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).foreach {
        case (k, s, e) =>
          assert(spans(k).exists { case (ss, se) => ss <= s && e <= se },
            s"seed $seed: input [$s,$e] of key $k not contained in any span")
      }
    }
  }

  test("weightedMedian: equal weights give the lower median; crossing holds >= half the mass") {
    import graft.operators.Quality
    for (seed <- 1L to 3L) {
      val rng = new scala.util.Random(seed)
      val vals = Seq.fill(31)(rng.nextInt(1000).toDouble)
      val df = vals.map(v => (1L, v, 2.0)).toDF("g", "v", "w")
      val wm = Quality.weightedMedian(df, Seq("g"), "v", "w").head.getDouble(1)
      val sorted = vals.sorted
      assert(wm === sorted(15), s"seed $seed: equal-weight median != middle element")
      // random weights: at least half the total weight sits at <= wm
      val wdf = vals.map(v => (1L, v, (rng.nextInt(9) + 1).toDouble)).toDF("g", "v", "w")
      val wm2 = Quality.weightedMedian(wdf, Seq("g"), "v", "w").head.getDouble(1)
      val rows = wdf.collect().map(r => (r.getDouble(1), r.getDouble(2)))
      val tot = rows.map(_._2).sum
      assert(rows.filter(_._1 <= wm2).map(_._2).sum >= tot / 2 - 1e-9, s"seed $seed")
    }
  }

  test("ntile: bucket sizes differ by at most one within each group") {
    for (seed <- 1L to 3L) {
      val df = randomRows(seed, 50).toDF("g", "v")
      val spread = Analytics.ntileBucket(df, Seq("g"), 4, Seq(col("v").asc))
        .groupBy("g", "bucket").count()
        .groupBy("g").agg((max("count") - min("count")).as("spread"))
        .agg(max("spread")).head.getLong(0)
      assert(spread <= 1L, s"seed $seed")
    }
  }

  test("histogram: bucket counts sum to the input row count") {
    for (seed <- 1L to 3L) {
      val rows = randomRows(seed, 30 + seed.toInt * 11)
      val total = Analytics.histogram(rows.toDF("g", "v"), "v", 37.5)
        .agg(sum("n")).head.getLong(0)
      assert(total === rows.length.toLong, s"seed $seed")
    }
  }

  test("winsorize: output bounded by the quantile band, inliers unchanged") {
    for (seed <- 1L to 3L) {
      val df = randomRows(seed, 60).toDF("g", "v")
      val w = Quality.winsorize(df, Seq("g"), "v", 0.1, 0.9)
      assert(w.filter(col("winsorized") < col("p10") - 1e-9 ||
        col("winsorized") > col("p90") + 1e-9).count() === 0, s"seed $seed")
      assert(w.filter(col("v") >= col("p10") && col("v") <= col("p90") &&
        col("winsorized") =!= col("v")).count() === 0, s"seed $seed")
    }
  }

  test("tokenEntropy ∈ [0, ln(distinct tokens)]") {
    for (seed <- 1L to 3L) {
      val rng = new scala.util.Random(seed)
      val docs = (0 until 15).map { i =>
        (i.toLong, Seq.fill(1 + rng.nextInt(30))("abcd" (rng.nextInt(4)).toString)
          .mkString(" "))
      }.toDF("doc_id", "text")
      Text.tokenEntropy(docs, "doc_id", "text").collect().foreach { r =>
        val h = r.getDouble(1)
        assert(h >= -1e-12 && h <= math.log(4) + 1e-12,
          s"seed $seed: entropy out of range: $h")
      }
    }
  }

  test("editDistancePairs equals the brute-force join on random short strings") {
    for (seed <- 1L to 3L) {
      val rng = new scala.util.Random(seed)
      // mixed lengths straddling the short/long pool boundary (q=3, d=2 → 10)
      val docs = (0 until 60).map { i =>
        (i.toLong, Seq.fill(3 + rng.nextInt(14))("ab" (rng.nextInt(2)).toString)
          .mkString)
      }.toDF("doc_id", "k")
      val fast = Dedup.editDistancePairs(docs, "doc_id", "k", maxDist = 2)
        .select("id_a", "id_b", "dist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val a = docs.select(col("doc_id").as("id_a"), col("k").as("k_a"))
      val b = docs.select(col("doc_id").as("id_b"), col("k").as("k_b"))
      val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("k_a"), col("k_b")))
        .filter(col("dist") <= 2)
        .select("id_a", "id_b", "dist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(fast === brute, s"seed $seed: fast=${fast.size} brute=${brute.size}")
    }
  }

  test("temperatureMixture: shares sum to 1, alpha=1 is the identity, alpha<1 flattens") {
    import graft.operators.Sampling
    for (seed <- 1L to 3L) {
      val rng = new scala.util.Random(seed)
      val df = Seq.fill(300)((rng.nextLong(), s"s${rng.nextInt(6)}"))
        .toDF("doc_id", "src")
      val t = Sampling.temperatureMixture(df, "src", alpha = 0.6).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      assert(math.abs(t.map(_._3).sum - 1.0) < 1e-9, s"seed $seed: p_raw sums")
      assert(math.abs(t.map(_._4).sum - 1.0) < 1e-9, s"seed $seed: p_temp sums")
      // flattening: tempered shares order-preserving but closer to
      // uniform — max share shrinks, min share grows
      assert(t.map(_._4).max <= t.map(_._3).max + 1e-12 &&
        t.map(_._4).min >= t.map(_._3).min - 1e-12,
        s"seed $seed: alpha<1 failed to flatten")
      val ident = Sampling.temperatureMixture(df, "src", alpha = 1.0).collect()
        .map(r => (r.getDouble(2), r.getDouble(3)))
      ident.foreach { case (raw, temp) =>
        assert(math.abs(raw - temp) < 1e-12, s"seed $seed: alpha=1 not identity") }
    }
  }

  test("rrfFuse: a doc in every list outranks docs in strictly dominated positions") {
    for (seed <- 1L to 3L) {
      val rng = new scala.util.Random(seed)
      // two rankings over a shared candidate pool; fused score must be
      // monotone: doc X at ranks (a1, a2) with a1<=b1, a2<=b2 (strict
      // somewhere) beats doc Y at (b1, b2); and every fused score is
      // the exact 2-term reciprocal sum (order-exact in IEEE)
      val perm1 = rng.shuffle((1L to 20L).toList)
      val perm2 = rng.shuffle((1L to 20L).toList)
      def ranking(p: List[Long]) =
        p.zipWithIndex.map { case (d, i) => (1L, d, i + 1) }
          .toDF("query_id", "doc_id", "rank")
      val fused = Analytics.rrfFuse(Seq(ranking(perm1), ranking(perm2)), k = 20)
        .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getInt(4))).toMap
      val r1 = perm1.zipWithIndex.map { case (d, i) => d -> (i + 1) }.toMap
      val r2 = perm2.zipWithIndex.map { case (d, i) => d -> (i + 1) }.toMap
      for (x <- 1L to 20L; y <- 1L to 20L
           if r1(x) <= r1(y) && r2(x) <= r2(y) && x != y) {
        assert(fused(x)._2 < fused(y)._2,
          s"seed $seed: dominated doc $y outranked $x")
      }
      (1L to 20L).foreach { d =>
        val expect = 1.0 / (60 + r1(d)) + 1.0 / (60 + r2(d))
        assert(math.abs(fused(d)._1 - expect) < 1e-15,
          s"seed $seed: fused score drifted for $d")
      }
    }
  }

  test("zValue: bit-interleave round-trips and preserves per-dim order on shared prefixes") {
    import graft.sources.LakeWriter
    val rng = new scala.util.Random(97)
    val pts = Seq.fill(300)((rng.nextInt(256).toLong, rng.nextInt(256).toLong))
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"),
        LakeWriter.zValue(Seq(col("a"), col("b")), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      // de-interleave in plain Scala: even bits back to a, odd bits to b
      var (da, db) = (0L, 0L)
      (0 until 8).foreach { j =>
        da |= ((z >> (2 * j)) & 1L) << j
        db |= ((z >> (2 * j + 1)) & 1L) << j
      }
      assert(da === a && db === b, s"roundtrip broke for ($a,$b): z=$z -> ($da,$db)")
    }
    // within a fixed b, z is strictly monotone in a (and vice versa):
    // the curve never reorders a single dimension's slices
    got.groupBy(_._2).values.foreach { slice =>
      val sorted = slice.sortBy(_._1)
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sorted.toSeq,
        "z not monotone in a within fixed b")
    }
  }
}
