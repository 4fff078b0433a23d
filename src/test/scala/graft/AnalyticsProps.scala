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
}
