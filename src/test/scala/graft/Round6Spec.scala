package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Round-6 hardening: lon-bucketed + hot-cell-salted encounter blocking
 * proven against a brute-force reference on adversarial geometry.
 */
class Round6Spec extends SparkSpecBase {
  import spark.implicits._

  /** O(n²) reference: the definition, with no blocking at all. */
  private def bruteEncounters(pts: DataFrame, maxKm: Double, maxGapSec: Long): Set[(Long, Long, Long, Long)] = {
    val a = pts.select(col("user_id").as("id_a"), col("ts_sec").as("ts_a"),
      col("lat").as("lat_a"), col("lon").as("lon_a"))
    val b = pts.select(col("user_id").as("id_b"), col("ts_sec").as("ts_b"),
      col("lat").as("lat_b"), col("lon").as("lon_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .filter(abs(col("ts_a") - col("ts_b")) <= maxGapSec)
      .filter(graft.functions.Geo.haversineKm(col("lat_a"), col("lon_a"),
        col("lat_b"), col("lon_b")) <= maxKm)
      .select("id_a", "id_b", "ts_a", "ts_b")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  /**
   * Adversarial fixture: a dense anchorage in one cell, an antimeridian
   * straddle, a high-latitude cluster, a near-pole ring (lon blocking
   * must degrade to band-only), plus pseudo-random global noise.
   * Deterministic (seeded via hashing), ~700 points.
   */
  private lazy val adversarialPoints: DataFrame = {
    def h(i: Int, s: Int): Double =
      (((i * 2654435761L + s * 40503L) & 0x7fffffffL) % 100000L) / 100000.0
    val anchorage = (0 until 200).map { i =>
      (1000L + i, 600L + (i % 40) * 30L, 1.0 + h(i, 1) * 0.1, 103.8 + h(i, 2) * 0.1)
    }
    val antimeridian = (0 until 100).map { i =>
      (2000L + i, 300L + i * 20L, -10.0 + h(i, 3) * 0.5,
        if (i % 2 == 0) 179.7 + h(i, 4) * 0.3 else -180.0 + h(i, 5) * 0.3)
    }
    val highLat = (0 until 100).map { i =>
      (3000L + i, 900L + i * 15L, 74.8 + h(i, 6) * 0.6, -40.0 + h(i, 7) * 2.0)
    }
    val polar = (0 until 100).map { i =>
      (4000L + i, 1200L + i * 10L, 89.5 + h(i, 8) * 0.49, -180.0 + i * 3.6)
    }
    val noise = (0 until 200).map { i =>
      (5000L + i, (h(i, 9) * 5000).toLong, -85.0 + h(i, 10) * 170.0,
        -180.0 + h(i, 11) * 360.0)
    }
    (anchorage ++ antimeridian ++ highLat ++ polar ++ noise)
      .toDF("user_id", "ts_sec", "lat", "lon")
  }

  test("encounters == brute force on adversarial geometry (anchorage, antimeridian, pole)") {
    val maxKm = 50.0; val maxGap = 1800L
    val expected = bruteEncounters(adversarialPoints, maxKm, maxGap)
    val got = Trajectory.encounters(adversarialPoints, "user_id", "ts_sec", "lat", "lon",
        maxKm, maxGap)
      .select("id_a", "id_b", "ts_a", "ts_b")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === got.toSet.size, "blocking emitted a duplicate pair")
    assert(got.toSet === expected,
      s"missing=${(expected -- got.toSet).take(5)} extra=${(got.toSet -- expected).take(5)}")
    assert(expected.nonEmpty, "fixture produced no encounters — not a real test")
    // the anchorage really is dense (quadratic if unblocked), the
    // antimeridian pairs really straddle the wrap
    assert(expected.count { case (a, b, _, _) => a >= 1000 && b < 2000 } > 500)
    assert(expected.exists { case (a, b, _, _) => a >= 2000 && a < 3000 && b >= 2000 && b < 3000 })
    assert(expected.exists { case (a, b, _, _) => a >= 4000 && a < 5000 && b >= 4000 && b < 5000 })
  }

  test("encounters: forced salting (tiny pair budget) leaves the result identical") {
    val maxKm = 50.0; val maxGap = 1800L
    val unsalted = Trajectory.encounters(adversarialPoints, "user_id", "ts_sec",
        "lat", "lon", maxKm, maxGap, hotPairBudget = Long.MaxValue)
      .select("id_a", "id_b", "ts_a", "ts_b").as[(Long, Long, Long, Long)].collect()
    val salted = Trajectory.encounters(adversarialPoints, "user_id", "ts_sec",
        "lat", "lon", maxKm, maxGap, hotPairBudget = 50L, maxSalt = 16)
      .select("id_a", "id_b", "ts_a", "ts_b").as[(Long, Long, Long, Long)].collect()
    assert(salted.length === salted.toSet.size, "salting duplicated a pair")
    assert(salted.toSet === unsalted.toSet, "salting changed the result set")
    assert(unsalted.length === unsalted.toSet.size)
  }

  test("encounters: salted plan stays an equi-join with a broadcast hot-key lookup") {
    val p = Trajectory.encounters(adversarialPoints, "user_id", "ts_sec", "lat", "lon",
        50.0, 1800L, hotPairBudget = 50L, maxSalt = 16)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "salted proximity join degraded to all-pairs\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"), "hot-key lookup is not broadcast\n" + p.take(2000))
  }
}
