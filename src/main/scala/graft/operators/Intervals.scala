package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval-containment) join: points × intervals with
 * `start <= ts <= end`, optionally per key.
 *
 * Spark plans a raw inequality join as BroadcastNestedLoop/cartesian —
 * quadratic. This is the standard binning rewrite instead: intervals
 * explode to the time buckets they overlap, points map to their single
 * bucket, and the match becomes an EQUI-join on (key..., bucket) plus a
 * residual containment filter. Each (point, interval) pair meets in
 * exactly one bucket (the point's), so no dedup is needed. Work is
 * linear in points + Σ interval-spans/bucketSec; pick `bucketSec` near
 * the median interval length so most intervals explode to O(1) buckets.
 */
object Intervals {

  def rangeJoin(points: DataFrame, tsCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                keyCols: Seq[String] = Nil,
                bucketSec: Long = 3600L): DataFrame = {
    val ivb = intervals.withColumn("_b",
      explode(sequence(
        floor(col(startCol) / bucketSec).cast("long"),
        floor(col(endCol) / bucketSec).cast("long"))))
    val ptb = points.withColumn("_b",
      floor(col(tsCol) / bucketSec).cast("long"))
    ptb.join(ivb, (keyCols :+ "_b").toSeq)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_b")
  }
}
