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

  /**
   * Interval-OVERLAP join: pairs (a, b) with `a.start <= b.end AND
   * b.start <= a.end` (optionally per key) — the interval×interval
   * companion to [[rangeJoin]]'s point×interval. Same binning rewrite,
   * plus the meet-once rule that [[graft.operators.Trajectory]]'s
   * encounter join uses: both sides explode to their covered buckets,
   * and the residual filter keeps a candidate only in the bucket
   * holding max(a.start, b.start) — a bucket both sides cover exactly
   * when they overlap — so every overlapping pair survives in EXACTLY
   * one bucket and there is no post-join dedup. Work is linear in
   * Σ span/bucketSec per side.
   */
  def overlapJoin(left: DataFrame, leftStart: String, leftEnd: String,
                  right: DataFrame, rightStart: String, rightEnd: String,
                  keyCols: Seq[String] = Nil,
                  bucketSec: Long = 3600L): DataFrame = {
    require(bucketSec > 0, "overlapJoin needs bucketSec > 0")
    def binned(df: DataFrame, s: String, e: String) = df.withColumn("_b",
      explode(sequence(
        floor(col(s) / bucketSec).cast("long"),
        floor(col(e) / bucketSec).cast("long"))))
    binned(left, leftStart, leftEnd)
      .join(binned(right, rightStart, rightEnd), (keyCols :+ "_b").toSeq)
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .filter(col("_b") ===
        floor(greatest(col(leftStart), col(rightStart)) / bucketSec).cast("long"))
      .drop("_b")
  }

  /**
   * Flatten overlapping/adjacent intervals per key into maximal disjoint
   * spans — the coverage normalizer (overlapping voyage/report spans →
   * "when was this vessel observed at all"). Two intervals belong to
   * one span when the next starts within `adjacencySec` of the running
   * maximum end (0 = strictly overlapping-or-touching). Same plan as
   * sessionization: ONE (key, start)-ordered window computing a prefix
   * running max of `end`, a new span wherever start exceeds it, then a
   * partial-agg rollup. Emits (keys..., span_id, start, end, n_spans
   * member count).
   */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String],
                     startCol: String, endCol: String,
                     adjacencySec: Long = 0L,
                     tieBreak: Seq[String] = Nil): DataFrame = {
    require(adjacencySec >= 0, "mergeIntervals needs adjacencySec >= 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((col(startCol).asc +: col(endCol).asc +: tieBreak.map(col(_).asc)): _*)
    // running max of end over all PRIOR rows; null for each key's first
    val prevMax = max(col(endCol)).over(
      w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    df.withColumn("_new", when(
        prevMax.isNull || col(startCol) > prevMax + adjacencySec, 1L).otherwise(0L))
      .withColumn("span_id", sum(col("_new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy((keyCols.map(col) :+ col("span_id")): _*)
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_members"))
  }

  /**
   * Coverage gaps per key: the COMPLEMENT of [[mergeIntervals]] within
   * each key's own observed extent — "when was this vessel dark"
   * (reporting outages, sensor gaps). A gap is the space between one
   * merged span's end and the next span's start, minus `minGapSec`
   * noise. One lag window over the merged spans (already tiny compared
   * to the input).
   */
  def coverageGaps(df: DataFrame, keyCols: Seq[String],
                   startCol: String, endCol: String,
                   minGapSec: Long = 0L,
                   tieBreak: Seq[String] = Nil): DataFrame = {
    val spans = mergeIntervals(df, keyCols, startCol, endCol, 0L, tieBreak)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("start").asc)
    spans
      .withColumn("gap_start", lag(col("end"), 1).over(w))
      .filter(col("gap_start").isNotNull)
      .select((keyCols.map(col) :+ col("gap_start") :+
        col("start").as("gap_end") :+
        (col("start") - col("gap_start")).as("gap_sec")): _*)
      .filter(col("gap_sec") > minGapSec)
  }
}
