package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality counters (reference: utils/common_functions_raw.py:182
 * compute_summary_stats). Single-pass aggregation — at scale this is one
 * job with partial aggregation, never a driver-side loop.
 */
object Quality {

  /** Total rows, distinct entities, and null counts for the given columns. */
  def summaryStats(df: DataFrame, entityCol: String, nullCheckCols: Seq[String]): DataFrame = {
    val nullCounts = nullCheckCols.map(c =>
      count(when(col(c).isNull, 1)).as(s"null_$c"))
    df.agg(
      count(lit(1)).as("total_records"),
      (countDistinct(col(entityCol)).as(s"unique_$entityCol") +: nullCounts): _*)
  }

  /**
   * Piggyback DQ counters onto an existing job via `observe`: row count
   * and per-column null counts are collected as the frame's consumer
   * action runs — NO extra pass over the data (the reference recomputes
   * its summary stats with a second scan; at 100 TB that scan is free
   * here). Read the metrics from the [[org.apache.spark.sql.Observation]]
   * after any action on the returned frame.
   */
  def observed(df: DataFrame, observation: org.apache.spark.sql.Observation,
               nullCheckCols: Seq[String]): DataFrame = {
    val metrics = count(lit(1)).as("n_rows") +:
      nullCheckCols.map(c => count(when(col(c).isNull, 1)).as(s"null_$c"))
    df.observe(observation, metrics.head, metrics.tail: _*)
  }
}
