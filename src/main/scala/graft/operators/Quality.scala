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
}
