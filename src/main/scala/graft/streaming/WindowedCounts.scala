package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Windowed streaming aggregation: events per (tumbling window, type)
 * with a watermark bounding state — the streaming twin of the batch
 * rows-per-day profile (reference:
 * athena_ddl_scripts/output_validation_scripts/athena_analysis_staging.sql).
 *
 * Works on both a streaming frame (`readStream`, incremental state-store
 * aggregation, late data dropped past the watermark) and a batch frame
 * (plain shuffle agg) — same code, Catalyst picks the mode.
 */
object WindowedCounts {

  def countsPerWindow(events: DataFrame, tsCol: String, typeCol: String,
                      windowLen: String = "1 hour",
                      watermarkDelay: String = "10 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
              else events
    src.groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col(typeCol), col("n_events"), col("sum_value"))
  }

  /**
   * Sliding-window variant: each event lands in every window of
   * `windowLen` that starts on a `slideLen` boundary and covers it
   * (windowLen / slideLen overlapping windows per event). State per key
   * is still watermark-bounded; the fan-out factor is the ratio.
   */
  def slidingCountsPerWindow(events: DataFrame, tsCol: String, typeCol: String,
                             windowLen: String = "1 hour",
                             slideLen: String = "15 minutes",
                             watermarkDelay: String = "10 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
              else events
    src.groupBy(window(col(tsCol), windowLen, slideLen), col(typeCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("window_start"),
        col(typeCol), col("n_events"))
  }
}
