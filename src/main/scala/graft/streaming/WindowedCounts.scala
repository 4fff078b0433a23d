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
   * Distinct entities per window via the HLL++ sketch — the LIVE half
   * of the reference's "distinct vessels per day" validation query.
   * Exact streaming distinct would need per-window set state
   * (O(entities) per open window); approx_count_distinct keeps one
   * mergeable sketch per window key, so state is O(windows × sketch),
   * rate-independent. The sketch is deterministic on a given row set —
   * the batch twin over the same (non-late) input produces the SAME
   * estimate, which is what the parity gate asserts.
   */
  def distinctPerWindow(events: DataFrame, tsCol: String, entityCol: String,
                        windowLen: String = "1 hour",
                        watermarkDelay: String = "10 minutes",
                        rsd: Double = 0.02): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
              else events
    src.groupBy(window(col(tsCol), windowLen))
      .agg(approx_count_distinct(col(entityCol), rsd).as("n_entities"))
      .select(col("window.start").as("window_start"), col("n_entities"))
  }

  /**
   * Streaming per-window quantiles via the KLL sketch — the percentile
   * sibling of [[distinctPerWindow]]. Exact streaming percentiles would
   * need every value per open window in state; a KLL buffer keeps state
   * at O(windows × sketch) and rate-independent, and the same
   * serialized-sketch contract the batch rollup uses
   * ([[graft.operators.Quality.quantileRollup]]) makes the state-store
   * round trip native to the aggregate. KLL compaction is randomized,
   * so the stream and its batch twin agree within the rank-error band,
   * not bit-for-bit — the parity gate asserts the band against the
   * exact per-window percentile, which is the guarantee KLL gives.
   */
  def quantilePerWindow(events: DataFrame, tsCol: String, valueCol: String,
                        qs: Seq[Double] = Seq(0.5, 0.95),
                        windowLen: String = "1 hour",
                        watermarkDelay: String = "10 minutes",
                        k: Int = 200): DataFrame = {
    import graft.expressions.{KllQuantile, KllSketchAgg}
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
              else events
    src.groupBy(window(col(tsCol), windowLen))
      .agg(GraftBridge.column(
          KllSketchAgg(GraftBridge.expression(col(valueCol).cast("double")), k)
            .toAggregateExpression()).as("sk"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start") +: col("n_events") +:
        qs.map { q =>
          GraftBridge.column(KllQuantile(GraftBridge.expression(col("sk")),
            Literal(q))).as(s"est_p${math.round(q * 100)}")
        }: _*)
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
