package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Native session-window aggregation: Spark's built-in `session_window`
 * (gap-based, state-store-backed) — the declarative twin of
 * [[SessionStream]]'s `flatMapGroupsWithState` implementation.
 *
 * Prefer THIS form when per-session output is a plain aggregation
 * (count/sum/min/max): Catalyst owns the state layout and merge logic,
 * and the same code runs in batch. Reach for [[SessionStream]] only
 * when session logic needs custom state transitions (e.g. emitting
 * mid-session updates or session-id continuity with a seed).
 */
object SessionWindowAgg {

  /** Per-(key, session) aggregates with a `gap` session window. */
  def aggregate(events: DataFrame, tsCol: String, keyCol: String,
                valueCol: String, gap: String = "3 hours",
                watermarkDelay: String = "10 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
              else events
    src.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_points"), sum(col(valueCol)).as("sum_value"))
      .select(col(keyCol),
        unix_timestamp(col("session_window.start")).as("start_sec"),
        unix_timestamp(col("session_window.end")).as("end_sec"),
        col("n_points"), col("sum_value"))
  }
}
