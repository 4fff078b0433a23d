package graft.streaming

import graft.operators.Trajectory
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming zone occupancy: the live twin of the batch geofence rollup
 * ([[graft.operators.Trajectory.zoneRollup]]) — "how many vessels are in
 * each port area RIGHT NOW", per tumbling window.
 *
 * The geofence tag itself is STATELESS (a broadcast join against the
 * small zone table plus a codegen haversine predicate), so it applies
 * to a stream unchanged; the only state is the windowed aggregation,
 * watermark-bounded like every windowed op here. Distinct entities use
 * the HLL++ sketch (exact streaming distinct would hold per-window
 * entity sets; the sketch keeps state O(windows × zones), rate-
 * independent) — deterministic on a given row set, so the batch twin
 * over the same non-late input produces the SAME estimate, which is
 * what the parity gate asserts.
 */
object ZoneStream {

  def occupancy(points: DataFrame, zones: DataFrame, tsCol: String,
                latCol: String, lonCol: String, entityCol: String,
                windowLen: String = "1 hour",
                watermarkDelay: String = "10 minutes",
                rsd: Double = 0.02): DataFrame = {
    val src = if (points.isStreaming) points.withWatermark(tsCol, watermarkDelay)
              else points
    Trajectory.zoneTag(src, zones, latCol, lonCol)
      .groupBy(window(col(tsCol), windowLen), col("zone"))
      .agg(count(lit(1)).as("n_points"),
        approx_count_distinct(col(entityCol), rsd).as("n_entities"))
      .select(col("window.start").as("window_start"), col("zone"),
        col("n_points"), col("n_entities"))
  }
}
