package graft.operators

import graft.functions.Geo
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Trajectory features over per-entity time-ordered points
 * (reference: transformations/facts/fact_voyage_trajectory.py).
 */
object Trajectory {

  /**
   * Consecutive-point segment distance (km) per entity (optionally per
   * session): lag lat/lon over the time window, haversine to the previous
   * point (reference: fact_voyage_trajectory.py:117-139 compute_trajectory).
   *
   * All lag features share one window spec — Catalyst plans a single
   * Window operator, i.e. one shuffle + one sort per entity key.
   */
  def segmentDistance(df: DataFrame, partitionCols: Seq[String], tsSecCol: String,
                      latCol: String, lonCol: String,
                      tieBreak: Seq[String] = Nil,
                      outCol: String = "segment_km"): DataFrame = {
    val order = (col(tsSecCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn(outCol,
      Geo.haversineKm(
        lag(col(latCol), 1).over(w), lag(col(lonCol), 1).over(w),
        col(latCol), col(lonCol)))
  }

  /**
   * Regularize an irregular per-entity time series onto a fixed grid:
   * one row per `stepSec`-aligned slot between each entity's first and
   * last observation, carrying the LAST observed value at or before the
   * slot (forward fill) — the resampling pass a model-feature export
   * runs over raw position/speed streams.
   *
   * Plan shape: slot assignment is a projection; per-slot last values
   * and per-entity bounds are partial-agg groupBys; the grid explodes
   * from one row per entity (span/step slots — bounded fan-out); the
   * forward fill is one `last(ignoreNulls)` window on the entity key.
   * No driver logic, no unbounded state.
   */
  def resampleForwardFill(df: DataFrame, keyCols: Seq[String], tsSecCol: String,
                          valueCol: String, stepSec: Long, rowKeyCol: String,
                          outCol: String = "value_ff"): DataFrame = {
    val keys = keyCols.map(col)
    val slotted = df.withColumn("slot",
      (floor(col(tsSecCol) / stepSec) * stepSec).cast("long"))
    // deterministic per-slot representative: value of the latest
    // (ts, rowKey) observation in the slot
    val obs = slotted.groupBy((keys :+ col("slot")): _*)
      .agg(max_by(col(valueCol), struct(col(tsSecCol), col(rowKeyCol))).as("v"))
    val grid = slotted.groupBy(keys: _*)
      .agg(min(col("slot")).as("mn"), max(col("slot")).as("mx"))
      .select((keys :+ explode(sequence(col("mn"), col("mx"), lit(stepSec))).as("slot")): _*)
    val w = Window.partitionBy(keys: _*).orderBy(col("slot").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, keyCols :+ "slot", "left")
      .withColumn(outCol, last(col("v"), ignoreNulls = true).over(w))
      .drop("v")
  }

  /**
   * Downsample a trajectory while keeping path fidelity
   * (reference: fact_voyage_trajectory.py:175 sample_trajectory):
   *  - moving rows: keep first + last point of each speed-dependent time
   *    bucket (fast vessels get finer buckets);
   *  - anchored rows: keep first + last per day;
   *  - always keep first + last per entity-day (daily endpoints).
   *
   * Keep-flags are computed with min/max over windows on the bucket keys;
   * bucket cardinality is high, so the shuffles stay balanced at scale.
   */
  def sample(df: DataFrame, idCol: String, sessionCol: String, tsSecCol: String,
             speedCol: String, stateCol: String, dayCol: String,
             fastSpeedThreshold: Double, fastIntervalSec: Long,
             slowIntervalSec: Long, rowKeyCol: String): DataFrame = {
    val bucketLen = when(coalesce(col(speedCol), lit(0.0)) >= fastSpeedThreshold,
      fastIntervalSec).otherwise(slowIntervalSec)
    val withBucket = df.withColumn("bucket_move", floor(col(tsSecCol) / bucketLen))

    // deterministic first/last = min/max of (ts, rowKey) struct
    val ord = struct(col(tsSecCol), col(rowKeyCol))
    val wMove = Window.partitionBy(col(idCol), col(sessionCol), col("bucket_move"))
    val wDay = Window.partitionBy(col(idCol), col(dayCol))

    val moving = col(stateCol) =!= "anchored"
    val keep =
      (moving && (ord === min(ord).over(wMove) || ord === max(ord).over(wMove))) ||
        (!moving && (ord === min(when(moving, null).otherwise(ord)).over(wDay) ||
          ord === max(when(moving, null).otherwise(ord)).over(wDay))) ||
        ord === min(ord).over(wDay) || ord === max(ord).over(wDay)

    withBucket.withColumn("keep", keep)
      .filter(col("keep"))
      .drop("bucket_move", "keep")
  }
}
