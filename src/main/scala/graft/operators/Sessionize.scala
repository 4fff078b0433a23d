package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-gap sessionization: assign a session (voyage) id per entity that
 * increments whenever the gap to the previous record exceeds a threshold.
 *
 * Reference semantics: utils/common_functions_curated.py:25 segment_voyages
 * (lag + conditional prefix-sum over a per-vessel time-ordered window) and
 * the seeded variant in transformations/facts/fact_voyage_trajectory.py:108
 * compute_trajectory (prior-day state row seeds the id so voyages stay
 * continuous across incremental windows).
 *
 * Scale notes: one shuffle on `idCol`; the lag and the running sum share the
 * same window spec so Catalyst plans a single Window operator over a single
 * sort. Entity cardinality (vessels/users) is high, so partitions stay
 * balanced at 100 TB; there is no global sort.
 */
object Sessionize {

  /**
   * Assign `outCol` session ids (0-based per entity).
   *
   * @param df         input
   * @param idCol      entity column (e.g. MMSI / user_id)
   * @param tsSecCol   epoch-seconds LONG column used for gap math
   * @param gapSeconds new session when (ts - prev_ts) > gapSeconds
   * @param tieBreak   extra ordering columns for deterministic order on ties
   */
  def apply(
      df: DataFrame,
      idCol: String,
      tsSecCol: String,
      gapSeconds: Long,
      tieBreak: Seq[String] = Nil,
      outCol: String = "session_id"): DataFrame = {
    val order = (col(tsSecCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(idCol).orderBy(order: _*)
    val gap = col(tsSecCol) - lag(col(tsSecCol), 1).over(w)
    val boundary = when(gap > gapSeconds, 1L).otherwise(0L)
    df.withColumn(outCol,
      sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /**
   * Seeded sessionization: rows flagged `isSeedCol` carry a prior-window
   * session id in `seedIdCol`; new-window rows get
   * seed_base + running boundary count, so ids continue across windows
   * (reference: fact_voyage_trajectory.py:128-132).
   *
   * Seed rows participate in gap math (day-1 last point vs day-0 first
   * point) but are dropped from the output.
   */
  def seeded(
      df: DataFrame,
      idCol: String,
      tsSecCol: String,
      gapSeconds: Long,
      seedIdCol: String,
      isSeedCol: String,
      tieBreak: Seq[String] = Nil,
      outCol: String = "session_id"): DataFrame = {
    val order = (col(tsSecCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(idCol).orderBy(order: _*)
    val gap = col(tsSecCol) - lag(col(tsSecCol), 1).over(w)
    val boundary = when(gap > gapSeconds, 1L).otherwise(0L)
    val base = first(col(seedIdCol), ignoreNulls = true)
      .over(Window.partitionBy(idCol))
    df.withColumn(outCol,
        coalesce(base, lit(0L)) +
          sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(!col(isSeedCol))
  }
}
