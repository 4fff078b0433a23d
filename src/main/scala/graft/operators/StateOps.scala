package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental-state operators (reference: utils/state_io.py,
 * transformations/facts/fact_voyage_summary.py:105 _merge_state).
 */
object StateOps {

  /**
   * Last row per key by (orderCols...) — the per-MMSI continuity snapshot
   * (reference: utils/state_io.py:49 latest_per_mmsi).
   *
   * Implemented as max_by over a struct instead of row_number over a window:
   * a single hash aggregation with map-side partial combine, no per-key sort
   * — at 100 TB this shuffles one row per key rather than sorting every row.
   */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keys.contains).toSeq
    val ord = struct(orderCols.map(col): _*)
    val aggs = payload.map(c => max_by(col(c), ord).as(c))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Merge additive per-key deltas into a running state via full-outer join:
   * sums add, spans extend (min start / max end), counts accumulate
   * (reference: fact_voyage_summary.py:105 _merge_state).
   *
   * `sumCols` must exist in both frames with identical names.
   */
  def mergeDeltas(state: DataFrame, deltas: DataFrame, keys: Seq[String],
                  sumCols: Seq[String], minCols: Seq[String] = Nil,
                  maxCols: Seq[String] = Nil,
                  replaceCols: Seq[String] = Nil,
                  unionCols: Seq[(String, (org.apache.spark.sql.Column,
                    org.apache.spark.sql.Column) =>
                    org.apache.spark.sql.Column)] = Nil): DataFrame = {
    val s = state.alias("s")
    val d = deltas.alias("d")
    val joined = s.join(d, keys, "full_outer")
    val keyCols = keys.map(k => coalesce(col(s"s.$k"), col(s"d.$k")).as(k))
    // the zero literal takes the column's OWN type: a double 0.0 would
    // silently widen long counters to double in the merged snapshot —
    // a schema drift the StateStore would then reject on the next day
    val sums = sumCols.map { c =>
      val zero = lit(0).cast(deltas.schema(c).dataType)
      (coalesce(col(s"s.$c"), zero) + coalesce(col(s"d.$c"), zero)).as(c)
    }
    val mins = minCols.map(c => least(col(s"s.$c"), col(s"d.$c")).as(c))
    val maxs = maxCols.map(c => greatest(col(s"s.$c"), col(s"d.$c")).as(c))
    // delta wins: opaque payloads (sketch blobs, SCD attributes) where a
    // re-landed key REPLACES its prior row rather than accumulating
    val reps = replaceCols.map(c => coalesce(col(s"d.$c"), col(s"s.$c")).as(c))
    // semigroup merge: both sides present → the caller's associative
    // combiner (hll_union, KLL pairwise merge, KMV bottom-k of the
    // union); one side absent → the other, verbatim. This is what lets
    // a day's sketch accumulate across partial landings (streaming
    // micro-batches) instead of replace-clobbering
    val unions = unionCols.map { case (c, f) =>
      when(col(s"s.$c").isNull, col(s"d.$c"))
        .when(col(s"d.$c").isNull, col(s"s.$c"))
        .otherwise(f(col(s"s.$c"), col(s"d.$c"))).as(c)
    }
    joined.select(keyCols ++ mins ++ maxs ++ sums ++ reps ++ unions: _*)
  }

  /**
   * Completion heuristic over session summaries: a session is complete
   * once the data's high watermark has moved more than `gapSec` past its
   * last point — no further point can legally join it (reference:
   * fact_voyage_summary.py completion rule).
   *
   * The watermark is the global max of `endCol`, computed as a 1-row
   * aggregate and broadcast — no window-over-everything (which would
   * funnel all rows through one partition at scale).
   */
  def markComplete(summary: DataFrame, endCol: String, gapSec: Long,
                   outCol: String = "is_complete"): DataFrame = {
    val wm = summary.agg(max(col(endCol)).as("_wm"))
    summary.crossJoin(broadcast(wm))
      .withColumn(outCol, col(endCol) + gapSec < col("_wm"))
      .drop("_wm")
  }

  /**
   * The aggregate-table form [[ivmAggregate]] maintains: per group,
   * `n_rows` plus, for each sum column `c`, `sum_c` AND its non-null
   * value count `nv_c`. The value count is what makes SUM exactly
   * maintainable under retraction — a group whose last non-null value
   * is deleted (or updated to null) must return to SUM = NULL, which
   * the running number alone cannot express (it would report 0).
   * `sumCols` should be long/double columns (the CDF delta multiplies
   * by a ±1 sign, which would widen decimal precision).
   */
  def aggTable(state: DataFrame, groupCols: Seq[String],
               sumCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.flatMap(c => Seq(sum(col(c)).as(s"sum_$c"),
        count(col(c)).as(s"nv_$c")))
    state.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * INCREMENTAL VIEW MAINTENANCE of an additive aggregate table from a
   * row-level change feed — the classic IVM-with-retractions algebra
   * (Delta CDF shape, [[graft.sources.StateStore.changesBetween]]):
   * inserts and update post-images contribute +1 / +value, deletes and
   * update pre-images contribute −1 / −value, so a reporting table over
   * a 100 TB fact store refreshes at the COST OF THE DAY'S DELTA
   * instead of a full rescan — the additive-aggregate counterpart of
   * the sketch-store rollup (which covers the non-additive metrics).
   *
   * Shape: UNION + RE-AGGREGATE, not a join — base rows are already
   * partial aggregates, so one shuffle of (base ∪ batch-sized delta)
   * on the group keys is the whole cost; a full-outer join of base
   * against the delta could never broadcast (outer side) and would pay
   * the same shuffle anyway. Groups whose maintained `n_rows` reaches 0
   * DROP (a direct aggregate has no row for an absent group); sums
   * whose `nv_c` reaches 0 return to NULL. Contract (spec + the q_ivm
   * oracle): `ivmAggregate(aggTable(v1), changes(v1→v2)) ≡ aggTable(v2)`
   * up to FP summation order.
   */
  /** The ±1/±value CDF rows of the IVM algebra — feed rows projected to
   * aggregate-table schema with retraction signs applied. */
  private def cdfDeltaRows(feed: DataFrame, groupCols: Seq[String],
                           sumCols: Seq[String]): DataFrame = {
    val sign = when(col("change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    feed.select(
      groupCols.map(col) ++ Seq(sign.as("n_rows")) ++
        sumCols.flatMap(c => Seq((col(c) * sign).as(s"sum_$c"),
          when(col(c).isNotNull, sign).otherwise(lit(0L)).as(s"nv_$c"))): _*)
  }

  /**
   * A feed's NET per-group aggregate deltas (batch-sized output, one
   * shuffle of the feed alone) — the increment a running aggregate
   * STORE adds per micro-batch ([[graft.streaming.IvmStream]]): n_rows,
   * sum_c and nv_c are all plain additive numbers, so the store merge
   * is the existing semigroup sum and the agg table is a pure fold of
   * delivered feeds. [[ivmAggregate]] is the one-shot (base-in-hand)
   * form of the same algebra.
   */
  def ivmDelta(feed: DataFrame, groupCols: Seq[String],
               sumCols: Seq[String]): DataFrame = {
    val aggs = sum("n_rows").as("n_rows") +:
      sumCols.flatMap(c => Seq(sum(s"sum_$c").as(s"sum_$c"),
        sum(s"nv_$c").as(s"nv_$c")))
    cdfDeltaRows(feed, groupCols, sumCols)
      .groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  def ivmAggregate(base: DataFrame, feed: DataFrame, groupCols: Seq[String],
                   sumCols: Seq[String]): DataFrame = {
    val deltaRows = cdfDeltaRows(feed, groupCols, sumCols)
    val aggs = sum("n_rows").as("n_rows") +:
      sumCols.flatMap(c => Seq(sum(s"sum_$c").as(s"sum_$c"),
        sum(s"nv_$c").as(s"nv_$c")))
    base.unionByName(deltaRows)
      .groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .filter(col("n_rows") > 0)
      .select(groupCols.map(col) ++ Seq(col("n_rows")) ++
        sumCols.flatMap(c => Seq(
          when(col(s"nv_$c") === 0, lit(null)).otherwise(col(s"sum_$c"))
            .as(s"sum_$c"),
          col(s"nv_$c"))): _*)
  }
}
