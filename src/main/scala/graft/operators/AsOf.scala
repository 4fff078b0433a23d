package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: enrich each left row with the right row nearest in time,
 * per key — the canonical time-series state lookup (e.g. each AIS
 * position joined to the vessel's most recent static/voyage report).
 * `direction` selects the pandas merge_asof surface:
 *
 *  - `backward` (default): latest right row with `r.ts <= l.ts`
 *  - `forward`: earliest right row with `r.ts >= l.ts`
 *  - `nearest`: whichever of the two is closer; exact ties prefer the
 *    prior (backward) row
 *
 * Spark has no native ASOF JOIN. The naive inequality join
 * (`l.ts >= r.ts` + row_number) explodes to |L|×|R| per key before
 * ranking; this implementation is the union-and-carry-forward plan
 * instead: tag both sides, union, and `last(payload, ignoreNulls)` over
 * one (key, time)-ordered window — right payloads carry forward (or
 * backward, via the same window with time descending) to every later
 * left row. ONE shuffle, linear work, same window family as
 * sessionization; `nearest` adds the second sort but still no second
 * shuffle (both windows share the partition keys).
 *
 * Right rows must be unique per (key, ts) — pre-dedup with
 * [[StateOps.latestPerKey]] otherwise (ties would be nondeterministic
 * in any engine).
 */
object AsOf {

  /**
   * @param left      rows to enrich
   * @param right     state events carrying `payloadCols`
   * @param keyCols   equality keys
   * @param tsCol     epoch-seconds column, present in BOTH frames
   * @param payloadCols right-side columns carried onto left rows
   * @param tieBreak  extra left-side ordering for deterministic output
   * @param direction "backward" | "forward" | "nearest"
   */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, payloadCols: Seq[String],
           tieBreak: Seq[String] = Nil,
           direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asof direction must be backward|forward|nearest, got '$direction'")
    val leftCols = left.columns.toSeq
    // schema-align: left gets null payloads, right gets null non-shared
    // cols; the matched right TS rides along for the `nearest` pick
    val shared = keyCols :+ tsCol
    val names = payloadCols :+ "_ts"
    val l = left
      .withColumns(names.map(c => s"_r_$c" -> lit(null)).toMap)
      .withColumn("_is_left", lit(true))
    val r = right.select((shared.map(col) ++
        payloadCols.map(c => col(c).as(s"_r_$c"))): _*)
      .withColumn("_r__ts", col(tsCol))
      .withColumns(leftCols.filterNot(shared.contains)
        .map(c => c -> lit(null)).toMap)
      .withColumn("_is_left", lit(false))
    val unioned = l.unionByName(r.select(l.columns.map(col): _*))

    // right rows order BEFORE left rows at equal ts in BOTH traversal
    // directions → `<=`/`>=` inclusive semantics either way
    def wnd(asc: Boolean) = {
      val tsOrd = if (asc) col(tsCol).asc else col(tsCol).desc
      Window.partitionBy(keyCols.map(col): _*)
        .orderBy((tsOrd +: col("_is_left").asc +: tieBreak.map(col(_).asc)): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    def carry(prefix: String, asc: Boolean)(df: DataFrame) =
      df.withColumns(names.map(c =>
        s"$prefix$c" -> last(col(s"_r_$c"), ignoreNulls = true).over(wnd(asc))).toMap)

    val resolved = direction match {
      case "backward" => carry("_r_", asc = true)(unioned)
      case "forward" => carry("_r_", asc = false)(unioned)
      case "nearest" =>
        // exact tie |l-b| == |f-l| keeps the prior row (<=), pandas-like
        val pickB = col("_f__ts").isNull || (col("_b__ts").isNotNull &&
          col(tsCol) - col("_b__ts") <= col("_f__ts") - col(tsCol))
        carry("_f_", asc = false)(carry("_b_", asc = true)(unioned))
          .withColumns(names.map(c => s"_r_$c" ->
            when(pickB, col(s"_b_$c")).otherwise(col(s"_f_$c"))).toMap)
          .drop(names.flatMap(c => Seq(s"_b_$c", s"_f_$c")): _*)
    }
    resolved.filter(col("_is_left"))
      .drop("_is_left", "_r__ts")
      .withColumnsRenamed(payloadCols.map(c => s"_r_$c" -> c).toMap)
  }
}
