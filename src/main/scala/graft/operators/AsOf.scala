package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (nearest-prior-event) join: enrich each left row with the latest
 * right row whose timestamp is `<=` the left timestamp, per key — the
 * canonical time-series state lookup (e.g. each AIS position joined to
 * the vessel's most recent static/voyage report).
 *
 * Spark has no native ASOF JOIN. The naive inequality join
 * (`l.ts >= r.ts` + row_number) explodes to |L|×|R| per key before
 * ranking; this implementation is the union-and-carry-forward plan
 * instead: tag both sides, union, and `last(payload, ignoreNulls)` over
 * one (key, time)-ordered window — right payloads carry forward to
 * every later left row. ONE shuffle, linear work, same window family as
 * sessionization.
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
   */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, payloadCols: Seq[String],
           tieBreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    // schema-align: left gets null payloads, right gets null non-shared cols
    val shared = keyCols :+ tsCol
    val l = left
      .withColumns(payloadCols.map(c => s"_r_$c" -> lit(null)).toMap)
      .withColumn("_is_left", lit(true))
    val r = right.select((shared.map(col) ++
        payloadCols.map(c => col(c).as(s"_r_$c"))): _*)
      .withColumns(leftCols.filterNot(shared.contains)
        .map(c => c -> lit(null)).toMap)
      .withColumn("_is_left", lit(false))

    // right rows order BEFORE left rows at equal ts → `<=` semantics
    val order = (col(tsCol).asc +: col("_is_left").asc +: tieBreak.map(col(_).asc))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.map(c =>
      s"_r_$c" -> last(col(s"_r_$c"), ignoreNulls = true).over(w))

    l.unionByName(r.select(l.columns.map(col): _*))
      .withColumns(carried.toMap)
      .filter(col("_is_left"))
      .drop("_is_left")
      .withColumnsRenamed(payloadCols.map(c => s"_r_$c" -> c).toMap)
  }
}
