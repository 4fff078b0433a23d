package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream equi-join bounded by event time: each left event joins
 * right events for the same key within `[-lookbackSec, +lookaheadSec]`
 * of its timestamp (e.g. AIS positions × nav-status reports from the
 * same vessel within the hour).
 *
 * Both sides carry watermarks and the join condition carries the time
 * interval — that pair is what lets Spark BOUND the join state: a
 * buffered right row is dropped once the left watermark passes its
 * horizon, so state is O(rate × window), not O(stream). An unbounded
 * stream-stream join would grow state forever and is refused for outer
 * joins for exactly that reason.
 */
object StreamJoin {

  /**
   * @param left / right  streaming frames; all non-key columns kept,
   *                      right's prefixed `r_`
   * @param keyCol        equality key present in both
   * @param tsLeft/tsRight event-time columns (TimestampType)
   */
  def withinInterval(left: DataFrame, right: DataFrame, keyCol: String,
                     tsLeft: String, tsRight: String,
                     lookbackSec: Long, lookaheadSec: Long,
                     watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(tsLeft, watermarkDelay)
    val r0 = right.withWatermark(tsRight, watermarkDelay)
    val r = r0.columns.foldLeft(r0) { (df, c) =>
      if (c == keyCol) df else df.withColumnRenamed(c, s"r_$c")
    }
    val rTs = s"r_$tsRight"
    l.join(r,
      l(keyCol) === r(keyCol) &&
        col(rTs) >= col(tsLeft) - expr(s"INTERVAL $lookbackSec SECONDS") &&
        col(rTs) <= col(tsLeft) + expr(s"INTERVAL $lookaheadSec SECONDS"))
      .drop(r(keyCol))
  }
}
