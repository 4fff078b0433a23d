package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One metric observation of a live stream. */
case class MetricFix(userId: Long, ts: Timestamp, value: Double)

/** A scored observation: residual vs the prior-window EWMA prediction
 * and the anomaly verdict (null while history is too thin / constant —
 * encoded as `hasFlag = false`). */
case class AnomalyOut(userId: Long, tsSec: Long, value: Double,
                      residual: Option[Double], anomaly: Option[Boolean])

/** Buffered observation awaiting finalization. */
case class MetricPending(tsSec: Long, value: Double)

/** Per-entity state: reorderable suffix + the last `window` FINALIZED
 * values in ts order (the prediction history). */
case class AnomalyState(pending: List[MetricPending], history: List[Double])

/**
 * Streaming anomaly detection — the live twin of
 * [[graft.operators.Analytics.anomalyFlags]]: each observation scored
 * against the EWMA prediction from the PRIOR `window` observations,
 * normalized by their sample std, as the watermark finalizes it. The
 * prediction must exclude the current row and respect event-time order
 * (a late value belongs INSIDE the history of later rows), so rows
 * buffer until the watermark passes them — the finalized-prefix recipe
 * — and the history deque holds exactly the last `window` finalized
 * values: state is O(window + rate × watermark delay) per entity.
 * Scoring arithmetic is the batch operator's strict fold, so the
 * parity gate asserts equality row-for-row, not approximately.
 */
object AnomalyStream {

  def flags(points: Dataset[MetricFix], alpha: Double = 0.3, window: Int = 10,
            k: Double = 3.0, minHistory: Int = 3,
            watermarkDelay: String = "10 minutes"): Dataset[AnomalyOut] = {
    require(alpha > 0 && alpha <= 1 && window >= 1 && k > 0 && minHistory >= 2,
      "flags needs alpha in (0,1], window/k positive, minHistory >= 2")
    val spark = points.sparkSession
    import spark.implicits._
    val decay = 1.0 - alpha

    points
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[AnomalyState, AnomalyOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, fixes, state: GroupState[AnomalyState]) =>
          val wmSec = state.getCurrentWatermarkMs() / 1000
          val st = state.getOption.getOrElse(AnomalyState(Nil, Nil))
          val incoming = fixes.map(f =>
            MetricPending(f.ts.getTime / 1000, f.value)).toList
          val (ready, pending) = (st.pending ++ incoming).partition(_.tsSec < wmSec)
          var hist = st.history // oldest-first, length <= window
          val out = Seq.newBuilder[AnomalyOut]
          for (p <- ready.sortBy(_.tsSec)) {
            val n = hist.length
            if (n == 0) out += AnomalyOut(userId, p.tsSec, p.value, None, None)
            else {
              // the batch operator's exact folds (strict left, 0.0 init)
              val num = hist.foldLeft(0.0)((acc, x) => acc * decay + alpha * x)
              val den = hist.foldLeft(0.0)((acc, _) => acc * decay + alpha)
              val ew = num / den
              val s = hist.foldLeft(0.0)(_ + _)
              val sq = hist.foldLeft(0.0)((acc, x) => acc + x * x)
              val std = if (n >= 2) math.sqrt((sq - s * s / n) / (n - 1)) else Double.NaN
              val residual = p.value - ew
              val flag = if (n >= minHistory && std > 0)
                Some(math.abs(residual) > k * std) else None
              out += AnomalyOut(userId, p.tsSec, p.value, Some(residual), flag)
            }
            hist = (hist :+ p.value).takeRight(window)
          }
          if (pending.isEmpty && hist.isEmpty) state.remove()
          else {
            state.update(AnomalyState(pending, hist))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp((pending.map(_.tsSec).min + 1) * 1000)
          }
          out.result().iterator
      }
  }
}
