package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One point of a live stream: entity + event-time + speed. */
case class StreamEvent(userId: Long, ts: Timestamp, value: Double)

/** Emitted when a session closes (watermark passes its gap horizon). */
case class SessionOut(userId: Long, sessionId: Long, startSec: Long,
                      endSec: Long, nPoints: Long, sumValue: Double)

/** Running per-entity session state. */
case class SessionState(sessionId: Long, startSec: Long, lastSec: Long,
                        nPoints: Long, sumValue: Double)

/**
 * Streaming time-gap sessionization — the streaming twin of
 * `operators.Sessionize` (reference "future work": the batch pipeline's
 * 3-hour voyage rule applied to a live AIS feed).
 *
 * `flatMapGroupsWithState` with event-time timeout: state holds the open
 * session per entity; a batch of points extends it or closes it (gap >
 * `gapSeconds`), and a watermark-fired timeout closes sessions for
 * entities that went silent. Emits one row per CLOSED session —
 * identical semantics to the batch prefix-sum on a bounded replay.
 *
 * Scale posture: state is one small record per live entity, partitioned
 * by entity key across executors; RocksDB state store handles 10⁷+
 * entities per node.
 */
object SessionStream {

  def sessionize(events: Dataset[StreamEvent], gapSeconds: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, points, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.sessionId, s.startSec, s.lastSec,
              s.nPoints, s.sumValue))
          } else {
            val sorted = points.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            for (p <- sorted) {
              val sec = p.ts.getTime / 1000
              cur match {
                case Some(s) if sec - s.lastSec <= gapSeconds =>
                  // out-of-order point (within watermark) may predate the
                  // open session — keep min-start / max-end semantics so the
                  // emitted span matches the batch twin's min/max timestamps
                  cur = Some(s.copy(startSec = math.min(s.startSec, sec),
                    lastSec = math.max(s.lastSec, sec),
                    nPoints = s.nPoints + 1, sumValue = s.sumValue + p.value))
                case Some(s) =>
                  closed += SessionOut(userId, s.sessionId, s.startSec,
                    s.lastSec, s.nPoints, s.sumValue)
                  cur = Some(SessionState(s.sessionId + 1, sec, sec, 1, p.value))
                case None =>
                  cur = Some(SessionState(0L, sec, sec, 1, p.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session once the watermark passes its gap horizon
              state.setTimeoutTimestamp((s.lastSec + gapSeconds) * 1000)
            }
            closed.result().iterator
          }
      }
  }
}
