package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One change-log row: entity + event time + the tracked attribute. */
case class Scd2Fix(userId: Long, ts: Timestamp, attr: String, eventId: Long)

/** A CLOSED attribute version: [effStart, effEnd). The open (current)
 * version per entity lives in state until the next change closes it. */
case class Scd2Out(userId: Long, attr: String, effStart: Long, effEnd: Long,
                   nRows: Long)

/** Buffered change row awaiting finalization. */
case class Scd2Pending(tsSec: Long, evt: Long, attr: String)

/** Snapshot of the OPEN (current) version of one entity. */
case class Scd2Cur(userId: Long, attr: String, effStart: Long, nRows: Long)

/** Per-entity SCD2 state: reorderable suffix + the open version. */
case class Scd2State(pending: List[Scd2Pending],
                     curAttr: Option[String], curStart: Long, curRows: Long)

/**
 * Streaming SCD Type-2 history — the live twin of
 * [[graft.operators.Dims.scd2]]: a keyed change-log stream becomes
 * closed validity intervals AS the next change arrives, instead of in
 * a nightly rebuild. Version detection is ORDER-SENSITIVE (a late row
 * between two processed rows re-cuts the versions), so rows buffer in
 * state until the watermark passes them — the
 * [[TrajectoryStream.stayPoints]] finalized-prefix recipe — and the
 * processed prefix is immutable: emitted intervals are never
 * retracted, heartbeats collapse exactly like batch. Emits one row per
 * CLOSED version; the open version per entity waits in state (pair
 * with a [[StateSink]]-style store if "current" must be queryable).
 */
object Scd2Stream {

  def versions(changes: Dataset[Scd2Fix],
               watermarkDelay: String = "10 minutes"): Dataset[Scd2Out] = {
    val spark = changes.sparkSession
    import spark.implicits._

    changes
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Scd2State, Scd2Out](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[Scd2State]) =>
          val wmSec = state.getCurrentWatermarkMs() / 1000
          val st = state.getOption.getOrElse(Scd2State(Nil, None, 0L, 0L))
          val incoming = rows.map(r =>
            Scd2Pending(r.ts.getTime / 1000, r.eventId, r.attr)).toList
          val (ready, pending) = (st.pending ++ incoming).partition(_.tsSec < wmSec)
          var cur = st.curAttr
          var curStart = st.curStart
          var curRows = st.curRows
          val out = Seq.newBuilder[Scd2Out]
          for (p <- ready.sortBy(r => (r.tsSec, r.evt))) {
            cur match {
              case Some(a) if a == p.attr => curRows += 1 // heartbeat
              case Some(a) =>
                out += Scd2Out(userId, a, curStart, p.tsSec, curRows)
                cur = Some(p.attr); curStart = p.tsSec; curRows = 1
              case None =>
                cur = Some(p.attr); curStart = p.tsSec; curRows = 1
            }
          }
          if (pending.isEmpty && cur.isEmpty) state.remove()
          else {
            state.update(Scd2State(pending, cur, curStart, curRows))
            // drain the buffer as soon as the watermark passes its
            // OLDEST row (the stayPoints wake-up rule)
            if (pending.nonEmpty)
              state.setTimeoutTimestamp((pending.map(_.tsSec).min + 1) * 1000)
          }
          out.result().iterator
      }
  }

  /**
   * The QUERYABLE-CURRENT side of the SCD2 stream: emits a snapshot of
   * each entity's OPEN version whenever finalized rows change it
   * (Update output mode) — new version opened, or a heartbeat grew the
   * open version's row count. Pair with a keyed-upsert sink
   * ([[StateSink]] with `maxCols` on the packed
   * `struct(effStart, nRows, attr)` — struct max is lexicographic and
   * a later snapshot of the same entity never compares lower, so
   * last-write-wins falls out of the existing merge) to get a lake
   * table answering "what is every entity's current attribute NOW"
   * without replaying the change log. Uses the same
   * finalized-prefix buffering as [[versions]]: snapshots reflect only
   * rows the watermark has passed, so they are never retracted.
   */
  def currentUpdates(changes: Dataset[Scd2Fix],
                     watermarkDelay: String = "10 minutes"): Dataset[Scd2Cur] = {
    val spark = changes.sparkSession
    import spark.implicits._

    changes
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Scd2State, Scd2Cur](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[Scd2State]) =>
          val wmSec = state.getCurrentWatermarkMs() / 1000
          val st = state.getOption.getOrElse(Scd2State(Nil, None, 0L, 0L))
          val incoming = rows.map(r =>
            Scd2Pending(r.ts.getTime / 1000, r.eventId, r.attr)).toList
          val (ready, pending) = (st.pending ++ incoming).partition(_.tsSec < wmSec)
          var cur = st.curAttr
          var curStart = st.curStart
          var curRows = st.curRows
          for (p <- ready.sortBy(r => (r.tsSec, r.evt))) {
            cur match {
              case Some(a) if a == p.attr => curRows += 1 // heartbeat
              case _ =>
                cur = Some(p.attr); curStart = p.tsSec; curRows = 1
            }
          }
          // one snapshot per invocation, only when the open version
          // moved — not per processed row: the sink upserts per key, so
          // intermediate versions inside one batch are unobservable
          // anyway and emitting them would only inflate the update feed
          val moved = cur != st.curAttr || curStart != st.curStart ||
            curRows != st.curRows
          if (pending.isEmpty && cur.isEmpty) state.remove()
          else {
            state.update(Scd2State(pending, cur, curStart, curRows))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp((pending.map(_.tsSec).min + 1) * 1000)
          }
          if (moved && cur.isDefined)
            Iterator.single(Scd2Cur(userId, cur.get, curStart, curRows))
          else Iterator.empty
      }
  }
}
