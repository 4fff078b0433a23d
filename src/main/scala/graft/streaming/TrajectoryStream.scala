package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One position fix of a live feed, as the stay-point detector sees it. */
case class StayFix(userId: Long, ts: Timestamp, speed: Double,
                   lat: Double, lon: Double)

/** A finalized dwell: maximal anchored run ≥ the duration floor. */
case class StayOut(userId: Long, stayId: Long, startSec: Long, endSec: Long,
                   nPoints: Long, latMean: Double, lonMean: Double)

/** A dwell row that may still be OPEN: `closed = false` rows are
 * monotone progress snapshots of a live dwell (same stayId, growing
 * endSec); the `closed = true` row is the final, batch-equal dwell. */
case class StayProgress(userId: Long, stayId: Long, startSec: Long, endSec: Long,
                        nPoints: Long, latMean: Double, lonMean: Double,
                        closed: Boolean)

/** Open anchored run (sums, not means — merged incrementally). */
case class StayRun(startSec: Long, endSec: Long, nPoints: Long,
                   sumLat: Double, sumLon: Double)

/** A buffered fix awaiting finalization (its event time is still
 * inside the watermark's reorder window). */
case class PendingFix(tsSec: Long, speed: Double, lat: Double, lon: Double)

/** Per-entity stay state: fixes newer than the watermark (still
 * reorderable) + the open run over the finalized prefix. `runId` is
 * assigned when a run OPENS so progress and final rows share it;
 * `progressEnd` is the last progress snapshot's endSec (Long.MinValue
 * = none yet), checkpointed so a restart never re-emits a snapshot. */
case class StayState(pending: List[PendingFix], run: Option[StayRun],
                     runId: Long, nextId: Long, progressEnd: Long)

/** One position fix for the origin–destination rollup. */
case class OdFix(userId: Long, ts: Timestamp, cell: String, eventId: Long)

/** A closed voyage with its endpoint cells. */
case class OdOut(userId: Long, sessionId: Long, origin: String, dest: String,
                 startSec: Long, endSec: Long, nPoints: Long)

/** Open per-entity voyage: session bookkeeping + min/max-by endpoints. */
case class OdState(sessionId: Long, startSec: Long, lastSec: Long,
                   nPoints: Long, oSec: Long, oEvt: Long, oCell: String,
                   dSec: Long, dEvt: Long, dCell: String)

/**
 * Streaming twins of the batch trajectory rollups
 * ([[graft.operators.Trajectory.stayPoints]] /
 * [[graft.operators.Trajectory.odMatrix]]) — SURVEY §7.8's queued live
 * half of dwell/traffic-flow analytics (the reference keeps these
 * nightly; a live feed wants the dwell WHILE the vessel is anchored).
 *
 * Both are `flatMapGroupsWithState` per entity with event-time
 * timeouts — the custom-state shape Spark gives for semantics that
 * session_window can't express.
 */
object TrajectoryStream {

  /**
   * Streaming stay-point detection. Exact parity with the batch
   * operator needs run SPLITS to respect event-time order even under
   * out-of-order arrival (a late fast fix lands inside an anchored run
   * and must cut it), so fixes are buffered in state until the
   * watermark passes them: the finalized prefix is then processed in
   * ts order against the open run, emitting every closed anchored run
   * ≥ `minDurationSec`. State per entity is O(rate × watermark delay)
   * pending fixes + one open run — bounded, RocksDB-friendly. An open
   * dwell closes only on a finalized moving fix (batch runs have no
   * silence rule; the run is emitted once the vessel provably moved).
   */
  def stayPoints(points: Dataset[StayFix], speedThreshold: Double,
                 minDurationSec: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[StayOut] = {
    val spark = points.sparkSession
    import spark.implicits._
    stayPointsLive(points, speedThreshold, minDurationSec,
      progressEverySec = None, watermarkDelay)
      .filter(_.closed)
      .map(p => StayOut(p.userId, p.stayId, p.startSec, p.endSec,
        p.nPoints, p.latMean, p.lonMean))
  }

  /**
   * [[stayPoints]] with LIVE PROGRESS: while a dwell is still open,
   * emit a snapshot row (`closed = false`, same stayId as the eventual
   * final row) whenever the finalized span has grown by at least
   * `progressEverySec` since the last snapshot and has already passed
   * the duration floor — "this vessel has been anchored 6 h AND
   * COUNTING", which a closed-only stream can't say. Snapshots are
   * derived from the immutable below-watermark prefix only and the
   * last-emitted mark is checkpointed, so restarts never re-emit and
   * out-of-order arrival never retracts. The `closed = true` rows are
   * exactly the [[stayPoints]] output (batch-parity-gated).
   */
  def stayPointsLive(points: Dataset[StayFix], speedThreshold: Double,
                     minDurationSec: Long,
                     progressEverySec: Option[Long],
                     watermarkDelay: String = "10 minutes"): Dataset[StayProgress] = {
    progressEverySec.foreach(p =>
      require(p > 0, "stayPointsLive needs progressEverySec > 0"))
    val spark = points.sparkSession
    import spark.implicits._

    points
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[StayState, StayProgress](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, fixes, state: GroupState[StayState]) =>
          val wmSec = state.getCurrentWatermarkMs() / 1000
          val st = state.getOption.getOrElse(
            StayState(Nil, None, 0L, 0L, Long.MinValue))
          val incoming = fixes.map(f =>
            PendingFix(f.ts.getTime / 1000, f.speed, f.lat, f.lon)).toList
          // strictly-below-watermark fixes are immutable: nothing older
          // can arrive anymore (late rows are dropped at the source)
          val (ready, pending) = (st.pending ++ incoming).partition(_.tsSec < wmSec)
          var run = st.run
          var runId = st.runId
          var nextId = st.nextId
          var progressEnd = st.progressEnd
          val out = Seq.newBuilder[StayProgress]
          for (p <- ready.sortBy(_.tsSec)) {
            if (p.speed < speedThreshold) {
              run = run match {
                case Some(r) => Some(StayRun(math.min(r.startSec, p.tsSec),
                  math.max(r.endSec, p.tsSec),
                  r.nPoints + 1, r.sumLat + p.lat, r.sumLon + p.lon))
                case None =>
                  runId = nextId; nextId += 1; progressEnd = Long.MinValue
                  Some(StayRun(p.tsSec, p.tsSec, 1L, p.lat, p.lon))
              }
            } else run.foreach { r =>
              if (r.endSec - r.startSec >= minDurationSec)
                out += StayProgress(userId, runId, r.startSec, r.endSec, r.nPoints,
                  r.sumLat / r.nPoints, r.sumLon / r.nPoints, closed = true)
              run = None
            }
          }
          // progress snapshot of the still-open run (finalized data only)
          for (every <- progressEverySec; r <- run) {
            if (r.endSec - r.startSec >= minDurationSec &&
                (progressEnd == Long.MinValue || r.endSec >= progressEnd + every)) {
              out += StayProgress(userId, runId, r.startSec, r.endSec, r.nPoints,
                r.sumLat / r.nPoints, r.sumLon / r.nPoints, closed = false)
              progressEnd = r.endSec
            }
          }
          if (pending.isEmpty && run.isEmpty) state.remove()
          else {
            state.update(StayState(pending, run, runId, nextId, progressEnd))
            // wake once the watermark passes the OLDEST pending fix —
            // finalize as soon as anything is ready, then re-arm; keying
            // on the newest would let one far-future fix (or this
            // entity's own watermark pusher) stall the whole buffer
            if (pending.nonEmpty)
              state.setTimeoutTimestamp((pending.map(_.tsSec).min + 1) * 1000)
          }
          out.result().iterator
      }
  }

  /**
   * Streaming origin–destination voyages: gap-sessionization (the
   * [[SessionStream]] state recipe — min-start/max-end merge absorbs
   * out-of-order within the watermark) carrying each voyage's first and
   * last cell by (ts, eventId) — the same `min_by`/`max_by` struct
   * ordering the batch rollup uses, so endpoints are order-insensitive
   * and deterministic under ties. Emits one row per CLOSED voyage
   * (gap exceeded in-stream, or the watermark passed the gap horizon);
   * `groupBy(origin, dest).count` downstream reproduces the batch
   * OD matrix. State: one record per live entity.
   */
  def odVoyages(points: Dataset[OdFix], gapSeconds: Long,
                watermarkDelay: String = "10 minutes"): Dataset[OdOut] = {
    val spark = points.sparkSession
    import spark.implicits._

    def minBy(s: OdState, t: Long, e: Long, c: String): (Long, Long, String) =
      if (t < s.oSec || (t == s.oSec && e < s.oEvt)) (t, e, c)
      else (s.oSec, s.oEvt, s.oCell)
    def maxBy(s: OdState, t: Long, e: Long, c: String): (Long, Long, String) =
      if (t > s.dSec || (t == s.dSec && e > s.dEvt)) (t, e, c)
      else (s.dSec, s.dEvt, s.dCell)
    def close(userId: Long, s: OdState): OdOut =
      OdOut(userId, s.sessionId, s.oCell, s.dCell, s.startSec, s.lastSec, s.nPoints)

    points
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OdState, OdOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, fixes, state: GroupState[OdState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(close(userId, s))
          } else {
            val sorted = fixes.toSeq.sortBy(f => (f.ts.getTime, f.eventId))
            var cur = state.getOption
            val closed = Seq.newBuilder[OdOut]
            for (f <- sorted) {
              val sec = f.ts.getTime / 1000
              cur match {
                case Some(s) if sec - s.lastSec <= gapSeconds =>
                  val (os, oe, oc) = minBy(s, sec, f.eventId, f.cell)
                  val (ds, de, dc) = maxBy(s, sec, f.eventId, f.cell)
                  cur = Some(OdState(s.sessionId,
                    math.min(s.startSec, sec), math.max(s.lastSec, sec),
                    s.nPoints + 1, os, oe, oc, ds, de, dc))
                case Some(s) =>
                  closed += close(userId, s)
                  cur = Some(OdState(s.sessionId + 1, sec, sec, 1L,
                    sec, f.eventId, f.cell, sec, f.eventId, f.cell))
                case None =>
                  cur = Some(OdState(0L, sec, sec, 1L,
                    sec, f.eventId, f.cell, sec, f.eventId, f.cell))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastSec + gapSeconds) * 1000)
            }
            closed.result().iterator
          }
      }
  }
}
