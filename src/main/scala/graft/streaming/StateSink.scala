package graft.streaming

import graft.sources.StateStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming keyed-upsert sink: maintains a running per-key state from a
 * live delta stream by MERGEing each micro-batch into the
 * [[graft.sources.StateStore]] as version `b<batchId>` — the streaming
 * MERGE-INTO (reference: the batch incremental state story of
 * utils/voyage_state_io.py + fact_voyage_summary._merge_state, applied
 * to a continuous feed).
 *
 * Effectively-once without a transactional table format: Structured
 * Streaming re-delivers a batch WITH THE SAME batchId on checkpoint
 * recovery, and [[StateStore.merge]] rebuilds that version from the
 * pre-batch state — so replaying batch N overwrites version bN with
 * identical content instead of double-adding the deltas, and a crash
 * mid-merge leaves an uncommitted (invisible) version the retry deletes.
 *
 * The batch is pre-aggregated to one delta row per key here (sum/min/max
 * — partial-agg'd, one shuffle of |keys-in-batch| rows) before the
 * merge, so callers stream raw per-event rows.
 */
object StateSink {

  def start(events: DataFrame, root: String, checkpointDir: String,
            keys: Seq[String], sumCols: Seq[String],
            minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
            nBuckets: Int = StateStore.DefaultBuckets): StreamingQuery = {
    require(sumCols.nonEmpty || minCols.nonEmpty || maxCols.nonEmpty,
      "StateSink needs at least one of sumCols/minCols/maxCols")
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, root, keys, sumCols, minCols, maxCols, nBuckets)
      }
      .start()
  }

  /**
   * [[start]] plus a live CHANGE FEED: after each micro-batch's merge,
   * the row-level CDF for exactly that batch's span
   * ([[StateStore.changesBetween]] between version b<id> and b<id+1> —
   * batch versions are zero-padded, so the successor id IS the next
   * exclusive bound) goes to `feedSink`. Downstream mirrors apply each
   * feed with [[StateStore.applyChanges]] instead of re-reading the
   * store. Checkpoint replay recomputes the SAME feed for a re-delivered
   * batch (the merge no-ops, the span is unchanged) — use an idempotent
   * feed sink, the same contract as every foreachBatch service here.
   */
  def startWithChangeFeed(events: DataFrame, root: String, checkpointDir: String,
                          keys: Seq[String], sumCols: Seq[String],
                          minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
                          nBuckets: Int = StateStore.DefaultBuckets)
                         (feedSink: DataFrame => Unit): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, root, keys, sumCols, minCols, maxCols, nBuckets)
        feedSink(StateStore.changesBetween(batch.sparkSession, root, keys,
          Some(f"b$batchId%012d"), Some(f"b${batchId + 1}%012d")))
      }
      .start()

  /** One micro-batch's merge — factored out so recovery behavior is
   * directly testable (same batchId → same version → no-op replay). */
  def mergeBatch(batch: DataFrame, batchId: Long, root: String,
                 keys: Seq[String], sumCols: Seq[String],
                 minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
                 nBuckets: Int = StateStore.DefaultBuckets): Unit = {
    require(sumCols.nonEmpty || minCols.nonEmpty || maxCols.nonEmpty,
      "StateSink needs at least one of sumCols/minCols/maxCols — " +
        "an all-empty agg list would fail inside foreachBatch with an " +
        "opaque NoSuchElementException")
    if (batch.isEmpty) return // empty trigger: nothing to version
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    val deltas = batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    StateStore.merge(batch.sparkSession, root, f"b$batchId%012d", deltas,
      keys, sumCols, minCols, maxCols, nBuckets)
  }
}
