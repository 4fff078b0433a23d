package graft.streaming

import org.apache.spark.sql.DataFrame

/**
 * Streaming exact deduplication — the streaming twin of
 * [[graft.operators.Dedup.exact]] for a live feed (reference "future
 * work": the batch content-hash dedup of raw_to_staging applied to a
 * continuous AIS ingest).
 *
 * `dropDuplicatesWithinWatermark` keeps one row per key and expires the
 * key's state once the watermark passes it — state is bounded by the
 * watermark horizon instead of growing forever (a plain
 * `dropDuplicates` on a stream would retain every key seen, which at
 * 100 TB/day of telemetry is unbounded).
 */
object DedupStream {

  /**
   * One row per `keyCols` within the watermark horizon.
   *
   * @param events         streaming DataFrame with an event-time column
   * @param tsCol          event-time column for the watermark
   * @param keyCols        dedup key (e.g. the content hash)
   * @param watermarkDelay lateness bound, e.g. "10 minutes" — also the
   *                       horizon after which a key may repeat
   */
  def dedup(events: DataFrame, tsCol: String, keyCols: Seq[String],
            watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)
}
