package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-static enrichment: join a stream against a (small) static
 * dimension — the streaming twin of the batch lookup join (reference:
 * utils/common_functions_raw.py:163 join_lookup; dims applied per
 * micro-batch instead of per job).
 *
 * The static side is broadcast, so each micro-batch maps over the
 * stream without shuffling it and WITHOUT any streaming state: a
 * stream-static join needs no watermark because the static side never
 * grows. Left join keeps unmatched events (null description), matching
 * the batch dim semantics.
 */
object StaticEnrich {

  def lookup(stream: DataFrame, dim: DataFrame,
             streamKey: String, dimKey: String,
             payloadCols: Seq[String]): DataFrame = {
    val d = dim.select((col(dimKey).as(streamKey) +: payloadCols.map(col)): _*)
    stream.join(broadcast(d), Seq(streamKey), "left")
  }

  /**
   * SCD2-AWARE streaming enrichment: each micro-batch as-of joins event
   * time against the dimension's VERSION HISTORY (latest `eff_start` ≤
   * event ts per key — [[graft.operators.AsOf.join]]'s backward rule),
   * so a late event is enriched with the attributes that were true AT
   * ITS TIMESTAMP, where [[lookup]] against the current dim would
   * silently apply today's attributes to yesterday's event. The history
   * frame sits behind an `AtomicReference` read once per batch (the
   * AnnStream swap contract): an SCD2 rebuild swaps in atomically
   * between batches — no mixed-version batch, no stream restart.
   * Stateless in the stream → checkpoint replay reproduces identical
   * rows (idempotent sink).
   */
  def scd2AsOf(stream: DataFrame,
               historyRef: java.util.concurrent.atomic.AtomicReference[DataFrame],
               keys: Seq[String], tsCol: String, attrCols: Seq[String],
               checkpointDir: String)
              (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val versions = historyRef.get().select(
          (keys.map(col) :+ col("eff_start").as(tsCol)) ++ attrCols.map(col): _*)
        sink(graft.operators.AsOf.join(batch, versions, keys, tsCol, attrCols))
      }
      .start()
}
