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
}
