package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming ANN retrieval over a STATIC PQ index — the online half of a
 * retrieval service: the index ([[Similarity.pqIndexBuild]]: persisted
 * code table + codebooks) is trained once and stays resident; each
 * micro-batch of query vectors is ADC-scored against it with
 * [[Similarity.pqScore]] and the per-query top-k lands via `sink`.
 *
 * foreachBatch, not a streaming join: per-query rank windows are a batch
 * construct, and the scoring plan inside each batch IS the batch
 * pqScore plan — so stream ≡ batch is asserted (StreamParitySpec runs
 * shuffled query batches and compares row-for-row with one batch run),
 * not assumed. No streaming state, no watermark: scoring is stateless
 * in the queries, so replay of a batch after checkpoint recovery
 * reproduces identical rows (make `sink` idempotent, e.g. keyed
 * overwrite by query_id, to absorb the replay).
 *
 * Scale: the resident index is m ints + 1 double per corpus vector —
 * the raw corpus is never touched at query time; each batch broadcasts
 * only its own |batch|·m·ks LUT.
 */
object AnnStream {

  def pqRetrieve(queryStream: DataFrame, index: Similarity.PqIndex,
                 idCol: String, vecCol: String, k: Int,
                 checkpointDir: String)(sink: DataFrame => Unit): StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(Similarity.pqScore(index, batch, idCol, vecCol, k))
      }
      .start()
}
