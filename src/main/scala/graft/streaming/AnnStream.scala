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
    pqRetrieveSwappable(queryStream,
      new java.util.concurrent.atomic.AtomicReference(index),
      idCol, vecCol, k, checkpointDir)(sink)

  /**
   * [[pqRetrieve]] with a SWAPPABLE resident index — the refresh path a
   * real retrieval service needs: the corpus grows or the embedding
   * model retrains, a new index is built with
   * [[Similarity.pqIndexBuild]], and `ref.set(newIndex)` swaps it in
   * WITHOUT stopping the stream.
   *
   * Atomicity contract: the reference is read exactly ONCE per
   * micro-batch, and foreachBatch bodies of one query run sequentially
   * — so every batch scores entirely against a single index generation
   * (no mixed-index rows), a swap between batches takes effect at the
   * next batch boundary, and a swap racing a running batch leaves that
   * batch on the generation it started with. Unpersist the OLD index's
   * frames only AFTER `set` returns (no later batch can observe it;
   * the in-flight batch, if any, still holds its own reference).
   * StreamParitySpec swaps mid-stream and proves pre/post batches each
   * match their own generation's batch pqScore.
   */
  def pqRetrieveSwappable(queryStream: DataFrame,
                          ref: java.util.concurrent.atomic.AtomicReference[Similarity.PqIndex],
                          idCol: String, vecCol: String, k: Int,
                          checkpointDir: String)(sink: DataFrame => Unit): StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val idx = ref.get()
        sink(Similarity.pqScore(idx, batch, idCol, vecCol, k))
      }
      .start()
}
