package graft.streaming

import graft.operators.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming inference with the resident linear classifier
 * ([[Text.linearClassifierTrain]]) — the online half of the
 * quality-model path: the model (a 1-row weights+bias frame, trained
 * batch-side or re-fit from a maintained
 * [[Text.classifierCounts]] table) stays resident; each micro-batch of
 * documents is scored map-only with [[Text.linearClassifierScore]]
 * (broadcast weight array + per-doc feature fold — no join, no
 * shuffle) and lands via `sink`.
 *
 * Same service contract as [[AnnStream]]: foreachBatch with the model
 * reference read exactly ONCE per batch, so every batch scores against
 * a single model generation; `ref.set(newModel)` (e.g. after a nightly
 * [[Text.classifierCountsApplyChanges]] +
 * [[Text.classifierAssemble]] refresh) takes effect at the next batch
 * boundary without stopping the stream. Scoring is stateless, so a
 * checkpoint-replayed batch reproduces identical rows — make `sink`
 * idempotent to absorb the replay. StreamParitySpec proves stream ≡
 * batch row-for-row and that a mid-stream swap scores each batch
 * against its own generation.
 */
object ClassifyStream {

  def classify(docStream: DataFrame, model: DataFrame,
               idCol: String, textCol: String,
               buckets: Int, checkpointDir: String,
               bigrams: Boolean = true)(sink: DataFrame => Unit): StreamingQuery =
    classifySwappable(docStream,
      new java.util.concurrent.atomic.AtomicReference(model),
      idCol, textCol, buckets, checkpointDir, bigrams)(sink)

  def classifySwappable(docStream: DataFrame,
                        ref: java.util.concurrent.atomic.AtomicReference[DataFrame],
                        idCol: String, textCol: String,
                        buckets: Int, checkpointDir: String,
                        bigrams: Boolean = true)
                       (sink: DataFrame => Unit): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(scoreBatch(ref.get(), batch, idCol, textCol, buckets, bigrams))
      }
      .start()

  /** One scored batch — factored so the spec asserts stream ≡ batch. */
  def scoreBatch(model: DataFrame, batch: DataFrame,
                 idCol: String, textCol: String,
                 buckets: Int, bigrams: Boolean = true): DataFrame =
    Text.linearClassifierScore(batch, model, idCol, textCol, buckets, bigrams)
}
