package graft.streaming

import graft.operators.{Analytics, Similarity, Text}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{array, coalesce, col}
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming retrieval over RESIDENT indexes — the sparse and hybrid
 * siblings of [[AnnStream]]: a [[Text.bm25Index]] (postings-with-stats
 * frame) and/or a [[Similarity.PqIndex]] stay resident while query
 * micro-batches come and go. Same design contract as AnnStream:
 * foreachBatch (per-query rank windows are a batch construct, so each
 * batch's plan IS the batch scoring plan and stream ≡ batch is asserted,
 * not assumed), no streaming state, no watermark — scoring is stateless
 * in the queries, so checkpoint replay reproduces identical rows (use
 * an idempotent sink). Indexes sit behind `AtomicReference`s read once
 * per batch: re-landing the corpus re-indexes and swaps with no stream
 * restart and no mixed-index rows (AnnStream's atomicity contract,
 * verbatim).
 *
 * Scale: the BM25 index is one row per (doc, distinct token) — the raw
 * corpus is never touched at query time; the PQ index is m ints + a
 * norm per vector; each batch broadcasts only its own query terms/LUT.
 */
object RetrieveStream {

  /** Sparse half: each micro-batch of (id, text) queries is BM25-scored
   * against the resident index. */
  def bm25Retrieve(queryStream: DataFrame,
                   ref: java.util.concurrent.atomic.AtomicReference[DataFrame],
                   qIdCol: String, qTextCol: String, k: Int,
                   checkpointDir: String,
                   scoreRoundDecimals: Option[Int] = Some(3))
                  (sink: DataFrame => Unit): StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(Text.bm25ScoreIndex(ref.get(), batch, qIdCol, qTextCol, k,
          scoreRoundDecimals = scoreRoundDecimals))
      }
      .start()

  /** The resident index PAIR a hybrid service holds: swap the whole
   * case class through ONE AtomicReference so a re-index can never be
   * observed half-applied (two separate refs would let a set racing a
   * running batch fuse one generation's sparse ranks with the other's
   * dense ranks — exactly the mixed-index rows the AnnStream contract
   * rules out). */
  final case class HybridIndex(bm25: DataFrame, pq: Similarity.PqIndex)

  /**
   * Hybrid retrieval service: each micro-batch of (id, text, embedding)
   * queries is scored against BOTH resident indexes — BM25 for the
   * sparse lexical match, PQ ADC for the dense semantic match — and the
   * two rankings fuse via [[Analytics.rrfFuse]] inside the same batch.
   * The [[HybridIndex]] reference is read exactly once per batch, so a
   * re-index (`ref.set(HybridIndex(newBm25, newPq))`) swaps the whole
   * stack atomically at the next batch boundary.
   */
  def hybridRetrieve(queryStream: DataFrame,
                     ref: java.util.concurrent.atomic.AtomicReference[HybridIndex],
                     qIdCol: String, qTextCol: String, qVecCol: String,
                     k: Int, perListK: Int, checkpointDir: String,
                     scoreRoundDecimals: Option[Int] = Some(3))
                    (sink: DataFrame => Unit): StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val idx = ref.get()
        val sparse = Text.bm25ScoreIndex(idx.bm25, batch,
            qIdCol, qTextCol, perListK, scoreRoundDecimals = scoreRoundDecimals)
          .select(col("query_id"), col("doc_id"), col("rank"))
        val dense = Similarity.pqScore(idx.pq, batch,
            qIdCol, qVecCol, perListK)
          .select(col("query_id"), col("cand_id").as("doc_id"), col("rank"))
        sink(Analytics.rrfFuse(Seq(sparse, dense), k))
      }
      .start()

  /** The resident stack of the DIVERSIFIED service: the hybrid pair
   * plus the PQ-reconstructed candidate vectors
   * ([[Similarity.pqReconstruct]] — derived once per index generation,
   * never per batch), swapped as one unit through one reference. */
  final case class DiversifiedIndex(bm25: DataFrame, pq: Similarity.PqIndex,
                                    vecs: DataFrame)

  object DiversifiedIndex {
    /** Build the resident stack: reconstruct + persist the candidate
     * vectors from the index itself (no corpus read). */
    def of(bm25: DataFrame, pq: Similarity.PqIndex): DiversifiedIndex =
      DiversifiedIndex(bm25, pq,
        graft.CacheScope.persist(Similarity.pqReconstruct(pq)))
  }

  /**
   * The FULL retrieval stack, live: retrieve (BM25 + PQ ADC) → fuse
   * (RRF) → DIVERSIFY (MMR over the fused pool, geometry from the
   * PQ-reconstructed vectors — the index is the only data the service
   * holds). RRF scores are rescaled per query to [0, 1] (max-normalized)
   * before MMR so `lambda` trades off against cosine on a shared scale.
   * Pool stays bounded at `poolK` per query, so the MMR group work is
   * O(poolK²) per query — the [[Similarity.mmrRerank]] contract.
   */
  def hybridRetrieveDiversified(queryStream: DataFrame,
                                ref: java.util.concurrent.atomic.AtomicReference[DiversifiedIndex],
                                qIdCol: String, qTextCol: String, qVecCol: String,
                                k: Int, perListK: Int, poolK: Int,
                                mmrLambda: Double, checkpointDir: String,
                                scoreRoundDecimals: Option[Int] = Some(3))
                               (sink: DataFrame => Unit): StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(diversifiedBatch(ref.get(), batch, qIdCol, qTextCol, qVecCol,
          k, perListK, poolK, mmrLambda, scoreRoundDecimals))
      }
      .start()

  /** One diversified-retrieval batch — factored so the spec asserts
   * stream ≡ batch on the same pool. */
  def diversifiedBatch(idx: DiversifiedIndex, batch: DataFrame,
                       qIdCol: String, qTextCol: String, qVecCol: String,
                       k: Int, perListK: Int, poolK: Int, mmrLambda: Double,
                       scoreRoundDecimals: Option[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{max => fmax}
    val sparse = Text.bm25ScoreIndex(idx.bm25, batch,
        qIdCol, qTextCol, perListK, scoreRoundDecimals = scoreRoundDecimals)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val dense = Similarity.pqScore(idx.pq, batch, qIdCol, qVecCol, perListK)
      .select(col("query_id"), col("cand_id").as("doc_id"), col("rank"))
    // LEFT join: a candidate surfaced by the BM25 corpus but absent from
    // the PQ index (corpora maintained on different cadences) must stay
    // in the pool, not silently vanish before MMR. Its geometry falls
    // back to the empty vector — norm 0, similarity 0 in mmrRerank — so
    // it competes on relevance alone and pays no redundancy penalty.
    val pool = Analytics.rrfFuse(Seq(sparse, dense), poolK)
      .withColumn("rel",
        col("rrf") / fmax(col("rrf")).over(Window.partitionBy("query_id")))
      .join(idx.vecs.withColumnRenamed("cand_id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("vec", coalesce(col("vec"), array().cast("array<double>")))
    Similarity.mmrRerank(pool, "query_id", "doc_id", "rel", "vec",
      k = k, lambda = mmrLambda, maxCandidates = math.max(poolK, 1024))
  }
}
