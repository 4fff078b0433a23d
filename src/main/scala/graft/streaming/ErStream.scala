package graft.streaming

import graft.operators.EntityResolution
import graft.sources.StateStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * STREAMING entity resolution — assign every record of a live feed an
 * `entity_id` against the ENTITY REGISTRY built so far (the streaming
 * twin of [[EntityResolution.entities]], and the operational shape of
 * record ingestion: a CRM/KYC feed does not land a day's records and
 * re-resolve the archive, it resolves each micro-batch as it arrives).
 *
 * Per micro-batch (foreachBatch — blocking joins, scoring and a bounded
 * CC loop are batch constructs):
 *  1. CROSS candidates: batch × registry equi-join on the block key
 *     (the registry is never self-paired — its pairs were resolved when
 *     its records arrived); score with the same
 *     [[EntityResolution.scorePairs]] rule as batch ER.
 *  2. Each batch record with a registry match ≥ threshold ADOPTS the
 *     best match's entity id (highest score, ties to the LOWEST entity
 *     id — deterministic). Registry entities never merge in-stream: a
 *     record matching two entities is evidence the REGISTRY needs a
 *     merge, which is batch maintenance over match evidence (re-run
 *     [[EntityResolution.entities]] over accumulated pairs), not a
 *     per-record streaming decision.
 *  3. Records with no registry match resolve AMONG THEMSELVES exactly
 *     like batch ER: [[EntityResolution.blockCandidates]] →
 *     [[EntityResolution.matches]] → min-label CC → entity_id =
 *     cluster label (own id when unmatched).
 *  4. The batch's `(record, entity_id)` rows append as
 *     `b=<batchId>/records` with a commit marker LAST — one atomic
 *     visibility point; the registry is the union of committed batches.
 *
 * Exactly-once: checkpoint recovery re-delivers a batch with the same
 * batchId; a committed `b=` dir short-circuits the replay, an
 * uncommitted one is a crashed attempt the retry deletes. The registry
 * is a pure function of the delivered batches.
 *
 * Scale: per-batch cost is the batch's own blocking joins — the
 * registry side shuffles on the block key (bucket the registry by it
 * at rest and the exchange disappears); nothing is ever quadratic in
 * the archive. `maxBlock` guards both the cross join (a degenerate
 * block key would pair every batch record with the whole registry
 * block) and the intra-batch self-join.
 */
object ErStream {

  def start(records: DataFrame, root: String, checkpointDir: String,
            idCol: String, blockCols: Seq[String], threshold: Double,
            stringCols: Seq[(String, Double)] = Seq.empty,
            exactCols: Seq[(String, Double)] = Seq.empty,
            numericCols: Seq[(String, Double, Double)] = Seq.empty,
            maxBlock: Int = 1000, maxIter: Int = 10): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root, idCol, blockCols, threshold,
          stringCols, exactCols, numericCols, maxBlock, maxIter)
      }
      .start()

  /** The entity registry so far: every committed record + its entity_id. */
  def registry(spark: SparkSession, root: String): DataFrame = {
    val dirs = committedDirs(spark, root)
    require(dirs.nonEmpty, s"no committed batches at $root")
    spark.read.parquet(dirs: _*)
  }

  /** One micro-batch — factored out so replay/recovery is directly
   * testable (committed batchId → verbatim no-op). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
                   idCol: String, blockCols: Seq[String], threshold: Double,
                   stringCols: Seq[(String, Double)],
                   exactCols: Seq[(String, Double)],
                   numericCols: Seq[(String, Double, Double)],
                   maxBlock: Int, maxIter: Int): Unit = {
    val spark = batch.sparkSession
    val rootP = new org.apache.hadoop.fs.Path(root)
    val f = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bdir = new org.apache.hadoop.fs.Path(rootP, f"b=$batchId%012d")
    val marker = new org.apache.hadoop.fs.Path(bdir, StateStore.CommitMarker)
    if (f.exists(marker)) return // replayed batch: already committed
    if (f.exists(bdir)) f.delete(bdir, true) // crashed attempt
    if (batch.isEmpty) return // empty trigger: nothing to commit

    val dirs = committedDirs(spark, root)
    val reg =
      if (dirs.isEmpty) batch.limit(0).withColumn("entity_id", col(idCol))
      else spark.read.parquet(dirs: _*)

    // 1. cross candidates on the block key (null keys pair with nothing,
    //    oversized BATCH-side blocks are the degenerate-key guard)
    val keyOk = blockCols.map(col(_).isNotNull).reduce(_ && _)
    val batchSizes = batch.filter(keyOk)
      .groupBy(blockCols.map(col): _*).agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") <= maxBlock).drop("_bn")
    val bKeyed = batch.filter(keyOk).join(batchSizes, blockCols)
    val crossCand = reg.filter(keyOk)
      .select(col(idCol).as("id_a") +: blockCols.map(col): _*)
      .join(bKeyed.select(col(idCol).as("id_b") +: blockCols.map(col): _*),
        blockCols)
      .select("id_a", "id_b")
    val combined = batch.unionByName(reg.drop("entity_id"))
    val crossScored = EntityResolution.scorePairs(combined, crossCand,
        idCol, stringCols, exactCols, numericCols)
      .filter(col("score") >= threshold)

    // 2. adopt the best registry entity: highest score, ties to the
    //    LOWEST entity id (max over (score, -entity_id) — deterministic)
    val adopted = crossScored
      .join(reg.select(col(idCol).as("id_a"), col("entity_id")), "id_a")
      .groupBy(col("id_b").as(idCol))
      .agg(max_by(col("entity_id"),
        struct(col("score"), (col("entity_id") * -1).as("_nid"))).as("entity_id"))

    // 3. leftovers resolve among themselves exactly like batch ER
    val leftovers = batch.join(adopted.select(idCol), Seq(idCol), "left_anti")
    val intraPairs = EntityResolution.matches(leftovers,
      EntityResolution.blockCandidates(leftovers, idCol, blockCols, maxBlock),
      idCol, threshold, stringCols, exactCols, numericCols)
    val fresh = EntityResolution.entities(leftovers, intraPairs
      .select("id_a", "id_b"), idCol)
      .select(col(idCol), col("entity_id"))

    // 4. land the batch's assignments, marker LAST
    val out = batch.join(
      adopted.unionByName(fresh), Seq(idCol), "inner")
    out.write.parquet(new org.apache.hadoop.fs.Path(bdir, "records").toString)
    f.create(marker).close()
  }

  private def committedDirs(spark: SparkSession, root: String): Seq[String] = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val f = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(rootP)) return Seq.empty
    f.listStatus(rootP).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("b="))
      .filter(p => f.exists(new org.apache.hadoop.fs.Path(p, StateStore.CommitMarker)))
      .map(p => new org.apache.hadoop.fs.Path(p, "records"))
      .filter(p => f.exists(p) && f.listStatus(p).exists(s =>
        s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith(".")))
      .map(_.toString).sorted.toSeq
  }
}
