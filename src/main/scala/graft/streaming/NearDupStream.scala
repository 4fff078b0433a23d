package graft.streaming

import graft.operators.Dedup
import graft.sources.StateStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * STREAMING near-duplicate deduplication — MinHash-LSH dedup of a live
 * document feed against everything kept so far (the streaming twin of
 * [[Dedup.minhashLsh]] / [[Dedup.dedupAgainstIndex]], and the missing
 * operational half of the daily-crawl story: a crawler does not land a
 * day's corpus and re-pair the archive, it dedups each micro-batch as
 * it arrives).
 *
 * Per micro-batch (foreachBatch — candidate generation is banded
 * equi-joins and a bounded CC loop, batch constructs):
 *  1. probe the batch against the persisted BAND INDEX of every
 *     previously KEPT doc ([[Dedup.dedupAgainstIndex]] — archive text
 *     re-read only for candidate ids, never a full archive pass);
 *     batch docs with a verified archive match drop;
 *  2. survivors' intra-batch verified pairs form components
 *     ([[Dedup.clusterPairs]]); each component resolves by the
 *     SEQUENTIAL GREEDY rule — ids ascending, keep unless a directly
 *     verified pair links to an already-kept member. Components are
 *     tiny (near-dup clusters), so the per-component resolution is a
 *     `flatMap` over collected member/pair lists — distributed across
 *     components, sequential only inside one;
 *  3. kept docs and their band rows append as `b=<batchId>/{kept,index}`
 *     with a commit marker LAST — one atomic visibility point.
 *
 * Exactly-once: checkpoint recovery re-delivers a batch with the same
 * batchId; a committed `b=` dir short-circuits the replay, an
 * uncommitted one is a crashed attempt the retry deletes. The kept
 * corpus is therefore a pure function of the delivered batches.
 *
 * Scale: state is the band index (32 longs per kept doc) + kept text,
 * both bucketable by `(band, bh)` / id; each batch's cost is its own
 * banding plus candidate-pruned verification — never quadratic in the
 * archive.
 */
object NearDupStream {

  def start(docs: DataFrame, root: String, checkpointDir: String,
            idCol: String, textCol: String,
            n: Int = 3, numPerms: Int = 128, bands: Int = 32,
            threshold: Double = 0.7, maxIter: Int = 10): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root, idCol, textCol,
          n, numPerms, bands, threshold, maxIter)
      }
      .start()

  /** The tf-WEIGHTED twin of [[start]]: every stage swaps its ICWS
   * counterpart in ([[Dedup.wminhashIndex]] /
   * [[Dedup.dedupAgainstIndexWeighted]] — collision probability exactly
   * the weighted Jaccard, candidates verified with the exact Σmin/Σmax
   * merge), so a feed of repetitive variants ("spam" vs "spam ×6")
   * discriminates where the set version cannot. Same sequential-greedy
   * resolution, same committed-batch replay contract, same layout —
   * state under a separate root. */
  def startWeighted(docs: DataFrame, root: String, checkpointDir: String,
                    idCol: String, textCol: String,
                    n: Int = 3, numPerms: Int = 128, bands: Int = 32,
                    threshold: Double = 0.7, maxIter: Int = 10): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root, idCol, textCol,
          n, numPerms, bands, threshold, maxIter, weighted = true)
      }
      .start()

  /** Every kept document so far (committed batches only). */
  def keptCorpus(spark: SparkSession, root: String): DataFrame = {
    val dirs = nonEmptyDataDirs(spark, root, "kept")
    require(dirs.nonEmpty, s"no kept batches at $root")
    spark.read.parquet(dirs: _*)
  }

  /** One micro-batch — factored out so replay/recovery is directly
   * testable (committed batchId → verbatim no-op). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
                   idCol: String, textCol: String,
                   n: Int, numPerms: Int, bands: Int,
                   threshold: Double, maxIter: Int,
                   weighted: Boolean = false): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val rootP = new org.apache.hadoop.fs.Path(root)
    val f = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bdir = new org.apache.hadoop.fs.Path(rootP, f"b=$batchId%012d")
    val marker = new org.apache.hadoop.fs.Path(bdir, StateStore.CommitMarker)
    if (f.exists(marker)) return // replayed batch: already committed
    if (f.exists(bdir)) f.delete(bdir, true) // crashed attempt
    if (batch.isEmpty) return // empty trigger: nothing to commit

    val indexDirs = nonEmptyDataDirs(spark, root, "index")
    val keptDirs = nonEmptyDataDirs(spark, root, "kept")
    def buildIndex(df: DataFrame) =
      if (weighted) Dedup.wminhashIndex(df, idCol, textCol, n, numPerms, bands)
      else Dedup.minhashIndex(df, idCol, textCol, n, numPerms, bands)
    val index =
      if (indexDirs.isEmpty) buildIndex(batch.limit(0))
      else spark.read.parquet(indexDirs: _*)
    val corpus = if (keptDirs.isEmpty) batch.limit(0)
      else spark.read.parquet(keptDirs: _*)

    val pairs = graft.CacheScope.persist(
      if (weighted)
        Dedup.dedupAgainstIndexWeighted(batch, index, corpus, idCol, textCol,
          n, numPerms, bands, threshold)
      else
        Dedup.dedupAgainstIndex(batch, index, corpus, idCol, textCol,
          n, numPerms, bands, threshold))
    val archDropped = pairs.filter(col("dup_src") === "old")
      .select(col("new_id")).distinct()
    // intra-batch pairs among archive survivors only: a doc dropped by
    // the archive is not kept, so it cannot drop anyone else
    val newPairs = pairs.filter(col("dup_src") === "new")
      .join(archDropped, Seq("new_id"), "left_anti")
      .join(archDropped.withColumnRenamed("new_id", "dup_id"),
        Seq("dup_id"), "left_anti")
      .select(col("new_id"), col("dup_id")) // new_id < dup_id by construction

    // per-component sequential-greedy resolution: keep ids ascending
    // unless a verified pair links to an already-kept member
    // (shared fold — Dedup.sequentialGreedyDrop)
    val intraDropped = Dedup
      .sequentialGreedyDrop(newPairs, "new_id", "dup_id", maxIter)
      .withColumnRenamed("id", "new_id")

    val dropAll = archDropped.select(col("new_id").cast("long"))
      .unionByName(intraDropped).distinct()
      .withColumnRenamed("new_id", idCol)
    val kept = batch.join(dropAll, Seq(idCol), "left_anti")

    kept.write.parquet(new org.apache.hadoop.fs.Path(bdir, "kept").toString)
    buildIndex(kept)
      .write.parquet(new org.apache.hadoop.fs.Path(bdir, "index").toString)
    f.create(marker).close() // marker LAST: the batch's atomic commit
    pairs.unpersist(false)
  }

  /** Committed batches' `sub` dirs that actually hold data files (an
   * all-dropped batch writes an empty kept dir — only `_SUCCESS`). */
  private def nonEmptyDataDirs(spark: SparkSession, root: String,
                               sub: String): Seq[String] = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val f = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(rootP)) return Seq.empty
    f.listStatus(rootP).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("b="))
      .filter(p => f.exists(new org.apache.hadoop.fs.Path(p, StateStore.CommitMarker)))
      .map(p => new org.apache.hadoop.fs.Path(p, sub))
      .filter(p => f.exists(p) && f.listStatus(p).exists(s =>
        s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith(".")))
      .map(_.toString).sorted.toSeq
  }
}
