package graft.streaming

import graft.operators.{Dedup, Multimodal}
import graft.sources.StateStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * STREAMING image near-duplicate dedup — the multimodal twin of
 * [[NearDupStream]]: each micro-batch of opaque image payloads is
 * decoded to a dHash perceptual fingerprint ([[Multimodal.dHash]] —
 * the real decode→resize→gradient path, partition-local), probed
 * against the PERSISTED BAND INDEX of every image kept so far
 * (Manku-blocked Hamming candidates, [[Dedup.simhashBands]] — the
 * archive is never re-banded, let alone re-decoded, per batch), and
 * resolved intra-batch by the same sequential-greedy fold as the text
 * service ([[Dedup.sequentialGreedyDrop]]) so one-at-a-time and
 * batched arrival orders agree.
 *
 * Per micro-batch (foreachBatch — banded equi-joins and a bounded CC
 * loop, batch constructs):
 *  1. decode → (id, dhash); undecodable media keeps (a null hash can
 *     match nothing, and silently dropping a corrupt-but-maybe-unique
 *     image is a curation decision, not a dedup one);
 *  2. batch band rows equi-join the archive index on (band, bh); a
 *     verified Hamming ≤ maxHamming match drops the batch image;
 *  3. survivors' intra-batch verified pairs resolve sequentially-greedy;
 *  4. kept (id, dhash) rows and their band rows append as
 *     `b=<batchId>/{kept,index}` with a commit marker LAST — one atomic
 *     visibility point (the [[NearDupStream]] commit protocol).
 *
 * Exactly-once: a committed `b=` dir short-circuits a replayed batchId;
 * an uncommitted one is a crashed attempt the retry deletes. State is
 * ~C(maxHamming+3,3) longs per kept image — the 100 TB image corpus
 * reduces to a fingerprint index, pixels never persist.
 */
object ImageDedupStream {

  def start(images: DataFrame, root: String, checkpointDir: String,
            maxHamming: Int = 3, maxIter: Int = 10): StreamingQuery =
    images.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root, maxHamming, maxIter)
      }
      .start()

  /** Every kept image id + fingerprint so far (committed batches only). */
  def keptImages(spark: SparkSession, root: String): DataFrame = {
    val dirs = nonEmptyDataDirs(spark, root, "kept")
    require(dirs.nonEmpty, s"no kept batches at $root")
    spark.read.parquet(dirs: _*)
  }

  /** One micro-batch — factored out so replay/recovery is directly
   * testable (committed batchId → verbatim no-op). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
                   maxHamming: Int, maxIter: Int): Unit = {
    val spark = batch.sparkSession
    val rootP = new org.apache.hadoop.fs.Path(root)
    val f = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bdir = new org.apache.hadoop.fs.Path(rootP, f"b=$batchId%012d")
    val marker = new org.apache.hadoop.fs.Path(bdir, StateStore.CommitMarker)
    if (f.exists(marker)) return // replayed batch: already committed
    if (f.exists(bdir)) f.delete(bdir, true) // crashed attempt
    if (batch.isEmpty) return // empty trigger: nothing to commit

    val hashed = graft.CacheScope.persist(
      Multimodal.dHash(batch).select(col("doc_id"), col("dhash")))
    val decodable = hashed.filter(col("dhash").isNotNull)
      .withColumnRenamed("dhash", "simhash")
    val batchBands = Dedup.simhashBands(decodable, "doc_id", maxHamming)

    val indexDirs = nonEmptyDataDirs(spark, root, "index")
    val archDropped =
      if (indexDirs.isEmpty) decodable.limit(0).select(col("doc_id"))
      else batchBands.alias("n")
        .join(spark.read.parquet(indexDirs: _*).alias("o"), Seq("band", "bh"))
        .filter(bit_count(col("n.simhash")
          .bitwiseXOR(col("o.simhash"))) <= maxHamming)
        .select(col("n.id").as("doc_id")).distinct()

    val survivors = graft.CacheScope.persist(
      decodable.join(archDropped, decodable("doc_id") === archDropped("doc_id"),
          "left_anti"))
    val intraPairs = Dedup.simhashPairs(survivors, "doc_id", maxHamming)
      .select(col("id_a"), col("id_b"))
    val intraDropped = Dedup
      .sequentialGreedyDrop(intraPairs, "id_a", "id_b", maxIter)
      .withColumnRenamed("id", "doc_id")

    // kept = undecodable (null hash: matches nothing, curation decides
    // later) + survivors not dropped intra-batch
    val kept = hashed.join(
      archDropped.unionByName(intraDropped).distinct(),
      Seq("doc_id"), "left_anti")
    kept.write.parquet(new org.apache.hadoop.fs.Path(bdir, "kept").toString)
    Dedup.simhashBands(
        kept.filter(col("dhash").isNotNull).withColumnRenamed("dhash", "simhash"),
        "doc_id", maxHamming)
      .write.parquet(new org.apache.hadoop.fs.Path(bdir, "index").toString)
    f.create(marker).close() // marker LAST: the batch's atomic commit
    survivors.unpersist(false)
    hashed.unpersist(false)
  }

  /** Committed batches' `sub` dirs that actually hold data files. */
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
