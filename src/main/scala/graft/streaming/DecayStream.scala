package graft.streaming

import graft.operators.Analytics
import graft.sources.StateStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * STREAMING half-life-decayed feature maintenance — the operational
 * proof of [[Analytics.decayedAgg]]'s mergeability contract: because
 * exponential decay composes, the resident per-key state folds each
 * micro-batch in with ONE multiply (state · 2^(−Δ/H)) plus the batch's
 * own decayed aggregate — the stream never rescans history, yet its
 * state equals a full batch recompute at every commit (spec-locked to
 * 1e-9). This is how a feature store actually serves "engagement
 * decayed at half-life H, fresh as of the last event" without a
 * nightly rebuild.
 *
 * Per micro-batch (foreachBatch — the merge is a keyed full-outer
 * join, a batch construct):
 *  1. asOf advances to max(previous asOf, batch max ts) — monotone, so
 *     late events (ts ≤ previous asOf) still fold in correctly: their
 *     own decayed weight is computed against the ADVANCED instant,
 *     which is exactly what the full recompute would do;
 *  2. previous committed state fades by 2^(−(asOf'−asOf)/H) and
 *     full-outer-merges the batch delta (coalesce-to-zero both sides);
 *  3. the new state (key-cardinality-sized) writes as
 *     `b=<batchId>/state` + `_asof` + commit marker LAST — the
 *     [[NearDupStream]] atomic-visibility protocol.
 *
 * Exactly-once: a committed batchId short-circuits verbatim on replay;
 * an uncommitted dir is a crashed attempt the retry deletes. State is
 * one row per key — the 100 TB event history never persists here.
 */
object DecayStream {

  def start(events: DataFrame, root: String, checkpointDir: String,
            keyCol: String, tsSecCol: String, valueCol: String,
            halfLifeSec: Long): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root, keyCol, tsSecCol, valueCol,
          halfLifeSec)
      }
      .start()

  /** Latest committed state: (key, decayed_sum, decayed_weight, n) plus
   * the asOf instant it is valid at. */
  def currentState(spark: SparkSession, root: String): (DataFrame, Long) = {
    val last = committedDirs(spark, root).lastOption.getOrElse(
      sys.error(s"no committed state at $root"))
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val asOf = readAsOf(f, new org.apache.hadoop.fs.Path(last))
    (spark.read.parquet(new org.apache.hadoop.fs.Path(last, "state").toString),
      asOf)
  }

  def processBatch(batch: DataFrame, batchId: Long, root: String,
                   keyCol: String, tsSecCol: String, valueCol: String,
                   halfLifeSec: Long): Unit = {
    val spark = batch.sparkSession
    val rootP = new org.apache.hadoop.fs.Path(root)
    val f = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bdir = new org.apache.hadoop.fs.Path(rootP, f"b=$batchId%012d")
    val marker = new org.apache.hadoop.fs.Path(bdir, StateStore.CommitMarker)
    if (f.exists(marker)) return // replayed batch: already committed
    if (f.exists(bdir)) f.delete(bdir, true) // crashed attempt
    if (batch.isEmpty) return

    val prevDir = committedDirs(spark, root).lastOption
    val prevAsOf = prevDir.map(d =>
      readAsOf(f, new org.apache.hadoop.fs.Path(d))).getOrElse(Long.MinValue)
    // a non-empty batch whose timestamps are ALL null aggregates max(ts)
    // to null — decayedAgg would drop every row anyway, so treat it like
    // an empty batch (return WITHOUT committing: the batchId replays as
    // a no-op) instead of NPE-ing on the null read and killing the query
    val maxRow = batch.agg(max(col(tsSecCol))).head
    if (maxRow.isNullAt(0)) return
    val batchMax = maxRow.getLong(0)
    val asOf = math.max(prevAsOf, batchMax)

    val delta = Analytics.decayedAgg(batch, Seq(keyCol), tsSecCol, valueCol,
        asOfSec = asOf, halfLifeSec = halfLifeSec)
      .select(col(keyCol), col("decayed_sum").as("_ds"),
        col("decayed_weight").as("_dw"), col("n").as("_n"))
    val merged = prevDir match {
      case None => delta.select(col(keyCol), col("_ds").as("decayed_sum"),
        col("_dw").as("decayed_weight"), col("_n").as("n"))
      case Some(d) =>
        val fade = math.pow(0.5, (asOf - prevAsOf).toDouble / halfLifeSec)
        spark.read.parquet(new org.apache.hadoop.fs.Path(d, "state").toString)
          .select(col(keyCol), (col("decayed_sum") * fade).as("_ps"),
            (col("decayed_weight") * fade).as("_pw"), col("n").as("_pn"))
          .join(delta, Seq(keyCol), "full")
          .select(col(keyCol),
            (coalesce(col("_ps"), lit(0.0)) + coalesce(col("_ds"), lit(0.0)))
              .as("decayed_sum"),
            (coalesce(col("_pw"), lit(0.0)) + coalesce(col("_dw"), lit(0.0)))
              .as("decayed_weight"),
            (coalesce(col("_pn"), lit(0L)) + coalesce(col("_n"), lit(0L)))
              .as("n"))
    }
    merged.write.parquet(new org.apache.hadoop.fs.Path(bdir, "state").toString)
    val out = f.create(new org.apache.hadoop.fs.Path(bdir, "_asof"))
    out.write(asOf.toString.getBytes("UTF-8")); out.close()
    f.create(marker).close() // marker LAST: atomic visibility
    // retention: each commit wrote a FULL key-cardinality snapshot but
    // only the latest is ever read (currentState / the next batch's
    // merge) — without pruning, storage grows O(batches x keys) in fully
    // redundant copies. Keep the new snapshot plus one predecessor (a
    // recovery point if the latest dir is lost to a partial filesystem
    // failure) and delete everything older; deletion happens AFTER the
    // new marker lands, so a crash mid-prune leaves only extra-committed
    // dirs behind — replay-safe, never a missing-state window.
    committedDirs(spark, root).dropRight(2).foreach { old =>
      f.delete(new org.apache.hadoop.fs.Path(old), true)
    }
  }

  private def readAsOf(f: org.apache.hadoop.fs.FileSystem,
                       dir: org.apache.hadoop.fs.Path): Long = {
    val in = f.open(new org.apache.hadoop.fs.Path(dir, "_asof"))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](64)
      var r = in.read(chunk)
      while (r > 0) { buf.write(chunk, 0, r); r = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8").trim.toLong
    } finally in.close()
  }

  private def committedDirs(spark: SparkSession, root: String): Seq[String] = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val f = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(rootP)) return Seq.empty
    f.listStatus(rootP).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("b="))
      .filter(p => f.exists(new org.apache.hadoop.fs.Path(p, StateStore.CommitMarker)))
      .map(_.toString).sorted.toSeq
  }
}
