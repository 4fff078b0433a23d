package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/**
 * DELETION VECTORS — merge-on-read deletes for the versioned parquet
 * lake (the Delta deletion-vector / Iceberg positional-delete shape).
 *
 * Deleting 3 rows from a 1 GB parquet file by rewrite costs 1 GB of IO
 * per file touched; at 100 TB a GDPR erase spanning every day of a
 * year rewrites the lake. A deletion vector instead records the
 * (file, row-position) of each deleted row in a tiny side table and
 * every read anti-joins it — IO proportional to the DELETES, not the
 * data. Compaction ([[applyDeletes]]) later folds the vectors into a
 * real rewrite of ONLY the files that carry deletes.
 *
 * Layout: data lives in a [[LakeWriter.writePartitionedVersioned]]
 * lake at `path/v=N/...`; vectors live beside it under
 * `path/_dv/v=M/dv/` as `(file, pos)` parquet published through
 * [[LakeWriter.publishSnapshot]] — each DV version is the CUMULATIVE
 * deletion state, its commit marker the single atomic visibility
 * point. Rows are addressed by physical lineage
 * (`_metadata.file_path`, `_metadata.row_index`), stable for an
 * immutable parquet file.
 *
 * Crash safety, every window:
 *  - [[deleteWhere]] mid-write: the new DV version is uncommitted ⇒
 *    invisible; readers keep the prior deletion state.
 *  - [[applyDeletes]] after the data version commits but before the DV
 *    resets: every DV entry references an OLD file of a rewritten
 *    partition — that leaf now resolves to the new version, so the
 *    stale entries anti-join nothing. Reads are already exact; the DV
 *    reset is garbage collection, not correctness.
 *  - A partition whose rows are ALL deleted is NOT rewritten: a
 *    manifest-less lake cannot tombstone a leaf (an empty dir never
 *    shadows an older version), so its DV entries are retained and
 *    keep masking it — semantically identical, and the mask survives
 *    [[LakeWriter.vacuumSnapshots]] of older DV versions.
 *
 * Single-writer per table, the same contract as [[StateStore]].
 */
object DeleteVectors {

  /** Lineage column names projected by [[LakeWriter.readVersionedLineage]]. */
  val FileCol = "_dv_file"
  val PosCol = "_dv_pos"

  private val DvSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  private def dvRoot(path: String) = s"$path/_dv"

  /** Committed deletion-vector versions, ascending. */
  def dvVersions(spark: SparkSession, path: String): Seq[String] =
    LakeWriter.committedSnapshotVersions(spark, dvRoot(path))

  /** The current cumulative deletion state: `(file, pos)` rows of the
   * newest committed DV version (empty frame when none exists). */
  def currentDeletes(spark: SparkSession, path: String): DataFrame =
    dvVersions(spark, path).lastOption match {
      case Some(v) => spark.read.parquet(s"${dvRoot(path)}/v=$v/dv")
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], DvSchema)
    }

  /** Live rows of the lake — data minus deletion vectors — still
   * carrying the [[FileCol]]/[[PosCol]] lineage. The DV side is
   * broadcast: it holds one row per DELETED row, small by the
   * feature's whole premise, so the anti-join adds no shuffle. */
  def readLive(spark: SparkSession, path: String): DataFrame = {
    val data = LakeWriter.readVersionedLineage(spark, path)
    val dv = currentDeletes(spark, path)
    data.join(broadcast(dv),
      data(FileCol) === dv("file") && data(PosCol) === dv("pos"), "left_anti")
  }

  /** Live rows with the lineage columns dropped — the reader surface. */
  def readWithDeletes(spark: SparkSession, path: String): DataFrame =
    readLive(spark, path).drop(FileCol, PosCol)

  /**
   * Delete every LIVE row matching `pred` without touching a data
   * file: publishes the next cumulative DV version (prior deletes ∪
   * the new positions). Returns the number of newly deleted rows.
   * Idempotent per version: re-running the same predicate deletes
   * nothing new (already-deleted rows are no longer live).
   */
  def deleteWhere(spark: SparkSession, path: String, pred: Column): Long = {
    val newDel = readLive(spark, path).filter(pred)
      .select(col(FileCol).as("file"), col(PosCol).as("pos"))
    val n = newDel.count()
    if (n > 0) {
      val all = currentDeletes(spark, path).unionByName(newDel)
        .distinct()
      val next = nextVersion(dvVersions(spark, path))
      LakeWriter.publishSnapshot(Map("dv" -> all), dvRoot(path), next)
    }
    n
  }

  /**
   * Fold the deletion vectors into the data: rewrite ONLY the leaf
   * partitions that carry deletes as a new data version (untouched
   * partitions' files stay byte-identical and keep resolving), then
   * reset the DV to just the entries still needed (fully-deleted
   * partitions — see the object doc). `newVersion` must sort after the
   * lake's committed data versions. Returns the partition-value tuples
   * that were rewritten.
   */
  def applyDeletes(spark: SparkSession, path: String, newVersion: String,
                   partitionCols: Seq[String] = LakeWriter.DefaultPartitionCols,
                   keyCol: Option[String] = None,
                   filesPerPartition: Int = 4): Seq[Seq[String]] = {
    val dv = currentDeletes(spark, path)
    // affected leaf dirs — manifest-scale collect (one row per file
    // that carries deletes), the same contract as the stats index
    val affectedDirs = dv
      .select(regexp_extract(col("file"), "^(.*)/[^/]+$", 1).as("dir"))
      .distinct().collect().map(_.getString(0))
    if (affectedDirs.isEmpty) return Seq.empty
    // partition values parsed from the dir's name=value segments;
    // numeric values normalized (dir "day=01" reads back as int 1 under
    // partition type inference — compare both sides canonically)
    def norm(s: String): String =
      scala.util.Try(BigInt(s).toString).getOrElse(s)
    def partVals(dir: String): Seq[String] = {
      val m = dir.split("/").filter(_.contains("="))
        .map { s => val Array(k, v) = s.split("=", 2); k -> v }.toMap
      partitionCols.map(c => norm(m.getOrElse(c,
        sys.error(s"partition col $c missing in $dir"))))
    }
    val affected = affectedDirs.map(partVals).toSeq.distinct
    val pred = affected.map(vals =>
      partitionCols.zip(vals).map { case (c, v) => col(c) === lit(v) }
        .reduce(_ && _)).reduce(_ || _)
    val live = readLive(spark, path).filter(pred)
    // partitions with zero surviving rows cannot be tombstoned by a
    // rewrite (an empty leaf never shadows); they keep their DV mask
    val survivors = live.groupBy(partitionCols.map(col): _*).count()
      .collect()
      .map(r => partitionCols.indices.map(i => norm(r.get(i).toString)): Seq[String])
      .toSet
    val rewrite = affected.filter(survivors.contains)
    if (rewrite.nonEmpty) {
      val rewritePred = rewrite.map(vals =>
        partitionCols.zip(vals).map { case (c, v) => col(c) === lit(v) }
          .reduce(_ && _)).reduce(_ || _)
      LakeWriter.writePartitionedVersioned(
        live.filter(rewritePred).drop(FileCol, PosCol),
        path, newVersion, partitionCols, keyCol, filesPerPartition)
    }
    // retain only the masks still load-bearing: files in fully-deleted
    // partitions (their leaves still resolve to the old files)
    val deadDirs = affected.filterNot(survivors.contains)
    val keep =
      if (deadDirs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], DvSchema)
      else {
        val deadSet = affectedDirs.filter(d => deadDirs.contains(partVals(d))).toSet
        dv.filter(regexp_extract(col("file"), "^(.*)/[^/]+$", 1)
          .isin(deadSet.toSeq: _*))
      }
    LakeWriter.publishSnapshot(Map("dv" -> keep), dvRoot(path),
      nextVersion(dvVersions(spark, path)))
    rewrite
  }

  private def nextVersion(existing: Seq[String]): String = {
    val n = existing.flatMap(v => scala.util.Try(v.toLong).toOption)
      .maxOption.getOrElse(0L)
    f"${n + 1}%06d"
  }
}
