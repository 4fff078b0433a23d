package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Partitioned parquet lake layout: `year/month/day` directories with
 * dynamic-partition overwrite for incremental reprocessing
 * (reference: pipelines/raw_to_staging.py:124-133 — dynamic overwrite so
 * a daily rerun replaces ONLY the partitions it recomputed, never the
 * whole table).
 */
object LakeWriter {

  val DefaultPartitionCols: Seq[String] = Seq("year", "month", "day")

  /**
   * Write `df` partitioned by `partitionCols`, overwriting only the
   * partitions present in `df`.
   *
   * File sizing at scale: a blind write emits one file per (task ×
   * partition) — 1000 tasks × 365 days = small-file death. Repartitioning
   * by (partitionCols, bucket(keyCol)) gives `filesPerPartition` files
   * per day, each written by one task, and rows of one key stay in one
   * file (better downstream locality + parquet min/max pruning on key).
   */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String] = DefaultPartitionCols,
                       keyCol: Option[String] = None,
                       filesPerPartition: Int = 4): Unit = {
    val arranged = keyCol match {
      case Some(k) =>
        df.repartition((partitionCols.map(col) :+
          (pmod(xxhash64(col(k)), lit(filesPerPartition)))): _*)
      case None => df.repartition(partitionCols.map(col): _*)
    }
    arranged.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Read the lake back; partition columns come from directory names and
   * partition pruning applies to filters on them. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
