package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable sampling for training-data pipelines.
 *
 * `sample(fraction)` is seed- and partitioning-dependent — rerunning a
 * 100 TB job must select the SAME rows, and a DuckDB/Trino consumer must
 * be able to reproduce the split. So the sampling decision is a pure
 * function of the row key: bucket = first 32 bits of md5(key) mod
 * `buckets`; keep when bucket < fraction·buckets. md5 (unlike xxhash64)
 * is bit-identical across engines.
 */
object Sampling {

  val DefaultBuckets = 10000

  /** Stable bucket in [0, buckets) from a key column. */
  def hashBucket(key: Column, buckets: Int = DefaultBuckets): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Keep a deterministic `fraction` of rows by key hash. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 buckets: Int = DefaultBuckets): DataFrame =
    df.filter(hashBucket(col(keyCol), buckets) < (fraction * buckets).toLong)

  /**
   * Per-stratum deterministic sampling: each stratum value gets its own
   * keep-fraction (e.g. downsample dominant languages, keep all of rare
   * ones). Missing strata keep `defaultFraction`. The fraction lookup is
   * a literal when-chain — no join, stays in codegen.
   */
  def stratifiedHashSample(df: DataFrame, keyCol: String, stratumCol: String,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 1.0,
                           buckets: Int = DefaultBuckets): DataFrame = {
    val cut = fractions.foldLeft(lit((defaultFraction * buckets).toLong)) {
      case (els, (stratum, frac)) =>
        when(col(stratumCol) === stratum, lit((frac * buckets).toLong)).otherwise(els)
    }
    df.filter(hashBucket(col(keyCol), buckets) < cut)
  }

  /**
   * Train/validation/test split by key hash: adds a `split` column
   * ("train" / "val" / "test") that is stable across runs and engines.
   */
  def splitAssign(df: DataFrame, keyCol: String, valFraction: Double,
                  testFraction: Double, buckets: Int = DefaultBuckets): DataFrame = {
    val b = hashBucket(col(keyCol), buckets)
    val valCut = (valFraction * buckets).toLong
    val testCut = valCut + (testFraction * buckets).toLong
    df.withColumn("split",
      when(b < valCut, "val").when(b < testCut, "test").otherwise("train"))
  }
}
