package graft

import org.apache.spark.sql.DataFrame

/**
 * Scan-parallelism guard for CPU-heavy map kernels (ICWS signatures,
 * codec decodes, suffix sorts): a small parquet table is often a SINGLE
 * row-group, so Spark plans ONE input split and the whole kernel runs on
 * one core — wall ≈ cpu while 31 cores idle (measured: q_dedup_wminhash
 * 5.4 s wall on 6.8 s cpu at sf0.1). `spread` round-robin-repartitions
 * to the session's default parallelism ONLY when the input plans fewer
 * partitions, so:
 *
 *  - at toy scale the kernel parallelizes (the repartition shuffles the
 *    raw rows once — bytes that are a rounding error next to the kernel
 *    cpu it unlocks);
 *  - at 100 TB the scan already carries thousands of splits and `spread`
 *    is the identity — no payload shuffle is ever added to a big input
 *    (guide §2.3's "never shuffle heavy rows to fix a map stage" rule);
 *  - the driver's lower-core-count runs adapt automatically (the target
 *    is defaultParallelism, never a constant).
 *
 * Only for order-insensitive consumers (aggregations, equi-joins):
 * keyless repartition reassigns rows to partitions (deterministically —
 * Spark sorts before round-robin), so never use it upstream of
 * partition-id-dependent logic (globalRowNumber does its OWN range
 * repartition instead).
 *
 * RAW-SCAN INPUTS ONLY: the probe reads `df.rdd.getNumPartitions`,
 * which compiles the physical plan to an RDD — on a plan containing
 * exchanges, AQE would MATERIALIZE every upstream query stage at
 * plan-construction time (executing real jobs before the caller's
 * action). A bare parquet scan has no exchanges, so the probe is free
 * there; do not point `spread` at a derived frame.
 */
object Parallelism {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
