package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for joins whose hot keys overflow a single partition.
 *
 * AQE's skew-join handles most cases at runtime; salting is the static
 * fallback for joins AQE can't split (e.g. a hot key inside an
 * aggregation-feeding join, or stream-static joins). The big side gets a
 * uniform random-ish salt derived from a row hash (deterministic — no
 * rand(), so retries and replays see the same placement); the small side
 * is replicated `saltFactor` times so every salted key still matches.
 */
object Skew {

  /**
   * Equi-join `big ⋈ small` on `key`, salted `saltFactor` ways.
   * Result rows are identical to `big.join(small, key)` — the salt is
   * internal. The small side grows ×saltFactor, so keep it broadcastable
   * after replication.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.toSeq.map(col): _*)), lit(saltFactor)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /**
   * Bloom-prefiltered join: build a Bloom filter over the SMALL side's
   * join key (`bloom_filter_agg` — one single-row aggregate, broadcast),
   * prune the BIG side with `might_contain` BEFORE its shuffle, then run
   * the equi-join. When the join is selective (a dim holding 1% of the
   * fact's keys — the blocklist/allowlist shape), the shuffle moves ~1%
   * of the fact side instead of all of it; at 100 TB that pruning IS the
   * job. False positives only cost pruning efficiency, never
   * correctness: the result is EXACTLY `big.join(small, key)`, which is
   * what q_bloom_join's oracle asserts (a plain SQL join). This is the
   * static, cross-stage version of Spark's runtime row-group filter —
   * available even when the small side is itself a computed frame.
   */
  def bloomJoin(big: DataFrame, small: DataFrame, key: String,
                expectedItems: Long = 1000000L,
                numBits: Long = 8L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    // BloomFilterAggregate/MightContain back Spark's own runtime join
    // filters but are not SQL-registered — bridged like the graft
    // kernels. might_contain requires its filter side to be a constant
    // or scalar subquery (never a joined column), so the one-row
    // aggregate rides along as a ScalarSubquery — executed once,
    // broadcast to every task, exactly like Spark's injected filters.
    val bfAgg = GraftBridge.column(
      new BloomFilterAggregate(GraftBridge.expression(xxhash64(col(key))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val bfPlan = small.agg(bfAgg.as("_bf")).queryExecution.analyzed
    big.filter(GraftBridge.column(BloomFilterMightContain(
        ScalarSubquery(bfPlan),
        GraftBridge.expression(xxhash64(col(key))))))
      .join(small, Seq(key))
  }

  /**
   * Join-key skew profile — the DETECTION half of the salting story,
   * run before choosing a join strategy (AQE reads shuffle stats at
   * runtime; this profiles the data ahead of the plan, e.g. to size
   * `saltFactor` or decide a broadcast). One partial-agg groupBy on the
   * key plus two single-row aggregates: total rows, distinct keys, the
   * heaviest key's rows, the top-k keys' combined rows, and the hot
   * ratio top1/(rows/keys) — >> 1 means the heaviest shuffle partition
   * is that many times the average.
   */
  def keyProfile(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("n"))
    // global top-k of the per-key counts: TakeOrdered over |keys| rows,
    // deterministic via the key tiebreak
    val top = counts.orderBy(col("n").desc, col(keyCol).asc).limit(k)
      .agg(max("n").as("top1_rows"), sum("n").as("topk_rows"))
    counts.agg(count(lit(1)).as("n_keys"), sum("n").as("n_rows"))
      .crossJoin(broadcast(top))
      .withColumn("skew_ratio",
        col("top1_rows") * col("n_keys") / col("n_rows").cast("double"))
      .select("n_rows", "n_keys", "top1_rows", "topk_rows", "skew_ratio")
  }
}
