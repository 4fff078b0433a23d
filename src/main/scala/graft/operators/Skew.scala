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
}
