package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-tier dataset builder: derives an sf×`factor` dataset from the
 * driver-generated sf0.1 tables by stacking `factor` SELF-CONSISTENT
 * replica shards. The point is the MEASURED SCALING SLOPE — run Verify
 * + Bench against the output and compare per-query cost to the sf0.1
 * artifact — so the construction is careful to scale the right axes:
 *
 * - Every identity key shifts by a replica stride (1e9, far above any
 *   source key), so key cardinality ×factor while per-key history
 *   (sessions, trajectories, order line counts) stays constant —
 *   the realistic growth mode for an event/corpus lake.
 * - Document text passes through a per-replica Caesar shift of [a-z]
 *   (whitespace untouched): a LENGTH-PRESERVING character bijection,
 *   so every intra-replica tf/df/shingle/Jaccard/edit-distance
 *   relation is preserved EXACTLY (n_chars included), while
 *   cross-replica token, shingle and substring overlap is
 *   structurally zero — duplicate GROUPS scale ×factor instead of
 *   group SIZES scaling ×factor (which would blow candidate- and
 *   true-pair counts up quadratically and measure a denser workload,
 *   not a bigger one).
 * - Embeddings transform by a per-replica signed rotation (cyclic
 *   dimension shift + deterministic sign flips — an ORTHOGONAL map):
 *   intra-replica cosines/norms are preserved to the bit, while
 *   cross-replica vectors decorrelate, for the same reason as text.
 *   Replica 0 is the identity on every axis.
 * - events.value shifts by +2·i: the derived lat/lon grids (value-based
 *   in the analytics queries) separate replicas by ≥2° (>200 km), so
 *   proximity joins (encounters) scale linearly instead of
 *   every-replica-meets-every-replica.
 * - region/nation are fixed dimension domains — copied, not replicated.
 *
 * Usage: runMain graft.ScaleData [srcDir] [outDir] [factor]
 */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("bench_data/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    require(factor >= 1, "factor must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val S = 1000000000L // key stride per replica

    def stacked(name: String, nFiles: Int)(f: (DataFrame, Int) => DataFrame): Unit = {
      val t = Tables.table(spark, src, name)
      (0 until factor).map(i => f(t, i)).reduce(_ unionByName _)
        .repartition(nFiles)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale] $name x$factor written")
    }
    def shift(c: String, i: Int) = col(c) + lit(i.toLong * S)
    // shared Caesar-decoration alphabet (documents.text, customer.c_name)
    require(factor <= 26, s"Caesar decoration supports <= 26 replicas " +
      s"(relative shift must stay nonzero mod 26), got $factor")
    val Alpha = "abcdefghijklmnopqrstuvwxyz"

    // fixed dimension domains: copy
    for (n <- Seq("region", "nation"))
      Tables.table(spark, src, n).write.mode("overwrite")
        .parquet(s"$out/$n.parquet")

    // c_name gets the same per-replica Caesar decoration as document
    // text: intra-replica name similarity — the entity-
    // resolution family's levenshtein structure and its name-prefix
    // blocking keys — is preserved exactly (digits/# untouched, [a-z]
    // bijected), while cross-replica names never share a block. Without
    // it, replicas carry IDENTICAL name sets and any fixed-cardinality
    // block key would densify quadratically instead of scaling out.
    stacked("customer", 4)((t, i) => t
      .withColumn("c_custkey", shift("c_custkey", i))
      .withColumn("c_name",
        if (i == 0) col("c_name")
        else translate(col("c_name"), Alpha, Alpha.drop(i) + Alpha.take(i))))
    stacked("supplier", 2)((t, i) => t.withColumn("s_suppkey", shift("s_suppkey", i)))
    stacked("part", 4)((t, i) => t.withColumn("p_partkey", shift("p_partkey", i)))
    stacked("orders", 8)((t, i) => t
      .withColumn("o_orderkey", shift("o_orderkey", i))
      .withColumn("o_custkey", shift("o_custkey", i)))
    stacked("lineitem", 16)((t, i) => t
      .withColumn("l_orderkey", shift("l_orderkey", i))
      .withColumn("l_partkey", shift("l_partkey", i))
      .withColumn("l_suppkey", shift("l_suppkey", i)))
    stacked("events", 16)((t, i) => t
      .withColumn("event_id", shift("event_id", i))
      .withColumn("user_id", shift("user_id", i))
      .withColumn("value", col("value") + lit(2.0 * i)))
    // Replica text decoration: per-replica CAESAR SHIFT of [a-z]
    // (whitespace untouched). A LENGTH-PRESERVING character bijection,
    // so every intra-replica relation — token counts, lengths, tf/df,
    // shingles, Jaccard, n_chars, and crucially which 30-char heads
    // collide — is preserved BIT-IDENTICALLY per replica, while any
    // two replicas sit a nonzero relative shift apart: cross-replica
    // heads differ in every alphabetic character (edit distance ~
    // head length >> any near-dup bound). Two earlier schemes failed
    // the edit-distance family: "r<i>" suffixes left cross-replica
    // heads 1 edit apart PER TOKEN (q_editdist true pairs 260 at
    // sf0.1 -> 59,516 at sf1 — quadratic in the factor), and longer
    // suffixes inflated token lengths so 30-char heads held fewer
    // tokens and intra-replica pairs densified instead. Chance
    // cross-replica SINGLE-token coincidences (shift_i(vocab) meeting
    // shift_j(vocab)) merge a little df mass but cannot manufacture
    // near-dup pairs: every pair family needs many shared tokens /
    // consecutive n-grams / low Hamming, all of which stay
    // replica-disjoint by construction.
    stacked("documents", 16)((t, i) =>
      (if (i == 0) t
       else t.withColumn("text",
         translate(col("text"), Alpha, Alpha.drop(i) + Alpha.take(i))))
        .withColumn("doc_id", shift("doc_id", i)))
    stacked("embeddings", 8)((t, i) =>
      (if (i == 0) t
       else t.withColumn("embedding",
         transform(sequence(lit(0), size(col("embedding")) - 1), j => {
           val d = size(col("embedding"))
           val rot = element_at(col("embedding"), pmod(j + lit(i * 13), d) + 1)
           val sgn = when(pmod(lit(i) * (j * 2 + 7) + lit(i) * j * j, lit(3)) === 1,
             lit(-1.0f)).otherwise(lit(1.0f))
           (rot * sgn).cast("float")
         }).cast("array<float>")))
        .withColumn("vec_id", shift("vec_id", i)))

    println(s"[scale] done: $out (factor $factor from $src)")
    spark.stop()
  }
}
