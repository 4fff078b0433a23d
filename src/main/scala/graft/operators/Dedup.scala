package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication family: exact (content-hash) plus the near-duplicate
 * operators a training-data pipeline needs (MinHash+LSH, SimHash,
 * n-gram Jaccard, embedding cosine).
 *
 * Reference anchor: utils/common_functions_raw.py:198 drop_duplicates
 * (sha256-of-JSON-struct content key) and
 * utils/common_functions_curated.py:191 add_hash_key (xxhash64-of-struct).
 */
object Dedup {

  /** Stable 64-bit content key over the given columns
   * (reference: common_functions_curated.py:191 add_hash_key). */
  def hashKey(df: DataFrame, cols: Seq[String], outCol: String = "hash_key"): DataFrame =
    df.withColumn(outCol, xxhash64(to_json(struct(cols.map(col): _*))))

  /** 256-bit content key, collision-safe at national-archive scale
   * (reference: common_functions_raw.py:198 drop_duplicates). */
  def contentKey(df: DataFrame, cols: Seq[String], outCol: String = "dedupe_key"): DataFrame =
    df.withColumn(outCol, sha2(to_json(struct(cols.map(col): _*)), 256))

  /**
   * Exact dedup on a content key: one row kept per distinct key.
   * Equivalent to the reference's dropDuplicates-on-hash; a hash
   * aggregation with map-side combine, no sort.
   */
  def exact(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.dropDuplicates(keyCols)

  /**
   * Deterministic exact dedup: keep the row minimizing `orderCol` within
   * each key group (e.g. smallest doc_id), and report group size.
   * min_by/count aggregate — single shuffle, partial-agg friendly.
   */
  def exactKeepFirst(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val payload = df.columns.filterNot(c => keyCols.contains(c)).toSeq
    val aggs = payload.map(c => min_by(col(c), col(orderCol)).as(c)) :+
      count(lit(1)).as("n_dups")
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Word n-gram shingles of a text column as an array (deduped). */
  def shingles(text: Column, n: Int): Column = {
    val tokens = split(text, "\\s+")
    if (n == 1) array_distinct(tokens)
    else {
      // sliding window over token indices via transform on a sequence
      val idx = sequence(lit(0), greatest(size(tokens) - n, lit(0)) - 1)
      array_distinct(transform(idx, i =>
        concat_ws(" ", slice(tokens, i + 1, lit(n)))))
    }
  }

  /**
   * Exact n-gram Jaccard similarity join: pairs (a < b) within the same
   * `blockCol` whose token-shingle Jaccard ≥ threshold.
   *
   * Blocking bounds the candidate space (at 100 TB an un-blocked
   * self-join is quadratic); within a block the join is a broadcast-able
   * equi-join on the block key.
   */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   blockCol: String, n: Int, threshold: Double): DataFrame = {
    val withSh = docs.select(col(idCol), col(blockCol),
      shingles(col(textCol), n).as("sh"))
    val a = withSh.select(col(blockCol), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col(blockCol), col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 3).as("jaccard"))
  }
}
