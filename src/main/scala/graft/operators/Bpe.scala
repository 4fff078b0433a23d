package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BPE merge-rule learning (Sennrich et al., ACL'16) over a distributed
 * corpus — the tokenizer-training half of a training-data pipeline
 * (vocabulary/fertility profiling already lives in [[Text]]; this
 * learns the merges those profiles evaluate).
 *
 * Word-level formulation: symbols start as whitespace tokens and each
 * round merges the globally most frequent ADJACENT symbol pair
 * (ties: lexicographically smallest pair — deterministic cross-run),
 * applying it left-to-right non-overlapping, exactly the reference
 * greedy algorithm.
 *
 * Scale shape per round: adjacent-pair counting is one partial-agg'd
 * groupBy over ~|corpus tokens| rows; the winning pair is a 1-row
 * `limit(1)` collect (the learned rule IS a scalar — this is model
 * fitting, not a data path); the merge itself is a map-only fold over
 * each document's symbol array. N merges = N rounds, the same
 * iterate-with-lineage-cut discipline as PageRank/k-means here
 * ([[Analytics.pageRank]], [[Similarity.kmeans]]). A merged symbol is
 * the space-join of its parts, so merging composes across rounds and
 * the final symbols read back as token n-grams.
 */
object Bpe {

  /** Left-to-right non-overlapping single-pair merge of a symbol array:
   * fold that replaces a trailing `l` followed by the current `r` with
   * the joined symbol — "a a a" under (a,a) becomes ["a a", "a"], the
   * BPE rule. `try_element_at` keeps the empty-accumulator probe
   * null-safe under ANSI. */
  def mergePair(syms: Column, l: String, r: String): Column = {
    val merged = l + " " + r
    aggregate(syms, array().cast("array<string>"), (acc, t) =>
      when(try_element_at(acc, lit(-1)) === lit(l) && t === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(t))))
  }

  /**
   * Learn `numMerges` merge rules. Returns
   * `(merges, tokenized)`: merges = one row per learned rule
   * `(step, left, right, pair_count)` in learning order; tokenized =
   * `(id, syms)` — every document's symbol array after all merges.
   * Stops early when no pair reaches `minCount`.
   */
  def learn(docs: DataFrame, idCol: String, textCol: String,
            numMerges: Int, minCount: Long = 2L): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    var syms = graft.CacheScope.persist(
      docs.filter(col(textCol).isNotNull)
        .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("syms")))
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val best = syms
        .select(explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect() // 1 row: the round's learned rule
      if (best.isEmpty || best.head.getLong(2) < minCount) done = true
      else {
        val (l, r, c) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        learned += ((step, l, r, c))
        // eager localCheckpoint: cuts the per-round HOF lineage AND
        // materializes the round (3^N plan growth otherwise)
        val next = syms.withColumn("syms", mergePair(col("syms"), l, r))
          .localCheckpoint(true)
        syms.unpersist(false)
        syms = next
        step += 1
      }
    }
    (learned.toSeq.toDF("step", "left", "right", "pair_count"), syms)
  }

  /**
   * ENCODE a corpus with an already-learned merge table — the tokenizer
   * APPLICATION half ([[learn]] is training): every production pipeline
   * trains merges once on a sample and then encodes 100 TB of text with
   * the frozen rules, so this path must be map-only and rule-count-
   * independent in plan size.
   *
   * The merge table is a MODEL ARTIFACT (bounded: a real tokenizer
   * learns ~32k rules ≈ a few MB), so it collects once to the driver and
   * broadcasts — the same scalar/model treatment as PQ codebooks and
   * k-means centroids, not a data-path collect. Application is
   * `mapPartitions` BY NECESSITY, argued like the image codec: N rules
   * as chained Catalyst HOF folds would build an O(N)-deep plan (the
   * 3^N lineage problem [[learn]] cuts per round), while here one
   * imperative pass per document applies all rules.
   *
   * Per doc the encoder applies rules IN LEARNED ORDER, each
   * left-to-right non-overlapping — definitionally [[learn]]'s own
   * application, so encoding the training corpus reproduces `learn`'s
   * tokenized output EXACTLY (the BpeSpec parity gate). This sequential
   * order is also equivalent to the lowest-rank-first priority rule HF
   * tokenizers use: a merge can only create adjacencies involving its
   * NEW symbol, and a rule whose side equals that symbol string was
   * necessarily learned later, so applying rule k never creates an
   * occurrence of rule j < k. A per-doc symbol-presence set skips the
   * (vast majority of) rules whose parts aren't in the doc in O(1)
   * without scanning the symbol array.
   *
   * Null text encodes like [[learn]] treats it: dropped.
   */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rules = merges.select(col("step").cast("int"),
        col("left").cast("string"), col("right").cast("string"))
      .as[(Int, String, String)].collect().sortBy(_._1)
      .map { case (_, l, r) => (l, r) } // model artifact: bounded, ordered
    val bRules = spark.sparkContext.broadcast(rules)
    val in = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
    in.mapPartitions { it =>
      val rs = bRules.value
      it.map { case (id, text) =>
        // split(text, " ") keeps ALL empty strings (java regex, limit -1)
        var syms = text.split(" ", -1).toIndexedSeq
        val present = scala.collection.mutable.HashSet.empty[String]
        syms.foreach(present += _)
        rs.foreach { case (l, r) =>
          if (present.contains(l) && present.contains(r)) {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var merged = false
            syms.foreach { t =>
              if (out.nonEmpty && out.last == l && t == r) {
                out.remove(out.length - 1)
                out += (l + " " + r)
                merged = true
              } else out += t
            }
            if (merged) {
              syms = out.toIndexedSeq
              present += (l + " " + r)
              // l/r may still occur elsewhere; the set is a SUPERSET
              // filter (false positives cost one scan, never wrongness)
            }
          }
        }
        (id, syms.toSeq)
      }
    }.toDF("id", "syms")
  }
}
