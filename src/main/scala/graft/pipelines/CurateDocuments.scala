package graft.pipelines

import graft.operators.{Dedup, Sampling, Text}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Document-corpus curation: the end-to-end training-data pipeline the
 * LLM-extension operators exist for — blocklist scrub → exact dedup →
 * near-dup cluster keep-one → quality/language/entropy annotation →
 * quality floor → PII scrub → deterministic split assignment.
 *
 * Everything up to clustering is one lazy plan; clustering is the one
 * genuinely iterative step (connected components).
 */
object CurateDocuments {

  case class Config(
      idCol: String, textCol: String,
      shingleSize: Int = 3, jaccardThreshold: Double = 0.8,
      minQuality: Double = 0.3,
      minEntropy: Double = 0.0,
      valFraction: Double = 0.05, testFraction: Double = 0.05)

  /** Curated corpus: one doc per near-dup cluster, quality-floored,
   * PII-redacted, with split labels. Adds `quality_score`, `lang_id`,
   * `entropy`, `redacted`, `split`. Pass `blocklist` (a frame of
   * known-bad text) to scrub opt-outs/eval sets first. */
  def run(docs: DataFrame, cfg: Config,
          blocklist: Option[DataFrame] = None): DataFrame = {
    // 0. known-bad removal (opt-outs, eval contamination)
    val cleared = blocklist.fold(docs)(b =>
      Dedup.blocklistAnti(docs, b, cfg.textCol, b.columns.head))
    // 1. exact dedup on content
    val exact = Dedup.exact(cleared, Seq(cfg.textCol))
    // 2. near-dup clusters → keep the smallest id per cluster
    val pairs = Dedup.minhashLsh(exact, cfg.idCol, cfg.textCol,
      n = cfg.shingleSize, threshold = cfg.jaccardThreshold)
    val losers = Dedup.clusterPairs(pairs, "id_a", "id_b")
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(cfg.idCol))
    val kept = exact.join(losers, Seq(cfg.idCol), "left_anti")
    // 3. annotate + floor quality (composite score AND token entropy —
    //    near-constant boilerplate dies here even when long enough to
    //    pass the length terms), scrub, split
    // entropy is LEFT-joined with a 0.0 default: a doc that tokenizes to
    // zero tokens has no entropy row, and an inner join would silently
    // drop it regardless of the configured floor — whether it survives
    // must be governed by minEntropy, not by the join shape
    val entropy = Text.tokenEntropy(kept, cfg.idCol, cfg.textCol)
      .withColumnRenamed("id", cfg.idCol)
    val scored = Text.languageId(
      Text.qualityScore(kept, cfg.textCol), cfg.textCol)
      .join(entropy, Seq(cfg.idCol), "left")
      .withColumn("entropy", coalesce(col("entropy"), lit(0.0)))
      .filter(col("quality_score") >= cfg.minQuality &&
        col("entropy") >= cfg.minEntropy)
    Sampling.splitAssign(
      Text.redactPii(scored, cfg.textCol),
      cfg.idCol, cfg.valFraction, cfg.testFraction)
  }
}
