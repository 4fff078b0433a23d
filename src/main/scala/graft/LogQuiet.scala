package graft

/**
 * Driver-side log hygiene. The bounded single-partition windows — the
 * ≤k-row centroid-init ranks ([[operators.Similarity]]'s `hRank`) and the
 * cardinality-gated KS cumulative ([[operators.Quality.ksTest]]) — are
 * the intended plans, but WindowExec logs "No Partition Defined" on every
 * (re)planning: 50+ identical lines per bench run, burying any real
 * warning. A literal partition key cannot silence it (Spark 4 folds
 * foldable partition specs away), so driver mains quiet ONLY that logger.
 * Test sessions do NOT call this: a newly introduced unpartitioned
 * window still warns loudly in `sbt test`.
 */
object LogQuiet {
  def windowExec(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
