package graft

import org.apache.spark.sql.SparkSession

/**
 * Plan-metrics diagnostic: run one query and print the EXECUTED plan
 * tree with each node's post-execution metrics (dataSize /
 * shuffleBytesWritten / numOutputRows), descending through AQE stages,
 * reused exchanges, and cached-relation boundaries that
 * `explain("formatted")` leaves opaque. This is how shuffle-byte
 * anomalies get attributed to a NODE rather than a query: it found
 * q_ppl_buckets' 78 MB probe-side exchange materialized for a
 * 1,526-row vocab join that AQE later broadcast (the estimate crossed
 * the threshold, so the pre-AQE plan was sort-merge — fixed with an
 * explicit broadcast in [[operators.Text.unigramLogProb]]).
 *
 * Usage: `runMain graft.DebugPlan <query> <sfDir>`.
 */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-debugplan").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = args(0); val dir = args(1)
    val df = SparkEntry.queries(q)(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan
    def walk(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
      val m = p.metrics
      val interesting = Seq("dataSize", "shuffleBytesWritten", "numOutputRows")
        .flatMap(k => m.get(k).map(v => s"$k=${v.value}"))
      println("  " * d + p.nodeName + " " + interesting.mkString(" "))
      p.children.foreach(walk(_, d + 1))
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, d + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, d + 1)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child, d + 1)
        case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          walk(i.relation.cachedPlan, d + 1)
        case _ => ()
      }
    }
    walk(plan, 0)
    spark.stop()
  }
}
