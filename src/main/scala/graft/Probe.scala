package graft

import org.apache.spark.sql.SparkSession

/** One-off perf/plan probe: time one SparkEntry query and print its plan.
  * Usage: runMain graft.Probe <queryName> [sfDir] [--explain] */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_dedup_jaccard")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogQuiet.windowExec()
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("--explain")) df.explain("formatted")
    // warm scans
    Seq("events", "documents", "embeddings").foreach(t =>
      try Tables.table(spark, sfDir, t).count() catch { case _: Throwable => })
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
