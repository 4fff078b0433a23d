package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: every SparkEntry query timed on SPARK_GRAFT_SF_DIR,
  * one JSON line to stdout. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // 52 queries × several codegen stages each exceed the default
      // 100-entry generated-class cache; sized to hold the whole workload
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm up JIT/codegen/parquet-footer paths untimed: table scans plus a
    // representative window + hash-agg on synthetic in-memory data. (A
    // full per-query warmup pass was tried and measured SLOWER overall:
    // 50+ extra plans thrash the codegen LRU cache, so timed queries
    // recompile anyway while paying the added GC pressure.)
    Seq("events", "documents", "embeddings", "lineitem", "customer",
      "nation", "region").foreach(t => Tables.table(spark, sfDir, t).count())
    val warm = spark.range(100000).select(
      (col("id") % 97).as("k"), col("id").cast("double").as("v"))
    warm.groupBy("k").agg(sum("v")).count()
    warm.select(col("k"), row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("v")).as("rn")).count()

    val failed = scala.collection.mutable.ArrayBuffer[String]()
    // deterministic execution order: rounds compare like-for-like and the
    // first-query session-warmup penalty always lands on the same query
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = CacheScope.scoped {
        try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
          false
        }
      }
      // failures are marked with negative elapsed so they can never be
      // mistaken for a fast success downstream
      val dt = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) dt else -dt)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
