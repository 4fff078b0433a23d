package graft

import graft.sources.LakeWriter
import graft.streaming.LakeSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * The operational lake-maintenance LOOP, end to end: a streaming
 * append-mode feed decays a day's clustering, the incremental stats
 * refresh sees exactly the new files, the depth threshold trips for
 * that day only, and the partition-scoped maintenance rewrites exactly
 * it — untouched days byte-identical, rows conserved, second loop
 * iteration idle. Rows 66/216/219/203 individually green is not the
 * same claim as the loop a real feed runs; this spec is that claim.
 */
@SlowTest
class MaintenanceLoopSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-loop-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def grid(day: Int, n: Int, seed: Int) =
    spark.range(n).select(
      lit(day).as("day"),
      pmod(hash(col("id") + seed), lit(1000)).cast("long").as("a"),
      pmod(hash(col("id") * 7 + 3 + seed), lit(1000)).cast("long").as("b"))

  /** worst per-dir avg depth, keyed by partition dir name. */
  private def depths(path: String): Map[String, Double] = {
    val stats = LakeWriter.statsIndex(spark, path, Seq("a", "b"))
      .withColumn("pdir", regexp_extract(col("file"), "^(.*)/[^/]+$", 1))
    LakeWriter.clusteringProfile(stats, Seq("a", "b"), groupCol = Some("pdir"))
      .groupBy("pdir").agg(max("avg_depth").as("worst"))
      .collect().map(r => (r.getString(0).split("/").last, r.getDouble(1)))
      .toMap
  }

  private def fileState(path: String, sub: String): Map[String, (Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.listStatus(p).filter(_.isFile).map(s =>
      (s.getPath.getName, (s.getLen, s.getModificationTime))).toMap
  }

  test("streaming appends -> stats refresh -> scoped re-cluster, as one loop") {
    implicit val sqlCtx = spark.sqlContext
    val lake = tmp("lake")

    // seed: two z-ordered days, healthy layout
    LakeWriter.writeZOrdered(grid(1, 20000, 0).unionAll(grid(2, 20000, 1)),
      lake, Seq("a", "b"), nFiles = 16, partitionCols = Seq("day"))
    val seedDepths = depths(lake)
    val threshold = seedDepths.values.max + 1.0
    val prior = LakeWriter.statsIndex(spark, lake, Seq("a", "b"))
      .localCheckpoint(true)

    // stream: three append micro-batches land in day=2 only, each rows
    // spanning the full (a, b) domain -> every appended file's stats
    // span everything, day 2's depth decays batch by batch
    val input = MemoryStream[(Int, Long, Long)]
    val q = LakeSink.startAppend(
      input.toDS().toDF("day", "a", "b"), lake, tmp("ckpt"),
      partitionCols = Seq("day"))
    try {
      (0 until 3).foreach { b =>
        input.addData((0 until 2000).map { i =>
          (2, (i * 37 + b) % 1000L, (i * 91 + 7 * b) % 1000L)
        }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val decayed = depths(lake)
    assert(decayed("day=2") > threshold,
      s"appends did not decay day=2: ${decayed("day=2")} <= $threshold")
    assert(decayed("day=1") === seedDepths("day=1"),
      "untouched day's depth moved")

    // incremental stats refresh == full rebuild (appended files only)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("file").collect().map(_.toSeq).toSeq
    assert(norm(LakeWriter.refreshStatsIndex(spark, lake, prior, Seq("a", "b")))
      === norm(LakeWriter.statsIndex(spark, lake, Seq("a", "b"))),
      "incremental refresh diverged from rebuild after streaming appends")

    // maintenance: exactly the decayed day rewrites
    val day1Before = fileState(lake, "day=1")
    val rowsBefore = spark.read.parquet(lake).count()
    val rewritten = LakeWriter.maintainClusteringPartitioned(spark, lake,
      Seq("a", "b"), Seq("day"), maxAvgDepth = threshold, nFiles = 8)
    assert(rewritten.map(_.split("/").last) === Seq("day=2"),
      s"expected only day=2 rewritten, got $rewritten")
    assert(fileState(lake, "day=1") === day1Before,
      "untouched day's files changed (name, length, or mtime)")
    assert(spark.read.parquet(lake).count() === rowsBefore, "rows lost in rewrite")
    val healed = depths(lake)
    assert(healed("day=2") <= threshold,
      s"rewrite did not heal day=2: ${healed("day=2")}")

    // loop iteration 2: nothing appended, nothing rewrites
    assert(LakeWriter.maintainClusteringPartitioned(spark, lake,
      Seq("a", "b"), Seq("day"), maxAvgDepth = threshold, nFiles = 8).isEmpty,
      "idle loop iteration rewrote something")
  }
}
