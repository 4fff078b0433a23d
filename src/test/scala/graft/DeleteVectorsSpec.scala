package graft

import graft.sources.{DeleteVectors, LakeWriter, StateStore}
import org.apache.spark.sql.functions._

/**
 * Deletion vectors (merge-on-read deletes) over the versioned lake:
 * delete-without-rewrite exactness, data files untouched by deletes,
 * crash invisibility of a torn DV publish, compaction that rewrites
 * ONLY delete-bearing partitions (others byte-identical), fully-deleted
 * partitions staying masked, and composition of successive deletes.
 */
class DeleteVectorsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-dv-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def seed(n: Int) =
    spark.range(n).select(
      col("id"),
      lit(2024).as("year"), lit(3).as("month"),
      (pmod(col("id"), lit(3)) + 1).cast("int").as("day"),
      (col("id") * 10).as("v"))

  private def fileState(path: String): Map[String, Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long)] =
      f.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else Seq((s.getPath.toString, s.getModificationTime))
      }
    walk(root).toMap
  }

  test("deleteWhere is exact, rewrite-free, idempotent, and composes") {
    val lake = tmp("basic")
    LakeWriter.writePartitionedVersioned(seed(3000), lake, "000001")
    val dataFiles = fileState(lake)

    // delete a predicate slice: read == full minus the slice
    val n1 = DeleteVectors.deleteWhere(spark, lake, col("v") % 7 === 0)
    assert(n1 === seed(3000).filter(col("v") % 7 === 0).count())
    val got = DeleteVectors.readWithDeletes(spark, lake)
    val want = seed(3000).filter(!(col("v") % 7 === 0))
    assert(got.count() === want.count())
    assert(got.join(want, Seq("id"), "full_outer")
      .filter(got("v").isNull || want("v").isNull).count() === 0)

    // no data file was touched — merge-on-read, not rewrite
    assert(fileState(lake).view.filterKeys(dataFiles.contains).toMap === dataFiles)

    // same predicate again: nothing left to delete, state unchanged
    assert(DeleteVectors.deleteWhere(spark, lake, col("v") % 7 === 0) === 0L)
    assert(DeleteVectors.dvVersions(spark, lake) === Seq("000001"))

    // a second, overlapping predicate composes cumulatively
    val n2 = DeleteVectors.deleteWhere(spark, lake, col("id") < 100)
    assert(n2 === want.filter(col("id") < 100).count())
    assert(DeleteVectors.readWithDeletes(spark, lake).count() ===
      seed(3000).filter(!(col("v") % 7 === 0) && col("id") >= 100).count())
  }

  test("torn DV publish is invisible until its marker lands") {
    val lake = tmp("torn")
    LakeWriter.writePartitionedVersioned(seed(300), lake, "000001")
    DeleteVectors.deleteWhere(spark, lake, col("id") < 50)
    val before = DeleteVectors.readWithDeletes(spark, lake).count()

    // simulate a crashed deleteWhere: next DV version dir, no marker
    val torn = new org.apache.hadoop.fs.Path(s"$lake/_dv/v=000002/dv")
    val f = torn.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(("file:/nowhere", 0L)).toDF("file", "pos")
      .write.parquet(torn.toString)
    assert(DeleteVectors.readWithDeletes(spark, lake).count() === before)
    assert(DeleteVectors.dvVersions(spark, lake) === Seq("000001"))

    // the next real delete reclaims the torn dir and commits over it
    DeleteVectors.deleteWhere(spark, lake, col("id") === 100)
    assert(DeleteVectors.dvVersions(spark, lake) === Seq("000001", "000002"))
    assert(DeleteVectors.readWithDeletes(spark, lake).count() === before - 1)
  }

  test("applyDeletes rewrites only delete-bearing partitions; results unchanged") {
    val lake = tmp("apply")
    LakeWriter.writePartitionedVersioned(seed(3000), lake, "000001")
    // day 1 gets partial deletes; day 2 none; day 3 fully deleted
    DeleteVectors.deleteWhere(spark, lake,
      (col("day") === 1 && col("id") < 500) || col("day") === 3)
    val wantRows = DeleteVectors.readWithDeletes(spark, lake)
      .select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = fileState(lake)

    val rewritten = DeleteVectors.applyDeletes(spark, lake, "000002")
    // only day=1 rewrote: day=2 carries no deletes, day=3 has no survivors
    assert(rewritten === Seq(Seq("2024", "3", "1")))

    // reads identical after compaction
    val after = DeleteVectors.readWithDeletes(spark, lake)
      .select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === wantRows)

    // untouched partitions byte-identical (same files, same mtimes)
    val nowFiles = fileState(lake)
    val untouched = before.keys.filter(p =>
      p.contains("/v=000001/") && !p.contains("_dv"))
    untouched.foreach(p => assert(nowFiles(p) === before(p), p))

    // day 1's new version carries no deleted row; day 3 stays masked
    val v2 = spark.read.option("basePath", s"$lake/v=000002")
      .parquet(s"$lake/v=000002/year=2024/month=3/day=1")
    assert(v2.filter(col("id") < 500).count() === 0)
    val dvLeft = DeleteVectors.currentDeletes(spark, lake)
    assert(dvLeft.filter(!col("file").contains("day=3")).count() === 0)
    assert(dvLeft.count() > 0) // the day-3 mask is retained

    // and a delete after compaction still works on the new files
    DeleteVectors.deleteWhere(spark, lake, col("id") === 1000)
    assert(DeleteVectors.readWithDeletes(spark, lake).count() === wantRows.size - 1)
  }
}
