package graft

import graft.sources.LakeWriter
import org.apache.spark.sql.functions._

/** Z-order clustering: file-level zone maps must prune on EVERY curve
 * dimension, where a single-sort-key layout prunes on one. */
class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-z-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  // 40k points on a 1000x1000 grid, deterministic pseudo-random layout
  private lazy val grid = spark.range(40000).select(
    (pmod(hash(col("id")), lit(1000)) + 500).as("a"),
    (pmod(hash(col("id") * 7 + 3), lit(1000)) + 500).as("b"),
    col("id"))

  test("zValue interleaves bits dimension-major") {
    val row = spark.range(1).select(
      LakeWriter.zValue(Seq(lit(0L), lit(0L)), 4).as("z00"),
      LakeWriter.zValue(Seq(lit(1L), lit(0L)), 4).as("z10"),
      LakeWriter.zValue(Seq(lit(0L), lit(1L)), 4).as("z01"),
      LakeWriter.zValue(Seq(lit(3L), lit(5L)), 4).as("z35")).head()
    assert(row.getLong(0) === 0L)
    assert(row.getLong(1) === 1L) // dim 0 bit 0 -> z bit 0
    assert(row.getLong(2) === 2L) // dim 1 bit 0 -> z bit 1
    // a=3 (011), b=5 (101): z = b2 a2 b1 a1 b0 a0 = 1 0 0 1 1 1 = 39
    assert(row.getLong(3) === 39L)
  }

  test("z-order prunes files on BOTH dims; single-sort only on its key") {
    val zDir = tmp("zord"); val sDir = tmp("sorted")
    LakeWriter.writeZOrdered(grid, zDir, Seq("a", "b"), nFiles = 16)
    // the contrast layout: range-sorted by `a` alone
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(sDir)

    def prunes(dir: String, c: String): (Long, Int, Int, Long) = {
      val stats = LakeWriter.statsIndex(spark, dir, Seq("a", "b"))
      val (df, kept, total) = LakeWriter.readPruned(spark, dir, stats, c, 600, 650)
      val want = spark.read.parquet(dir)
        .filter(col(c) >= 600 && col(c) <= 650)
      assert(df.agg(sum("id")).head.getLong(0) ===
        want.agg(sum("id")).head.getLong(0), s"$dir/$c pruned read wrong")
      (df.count(), kept, total, want.count())
    }

    val (na, keptA, totalA, wantA) = prunes(zDir, "a")
    assert(na === wantA)
    assert(keptA < totalA, s"z-order did not prune on a: $keptA/$totalA")
    val (nb, keptB, totalB, wantB) = prunes(zDir, "b")
    assert(nb === wantB)
    assert(keptB < totalB, s"z-order did not prune on b: $keptB/$totalB")
    // a 5%-of-domain range on a 2-dim curve with 16 files should keep
    // well under half the files on either dim
    assert(keptA <= totalA / 2 && keptB <= totalB / 2,
      s"z-order pruning weak: a=$keptA/$totalA b=$keptB/$totalB")

    val (_, sKeptA, sTotalA, _) = prunes(sDir, "a")
    val (_, sKeptB, sTotalB, _) = prunes(sDir, "b")
    assert(sKeptA < sTotalA, "sort-by-a should prune on a")
    assert(sKeptB === sTotalB,
      s"sort-by-a unexpectedly pruned on b ($sKeptB/$sTotalB) — bad contrast fixture")
  }

  test("bloom index prunes point lookups min/max stats cannot") {
    val dir = tmp("bloom")
    // cluster by user bucket: each user's rows land in ONE file, but ids
    // are spread so every file's [min_id, max_id] spans the whole domain
    // — range zone maps are useless for id equality here
    val users = spark.range(8000).select(
      col("id"), pmod(col("id"), lit(8)).as("bucket"),
      (col("id") * 37 % 8000).as("probe_id"))
    users.repartition(8, col("bucket")).write.mode("overwrite").parquet(dir)

    val stats = LakeWriter.statsIndex(spark, dir, Seq("id"))
    val (_, rangeKept, rangeTotal) =
      LakeWriter.readPruned(spark, dir, stats, "id", 4242, 4242)
    assert(rangeKept === rangeTotal,
      s"fixture broke: min/max should NOT prune ids ($rangeKept/$rangeTotal)")

    val idx = LakeWriter.bloomIndex(spark, dir, "id",
      expectedItems = 2000, numBits = 64 * 1024)
    val (hit, kept, total) = LakeWriter.readPointPruned(spark, dir, idx, "id", 4242L)
    assert(hit.count() === 1L && hit.head.getLong(0) === 4242L)
    assert(kept < total, s"bloom did not prune: $kept/$total")
    // absent key: bloom says definitely-absent for ~all files
    val (miss, keptMiss, _) =
      LakeWriter.readPointPruned(spark, dir, idx, "id", 999999L)
    assert(miss.count() === 0L)
    assert(keptMiss <= 1, s"absent key kept $keptMiss files")

    // scale contract: the driver-bound probe result is (file, keep)
    // verdicts only — the bloom payloads are consumed on executors and
    // never appear in the collected schema
    val h = spark.range(1).select(xxhash64(lit(4242L))).head().getLong(0)
    val verdicts = LakeWriter.bloomVerdicts(idx, h)
    assert(verdicts.schema.fields.map(_.dataType).forall {
      case org.apache.spark.sql.types.BinaryType => false
      case _ => true
    }, s"driver-bound bloom verdicts carry a binary payload: ${verdicts.schema}")
    assert(verdicts.schema.fieldNames.toSeq === Seq("file", "keep"))
    val keptViaVerdicts = verdicts.collect().count(_.getBoolean(1))
    assert(keptViaVerdicts === kept, "verdict path diverged from readPointPruned")
  }

  test("clustering depth quantifies the layouts: z-order beats single-sort on the off key") {
    val zDir = tmp("zdepth"); val sDir = tmp("sdepth")
    LakeWriter.writeZOrdered(grid, zDir, Seq("a", "b"), nFiles = 16)
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(sDir)
    def depth(dir: String, c: String): (Double, Long) = {
      val p = LakeWriter.clusteringProfile(
        LakeWriter.statsIndex(spark, dir, Seq("a", "b")), Seq(c)).head()
      (p.getDouble(p.fieldIndex("avg_depth")), p.getLong(p.fieldIndex("max_depth")))
    }
    val (sortA, _) = depth(sDir, "a")
    val (sortB, sortBMax) = depth(sDir, "b")
    val (zA, _) = depth(zDir, "a")
    val (zB, _) = depth(zDir, "b")
    // single sort: near-perfect on its key, useless on the other
    assert(sortA < 2.5, s"sorted-by-a depth on a: $sortA")
    assert(sortBMax === 16L && sortB > 12.0,
      s"fixture broke: sorted-by-a should be unclustered on b ($sortB/$sortBMax)")
    // z-order: moderate on BOTH dims, and far better than the single
    // sort on the off key
    assert(zB < sortB / 2, s"z depth on b ($zB) not < half of sorted ($sortB)")
    assert(zA < sortB / 2, s"z depth on a ($zA) not < half of sorted-b ($sortB)")
  }

  test("partitioned z-order keeps per-dir files curve-clustered") {
    val dir = tmp("zpart")
    val days = grid.withColumn("day", (col("id") % 2).cast("int"))
    LakeWriter.writeZOrdered(days, dir, Seq("a", "b"), nFiles = 16,
      partitionCols = Seq("day"))
    val stats = LakeWriter.statsIndex(spark, dir, Seq("a", "b"))
    val (df, kept, total) = LakeWriter.readPruned(spark, dir, stats, "b", 600, 650)
    assert(kept < total, s"no pruning across partition dirs: $kept/$total")
    val want = spark.read.parquet(dir).filter(col("b").between(600, 650))
    assert(df.agg(sum("id")).head.getLong(0) ===
      want.agg(sum("id")).head.getLong(0))
    // partition pruning still composes: day filter + z-dim filter
    assert(df.filter(col("day") === 1).count() ===
      want.filter(col("day") === 1).count())
  }

  test("skewed dims still spread the curve (quantile buckets, not widths)") {
    // heavy skew: 90% of mass in [0, 10], tail to 1e6
    val skew = spark.range(20000).select(
      when(col("id") % 10 < 9, pmod(hash(col("id")), lit(10)).cast("long"))
        .otherwise(pmod(hash(col("id")), lit(1000000)).cast("long")).as("a"),
      pmod(hash(col("id") + 99), lit(1000)).cast("long").as("b"),
      col("id"))
    val dir = tmp("skew")
    LakeWriter.writeZOrdered(skew, dir, Seq("a", "b"), nFiles = 8)
    val stats = LakeWriter.statsIndex(spark, dir, Seq("a", "b"))
    val (df, kept, total) = LakeWriter.readPruned(spark, dir, stats, "b", 100, 199)
    val want = skew.filter(col("b").between(100, 199)).count()
    assert(df.count() === want)
    assert(kept < total, s"no pruning under skew: $kept/$total")
  }
}
