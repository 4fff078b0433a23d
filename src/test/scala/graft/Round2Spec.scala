package graft

import graft.functions.Hashing
import graft.operators._
import graft.sources.{CsvSource, LakeWriter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Round-2 additions: codegen kernels, clustering, PII, sampling,
  * completion heuristic, IVF ANN, and the sources package. */
class Round2Spec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox jumps over the lazy cat again and again"),
    (4L, "completely different text with no overlap whatsoever here now"),
    (5L, "x y"))
    .toDF("doc_id", "text")

  test("dotProduct codegen kernel equals HOF left fold exactly") {
    val em = Tables.embeddings(spark, sfDir)
      .withColumn("v", col("embedding").cast("array<double>"))
    val both = em.select(
      Hashing.dotProduct(col("v"), col("v")).as("fast"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
    assert(both.filter(col("fast") =!= col("hof")).count() === 0)
    // null propagation: mismatched lengths -> null
    val r = both.sparkSession.range(1).select(
      Hashing.dotProduct(array(lit(1.0)), array(lit(1.0), lit(2.0))).as("d"))
    assert(r.head().isNullAt(0))
  }

  test("hashedShingles kernel equals the HOF distinct-xxhash64 formulation") {
    val d = Tables.documents(spark, sfDir)
    val both = d.select(
      sort_array(Hashing.hashedShingles(col("text"), 3)).as("fast"),
      sort_array(transform(array_distinct(Text.wordShingles(col("text"), 3)),
        s => xxhash64(s))).as("hof"))
    assert(both.filter(col("fast") =!= col("hof")).count() === 0)
    // under-n-tokens and multi-space edge cases
    val edge = Seq("one two", "a  b  c d", "").toDF("text")
      .select(sort_array(Hashing.hashedShingles(col("text"), 3)).as("fast"),
        sort_array(transform(array_distinct(Text.wordShingles(col("text"), 3)),
          s => xxhash64(s))).as("hof"))
    assert(edge.filter(col("fast") =!= col("hof")).count() === 0)
  }

  test("minhashBands: identical docs collide in every band, distinct docs in none") {
    val sh = docs.select(col("doc_id"),
      Hashing.minhashBands(
        transform(array_distinct(Text.wordShingles(col("text"), 3)), s => xxhash64(s)),
        numPerms = 128, bands = 32).as("bands"))
    val m = sh.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m(1L) === m(2L), "identical docs must have identical band hashes")
    assert(m(1L).intersect(m(4L)).isEmpty, "disjoint docs should share no band")
  }

  test("simhash64 kernel: deterministic, empty -> 0") {
    val s = docs.select(col("doc_id"), Hashing.simhash64(
      transform(Text.tokens(col("text")), t => xxhash64(t))).as("sh"))
    val m = s.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(2L))
    assert(m(1L) !== m(4L))
    val empty = spark.range(1).select(
      Hashing.simhash64(array().cast("array<long>")).as("sh"))
    assert(empty.head().getLong(0) === 0L)
  }

  test("clusterPairs: transitive chain collapses to one cluster, disjoint stays apart") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val got = Dedup.clusterPairs(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("redactPii replaces emails, IPs, phone runs; leaves clean text alone") {
    val df = Seq(
      (1L, "contact me at jane.doe+x@example.co.uk or +1 (555) 123-4567"),
      (2L, "server at 192.168.0.1 went down"),
      (3L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = Text.redactPii(df, "text").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L).contains("<EMAIL>") && out(1L).contains("<PHONE>"))
    assert(!out(1L).contains("example"))
    assert(out(2L) === "server at <IP> went down")
    assert(out(3L) === "nothing sensitive here")
  }

  test("repetitionRatio: repeated n-grams score high, varied text low") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "every word in this sentence is used once only")).toDF("doc_id", "text")
    val m = Text.repetitionRatio(df, "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(1L) > 0.8)
    assert(m(2L) === 0.0)
  }

  test("hashSample deterministic and fraction-accurate; splitAssign covers all rows") {
    val d = Tables.documents(spark, sfDir)
    val a = Sampling.hashSample(d, "doc_id", 0.3).select("doc_id").collect().toSet
    val b = Sampling.hashSample(d, "doc_id", 0.3).select("doc_id").collect().toSet
    assert(a === b, "same fraction must select identical rows")
    val n = d.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.15, s"fraction off: ${a.size / n}")
    val splits = Sampling.splitAssign(d, "doc_id", 0.1, 0.1)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.values.sum === n.toLong)
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    // subsets nest: a 0.1 sample is contained in the 0.3 sample
    val small = Sampling.hashSample(d, "doc_id", 0.1).select("doc_id").collect().toSet
    assert(small.subsetOf(a))
  }

  test("contamination flags docs sharing n-grams with probes, skips clean docs") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "totally different words that never overlap with anything probe related"),
      (3L, "prefix words then alpha beta gamma delta epsilon zeta eta theta end"))
      .toDF("doc_id", "text")
    val probes = Seq("alpha beta gamma delta epsilon zeta eta theta").toDF("text")
    val out = Text.contamination(corpus, "doc_id", "text", probes, "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("vocabulary ranks tokens by count with deterministic tie-break") {
    val docs = Seq((1L, "b a a c b a"), (2L, "c b x")).toDF("doc_id", "text")
    val out = Text.vocabulary(docs, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._3) === Seq(("a", 3L, 1L), ("b", 3L, 2L), ("c", 2L, 3L)))
  }

  test("packSequences bins consecutive docs by token budget per shard") {
    val docs = Seq(
      (1L, "s", 300L), (2L, "s", 300L), (3L, "s", 300L), (4L, "s", 50L),
      (5L, "t", 600L), (6L, "t", 10L))
      .toDF("doc_id", "shard", "n_tok")
    val got = Text.packSequences(docs, "shard", "doc_id", "n_tok", budget = 512L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // shard s cumsums (exclusive): 0,300,600,900 → packs 0,0,1,1
    // shard t: 0,600 → packs 0,1
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L, 6L -> 1L))
  }

  test("urlStats counts urls and extracts first domain") {
    val df = Seq(
      (1L, "see https://example.com/a and http://other.org too"),
      (2L, "no links")).toDF("doc_id", "text")
    val out = Text.urlStats(df, "text").collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) === ((2, "example.com")))
    assert(out(2L) === ((0, "")))
  }

  test("partitionProfile emits every rollup level from one pass") {
    val df = Seq(("2024", "01", "01", 10L), ("2024", "01", "02", 20L), ("2024", "02", "01", 30L))
      .toDF("year", "month", "day", "ts_sec")
    val out = Rollup.partitionProfile(df, Seq("year", "month", "day"), "ts_sec")
    assert(out.count() === 3 + 2 + 1 + 1) // day rows + month + year + grand total
    val total = out.filter(col("year").isNull).head()
    assert(total.getLong(3) === 3L && total.getLong(4) === 10L && total.getLong(5) === 30L)
  }

  test("markComplete: only sessions ending gap before the watermark are complete") {
    val df = Seq((1L, 0L, 1000L), (2L, 0L, 90000L), (3L, 0L, 100000L))
      .toDF("id", "start_sec", "end_sec")
    val got = StateOps.markComplete(df, "end_sec", 10800L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("ivfTopK with nProbe = nCentroids equals brute force exactly") {
    val em = Tables.embeddings(spark, sfDir)
    val q = em.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfTopK(em, q, "vec_id", "embedding", k = 3,
      nCentroids = 4, nProbe = 4)
      .select("query_id", "cand_id", "rank").collect().toSet
    val brute = Similarity.bruteForceTopK(em, q, "vec_id", "embedding", k = 3)
      .select("query_id", "cand_id", "rank").collect().toSet
    assert(ivf === brute)
  }

  test("asofJoin picks latest prior right row per key, null before any") {
    val left = Seq((1L, 5L, "l1"), (1L, 10L, "l2"), (1L, 20L, "l3"), (2L, 7L, "l4"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 99L, "z"))
      .toDF("k", "ts", "v")
    val got = AsOf.join(left, right, Seq("k"), "ts", Seq("v"))
      .select("k", "ts", "tag", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), Option(r.getString(3)))).toSet
    assert(got === Set(
      (1L, 5L, "l1", None),        // before any state
      (1L, 10L, "l2", Some("a")),  // equal ts -> inclusive
      (1L, 20L, "l3", Some("b")),  // carried forward past 15
      (2L, 7L, "l4", None)))       // other key's state invisible
  }

  test("rangeJoin matches brute-force containment incl. bucket boundaries") {
    val points = (0L to 50L).map(t => (t, t * 100)).toDF("pid", "ts")
    val ivs = Seq((1L, 0L, 900L), (2L, 3600L, 3700L), (3L, 100L, 5000L), (4L, 4999L, 4999L))
      .toDF("iv", "s", "e")
    val got = Intervals.rangeJoin(points, "ts", ivs, "s", "e", bucketSec = 1000L)
      .select("iv", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (pid, ts) <- (0L to 50L).map(t => (t, t * 100))
      (iv, s, e) <- Seq((1L, 0L, 900L), (2L, 3600L, 3700L), (3L, 100L, 5000L), (4L, 4999L, 4999L))
      if ts >= s && ts <= e
    } yield (iv, pid)).toSet
    assert(got === brute)
  }

  test("intersectionSize equals size(array_intersect) and the rule rewrites it") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 9L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(5L, 5L, 6L), Seq(5L, 6L))).toDF("a", "b")
    val both = df.select(
      Hashing.intersectionSize(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("builtin"))
    assert(both.filter(col("fast") =!= col("builtin")).count() === 0)
    // the injected optimizer rule rewrites the builtin combination
    // (parquet-backed frame — a LocalRelation would be constant-folded)
    val sh = Hashing.hashedShingles(col("text"), 3)
    val optimized = Tables.documents(spark, sfDir)
      .select(size(array_intersect(sh, sh)).as("n"))
      .queryExecution.optimizedPlan.toString
    assert(optimized.contains("intersection_size"), optimized)
  }

  test("enforceSchema/safeCast null out malformed values under ANSI instead of throwing") {
    val df = Seq(("1", "x"), ("notanumber", "y"), ("", "z")).toDF("v", "tag")
    val enforced = Cleanse.enforceSchema(df,
      Seq("v" -> org.apache.spark.sql.types.LongType,
        "tag" -> org.apache.spark.sql.types.StringType))
    assert(enforced.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .toSeq === Seq(Some(1L), None, None))
    val cast = Cleanse.safeCast(df, Map("v" -> org.apache.spark.sql.types.DoubleType))
    assert(cast.filter(col("v").isNull).count() === 2)
  }

  test("saltedJoin equals plain join row-for-row") {
    val big = Seq((1L, "x"), (1L, "y"), (2L, "z"), (1L, "w")).toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "name")
    val plain = big.join(small, "k").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "k", saltFactor = 4)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
  }

  test("quantiles interpolate linearly at rank (n-1)p") {
    val df = Seq(1.0, 2.0, 4.0, 8.0, 16.0).map(("g", _)).toDF("g", "x")
    val r = Quality.quantiles(df, Seq("g"), "x", Seq(0.25, 0.5, 0.9)).head()
    assert(r.getDouble(1) === 2.0 && r.getDouble(2) === 4.0 && r.getDouble(3) === 12.8)
  }

  test("observed DQ counters fill during the consumer's own action") {
    val obs = org.apache.spark.sql.Observation("dq")
    val df = Quality.observed(
      Seq((1L, "a"), (2L, null), (3L, "c")).toDF("id", "v"), obs, Seq("v"))
    assert(df.count() === 3) // the action that populates the observation
    val m = obs.get
    assert(m("n_rows") === 3L && m("null_v") === 1L)
  }

  test("CsvSource: malformed rows land in quarantine, good rows keep schema") {
    val dir = Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "in.csv")
    Files.writeString(f.toPath,
      "id,val\n1,10\n2,notanumber\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("val", LongType)))
    val (good, quarantine) = CsvSource.readWithQuarantine(spark, f.getPath, schema)
    assert(good.count() === 2)
    assert(good.columns.toSeq === Seq("id", "val"))
    val bad = quarantine.select("raw_line").collect().map(_.getString(0))
    assert(bad.length === 1 && bad.head.contains("notanumber"))
  }

  test("JsonSource: malformed lines land in quarantine, good rows keep schema") {
    val dir = Files.createTempDirectory("graft-json").toFile
    val f = new java.io.File(dir, "in.jsonl")
    Files.writeString(f.toPath,
      """{"id": 1, "val": 10}
        |{"id": 2, "val": "notanumber"}
        |not json at all
        |{"id": 3, "val": 30}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("val", LongType)))
    val (good, quarantine) = graft.sources.JsonSource.readWithQuarantine(
      spark, f.getPath, schema)
    assert(good.count() === 2)
    assert(good.columns.toSeq === Seq("id", "val"))
    assert(quarantine.count() === 2)
  }

  test("LakeSink: streaming micro-batches land idempotently in the lake") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val lake = Files.createTempDirectory("graft-lakesink").toFile.getPath
    val ckpt = Files.createTempDirectory("graft-ckpt").toFile.getPath
    val input = MemoryStream[(Long, String, String, String)]
    val df = input.toDF().toDF("id", "year", "month", "day")
    val q = graft.streaming.LakeSink.start(df, lake, ckpt, keyCol = Some("id"))
    try {
      input.addData((1L, "2024", "01", "01"), (2L, "2024", "01", "02"))
      q.processAllAvailable()
      input.addData((3L, "2024", "01", "02")) // overwrites day 02 partition
      q.processAllAvailable()
      val ids = graft.sources.LakeWriter.read(spark, lake)
        .select("id").as[Long].collect().toSet
      assert(ids === Set(1L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("LakeWriter.compact collapses small files without losing rows") {
    val dir = Files.createTempDirectory("graft-compact").toFile.getPath
    val rows = (1L to 100L).map(i => (i, "2024", "01", f"${i % 3 + 1}%02d"))
      .toDF("id", "year", "month", "day")
    import scala.jdk.CollectionConverters._
    // fragment: three appends, several tasks each → many small files
    (0 until 3).foreach { _ =>
      rows.repartition(4).write.mode("append")
        .partitionBy("year", "month", "day").parquet(dir)
    }
    def dataFiles = Files.walk(new java.io.File(dir).toPath).iterator().asScala
      .count(p => p.toString.endsWith(".parquet"))
    val before = dataFiles
    assert(before > 3, s"fixture not fragmented: $before files")
    graft.sources.LakeWriter.compact(spark, dir)
    assert(dataFiles === 3, s"want 1 file per day partition, got $dataFiles")
    assert(graft.sources.LakeWriter.read(spark, dir).count() === 300L)
  }

  test("writeClustered sorts rows by cluster column within files") {
    val dir = Files.createTempDirectory("graft-cluster").toFile.getPath
    val rows = spark.range(1000).select(
      (col("id") * 2654435761L % 1000).as("k"), lit("2024").as("year"),
      lit("01").as("month"), lit("01").as("day"))
    graft.sources.LakeWriter.writeClustered(rows, dir, Seq("k"),
      filesPerPartition = 2)
    // within every file, k must arrive non-decreasing
    val files = Files.walk(new java.io.File(dir).toPath).iterator()
    import scala.jdk.CollectionConverters._
    val parquets = files.asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq
    assert(parquets.nonEmpty)
    parquets.foreach { f =>
      val ks = spark.read.parquet(f).select("k").collect().map(_.getLong(0))
      assert(ks.sameElements(ks.sorted), s"unsorted file $f")
    }
  }

  test("LakeWriter: dynamic overwrite replaces only touched partitions") {
    val dir = Files.createTempDirectory("graft-lake").toFile.getPath
    val day1 = Seq((1L, "2024", "01", "01"), (2L, "2024", "01", "01"))
      .toDF("id", "year", "month", "day")
    val day2 = Seq((3L, "2024", "01", "02")).toDF("id", "year", "month", "day")
    LakeWriter.writePartitioned(day1.union(day2), dir, keyCol = Some("id"))
    // rewrite ONLY day 2 with new content; day 1 must survive
    val day2v2 = Seq((30L, "2024", "01", "02"), (31L, "2024", "01", "02"))
      .toDF("id", "year", "month", "day")
    LakeWriter.writePartitioned(day2v2, dir, keyCol = Some("id"))
    val back = LakeWriter.read(spark, dir)
    val ids = back.select("id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 30L, 31L))
    // partition pruning: a day filter must prune to one partition dir
    val pruned = back.filter(col("day") === "02")
    assert(pruned.count() === 2)
  }
}
