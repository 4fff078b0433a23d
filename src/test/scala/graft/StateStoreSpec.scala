package graft

import graft.sources.StateStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The MERGE-equivalent's contract: dated round-trip idempotence,
  * commit-marker crash safety, touched-buckets-only IO, compaction and
  * vacuum correctness. */
class StateStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-state").toString

  private def deltas(rows: (String, Double, Long, Long)*) =
    rows.toDF("entity", "dist", "start_sec", "end_sec")

  private def stateMap(root: String, before: Option[String] = None) =
    StateStore.read(spark, root, before).map(
      _.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap)
      .getOrElse(Map.empty)

  private def mergeDay(root: String, day: String,
                       d: org.apache.spark.sql.DataFrame): Unit =
    StateStore.merge(spark, root, day, d, keys = Seq("entity"),
      sumCols = Seq("dist"), minCols = Seq("start_sec"), maxCols = Seq("end_sec"),
      nBuckets = 8)

  test("merge accumulates across days: sums add, spans extend") {
    val root = tmpRoot()
    mergeDay(root, "2024-01-01", deltas(("a", 10.0, 100L, 200L), ("b", 5.0, 50L, 60L)))
    mergeDay(root, "2024-01-02", deltas(("a", 2.5, 250L, 300L)))
    val got = stateMap(root)
    assert(got("a") === ((100L, 300L, 12.5)))
    assert(got("b") === ((50L, 60L, 5.0)))
  }

  test("re-running the same delta window is a no-op (dated round-trip idempotence)") {
    val root = tmpRoot()
    mergeDay(root, "2024-01-01", deltas(("a", 10.0, 100L, 200L)))
    val day2 = deltas(("a", 2.5, 250L, 300L))
    mergeDay(root, "2024-01-02", day2)
    val first = stateMap(root)
    // crash-and-retry / blind re-run of day 2: state must NOT double-add
    mergeDay(root, "2024-01-02", day2)
    assert(stateMap(root) === first)
    assert(stateMap(root)("a")._3 === 12.5)
  }

  test("a crashed (uncommitted) write is invisible and never corrupts prior state") {
    val root = tmpRoot()
    mergeDay(root, "2024-01-01", deltas(("a", 10.0, 100L, 200L)))
    val before = stateMap(root)
    // simulate a writer that died after landing data but before the
    // marker: a version dir with parquet and no _COMMITTED
    val crashed = deltas(("a", 99.0, 1L, 2L))
      .withColumn("bucket", lit(0))
    crashed.write.partitionBy("bucket").parquet(s"$root/v=2024-01-02")
    assert(stateMap(root) === before)
    assert(StateStore.committedVersions(spark, root) === Seq("2024-01-01"))
    // the retry rebuilds the version from scratch — stale crashed files gone
    mergeDay(root, "2024-01-02", deltas(("a", 2.5, 250L, 300L)))
    assert(stateMap(root)("a") === ((100L, 300L, 12.5)))
  }

  test("merge writes ONLY the buckets its delta keys hash to") {
    val root = tmpRoot()
    // day 1: many entities spread over buckets
    mergeDay(root, "2024-01-01",
      deltas((1 to 50).map(i => (s"e$i", 1.0, 0L, 10L)): _*))
    // day 2: a single entity
    mergeDay(root, "2024-01-02", deltas(("e1", 1.0, 20L, 30L)))
    val day2 = new java.io.File(s"$root/v=2024-01-02")
      .listFiles().filter(_.isDirectory).map(_.getName).toSeq
    assert(day2.length === 1 && day2.head.startsWith("bucket="),
      s"day-2 merge should write exactly one bucket, wrote: $day2")
    // and the state still covers all 50 entities
    assert(stateMap(root).size === 50)
    assert(stateMap(root)("e1")._3 === 2.0)
  }

  test("read(before=) gives the as-of state (time travel across versions)") {
    val root = tmpRoot()
    mergeDay(root, "2024-01-01", deltas(("a", 10.0, 100L, 200L)))
    mergeDay(root, "2024-01-02", deltas(("a", 2.5, 250L, 300L)))
    assert(stateMap(root, before = Some("2024-01-02"))("a")._3 === 10.0)
    assert(stateMap(root)("a")._3 === 12.5)
  }

  test("compactSnapshot + vacuum collapse history without changing state") {
    val root = tmpRoot()
    mergeDay(root, "2024-01-01", deltas(("a", 10.0, 100L, 200L), ("b", 5.0, 50L, 60L)))
    mergeDay(root, "2024-01-02", deltas(("a", 2.5, 250L, 300L)))
    val before = stateMap(root)
    StateStore.compactSnapshot(spark, root, "2024-01-03", keys = Seq("entity"),
      nBuckets = 8)
    StateStore.vacuum(spark, root, asOf = "2024-01-03")
    assert(stateMap(root) === before)
    assert(StateStore.committedVersions(spark, root) === Seq("2024-01-03"))
  }

  test("a mixed nBuckets layout is rejected, not silently corrupted") {
    val root = tmpRoot()
    mergeDay(root, "2024-01-01", deltas(("a", 10.0, 100L, 200L))) // nBuckets = 8
    intercept[IllegalArgumentException] {
      StateStore.merge(spark, root, "2024-01-02", deltas(("a", 1.0, 0L, 1L)),
        keys = Seq("entity"), sumCols = Seq("dist"),
        minCols = Seq("start_sec"), maxCols = Seq("end_sec"), nBuckets = 64)
    }
    // the rejected attempt left no committed garbage
    assert(StateStore.committedVersions(spark, root) === Seq("2024-01-01"))
  }

  test("merging onto a committed version is a free no-op (never deletes the snapshot)") {
    val root = tmpRoot()
    mergeDay(root, "2024-01-01", deltas(("a", 10.0, 100L, 200L)))
    // blind re-run with DIFFERENT deltas and the same version: the
    // committed snapshot wins — recomputation requires the explicit flag
    mergeDay(root, "2024-01-01", deltas(("a", 999.0, 0L, 1L)))
    assert(stateMap(root)("a") === ((100L, 200L, 10.0)))
    StateStore.merge(spark, root, "2024-01-01", deltas(("a", 999.0, 0L, 1L)),
      keys = Seq("entity"), sumCols = Seq("dist"), minCols = Seq("start_sec"),
      maxCols = Seq("end_sec"), nBuckets = 8, overwriteCommitted = true)
    assert(stateMap(root)("a") === ((0L, 1L, 999.0)))
  }

  test("empty store reads as None; first merge bootstraps it") {
    val root = tmpRoot()
    assert(StateStore.read(spark, root).isEmpty)
    mergeDay(root, "2024-01-01", deltas(("a", 1.0, 0L, 1L)))
    assert(stateMap(root)("a") === ((0L, 1L, 1.0)))
  }

  test("deleteKeys scrubs an entity from current reads; compact+vacuum destroys the bytes") {
    val root = tmpRoot()
    mergeDay(root, "2024-01-01", deltas(("a", 10.0, 100L, 200L), ("b", 5.0, 50L, 60L)))
    mergeDay(root, "2024-01-02", deltas(("a", 2.5, 250L, 300L)))
    StateStore.deleteKeys(spark, root, "2024-01-03",
      Seq("a").toDF("entity"), Seq("entity"), nBuckets = 8)
    // current read: the key is gone, others untouched
    assert(stateMap(root) === Map("b" -> ((50L, 60L, 5.0))))
    // layered history: an as-of read BEFORE the deletion still sees it
    // (the delete is a normal crash-safe version, not an in-place mutation)
    assert(stateMap(root, before = Some("2024-01-03")).contains("a"))
    // physical destruction: compact the post-delete state, vacuum history,
    // then NO surviving parquet file anywhere under the root holds the key
    StateStore.compactSnapshot(spark, root, "2024-01-04", Seq("entity"), nBuckets = 8)
    StateStore.vacuum(spark, root, "2024-01-04")
    assert(stateMap(root) === Map("b" -> ((50L, 60L, 5.0))))
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .filter(p => p.toString.endsWith(".parquet")).toArray.map(_.toString)
    assert(files.nonEmpty)
    val survivors = spark.read.parquet(files: _*)
      .filter(col("entity") === "a").count()
    assert(survivors === 0L, "deleted entity still present in surviving files")
  }

  test("deleteKeys on an entity sharing no bucket leaves other buckets' dirs alone") {
    val root = tmpRoot()
    mergeDay(root, "2024-01-01", deltas(("a", 1.0, 0L, 1L), ("b", 2.0, 0L, 1L),
      ("c", 3.0, 0L, 1L), ("d", 4.0, 0L, 1L)))
    StateStore.deleteKeys(spark, root, "2024-01-02",
      Seq("a").toDF("entity"), Seq("entity"), nBuckets = 8)
    val day2 = new java.io.File(s"$root/v=2024-01-02")
      .listFiles().filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    // only the deleted key's bucket was rewritten (touched-only IO)
    assert(day2.length === 1, s"expected 1 touched bucket, got ${day2.length}")
    assert(stateMap(root).keySet === Set("b", "c", "d"))
  }

  test("StateSink maintains running state from a stream; batch replay is a no-op") {
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    val root = tmpRoot()
    val ckpt = tmpRoot()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (String, Double, Long, Long)]
    val query = graft.streaming.StateSink.start(
      input.toDF().toDF("entity", "dist", "start_sec", "end_sec"),
      root, ckpt, keys = Seq("entity"), sumCols = Seq("dist"),
      minCols = Seq("start_sec"), maxCols = Seq("end_sec"), nBuckets = 8)
    try {
      input.addData(("a", 10.0, 100L, 200L), ("b", 5.0, 50L, 60L),
        ("a", 1.0, 150L, 160L)) // two per-key rows pre-aggregate in-batch
      query.processAllAvailable()
      input.addData(("a", 2.5, 250L, 300L))
      query.processAllAvailable()
      val got = stateMap(root)
      assert(got("a") === ((100L, 300L, 13.5)))
      assert(got("b") === ((50L, 60L, 5.0)))
      // checkpoint recovery re-delivers a batch with the SAME id: the
      // merge rebuilds that version identically instead of double-adding
      graft.streaming.StateSink.mergeBatch(
        deltas(("a", 2.5, 250L, 300L)), batchId = 1L, root,
        keys = Seq("entity"), sumCols = Seq("dist"),
        minCols = Seq("start_sec"), maxCols = Seq("end_sec"), nBuckets = 8)
      assert(stateMap(root) === got, "batch replay changed the state")
    } finally query.stop()
  }

  test("startWithChangeFeed streams per-batch CDF a mirror can replay") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpRoot()
    val ckpt = tmpRoot()
    val feeds = scala.collection.mutable.ArrayBuffer[
      Array[org.apache.spark.sql.Row]]()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (String, Double, Long, Long)]
    val query = graft.streaming.StateSink.startWithChangeFeed(
      input.toDF().toDF("entity", "dist", "start_sec", "end_sec"),
      root, ckpt, keys = Seq("entity"), sumCols = Seq("dist"),
      minCols = Seq("start_sec"), maxCols = Seq("end_sec"), nBuckets = 8) {
        feed => feeds += feed.collect()
      }
    try {
      input.addData(("a", 10.0, 100L, 200L), ("b", 5.0, 50L, 60L))
      query.processAllAvailable()
      input.addData(("a", 2.5, 250L, 300L), ("c", 3.0, 1L, 2L))
      query.processAllAvailable()
      assert(feeds.size === 2)
      val types1 = feeds(0).map(r => (r.getString(0), r.getString(1))).toSet
      assert(types1 === Set(("insert", "a"), ("insert", "b")))
      val types2 = feeds(1).map(r => (r.getString(0), r.getString(1))).toSet
      assert(types2 === Set(("update_preimage", "a"),
        ("update_postimage", "a"), ("insert", "c")))
      // a mirror replaying the feeds in order lands on the store's state
      val schema = StateStore.read(spark, root).get.schema
      var mirror = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      feeds.foreach { rows =>
        val feedDf = spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq),
          StateStore.changesBetween(spark, root, Seq("entity"),
            Some("b000000000000"), Some("b000000000001")).schema)
        mirror = StateStore.applyChanges(mirror, feedDf, Seq("entity"))
      }
      assert(mirror.collect().map(_.toSeq).toSet ===
        StateStore.read(spark, root).get.collect().map(_.toSeq).toSet,
        "mirror replay diverged from the store")
    } finally query.stop()
  }

  test("changesBetween emits Delta-CDF-shaped row-level changes") {
    val root = tmpRoot()
    mergeDay(root, "2024-01-01",
      deltas(("a", 10.0, 100L, 200L), ("b", 5.0, 50L, 60L), ("c", 1.0, 1L, 2L)))
    // day 2: update a (sum adds), insert d; day 3: delete c
    mergeDay(root, "2024-01-02", deltas(("a", 2.5, 250L, 300L), ("d", 7.0, 7L, 8L)))
    StateStore.deleteKeys(spark, root, "2024-01-03",
      Seq("c").toDF("entity"), Seq("entity"), nBuckets = 8)

    def changeSet(from: Option[String], to: Option[String]) =
      StateStore.changesBetween(spark, root, Seq("entity"), from, to)
        .select("change_type", "entity", "dist")
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet

    // day1 -> day2: a updated (both images), d inserted, b/c silent
    assert(changeSet(Some("2024-01-02"), Some("2024-01-03")) === Set(
      ("update_preimage", "a", 10.0), ("update_postimage", "a", 12.5),
      ("insert", "d", 7.0)))
    // day2 -> current: only the deletion, carrying the old image
    assert(changeSet(Some("2024-01-03"), None) === Set(("delete", "c", 1.0)))
    // from before the first commit: everything is an insert
    assert(changeSet(Some("2024-01-01"), Some("2024-01-02")) === Set(
      ("insert", "a", 10.0), ("insert", "b", 5.0), ("insert", "c", 1.0)))
    // no-op span: empty feed
    assert(changeSet(Some("2024-01-02"), Some("2024-01-02")) === Set.empty)

    // consumer round trip: base + feed ≡ target, for every span
    def snap(before: Option[String]) =
      StateStore.read(spark, root, before).get
        .collect().map(_.toSeq).toSet
    for ((from, to) <- Seq(
        (Some("2024-01-02"), Some("2024-01-03")),
        (Some("2024-01-03"), None),
        (Some("2024-01-02"), None))) {
      val applied = StateStore.applyChanges(
          StateStore.read(spark, root, from).get,
          StateStore.changesBetween(spark, root, Seq("entity"), from, to),
          Seq("entity"))
        .collect().map(_.toSeq).toSet
      assert(applied === snap(to), s"apply($from -> $to) diverged")
    }
  }
}
