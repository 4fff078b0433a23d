package graft

import graft.operators.StateOps
import graft.sources.StateStore
import graft.streaming.IvmStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming IVM: the live reporting table is a pure fold of delivered
 * CDF feeds — parity with a direct aggregate of the detail state after
 * every kind of transition (intra-batch duplicate upserts, value
 * updates, GROUP MOVES, null transitions both directions), and replay
 * of a committed batch is a verbatim no-op.
 */
@SlowTest
class IvmStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-ivmstream-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("streamed aggregate table ≡ direct aggregate of the detail store; replay no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val detail = tmpDir("detail")
    val agg = tmpDir("agg")

    val batches: Seq[Seq[(Long, String, Option[Double], Long)]] = Seq(
      // b0: inserts incl. an intra-batch duplicate of id 2 (seq decides)
      // and a null-valued row
      Seq((1L, "a", Some(5.0), 1L), (2L, "a", Some(99.0), 1L),
        (2L, "a", Some(3.0), 2L), (3L, "b", Some(7.0), 1L),
        (4L, "b", None, 1L), (5L, "c", Some(2.0), 1L),
        (6L, "c", None, 1L)),
      // b1: value update (1), GROUP MOVE (3: b→c), fresh insert (7)
      Seq((1L, "a", Some(8.0), 3L), (3L, "c", Some(7.0), 3L),
        (7L, "d", Some(4.0), 3L)),
      // b2: null→value (6), and a null upsert for 5 — the store's
      // replace-merge is coalesce-style (a null NEVER overwrites), so 5
      // keeps 2.0; the CDF feed sees exactly what the store did, which
      // is what the parity gate pins
      Seq((5L, "c", None, 4L), (6L, "c", Some(1.5), 4L)))

    val input = MemoryStream[(Long, String, Option[Double], Long)]
    val q = IvmStream.start(input.toDS().toDF("id", "grp", "value", "seq"),
      detail, agg, tmpDir("ckpt"), keys = Seq("id"), orderCol = "seq",
      groupCols = Seq("grp"), sumCols = Seq("value"))
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val served = IvmStream.readAggTable(spark, agg, Seq("grp"), Seq("value"))
    val detailState = StateStore.read(spark, detail)
      .getOrElse(fail("detail store missing"))
    val direct = StateOps.aggTable(
      detailState.select("grp", "value"), Seq("grp"), Seq("value"))
    assert(sortedRows(served) === sortedRows(direct),
      s"served:\n${sortedRows(served)}\ndirect:\n${sortedRows(direct)}")
    // the group move really moved: b holds only the null-valued id 4
    val byGrp = served.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2)), r.getLong(3))))
      .toMap
    assert(byGrp("b") === ((1L, None, 0L)), s"group move wrong: $byGrp")
    // c = 3 (7.0, moved in), 5 (2.0 — null upsert did not clobber),
    // 6 (null→1.5)
    assert(byGrp("c") === ((3L, Some(10.5), 3L)), s"c wrong: $byGrp")

    // replay b1 (crash-recovery shape): committed versions no-op, the
    // aggregate neither double-counts nor shifts
    val before = sortedRows(served)
    IvmStream.processBatch(
      batches(1).toDF("id", "grp", "value", "seq"), 1L, detail, agg,
      Seq("id"), "seq", Seq("grp"), Seq("value"))
    val after = sortedRows(
      IvmStream.readAggTable(spark, agg, Seq("grp"), Seq("value")))
    assert(after === before, "replayed batch changed the aggregate")
  }

  test("streaming expectations sink: violators quarantined with reasons; replay rewrites, never duplicates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val lake = tmpDir("explake")
    val quar = tmpDir("expquar")
    val checks = Seq(
      "value_nonneg" -> (col("value") >= 0),
      "type_known" -> col("event_type").isin("a", "b"))
    val batches = Seq(
      Seq((1, 1L, 5.0, "a"), (1, 2L, -1.0, "a"), (2, 3L, 2.0, "zz")),
      Seq((2, 4L, 7.0, "b"), (1, 5L, -2.0, "zz")))
    val input = MemoryStream[(Int, Long, Double, String)]
    val q = graft.streaming.LakeSink.startWithExpectations(
      input.toDS().toDF("day", "id", "value", "event_type"),
      lake, quar, tmpDir("expckpt"), checks, partitionCols = Seq("day"))
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    def ids(p: String): Seq[Long] =
      spark.read.parquet(p).select("id").as[Long].collect().sorted.toSeq
    assert(ids(lake) === Seq(1L, 4L), s"clean lake wrong: ${ids(lake)}")
    assert(ids(quar) === Seq(2L, 3L, 5L), s"quarantine wrong: ${ids(quar)}")
    val reasons = spark.read.parquet(quar)
      .select(col("id"), col("_violations"))
      .as[(Long, String)].collect().toMap
    assert(reasons === Map(2L -> "value_nonneg", 3L -> "type_known",
      5L -> "value_nonneg,type_known"), s"reasons wrong: $reasons")
    // crash-recovery shape: re-deliver batch 0 with the same id — the
    // dynamic per-batch overwrite rewrites its own dirs, row sets stable
    graft.streaming.LakeSink.expectationsBatch(
      batches(0).toDF("day", "id", "value", "event_type"), 0L,
      lake, quar, checks, Seq("day"))
    assert(ids(lake) === Seq(1L, 4L), "replay duplicated clean rows")
    assert(ids(quar) === Seq(2L, 3L, 5L), "replay duplicated quarantine rows")
  }
}
