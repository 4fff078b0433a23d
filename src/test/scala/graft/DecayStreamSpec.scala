package graft

import graft.operators.Analytics
import graft.streaming.DecayStream
import org.apache.spark.sql.functions._

/**
 * Streaming decayed-feature maintenance ≡ full batch recompute at every
 * commit: the one-multiply merge law (state·2^(−Δ/H) + delta) IS the
 * streaming design, so the resident state must track
 * [[Analytics.decayedAgg]] over all delivered events exactly (1e-9),
 * including late events and keys that go quiet.
 */
class DecayStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private val H = 3600L

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-dcs-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def stateMap(root: String): (Map[Long, (Double, Double, Long)], Long) = {
    val (df, asOf) = DecayStream.currentState(spark, root)
    (df.collect().map(r => r.getLong(0) ->
      (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap, asOf)
  }

  private def truth(events: Seq[(Long, Long, Double)], asOf: Long) =
    Analytics.decayedAgg(events.toDF("k", "ts_sec", "v"),
        Seq("k"), "ts_sec", "v", asOf, H)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap

  private def assertClose(got: Map[Long, (Double, Double, Long)],
                          want: Map[Long, (Double, Double, Long)]): Unit = {
    assert(got.keySet === want.keySet)
    got.foreach { case (k, (s, w, n)) =>
      val (ts, tw, tn) = want(k)
      assert(math.abs(s - ts) < 1e-9 && math.abs(w - tw) < 1e-9 && n === tn,
        s"key $k drifted: ($s,$w,$n) vs ($ts,$tw,$tn)")
    }
  }

  test("resident state equals the full recompute after every batch; late events fold correctly") {
    val inputDir = tmp("in")
    val root = tmp("root")
    val ckpt = tmp("ckpt")
    def addFile(rows: (Long, Long, Double)*): Unit =
      rows.toDF("k", "ts_sec", "v")
        .coalesce(1).write.mode("append").parquet(inputDir)
    val schema = Seq.empty[(Long, Long, Double)].toDF("k", "ts_sec", "v").schema
    def run() = DecayStream.start(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inputDir),
      root, ckpt, "k", "ts_sec", "v", H)

    val b0 = Seq((1L, 1000L, 10.0), (2L, 2000L, 4.0))
    // b1 carries a LATE event (ts 1500 < b0's max 2000) and a new key
    val b1 = Seq((1L, 9000L, 2.0), (1L, 1500L, 6.0), (3L, 8000L, 1.0))
    // b2: key 2 stays quiet — pure decay of its old state
    val b2 = Seq((3L, 15000L, 5.0))

    addFile(b0: _*)
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    val (s0, a0) = stateMap(root)
    assert(a0 === 2000L)
    assertClose(s0, truth(b0, 2000L))

    addFile(b1: _*); addFile(b2: _*)
    val q2 = run() // also the restart leg: same checkpoint, new query
    try q2.processAllAvailable() finally q2.stop()
    val (s2, a2) = stateMap(root)
    assert(a2 === 15000L)
    assertClose(s2, truth(b0 ++ b1 ++ b2, 15000L))

    // replay of a committed batchId is a verbatim no-op
    DecayStream.processBatch(b1.toDF("k", "ts_sec", "v"), 1L, root,
      "k", "ts_sec", "v", H)
    val (s2b, a2b) = stateMap(root)
    assert(a2b === a2)
    assertClose(s2b, s2)
  }

  test("all-null-ts batches commit nothing; retention keeps only the latest two snapshots") {
    val root = tmp("ret")
    def commit(id: Long, rows: (Long, Long, Double)*): Unit =
      DecayStream.processBatch(rows.toDF("k", "ts_sec", "v"), id, root,
        "k", "ts_sec", "v", H)
    val delivered = Seq((1L, 1000L, 1.0), (1L, 2000L, 2.0), (2L, 3000L, 4.0))
    delivered.zipWithIndex.foreach { case (r, i) => commit(i.toLong, r) }
    // retention: each commit wrote a full snapshot, only the latest is
    // read — after three commits b=0 must be pruned, b=1 + b=2 kept
    def dirs() = new java.io.File(root).listFiles
      .filter(_.getName.startsWith("b=")).map(_.getName).sorted.toSeq
    assert(dirs() === Seq("b=000000000001", "b=000000000002"), dirs())
    val (s2, a2) = stateMap(root)
    assertClose(s2, truth(delivered, 3000L))

    // a non-empty batch whose timestamps are ALL null is a no-op: no
    // b=3 dir, no state/asOf movement, and no NPE killing the query
    DecayStream.processBatch(
      Seq((9L, Option.empty[Long], 99.0)).toDF("k", "ts_sec", "v"), 3L,
      root, "k", "ts_sec", "v", H)
    assert(dirs() === Seq("b=000000000001", "b=000000000002"))
    val (s3, a3) = stateMap(root)
    assert(a3 === a2)
    assertClose(s3, s2)
  }
}
