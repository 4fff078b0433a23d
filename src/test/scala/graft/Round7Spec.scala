package graft

import java.nio.file.Files

import graft.operators._
import graft.sources.StateStore
import org.apache.spark.sql.functions._

/**
 * Round-7 hardening: regression gates for the round-6 advice items —
 * the StateStore drift-guard bypass via untouched buckets, and the
 * NaN-variance hole in anomalyFlags.
 */
class Round7Spec extends SparkSpecBase {
  import spark.implicits._

  // --- StateStore drift guard is independent of touched-bucket pruning ----

  test("StateStore.merge rejects a drifted delta even when its keys all hash to absent buckets") {
    val root = Files.createTempDirectory("graft-state").toString
    val nB = 8
    // seed the store with a single key
    StateStore.merge(spark, root, "2024-01-01",
      Seq(("a", 10.0)).toDF("entity", "dist"),
      keys = Seq("entity"), sumCols = Seq("dist"), nBuckets = nB)
    // pick a key landing in a DIFFERENT bucket than "a": with the old
    // guard (attached to the touched-bucket read) a drifted delta whose
    // buckets don't exist yet in the store read None and skipped the
    // check entirely, committing a mixed-schema snapshot
    val bucketOf = (k: String) =>
      Seq(k).toDF("entity")
        .select(pmod(xxhash64(col("entity")), lit(nB)).cast("int"))
        .head().getInt(0)
    val bA = bucketOf("a")
    val other = ('b' to 'z').map(_.toString).find(bucketOf(_) != bA).get
    val drifted = Seq((other, 2.0, 7L)).toDF("entity", "dist", "extra")
    val e = intercept[IllegalArgumentException] {
      StateStore.merge(spark, root, "2024-01-02", drifted,
        keys = Seq("entity"), sumCols = Seq("dist"), nBuckets = nB)
    }
    assert(e.getMessage.contains("schema drift"))
    // a conforming delta to that same fresh bucket still lands
    StateStore.merge(spark, root, "2024-01-03",
      Seq((other, 2.5)).toDF("entity", "dist"),
      keys = Seq("entity"), sumCols = Seq("dist"), nBuckets = nB)
    val got = StateStore.read(spark, root).get.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 10.0, other -> 2.5))
  }

  // --- anomalyFlags: negative fp variance must yield null, not false ------

  test("anomalyFlags: a prior window with negative fp variance flags null (not false)") {
    // five identical 100000000.1 values: the naive sum-of-squares
    // variance is -2.0 in double arithmetic; sqrt would be NaN, and
    // NaN > 0 is TRUE under Spark ordering semantics — the old guard
    // let that through as anomaly=false where the contract says null
    val base = 100000000.1
    val rows = ((1 to 5).map(i => ("k", i.toLong, base)) :+ (("k", 6L, 2.0 * base)))
      .toDF("k", "ts", "v")
    val r = Analytics.anomalyFlags(rows, Seq("k"), "ts", "v",
        alpha = 0.3, window = 10, k = 3.0, minHistory = 3)
      .filter(col("ts") === 6L).head()
    assert(r.isNullAt(r.fieldIndex("anomaly")),
      "constant-window (fp-negative variance) row must be null, not false")
  }
}
