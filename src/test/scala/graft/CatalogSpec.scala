package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Catalog registration: the whole table surface must be reachable from
  * plain spark.sql through registered names (the reference registers
  * every lake layer as Athena external tables). */
class CatalogSpec extends SparkSpecBase {

  test("register exposes every base table to spark.sql") {
    Tables.register(spark, sfDir)
    Tables.Names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM graft.$n").count() > 0, s"table $n empty")
    }
  }

  test("SQL over registered tables matches the DataFrame API result") {
    Tables.register(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT r_name, COUNT(*) AS n FROM graft.customer c
        |JOIN graft.nation n ON c.c_nationkey = n.n_nationkey
        |JOIN graft.region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaApi = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql === viaApi)
  }

  test("events_ts view serves a real timestamp and agrees with Tables.events") {
    Tables.register(spark, sfDir)
    val view = spark.sql("SELECT ts FROM graft.events_ts")
    assert(view.schema("ts").dataType === TimestampType)
    val sqlMax = spark.sql("SELECT CAST(max(ts) AS LONG) FROM graft.events_ts").head().getLong(0)
    val apiMax = Tables.events(spark, sfDir)
      .agg(max(col("ts").cast("long"))).head().getLong(0)
    assert(sqlMax === apiMax)
  }

  // The testdata generator has flipped the physical `ts` encoding between
  // rounds (TIMESTAMP(NANOS)→long vs timestamp[us]→TIMESTAMP_NTZ). Both
  // must normalize to TimestampType through Tables.events AND the
  // events_ts view, so the next flip can't re-break the contract. Each
  // fixture dir symlinks the other nine tables and rewrites events with
  // the target encoding.
  private def fixtureDir(encode: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-events-enc").toString
    Tables.Names.filterNot(_ == "events").foreach { n =>
      Files.createSymbolicLink(
        Paths.get(s"$dir/$n.parquet"), Paths.get(s"$sfDir/$n.parquet"))
    }
    encode(Tables.events(spark, sfDir))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events ts normalizes to TimestampType under BOTH physical encodings") {
    val truth = Tables.events(spark, sfDir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val fixtures = Seq(
      // micros-NTZ: what the current generator writes
      "ntz" -> fixtureDir(df => df.withColumn("ts", col("ts").cast("timestamp_ntz"))),
      // nanos-as-long: what the old generator's TIMESTAMP(NANOS) read as
      "long" -> fixtureDir(df => df.withColumn("ts", expr("unix_micros(ts) * 1000L"))))
    try fixtures.foreach { case (enc, dir) =>
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType === TimestampType, s"encoding $enc via Tables.events")
      assert(ev.agg(max(unix_micros(col("ts")))).head().getLong(0) === truth,
        s"encoding $enc drifted the instant")
      Tables.register(spark, dir)
      val view = spark.sql("SELECT ts FROM graft.events_ts")
      assert(view.schema("ts").dataType === TimestampType, s"encoding $enc via events_ts")
      assert(spark.sql("SELECT max(unix_micros(ts)) FROM graft.events_ts")
        .head().getLong(0) === truth, s"encoding $enc drifted through the view")
    }
    // finally, not tail: a failed assertion must not leave the shared
    // session's catalog pointed at the temp fixture for every later suite
    finally Tables.register(spark, sfDir)
  }

  test("StateStore.register serves versioned snapshots through SQL with isolation") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cat-state").toString
    graft.sources.StateStore.merge(spark, root, "2024-01-01",
      Seq(("a", 1.0), ("b", 2.0)).toDF("entity", "dist"),
      keys = Seq("entity"), sumCols = Seq("dist"), nBuckets = 4)
    graft.sources.StateStore.merge(spark, root, "2024-01-02",
      Seq(("a", 10.0), ("c", 5.0)).toDF("entity", "dist"),
      keys = Seq("entity"), sumCols = Seq("dist"), nBuckets = 4)
    graft.sources.StateStore.register(spark, root, "voyage_state")
    def m(view: String) = spark.sql(s"SELECT entity, dist FROM $view")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // day-1 snapshot: the pre-merge state
    assert(m("voyage_state_v_2024_01_01") === Map("a" -> 1.0, "b" -> 2.0))
    // day-2 snapshot = current: merged sums + the new key
    assert(m("voyage_state_v_2024_01_02") === Map("a" -> 11.0, "b" -> 2.0, "c" -> 5.0))
    assert(m("voyage_state") === m("voyage_state_v_2024_01_02"))
    // snapshot ISOLATION: a merge committed after registration must not
    // bleed into the already-registered views
    graft.sources.StateStore.merge(spark, root, "2024-01-03",
      Seq(("a", 100.0)).toDF("entity", "dist"),
      keys = Seq("entity"), sumCols = Seq("dist"), nBuckets = 4)
    assert(m("voyage_state")("a") === 11.0,
      "post-registration merge bled into the registered current view")
    // re-registration sees it
    graft.sources.StateStore.register(spark, root, "voyage_state")
    assert(m("voyage_state")("a") === 111.0)
    assert(m("voyage_state_v_2024_01_01") === Map("a" -> 1.0, "b" -> 2.0))
  }

  test("re-registration is idempotent and re-points at the new location") {
    Tables.register(spark, sfDir)
    val n1 = spark.sql("SELECT COUNT(*) FROM graft.lineitem").head().getLong(0)
    Tables.register(spark, sfDir) // same dir again: no failure, same counts
    assert(spark.sql("SELECT COUNT(*) FROM graft.lineitem").head().getLong(0) === n1)
    // different dir: the registration must win
    Tables.register(spark, "/root/testdata/sf0.01")
    val n2 = spark.sql("SELECT COUNT(*) FROM graft.lineitem").head().getLong(0)
    assert(n2 > n1, s"expected sf0.01 row count > sf0.001 ($n2 vs $n1)")
    Tables.register(spark, sfDir) // restore for other suites
  }
}
