package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Loaders for the synthetic test tables.
 *
 * `events.parquet` has shipped `ts` in two physical encodings across
 * testdata generations: parquet TIMESTAMP(NANOS), which Spark only reads
 * as a raw nanosecond LONG (spark.sql.legacy.parquet.nanosAsLong), and
 * parquet timestamp[us] without timezone, which Spark reads as
 * TIMESTAMP_NTZ. [[events]] normalizes BOTH back to a plain microsecond
 * TimestampType so every downstream operator (and every streaming
 * watermark, which requires TimestampType) sees one contract regardless
 * of which generation wrote the file. All graft sessions pin
 * spark.sql.session.timeZone=UTC, so the NTZ→LTZ cast is an exact
 * micros-preserving reinterpretation, not a wall-clock shift.
 */
object Tables {

  /** Read one table from an sf directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Events with `ts` normalized to TimestampType (microsecond precision). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long: integer-divide to micros (exact; no double round-trip)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // micros-NTZ: reinterpret as UTC instant (session TZ is UTC)
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Every base table in an sf directory. */
  val Names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /**
   * Register the whole surface in the session catalog as EXTERNAL parquet
   * tables (twin of the reference's athena_ddl_scripts/
   * athena_external_tables.sql:1-135 — there every lake layer becomes an
   * Athena-queryable external table; here every table becomes reachable
   * from plain `spark.sql("SELECT … FROM graft.x")`). Idempotent, and
   * re-registration re-points at a new directory. `events_ts` is a view
   * exposing the nanos-normalized timestamp so SQL consumers never see
   * the raw long.
   */
  def register(spark: SparkSession, dir: String,
               database: String = "graft"): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    Names.foreach { n =>
      // DROP + CREATE (not IF NOT EXISTS): registration must WIN so a
      // re-register against a different sf dir can't silently keep
      // serving the old location
      spark.sql(s"DROP TABLE IF EXISTS $database.$n")
      spark.sql(
        s"CREATE TABLE $database.$n USING PARQUET LOCATION '$dir/$n.parquet'")
    }
    // the external table serves the RAW schema; the view applies the
    // normalization exactly once for every SQL consumer (same two-encoding
    // contract as Tables.events above)
    val viewTs = table(spark, dir, "events").schema("ts").dataType match {
      case LongType         => "timestamp_micros(ts div 1000)"
      case TimestampNTZType => "CAST(ts AS TIMESTAMP)"
      case _                => "ts"
    }
    spark.sql(
      s"""CREATE OR REPLACE VIEW $database.events_ts AS
         |SELECT event_id, $viewTs AS ts, user_id, event_type, value, props
         |FROM $database.events""".stripMargin)
  }
}
