package graft

import graft.functions.Geo
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Driver contract: named queries (one per SURVEY.md §2 operator) and their
 * DuckDB oracle SQL. Column names/aliases match between the two exactly.
 *
 * Data mapping (SURVEY.md §3): events.user_id ≈ MMSI, ts ≈ BaseDateTime,
 * value ≈ SOG; lat/lon derived deterministically from value so the geo
 * operators are exercised on the synthetic tables.
 *
 * Cross-engine parity rules (SURVEY.md §5): timestamps surfaced as
 * floored epoch seconds (BIGINT both sides); aggregated doubles rounded;
 * all per-entity windows ordered by (ts_sec, event_id).
 */
object SparkEntry {

  /** 3-hour session gap, in seconds (reference 3h rule). */
  private val GapSec = 10800L
  /** Movement threshold on `value` (maps the reference's SOG 0.5 kn cutoff
   * onto the synthetic value distribution). */
  private val SpeedThreshold = 50.0

  /** Parity-safe 3-decimal rounding: floor(x*1000 + 0.5)/1000 is pure IEEE
   * arithmetic, bit-identical in Spark and DuckDB (Spark's `round` is
   * decimal HALF_UP, DuckDB's is binary — they disagree on .xxx5 values). */
  private def r3(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 1000 + 0.5) / 1000

  /** events + epoch-second and derived geo columns. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("lat", col("value") % 180 - 90)
      .withColumn("lon", (col("value") * 7) % 360 - 180)

  /** DuckDB twin of [[ev]] used as a CTE prefix in oracle SQL. */
  private val EvCte =
    """WITH e AS (
      |  SELECT *,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
      |         fmod(value, 180) - 90 AS lat,
      |         fmod(value * 7, 360) - 180 AS lon
      |  FROM events
      |)""".stripMargin

  private def sessions(s: SparkSession, dir: String): DataFrame =
    Sessionize(ev(s, dir), "user_id", "ts_sec", GapSec, tieBreak = Seq("event_id"))

  /** DuckDB twin of [[sessions]]: e + session_id. */
  private val SessCte = EvCte +
    """, g AS (
      |  SELECT e.*, ts_sec - lag(ts_sec) OVER w AS gap_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
      |), sess AS (
      |  SELECT g.*, CAST(SUM(CASE WHEN gap_s > 10800 THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g
      |)""".stripMargin

  /** Flagship: pricing-summary style aggregation (smoke-check on sf0.001). */
  def entry(spark: SparkSession): DataFrame =
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))

  // -------------------------------------------------------------------- //
  //  queries + oracleSql — keep the two maps in lockstep                  //
  // -------------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- analytics profile (athena_analysis_curated.sql) ---
    "q_rows_per_day" -> ((s, dir) =>
      ev(s, dir).groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_rows"))),

    "q_distinct_per_day" -> ((s, dir) =>
      ev(s, dir).groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(countDistinct(col("user_id")).as("n_users"))),

    "q_timeline" -> ((s, dir) =>
      ev(s, dir).filter(col("user_id") === 7)
        .select(col("event_id"), col("ts_sec"), col("event_type"), col("value"))),

    // --- cleansing ---
    "q_parse_ts" -> ((s, dir) => {
      val strs = ev(s, dir).select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("ts_str"))
      Cleanse.parseTimestamps(strs, "ts_str")
        .select(col("event_id"), unix_timestamp(col("ts_str")).as("parsed_sec"),
          col("year"), col("month"), col("day"))
    }),

    "q_normalize" -> ((s, dir) =>
      Cleanse.normalizeColumns(Tables.lineitem(s, dir),
          Map("l_orderkey" -> "orderkey", "l_linenumber" -> "linenumber",
            "l_quantity" -> "quantity", "l_extendedprice" -> "price"))
        .select("orderkey", "linenumber", "quantity", "price")),

    "q_empty_null" -> ((s, dir) =>
      Cleanse.emptyToNull(Tables.documents(s, dir), Seq("lang"))
        .groupBy("lang").agg(count(lit(1)).as("n"))),

    "q_clamp" -> ((s, dir) =>
      Cleanse.clampUpper(ev(s, dir), Map("value" -> 100.0))
        .select(col("event_id"), col("value").as("value_clamped"))),

    "q_valid_filter" -> ((s, dir) => {
      val pts = ev(s, dir)
        .withColumn("vlat", col("value") - 90)
        .withColumn("vlon", col("value") * 2 - 180)
      val (valid, _) = Cleanse.validSplit(pts, Cleanse.validCoords(col("vlat"), col("vlon")))
      valid.select(col("event_id"), col("vlat"), col("vlon"))
    }),

    "q_dq_stats" -> ((s, dir) =>
      Quality.summaryStats(ev(s, dir), "user_id", Seq("value", "event_type"))),

    // --- movement ---
    "q_movement_flag" -> ((s, dir) =>
      Movement.flag(ev(s, dir), "value", SpeedThreshold)
        .groupBy("movement_flag").agg(count(lit(1)).as("n"))),

    "q_state_dist" -> ((s, dir) =>
      Movement.state(ev(s, dir), "value", SpeedThreshold)
        .groupBy("movement_state").agg(count(lit(1)).as("n"))),

    // --- sessionization (voyage segmentation) ---
    "q_sessionize" -> ((s, dir) =>
      sessions(s, dir).select("event_id", "user_id", "session_id")),

    "q_session_summary" -> ((s, dir) =>
      Rollup.sessionSummary(sessions(s, dir), Seq("user_id", "session_id"), "ts_sec", "value")
        .select(col("user_id"), col("session_id"), col("start_sec"), col("end_sec"),
          col("n_points"), col("duration_hours"),
          r3(col("sum_speed")).as("sum_value"),
          r3(col("avg_speed")).as("avg_value"))),

    "q_daily_segments" -> ((s, dir) =>
      Rollup.dailySegments(
        ev(s, dir).withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
        Seq("user_id"), "ts_sec", "day")),

    "q_daily_metrics" -> ((s, dir) =>
      Rollup.dailyMetrics(
          sessions(s, dir).withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
          Seq("user_id", "session_id"), "day", Seq("value"))
        .withColumn("day_sum_value", r3(col("day_sum_value")))),

    "q_latest_per_key" -> ((s, dir) =>
      StateOps.latestPerKey(
        ev(s, dir).select("user_id", "ts_sec", "event_id", "event_type", "value"),
        Seq("user_id"), Seq("ts_sec", "event_id"))),

    // --- geo ---
    "q_haversine" -> ((s, dir) =>
      Trajectory.segmentDistance(ev(s, dir), Seq("user_id"), "ts_sec",
          "lat", "lon", tieBreak = Seq("event_id"))
        .groupBy("user_id")
        .agg(r3(sum(col("segment_km"))).as("total_km"),
          count(col("segment_km")).as("n_segments"))),

    "q_spatial_grid" -> ((s, dir) =>
      ev(s, dir)
        .withColumn("grid_lat", Geo.gridCell(col("lat"), 5.0))
        .withColumn("grid_lon", Geo.gridCell(col("lon"), 5.0))
        .groupBy("grid_lat", "grid_lon").agg(count(lit(1)).as("n"))),

    // --- dims / lookups ---
    "q_lookup_join" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      val withRegion = Dims.lookupJoin(
        Dims.lookupJoin(cust, nat, "c_nationkey", "n_nationkey", "n_regionkey", "rkey"),
        reg, "rkey", "r_regionkey", "r_name", "r_name")
      withRegion.groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"),
          r3(avg(col("c_acctbal"))).as("avg_acctbal"))
    }),

    "q_dim_build" -> ((s, dir) =>
      Dims.buildUnionDim(
        Seq(
          Tables.nation(s, dir).select(col("n_name").as("name")) -> "nation",
          Tables.region(s, dir).select(col("r_name").as("name")) -> "region"),
        dedupKeys = Seq("name", "source"), trimCols = Seq("name"))),

    // --- dedup ---
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactKeepFirst(Tables.documents(s, dir).select("doc_id", "text"),
          Seq("text"), "doc_id")
        .select("doc_id", "n_dups"))
  )

  def oracleSql: Map[String, String] = Map(
    "q_rows_per_day" ->
      "SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_rows FROM events GROUP BY 1",

    "q_distinct_per_day" ->
      "SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY 1",

    "q_timeline" ->
      s"$EvCte SELECT event_id, ts_sec, event_type, value FROM e WHERE user_id = 7",

    "q_parse_ts" ->
      """SELECT event_id,
        |       CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS parsed_sec,
        |       strftime(ts, '%Y') AS year, strftime(ts, '%m') AS month,
        |       strftime(ts, '%d') AS day
        |FROM events""".stripMargin,

    "q_normalize" ->
      """SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
        |       l_quantity AS quantity, l_extendedprice AS price FROM lineitem""".stripMargin,

    "q_empty_null" ->
      "SELECT CASE WHEN lang = '' THEN NULL ELSE lang END AS lang, COUNT(*) AS n FROM documents GROUP BY 1",

    "q_clamp" ->
      "SELECT event_id, LEAST(value, 100.0) AS value_clamped FROM events",

    "q_valid_filter" ->
      """SELECT event_id, value - 90 AS vlat, value * 2 - 180 AS vlon
        |FROM events
        |WHERE value - 90 BETWEEN -90 AND 90 AND value * 2 - 180 BETWEEN -180 AND 180""".stripMargin,

    "q_dq_stats" ->
      """SELECT COUNT(*) AS total_records, COUNT(DISTINCT user_id) AS unique_user_id,
        |       COUNT(CASE WHEN value IS NULL THEN 1 END) AS null_value,
        |       COUNT(CASE WHEN event_type IS NULL THEN 1 END) AS null_event_type
        |FROM events""".stripMargin,

    "q_movement_flag" ->
      """SELECT CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS movement_flag, COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "q_state_dist" ->
      """SELECT CASE WHEN value < 50.0 THEN 'anchored' ELSE 'moving' END AS movement_state,
        |       COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "q_sessionize" ->
      s"$SessCte SELECT event_id, user_id, session_id FROM sess",

    "q_session_summary" ->
      s"""$SessCte
         |SELECT user_id, session_id,
         |       MIN(ts_sec) AS start_sec, MAX(ts_sec) AS end_sec,
         |       COUNT(*) AS n_points,
         |       (MAX(ts_sec) - MIN(ts_sec)) / 3600.0 AS duration_hours,
         |       floor(SUM(value)*1000 + 0.5)/1000 AS sum_value,
         |       floor((SUM(value)/COUNT(*))*1000 + 0.5)/1000 AS avg_value
         |FROM sess GROUP BY user_id, session_id""".stripMargin,

    "q_daily_segments" ->
      s"""$EvCte
         |SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
         |       MIN(ts_sec) AS day_first_sec, MAX(ts_sec) AS day_last_sec
         |FROM e GROUP BY 1, 2""".stripMargin,

    "q_daily_metrics" ->
      s"""$SessCte
         |SELECT user_id, session_id, strftime(ts, '%Y-%m-%d') AS day,
         |       COUNT(*) AS day_pointcount, floor(SUM(value)*1000 + 0.5)/1000 AS day_sum_value
         |FROM sess GROUP BY 1, 2, 3""".stripMargin,

    "q_latest_per_key" ->
      s"""$EvCte
         |SELECT user_id, ts_sec, event_id, event_type, value FROM (
         |  SELECT e.*, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts_sec DESC, event_id DESC) AS rn FROM e
         |) WHERE rn = 1""".stripMargin,

    "q_haversine" ->
      s"""$EvCte, l AS (
         |  SELECT user_id, lat, lon,
         |         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
         |), d AS (
         |  SELECT user_id,
         |         2 * 6371.0 * asin(sqrt(
         |           pow(sin(radians(lat - plat) / 2), 2) +
         |           cos(radians(plat)) * cos(radians(lat)) *
         |           pow(sin(radians(lon - plon) / 2), 2))) AS km
         |  FROM l
         |)
         |SELECT user_id, floor(SUM(km)*1000 + 0.5)/1000 AS total_km, COUNT(km) AS n_segments
         |FROM d GROUP BY user_id""".stripMargin,

    "q_spatial_grid" ->
      s"""$EvCte
         |SELECT CAST(floor(lat / 5.0) * 5.0 AS INT) AS grid_lat,
         |       CAST(floor(lon / 5.0) * 5.0 AS INT) AS grid_lon,
         |       COUNT(*) AS n
         |FROM e GROUP BY 1, 2""".stripMargin,

    "q_lookup_join" ->
      """SELECT r_name, COUNT(*) AS n_customers, floor(AVG(c_acctbal)*1000 + 0.5)/1000 AS avg_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q_dim_build" ->
      """SELECT DISTINCT trim(n_name) AS name, 'nation' AS source FROM nation
        |UNION
        |SELECT DISTINCT trim(r_name) AS name, 'region' AS source FROM region""".stripMargin,

    "q_dedup_exact" ->
      "SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups FROM documents GROUP BY text"
  )
}
