package graft

import graft.pipelines._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** End-to-end pipeline compositions (reference: the pipelines package). */
class PipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("RawToStaging: normalize, parse, quarantine, clamp, dedup, flag") {
    val raw = Seq(
      // drifting column names, one bad coord, one dup, one bad timestamp
      ("2024-01-01 10:00:00", "7", "10.0", "20.0", "120.0"),
      ("2024-01-01 10:00:00", "7", "10.0", "20.0", "120.0"), // exact dup
      ("2024-01-01 11:00:00", "8", "95.0", "20.0", "30.0"),  // bad lat
      ("not-a-time", "9", "10.0", "20.0", "30.0"),           // dropped by parse
      ("2024-01-02 12:00:00", "10", "", "20.0", "40.0"))     // empty lat -> null -> quarantined
      .toDF("base_datetime", "mmsi", "LAT", "LON", "sog")

    val cfg = RawToStaging.Config(
      columnMapping = Map("base_datetime" -> "ts", "mmsi" -> "user_id",
        "LAT" -> "lat", "LON" -> "lon", "sog" -> "speed"),
      schema = Seq("user_id" -> LongType, "ts" -> StringType,
        "lat" -> DoubleType, "lon" -> DoubleType, "speed" -> DoubleType),
      tsCol = "ts",
      validCondition = df => graft.operators.Cleanse.validCoords(col("lat"), col("lon")),
      clampCaps = Map("speed" -> 100.0),
      dedupCols = Seq("user_id", "ts", "lat", "lon"),
      speedCol = "speed", speedThreshold = 50.0)

    val (staged, quarantine) = RawToStaging.run(raw, cfg)
    val rows = staged.orderBy("user_id").collect()
    assert(rows.length === 1, staged.columns.mkString(","))
    val r = rows.head
    assert(r.getAs[Long]("user_id") === 7L)
    assert(r.getAs[Double]("speed") === 100.0) // clamped from 120
    assert(r.getAs[Int]("movement_flag") === 1)
    assert(r.getAs[String]("year") === "2024")
    assert(quarantine.count() === 2) // bad lat + null lat
  }

  test("StagingToCurated: one-shuffle enrichment feeding all three outputs") {
    val staged = Tables.events(spark, sfDir)
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("lat", col("value") % 180 - 90)
      .withColumn("lon", (col("value") * 7) % 360 - 180)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val cfg = StagingToCurated.Config(
      idCol = "user_id", tsSecCol = "ts_sec", dayCol = "day",
      latCol = "lat", lonCol = "lon", speedCol = "value",
      gapSeconds = 10800L, speedThreshold = 50.0,
      fastSpeedThreshold = 80.0, fastIntervalSec = 600L, slowIntervalSec = 3600L,
      rowKeyCol = "event_id")
    val out = StagingToCurated.run(staged, cfg)
    val nTraj = out.trajectory.count()
    val nAll = staged.count()
    assert(nTraj > 0 && nTraj <= nAll, "downsample must keep a subset")
    assert(out.trajectory.columns.contains("geohash"))
    assert(out.daily.columns.toSet.intersect(
      Set("day_first_sec", "day_last_sec", "day_pointcount")).size === 3)
    // summary point counts reconcile with input size
    val sumPoints = out.summary.agg(sum("n_points")).head().getLong(0)
    assert(sumPoints === nAll)
  }

  test("CurateDocuments: dedups, floors quality, scrubs, splits") {
    val extra = Seq(
      (9001L, "the quick brown fox jumps over the lazy dog again and again and again today"),
      (9002L, "the quick brown fox jumps over the lazy dog again and again and again today"))
      .toDF("doc_id", "text")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").unionByName(extra)
    val out = CurateDocuments.run(docs,
      CurateDocuments.Config(idCol = "doc_id", textCol = "text")).cache()
    // the planted near-identical pair collapses to one survivor
    assert(out.filter(col("doc_id") >= 9001L).count() <= 1)
    // no duplicate texts survive
    assert(out.groupBy("text").count().filter(col("count") > 1).count() === 0)
    assert(out.agg(min("quality_score")).head().getDouble(0) >= 0.3)
    val splits = out.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
    out.unpersist()
  }

  test("CurateDocuments: blocklist scrubs first; entropy floor kills boilerplate") {
    val docs = Seq(
      (1L, "opted out text that must never appear in the corpus at all costs"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam spam spam"),
      (3L, "the quick brown fox jumps over the lazy dog and then runs far away home"))
      .toDF("doc_id", "text")
    val block = docs.filter(col("doc_id") === 1L).select(col("text").as("t"))
    val out = CurateDocuments.run(docs,
      CurateDocuments.Config(idCol = "doc_id", textCol = "text",
        minQuality = 0.0, minEntropy = 0.5),
      blocklist = Some(block))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(1L), "blocklisted doc survived")
    assert(!ids.contains(2L), "zero-entropy boilerplate survived")
    assert(ids.contains(3L))
  }
}
