package graft.streaming

import graft.functions.Geo
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming encounter detection — the stream-stream twin of
 * [[graft.operators.Trajectory.encounters]] for a LIVE feed: pairs of
 * distinct entities within `maxKm` and `maxGapSec` of each other,
 * surfaced as the positions arrive instead of in a nightly batch (the
 * live half of rendezvous / near-miss monitoring).
 *
 * Candidates use the same provably-lossless keys as the batch operator —
 * (time bucket, latitude band, per-band longitude cell), with the left
 * side expanded to its 3×3 band/bucket neighborhood and the right side
 * to its lon cell ± 1 mod nb (great-circle distance ≥ its meridional
 * component bounds Δband/Δbucket to one; the haversine Δλ bound shared
 * with [[graft.operators.Trajectory]] makes the lon cells lossless,
 * antimeridian wrap included, degrading to band-only near the poles).
 * That keeps the stream-stream join an EQUI-join, the form whose state
 * Spark can bound: both sides carry watermarks and the join condition
 * carries the |Δts| ≤ maxGapSec range, so a buffered row is evicted
 * once the other side's watermark passes its horizon — state is
 * O(rate × gap), never O(stream), and in a dense strait the lon key
 * keeps each probe from matching the whole band's buffer. Exact
 * haversine + the range predicate verify every bucket collision,
 * exactly like batch.
 */
object EncounterStream {

  /**
   * @param points  streaming frame of position fixes
   * @param tsCol   event-time column (TimestampType) — watermarked here
   */
  def encounters(points: DataFrame, idCol: String, tsCol: String,
                 latCol: String, lonCol: String,
                 maxKm: Double, maxGapSec: Long,
                 watermarkDelay: String = "10 minutes"): DataFrame = {
    require(maxKm > 0 && maxGapSec > 0, "encounters needs positive bounds")
    val bandDeg = maxKm / 111.0
    val T = graft.operators.Trajectory
    def base(sfx: String) = points
      .withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).as(s"id_$sfx"), col(tsCol).as(s"ts_$sfx"),
        col(latCol).cast("double").as(s"lat_$sfx"),
        col(lonCol).cast("double").as(s"lon_$sfx"))
      .withColumn(s"band_$sfx",
        floor(col(s"lat_$sfx") / bandDeg).cast("long"))
      .withColumn(s"tb_$sfx",
        floor(unix_timestamp(col(s"ts_$sfx")) / maxGapSec).cast("long"))
      .withColumn(s"nb_$sfx", T.lonCells(maxKm, bandDeg, col(s"band_$sfx")))
      .withColumn(s"lb_$sfx",
        T.lonCell(maxKm, bandDeg, col(s"band_$sfx"), col(s"lon_$sfx")))
    // LEFT: band/bucket ± 1, own lon cell under the TARGET band's
    // bucketing (neighbor bands' cells precomputed before the explode);
    // RIGHT: own band/bucket, lon cell ± 1 mod nb (distinct) — the
    // exact batch key recipe, so each pair meets at exactly one key
    val left = base("a")
      .withColumn("bl", explode(array(
        struct((col("band_a") - 1).as("band"),
          T.lonCell(maxKm, bandDeg, col("band_a") - 1, col("lon_a")).as("lb")),
        struct(col("band_a").as("band"), col("lb_a").as("lb")),
        struct((col("band_a") + 1).as("band"),
          T.lonCell(maxKm, bandDeg, col("band_a") + 1, col("lon_a")).as("lb")))))
      .withColumn("band_a", col("bl.band")).withColumn("lb_a", col("bl.lb"))
      .drop("bl", "nb_a")
      .withColumn("tb_a",
        explode(array(col("tb_a") - 1, col("tb_a"), col("tb_a") + 1)))
    val right = base("b")
      .withColumn("lb_b", explode(array_distinct(array(
        pmod(col("lb_b") - 1 + col("nb_b"), col("nb_b")),
        col("lb_b"),
        pmod(col("lb_b") + 1, col("nb_b"))))))
      .drop("nb_b")
    left.join(right,
        col("band_a") === col("band_b") && col("tb_a") === col("tb_b") &&
          col("lb_a") === col("lb_b") &&
          col("id_a") < col("id_b") &&
          col("ts_a") >= col("ts_b") - expr(s"INTERVAL $maxGapSec SECONDS") &&
          col("ts_a") <= col("ts_b") + expr(s"INTERVAL $maxGapSec SECONDS"))
      .withColumn("dist_km", Geo.haversineKm(col("lat_a"), col("lon_a"),
        col("lat_b"), col("lon_b")))
      .filter(col("dist_km") <= maxKm)
      .select("id_a", "id_b", "ts_a", "ts_b", "dist_km")
  }
}
