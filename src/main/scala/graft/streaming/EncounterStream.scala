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
 * (time bucket, latitude band), with the left side expanded to its 3×3
 * neighborhood (great-circle distance ≥ its meridional component, so a
 * qualifying pair can differ by at most one band and one bucket). That
 * keeps the stream-stream join an EQUI-join, the form whose state Spark
 * can bound: both sides carry watermarks and the join condition carries
 * the |Δts| ≤ maxGapSec range, so a buffered row is evicted once the
 * other side's watermark passes its horizon — state is O(rate × gap),
 * never O(stream). Exact haversine + the range predicate verify every
 * bucket collision, exactly like batch.
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
    def base(sfx: String) = points
      .withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).as(s"id_$sfx"), col(tsCol).as(s"ts_$sfx"),
        col(latCol).cast("double").as(s"lat_$sfx"),
        col(lonCol).cast("double").as(s"lon_$sfx"))
      .withColumn(s"band_$sfx",
        floor(col(s"lat_$sfx") / bandDeg).cast("long"))
      .withColumn(s"tb_$sfx",
        floor(unix_timestamp(col(s"ts_$sfx")) / maxGapSec).cast("long"))
    val left = base("a")
      .withColumn("band_a",
        explode(array(col("band_a") - 1, col("band_a"), col("band_a") + 1)))
      .withColumn("tb_a",
        explode(array(col("tb_a") - 1, col("tb_a"), col("tb_a") + 1)))
    val right = base("b")
    left.join(right,
        col("band_a") === col("band_b") && col("tb_a") === col("tb_b") &&
          col("id_a") < col("id_b") &&
          col("ts_a") >= col("ts_b") - expr(s"INTERVAL $maxGapSec SECONDS") &&
          col("ts_a") <= col("ts_b") + expr(s"INTERVAL $maxGapSec SECONDS"))
      .withColumn("dist_km", Geo.haversineKm(col("lat_a"), col("lon_a"),
        col("lat_b"), col("lon_b")))
      .filter(col("dist_km") <= maxKm)
      .select("id_a", "id_b", "ts_a", "ts_b", "dist_km")
  }
}
