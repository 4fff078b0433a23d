package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Geospatial column functions.
 *
 * Spark-first re-expression of the reference's geo helpers
 * (reference: utils/common_functions_curated.py:113 calculate_haversine,
 * :62 assign_spatial_grid). Everything here is a pure `Column` expression
 * tree — it stays inside whole-stage codegen, unlike the reference's
 * Python UDF geohash.
 */
object Geo {

  /** Mean Earth radius in kilometres (same constant as the reference). */
  val EarthRadiusKm = 6371.0

  /**
   * Great-circle distance in km between two (lat, lon) points, haversine
   * formula (reference: utils/common_functions_curated.py:113).
   * Null-safe: any null operand yields null.
   */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    lit(2 * EarthRadiusKm) * asin(sqrt(
      pow(sin(dLat), 2) +
        cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)))
  }

  /**
   * Initial great-circle bearing from point 1 to point 2 in degrees
   * [0, 360): atan2(sin Δλ·cos φ₂, cos φ₁·sin φ₂ − sin φ₁·cos φ₂·cos Δλ)
   * — the course-made-good companion to [[haversineKm]] (the reference
   * stores COG from the feed; bearing derives it from positions when
   * the feed's value is missing or untrusted). Null-safe like
   * haversine.
   */
  def bearingDeg(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLon = radians(lon2 - lon1)
    val y = sin(dLon) * cos(radians(lat2))
    val x = cos(radians(lat1)) * sin(radians(lat2)) -
      sin(radians(lat1)) * cos(radians(lat2)) * cos(dLon)
    pmod(degrees(atan2(y, x)), lit(360.0))
  }

  /**
   * Quantize a coordinate to a grid bucket boundary:
   * floor(x / precision) * precision (reference:
   * utils/common_functions_curated.py:62 assign_spatial_grid).
   */
  def gridCell(coord: Column, precision: Double): Column =
    (floor(coord / precision) * precision).cast("int")

  /**
   * Geohash of (lat, lon) at the given character precision — a native
   * codegen expression, not a UDF (reference:
   * utils/common_functions_curated.py:164 add_geohash, a Python UDF).
   */
  def geohash(lat: Column, lon: Column, precision: Int = 6): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.expressions.GeohashExpression(
      GraftBridge.expression(lat.cast("double")),
      GraftBridge.expression(lon.cast("double")), precision))
  }
}
