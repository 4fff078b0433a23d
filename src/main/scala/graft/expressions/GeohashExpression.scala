package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst geohash expression (base-32 interleaved bit encoding,
 * Niemeyer's public geohash scheme).
 *
 * The reference computes geohashes through a per-row Python UDF
 * (reference: utils/common_functions_curated.py:164 add_geohash) — an
 * interpreter hop and a serialization boundary on every row. This
 * implementation is a `BinaryExpression` with `doGenCode`, so it compiles
 * straight into the whole-stage-codegen loop: no boxing, no UDF call,
 * null-safe, and usable anywhere a builtin is.
 *
 * Out-of-range coordinates yield null (mirrors the reference's
 * validity-filter contract rather than throwing mid-pipeline).
 */
case class GeohashExpression(left: Expression, right: Expression, precision: Int)
    extends BinaryExpression {

  require(precision >= 1 && precision <= 12, "geohash precision must be in [1,12]")

  // children are cast to double by the Geo.geohash wrapper / SQL builder
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "geohash"

  override def nullSafeEval(lat: Any, lon: Any): Any = {
    val h = GeohashExpression.encode(
      lat.asInstanceOf[Double], lon.asInstanceOf[Double], precision)
    if (h == null) null else UTF8String.fromString(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GeohashExpression.getClass.getName.stripSuffix("$")
    // freshName: a fixed local would collide when two geohash calls fuse
    // into one codegen function (same failure mode as DotProduct's dotr)
    val gh = ctx.freshName("gh")
    nullSafeCodeGen(ctx, ev, (lat, lon) => {
      s"""
         |String $gh = $cls.encode($lat, $lon, $precision);
         |if ($gh == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = UTF8String.fromString($gh);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GeohashExpression {

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz".toCharArray

  /** Standard geohash encoding; null on out-of-range input. Called from
   * both interpreted eval and generated code. */
  def encode(lat: Double, lon: Double, precision: Int): String = {
    if (lat < -90.0 || lat > 90.0 || lon < -180.0 || lon > 180.0 ||
        java.lang.Double.isNaN(lat) || java.lang.Double.isNaN(lon)) return null
    val sb = new java.lang.StringBuilder(precision)
    var latMin = -90.0; var latMax = 90.0
    var lonMin = -180.0; var lonMax = 180.0
    var isEven = true
    var bit = 0
    var ch = 0
    while (sb.length < precision) {
      if (isEven) {
        val mid = (lonMin + lonMax) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonMin = mid }
        else { ch = ch << 1; lonMax = mid }
      } else {
        val mid = (latMin + latMax) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latMin = mid }
        else { ch = ch << 1; latMax = mid }
      }
      isEven = !isEven
      bit += 1
      if (bit == 5) { sb.append(Base32(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }
}
