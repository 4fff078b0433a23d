package graft

import graft.expressions.GeohashExpression
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.DoubleType

/**
 * Session extensions: registers graft's native expressions so they are
 * callable from SQL (`SELECT geohash(lat, lon, 6) ...`). Install with
 * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
 * post-hoc via [[GraftFunctions.register]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.geohashDescriptor)
}

object GraftFunctions {

  private def geohashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(lat, lon) =>
      GeohashExpression(Cast(lat, DoubleType), Cast(lon, DoubleType), 6)
    case Seq(lat, lon, Literal(p: Int, _)) =>
      GeohashExpression(Cast(lat, DoubleType), Cast(lon, DoubleType), p)
    case _ => throw new IllegalArgumentException(
      "geohash(lat, lon[, precision]) expects 2 or 3 arguments (precision literal)")
  }

  val geohashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("geohash"),
    new ExpressionInfo(classOf[GeohashExpression].getName, "geohash"),
    geohashBuilder)

  /** Register graft functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    val (ident, info, builder) = geohashDescriptor
    registry.registerFunction(ident, info, builder)
  }
}
