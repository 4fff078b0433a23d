package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/**
 * Probe a serialized Spark `CountMinSketch` (the binary produced by the
 * `count_min_sketch` aggregate) for one key's estimated count.
 *
 * Deliberately `CodegenFallback`: this only ever runs over the top-k
 * candidate rows of a heavy-hitter gate (bounded, not a hot path), and
 * each eval deserializes the sketch — acceptable at k rows, wrong for a
 * per-row scan. The key is LongType: the estimate must hash exactly the
 * value the aggregate added, and pinning both sides to long removes the
 * String/UTF8String asymmetry.
 */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cms_estimate needs (binary, bigint), got (${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(sketchBytes: Any, key: Any): Any = {
    val in = new java.io.ByteArrayInputStream(sketchBytes.asInstanceOf[Array[Byte]])
    CountMinSketch.readFrom(in).estimateCount(key.asInstanceOf[java.lang.Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
