package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/**
 * Bucket a double against precomputed sorted interior cut points:
 * result = number of cuts ≤ x (the upper-bound index), via binary
 * search inside whole-stage codegen — O(log 2^bits) compares per row
 * where the aggregate-HOF formulation it replaces burned O(2^bits)
 * interpreted lambda hops per row per dimension at write time.
 *
 * Null handling lives in the caller (null → bucket 0, the HOF
 * contract); NaN replicates Spark SQL's ordering where NaN is GREATER
 * than every double (Java's `NaN >= cut` is false — the one place the
 * two semantics diverge), so NaN lands in the top bucket exactly as
 * `when(x >= cut, 1)` summed it.
 */
case class QuantileBucket(child: Expression, cuts: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "quantile_bucket"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quantile_bucket needs a double child, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    QuantileBucket.compute(input.asInstanceOf[Double], cuts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("qbCuts", cuts, "double[]")
    val cls = QuantileBucket.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $cls.compute($x, $cutsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantileBucket {
  def compute(x: Double, cuts: Array[Double]): Long = {
    if (java.lang.Double.isNaN(x)) return cuts.length.toLong
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      // cut ≤ x with Spark ordering: a NaN cut is greater than any
      // non-NaN x (x already returned above if NaN)
      if (!java.lang.Double.isNaN(cuts(m)) && cuts(m) <= x) lo = m + 1
      else hi = m
    }
    lo.toLong
  }
}
