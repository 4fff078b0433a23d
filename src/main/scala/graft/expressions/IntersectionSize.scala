package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * `|A ∩ B|` of two long-array sets WITHOUT materializing the
 * intersection array: `size(array_intersect(a, b))` builds (hash set +
 * output ArrayData) per row and then only reads its length — the
 * set-similarity verify joins (Jaccard, MinHash) do this millions of
 * times. This kernel sorts local copies and merge-counts distinct
 * common values: zero ArrayData output, and for inputs that are already
 * sorted (e.g. [[HashedShingles]]) the sort is a no-op pass.
 *
 * Semantics match `size(array_intersect)` for arrays of non-null longs:
 * distinct common element count; null if either input is null.
 */
case class IntersectionSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersection_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectionSize.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = IntersectionSize.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectionSize {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    java.util.Arrays.sort(x)
    java.util.Arrays.sort(y)
    var i = 0
    var j = 0
    var n = 0
    var last = 0L
    var any = false
    while (i < x.length && j < y.length) {
      if (x(i) < y(j)) i += 1
      else if (x(i) > y(j)) j += 1
      else {
        if (!any || x(i) != last) { n += 1; last = x(i); any = true }
        i += 1; j += 1
      }
    }
    n
  }
}

/**
 * Optimizer rule (installed by [[graft.GraftExtensions]] via
 * `injectOptimizerRule`): rewrites `size(array_intersect(a, b))` over
 * non-null long arrays to [[IntersectionSize]], so ANY user query using
 * the builtin combination — SQL or DataFrame — gets the
 * no-materialization kernel transparently.
 */
object RewriteIntersectionSize extends Rule[LogicalPlan] {
  private def eligible(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // legacySizeOfNull=false only: legacy mode returns -1 for null
      // input where this kernel (and modern size) returns null
      case Size(ArrayIntersect(a, b), false) if eligible(a) && eligible(b) =>
        IntersectionSize(a, b)
    }
}
