package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Probe a SERIALIZED bloom filter column with a constant 64-bit hash —
 * the executor-side half of a per-file bloom index lookup.
 *
 * Spark's own `BloomFilterMightContain` requires the bloom side to be a
 * literal or scalar subquery (it is built for runtime join filters where
 * ONE bloom probes many rows); a per-file bloom INDEX is the transpose —
 * many blooms, one probe value — so the filter must run over the bloom
 * column itself. This expression deserializes each row's bloom once and
 * probes it, inside whole-stage codegen, so a million-file index is
 * pruned distributed and only surviving file NAMES ever reach the
 * driver (see [[graft.sources.LakeWriter.readPointPruned]]).
 *
 * One deserialization per index row is the floor: each row is a distinct
 * filter. The payload never moves to the driver, which is the point.
 */
case class BloomMightContainLong(child: Expression, hashValue: Long)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(input: Any): Any =
    BloomMightContainLong.compute(input.asInstanceOf[Array[Byte]], hashValue)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BloomMightContainLong.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = $cls.compute($b, ${hashValue}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainLong {
  def compute(bytes: Array[Byte], h: Long): Boolean =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      .mightContainLong(h)
}
