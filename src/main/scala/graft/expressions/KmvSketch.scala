package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * KMV (bottom-k / k-minimum-values) distinct sketch as a GROUPED
 * aggregate — the per-(day, dim) twin of
 * [[graft.operators.Quality.kmvSketch]]'s global map-only kernel, for
 * the persisted-sketch rollup algebra: one bounded TreeSet per group,
 * at most `k` distinct hashes of state, serialized only at exchange
 * boundaries. Input is the md5 HEX string of the element (hashed by the
 * caller — the same engine-portable contract as kmvSketch, so a DuckDB
 * consumer replays the identical k hashes). Output: sorted
 * array<string> of ≤ k hashes.
 */
abstract class KmvAggBase
    extends TypedImperativeAggregate[java.util.TreeSet[String]]
    with UnaryLike[Expression] {

  def k: Int

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  protected final def add(buffer: java.util.TreeSet[String], h: String): Unit =
    if (!buffer.contains(h)) {
      if (buffer.size < k) { buffer.add(h); () }
      else if (h.compareTo(buffer.last) < 0) {
        buffer.add(h); buffer.pollLast(); ()
      }
    }

  override def merge(buffer: java.util.TreeSet[String],
                     other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    other.forEach(h => add(buffer, h))
    buffer
  }

  override def eval(buffer: java.util.TreeSet[String]): Any = {
    val out = new Array[Any](buffer.size)
    var i = 0
    buffer.forEach { h => out(i) = UTF8String.fromString(h); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.forEach(h => out.writeUTF(h))
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val set = new java.util.TreeSet[String]()
    var i = 0
    while (i < n) { set.add(in.readUTF()); i += 1 }
    set
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
}

/** Build a KMV sketch from element-hash STRING rows. */
case class KmvSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends KmvAggBase {

  override def update(buffer: java.util.TreeSet[String],
                      input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(buffer, v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def prettyName: String = "kmv_sketch_agg"
  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** Union of KMV sketches (array<string> rows): bottom-k of the union —
 * the rollup re-aggregation over persisted per-day sketch rows. */
case class KmvMergeAgg(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends KmvAggBase {

  override def update(buffer: java.util.TreeSet[String],
                      input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i))
          add(buffer, arr.getUTF8String(i).toString)
        i += 1
      }
    }
    buffer
  }

  override def prettyName: String = "kmv_merge_agg"
  override def withNewMutableAggBufferOffset(offset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
    copy(child = newChild)
}
