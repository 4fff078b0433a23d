package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native codegen kernels for the dedup/similarity family.
 *
 * The pure-`Column` formulations (nested `transform`/`aggregate`
 * higher-order functions) are semantically right but evaluate one
 * interpreted lambda per array element — a 128-permutation MinHash over a
 * 200-shingle document is 25k lambda invocations per row. These
 * expressions run the same loops as compiled Java inside whole-stage
 * codegen: one static call per row, zero boxing in the loop.
 *
 * Reference anchor: the reference computes near-dup signatures in native
 * engine kernels too; re-expressing them as Catalyst expressions is the
 * Spark-native equivalent.
 */

/**
 * MinHash signature + LSH band hashes in one pass.
 *
 * Input: array<bigint> of (already distinct) shingle hashes. Output:
 * array<bigint> of `bands` band hashes, where band b is a fold of the
 * signature rows `[b*r, (b+1)*r)` and signature row p is
 * `min_h (h * A(p) + B(p))` — a multiply-add permutation family over
 * Z/2^64 seeded from XXH64, the classical `(a*x+b)` MinHash scheme.
 *
 * An empty shingle set yields the all-`Long.MaxValue` signature (callers
 * should filter empty docs before banding — they'd otherwise all share
 * one degenerate bucket).
 */
case class MinHashBands(child: Expression, numPerms: Int, bands: Int, seed: Long)
    extends UnaryExpression {

  require(numPerms > 0 && bands > 0 && numPerms % bands == 0,
    "bands must divide numPerms")

  private val r = numPerms / bands

  @transient private lazy val coef = MinHashBands.coefficients(numPerms, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData], coef._1, coef._2, bands, r, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coef._1, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coef._2, "long[]")
    val cls = MinHashBands.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $cls.compute($arr, $aRef, $bRef, $bands, $r, ${seed}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBands {

  /** Deterministic per-permutation multiply-add coefficients (a forced odd
   * so x -> a*x+b is a bijection on Z/2^64). */
  def coefficients(numPerms: Int, seed: Long): (Array[Long], Array[Long]) = {
    val a = new Array[Long](numPerms)
    val b = new Array[Long](numPerms)
    var p = 0
    while (p < numPerms) {
      a(p) = XXH64.hashLong(p.toLong, seed) | 1L
      b(p) = XXH64.hashLong(p.toLong, seed ^ 0x9E3779B97F4A7C15L)
      p += 1
    }
    (a, b)
  }

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, a: Array[Long], b: Array[Long],
              bands: Int, r: Int, seed: Long): UnsafeArrayData = {
    val numPerms = bands * r
    val sig = new Array[Long](numPerms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var p = 0
        while (p < numPerms) {
          val v = h * a(p) + b(p)
          if (v < sig(p)) sig(p) = v
          p += 1
        }
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var bnd = 0
    while (bnd < bands) {
      var bh = seed
      var j = bnd * r
      val end = j + r
      while (j < end) { bh = XXH64.hashLong(sig(j), bh); j += 1 }
      out(bnd) = bh
      bnd += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/**
 * Distinct hashed word n-gram shingles of a text column in one pass:
 * equivalent to `array_distinct(transform(wordShingles(text, n), xxhash64))`
 * but with zero per-shingle allocation.
 *
 * Tokenization is byte-level split on 0x20 (valid: in UTF-8 a space byte
 * never occurs inside a multi-byte sequence), and each shingle's hash is
 * computed over the ORIGINAL byte range spanning its n tokens — exactly
 * the bytes `concat_ws(" ", slice(split(text, " "), i, n))` would build,
 * because consecutive single-space-split tokens rejoined with single
 * spaces reconstruct the source bytes verbatim. Hash is XXH64 with
 * Spark's seed 42, so values equal `xxhash64(shingle_string)`.
 *
 * Fewer than n tokens → empty array. Output is sorted distinct (order is
 * irrelevant to every consumer: min-hashing, set intersection, explode).
 */
case class HashedShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HashedShingles.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedShingles {
  def compute(text: org.apache.spark.unsafe.types.UTF8String, n: Int): UnsafeArrayData = {
    val numBytes = text.numBytes()
    // token start/end byte offsets (split on single space, keeping empties)
    var nTokens = 1
    var i = 0
    while (i < numBytes) {
      if (text.getByte(i) == 0x20) nTokens += 1
      i += 1
    }
    if (nTokens < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < numBytes) {
      if (text.getByte(i) == 0x20) {
        ends(t) = i
        t += 1
        starts(t) = i + 1
      }
      i += 1
    }
    ends(t) = numBytes
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nShingles = nTokens - n + 1
    val hashes = new Array[Long](nShingles)
    var s = 0
    while (s < nShingles) {
      val from = starts(s)
      hashes(s) = XXH64.hashUnsafeBytes(base, off + from, ends(s + n - 1) - from, 42L)
      s += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place unique over the sorted hashes
    var out = 0
    var j = 1
    while (j < nShingles) {
      if (hashes(j) != hashes(out)) { out += 1; hashes(out) = hashes(j) }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hashes, out + 1))
  }
}

/**
 * 64-bit SimHash from an array of 64-bit token hashes: bit b of the
 * result is set iff more token hashes have bit b set than clear.
 * Single pass over the tokens; empty input yields 0L (matching the
 * fold-over-empty behavior of the Column formulation it replaces).
 */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash64.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $cls.compute($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def compute(arr: ArrayData): Long = {
    val cnt = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/**
 * Strict left-fold dot product of two array<double> columns:
 * `((a0*b0 + a1*b1) + a2*b2) + ...` — exactly the IEEE accumulation
 * order of DuckDB's `list_reduce(list_transform(...))`, so results stay
 * bit-identical with the SQL oracle (and with the `aggregate(zip_with)`
 * Column formulation this replaces).
 *
 * Null result on: null input arrays, length mismatch, or any null
 * element — the propagation semantics of the HOF formulation.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DotProduct.getClass.getName.stripSuffix("$")
    // freshName: two DotProducts fused into one codegen function (e.g. the
    // k-center distance form v·v − 2·v·c + c·c) would otherwise redefine
    // the local and throw the whole stage back to interpreted mode
    val dotr = ctx.freshName("dotr")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double $dotr = $cls.compute($a, $b);
         |if ($dotr == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dotr.doubleValue();
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Boxed so null can signal "no result" to both eval paths. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(sum)
  }
}
