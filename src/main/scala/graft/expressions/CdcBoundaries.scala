package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Content-defined chunk boundaries — the Rabin-style rolling-hash split
 * (LBFS, Muthitacharoen et al. SOSP'01; the chunking under every
 * dedup'ing store): position `i` (1-based, codepoints) is a boundary
 * iff the polynomial hash of the trailing `w`-codepoint window,
 * `fold(acc·base + cp) mod prime`, is ≡ 0 mod `mod`. Boundaries move
 * WITH the content, so inserting one byte near the front of a document
 * shifts every chunk of a fixed-width splitter but leaves all but one
 * CDC chunk identical — chunk-hash dedup then catches shifted
 * boilerplate that whole-doc or fixed-block hashing misses.
 *
 * The declarative formulation (`aggregate` over a `sequence` per
 * position) is O(len·w) interpreted lambda hops; this kernel is the
 * same math via the O(len) rolling recurrence
 * `h' = ((h − cp_out·base^{w−1})·base + cp_in) mod prime`, one compiled
 * pass inside whole-stage codegen. Parity with the HOF form is gated in
 * CdcChunkSpec; cross-engine parity rides the q_cdc_chunks oracle
 * (DuckDB replays the per-window fold verbatim).
 */
case class CdcBoundaries(child: Expression, w: Int, base: Long, prime: Long,
                         mod: Int)
    extends UnaryExpression {

  require(w >= 1, "window must be >= 1")
  require(prime > 0 && base > 0 && mod > 0, "base/prime/mod must be positive")
  // every intermediate stays in a positive long: acc < prime, cp ≤ 0x10FFFF
  require(prime <= Int.MaxValue && base <= Int.MaxValue,
    "base/prime above 2^31 could overflow the rolling recurrence")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.compute(input.asInstanceOf[UTF8String], w, base, prime, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CdcBoundaries.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $cls.compute($t, $w, ${base}L, ${prime}L, $mod);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundaries {

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String, w: Int, base: Long, prime: Long,
              mod: Int): UnsafeArrayData = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n < w) return UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)
    val codes = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      codes(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    // base^(w-1) mod prime, for evicting the outgoing codepoint
    var powOut = 1L
    var k = 1
    while (k < w) { powOut = powOut * base % prime; k += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var h = 0L
    var i = 0
    while (i < w) { h = (h * base + codes(i)) % prime; i += 1 }
    if (h % mod == 0) out += w
    while (i < n) {
      h = ((h + prime - codes(i - w) * powOut % prime) % prime * base
        + codes(i)) % prime
      if (h % mod == 0) out += (i + 1)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }
}
