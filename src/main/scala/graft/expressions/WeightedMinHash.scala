package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Weighted-MinHash kernel family (Ioffe 2010, "Improved consistent
 * sampling, weighted minhash and L1 sketching") — the multiset upgrade
 * of [[MinHashBands]]: plain MinHash treats a document as a shingle
 * SET, so "spam spam spam spam" and one "spam" are identical; corpus
 * near-dup increasingly weights shingles (tf here; idf rides the same
 * kernel by pre-scaling counts). ICWS draws one consistent sample per
 * permutation whose collision probability is EXACTLY the weighted
 * Jaccard Σ min(w)/Σ max(w).
 *
 * Same engineering discipline as the rest of this file: the multiset is
 * an INTERLEAVED sorted array<bigint> [h₀,c₀,h₁,c₁,…] (primitive
 * UnsafeArrayData, zero boxing, one cache-friendly layout shared by the
 * sampler and the exact-verification merge), and every kernel is one
 * static call per row inside whole-stage codegen.
 */

/**
 * Word n-gram shingles WITH term frequencies: [[HashedShingles]]' byte
 * scan, but duplicates are run-length encoded instead of dropped.
 * Output: interleaved (hash, count) pairs sorted by hash; fewer than n
 * tokens → empty array.
 */
case class HashedShingleCounts(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingle_counts"

  override def nullSafeEval(input: Any): Any =
    HashedShingleCounts.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HashedShingleCounts.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedShingleCounts {
  def compute(text: org.apache.spark.unsafe.types.UTF8String, n: Int): UnsafeArrayData = {
    val numBytes = text.numBytes()
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
    // run-length encode the sorted hashes into interleaved (h, count)
    var distinct = 1
    var j = 1
    while (j < nShingles) {
      if (hashes(j) != hashes(j - 1)) distinct += 1
      j += 1
    }
    val out = new Array[Long](distinct * 2)
    var w = 0
    var run = 1L
    j = 1
    while (j <= nShingles) {
      if (j == nShingles || hashes(j) != hashes(j - 1)) {
        out(w) = hashes(j - 1); out(w + 1) = run
        w += 2; run = 1L
      } else run += 1L
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/**
 * ICWS signature + LSH band hashes in one pass over an interleaved
 * (hash, count) multiset. Per permutation p the consistent sample is
 * the element minimizing ln a = ln c − r·(t − β) − r with
 * r, c ~ Gamma(2,1), β ~ U(0,1) all derived from XXH64(h, perm seed) —
 * the SAME element always draws the SAME variates, which is what makes
 * the sample consistent and the collision probability exactly the
 * weighted Jaccard. The signature entry is the (h, t) pair (Ioffe §4:
 * collisions must match the discretized t, not just the element);
 * band b folds its r = numPerms/bands entries with XXH64.
 *
 * Deterministic: every variate is a pure function of (element hash,
 * perm index, seed) through ln/exp on the JVM — rerun- and
 * plan-independent (NOT oracle-replayable: libm transcendentals are
 * engine-specific, so the oracle verifies the exact weighted-Jaccard
 * join instead, the q_dedup_minhash pattern). Empty input → empty
 * array (callers filter zero-weight docs before banding).
 */
case class IcwsBands(child: Expression, numPerms: Int, bands: Int, seed: Long)
    extends UnaryExpression {

  require(numPerms > 0 && bands > 0 && numPerms % bands == 0,
    "bands must divide numPerms")

  @transient private lazy val seeds = IcwsBands.permSeeds(numPerms, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "icws_bands"

  override def nullSafeEval(input: Any): Any =
    IcwsBands.compute(input.asInstanceOf[ArrayData], seeds, bands,
      numPerms / bands, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("icwsSeeds", seeds, "long[]")
    val cls = IcwsBands.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $cls.compute($arr, $sRef, $bands, ${numPerms / bands}, ${seed}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IcwsBands {

  /** Five derivation seeds per permutation (u1, u2 → r; u3, u4 → c;
   * u5 → β), flattened. */
  def permSeeds(numPerms: Int, seed: Long): Array[Long] = {
    val s = new Array[Long](numPerms * 5)
    var i = 0
    while (i < s.length) {
      s(i) = XXH64.hashLong(i.toLong, seed)
      i += 1
    }
    s
  }

  /** (0,1) uniform from a 64-bit hash: top 53 bits, offset by half an
   * ulp so 0 and 1 are unreachable (ln stays finite). */
  private def uniform(h: Long): Double =
    ((h >>> 11) + 0.5) * 1.1102230246251565e-16 // 2^-53

  def compute(arr: ArrayData, seeds: Array[Long], bands: Int, r: Int,
              seed: Long): UnsafeArrayData = {
    val numPerms = bands * r
    val nPairs = arr.numElements() / 2
    if (nPairs == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val sigH = new Array[Long](numPerms)
    val sigT = new Array[Long](numPerms)
    val best = new Array[Double](numPerms)
    java.util.Arrays.fill(best, Double.PositiveInfinity)
    var e = 0
    while (e < nPairs) {
      val h = arr.getLong(2 * e)
      val w = arr.getLong(2 * e + 1).toDouble
      if (w > 0) {
        val lnw = math.log(w)
        var p = 0
        while (p < numPerms) {
          val b5 = p * 5
          val rG = -math.log(uniform(XXH64.hashLong(h, seeds(b5))) *
            uniform(XXH64.hashLong(h, seeds(b5 + 1))))
          val cG = -math.log(uniform(XXH64.hashLong(h, seeds(b5 + 2))) *
            uniform(XXH64.hashLong(h, seeds(b5 + 3))))
          val beta = uniform(XXH64.hashLong(h, seeds(b5 + 4)))
          val t = math.floor(lnw / rG + beta)
          val lnA = math.log(cG) - rG * (t - beta) - rG
          if (lnA < best(p) ||
              (lnA == best(p) && (h < sigH(p) ||
                (h == sigH(p) && t.toLong < sigT(p))))) {
            best(p) = lnA
            sigH(p) = h
            sigT(p) = t.toLong
          }
          p += 1
        }
      }
      e += 1
    }
    val out = new Array[Long](bands)
    var bnd = 0
    while (bnd < bands) {
      var bh = seed
      var j = bnd * r
      val end = j + r
      while (j < end) {
        bh = XXH64.hashLong(sigH(j), bh)
        bh = XXH64.hashLong(sigT(j), bh)
        j += 1
      }
      out(bnd) = bh
      bnd += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/**
 * Exact multiset intersection mass Σ min(c_a, c_b) over two interleaved
 * sorted (hash, count) arrays — the weighted analogue of
 * [[graft.functions.Hashing.intersectionSize]], one linear merge, no
 * allocation. Used by the verification half of weighted LSH: weighted
 * Jaccard = Σmin / (tot_a + tot_b − Σmin).
 */
case class WeightedIntersection(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "weighted_intersection"

  override def nullSafeEval(a: Any, b: Any): Any =
    WeightedIntersection.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WeightedIntersection.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WeightedIntersection {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements() / 2
    val nb = b.numElements() / 2
    var i = 0
    var j = 0
    var s = 0L
    while (i < na && j < nb) {
      val ha = a.getLong(2 * i)
      val hb = b.getLong(2 * j)
      if (ha == hb) {
        s += math.min(a.getLong(2 * i + 1), b.getLong(2 * j + 1))
        i += 1; j += 1
      } else if (ha < hb) i += 1
      else j += 1
    }
    s
  }
}

/** Total multiset mass Σ c of an interleaved (hash, count) array — the
 * per-document size the weighted-Jaccard denominator needs. */
case class WeightedTotal(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "weighted_total"

  override def nullSafeEval(input: Any): Any =
    WeightedTotal.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WeightedTotal.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $cls.compute($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WeightedTotal {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements() / 2
    var i = 0
    var s = 0L
    while (i < n) { s += arr.getLong(2 * i + 1); i += 1 }
    s
  }
}
