package graft

import graft.expressions._
import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XXH64}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/**
 * Property tests for the codegen kernels' shared compute functions —
 * randomized inputs against independent reference implementations.
 * Pure JVM (no SparkSession), so hundreds of cases run in milliseconds.
 */
object KernelProps extends Properties("kernels") {

  private def arr(xs: Seq[Long]): UnsafeArrayData =
    UnsafeArrayData.fromPrimitiveArray(xs.toArray)

  private val longs = Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
  private val smallLongs = Gen.listOf(Gen.chooseNum(-50L, 50L)) // force collisions

  property("intersectionSize == set-intersection size") =
    forAll(smallLongs, smallLongs) { (a, b) =>
      IntersectionSize.compute(arr(a), arr(b)) == (a.toSet & b.toSet).size
    }

  property("intersectionSize symmetric") =
    forAll(smallLongs, smallLongs) { (a, b) =>
      IntersectionSize.compute(arr(a), arr(b)) ==
        IntersectionSize.compute(arr(b), arr(a))
    }

  private val coef = MinHashBands.coefficients(128, 42L)

  property("minhash bands: order-invariant, 32 bands, identical for identical sets") =
    forAll(longs) { xs =>
      val bands = MinHashBands.compute(arr(xs), coef._1, coef._2, 32, 4, 42L)
      val shuffled = MinHashBands.compute(arr(scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(xs)), coef._1, coef._2, 32, 4, 42L)
      bands.numElements() == 32 &&
        bands.toLongArray().sameElements(shuffled.toLongArray())
    }

  property("minhash bands: superset changes at most, equality implies same sig input") =
    forAll(longs) { xs =>
      val a = MinHashBands.compute(arr(xs), coef._1, coef._2, 32, 4, 42L)
      val b = MinHashBands.compute(arr(xs ++ xs), coef._1, coef._2, 32, 4, 42L)
      // duplicates never change a min-hash
      a.toLongArray().sameElements(b.toLongArray())
    }

  property("simhash: order- and duplicate-count-sensitive only via counters (commutative)") =
    forAll(longs) { xs =>
      val r = new scala.util.Random(11)
      SimHash64.compute(arr(xs)) == SimHash64.compute(arr(r.shuffle(xs)))
    }

  property("dot product == naive fold; null on length mismatch") =
    forAll(Gen.listOf(Gen.chooseNum(-1e6, 1e6)), Gen.listOf(Gen.chooseNum(-1e6, 1e6))) {
      (a: List[Double], b: List[Double]) =>
        val ad = UnsafeArrayData.fromPrimitiveArray(a.toArray)
        val bd = UnsafeArrayData.fromPrimitiveArray(b.toArray)
        val got = DotProduct.compute(ad, bd)
        if (a.length != b.length) got == null
        else {
          var expect = 0.0
          a.indices.foreach(i => expect += a(i) * b(i))
          got.doubleValue() == expect
        }
    }

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val text = Gen.listOf(Gen.frequency(9 -> word, 1 -> Gen.const("")))
    .map(_.mkString(" "))

  property("hashedShingles == split/sliding/join/xxhash64 reference") =
    forAll(text, Gen.choose(1, 5)) { (t, n) =>
      val got = HashedShingles.compute(UTF8String.fromString(t), n).toLongArray().toSet
      val toks = t.split(" ", -1)
      val want =
        if (toks.length < n) Set.empty[Long]
        else toks.sliding(n).map(w =>
          XXH64.hashUTF8String(UTF8String.fromString(w.mkString(" ")), 42L)).toSet
      got == want
    }

  property("geohash: valid alphabet, requested length, bounds stable") =
    forAll(Gen.chooseNum(-90.0, 90.0), Gen.chooseNum(-180.0, 180.0),
      Gen.choose(1, 12)) { (lat, lon, p) =>
      val gh = GeohashExpression.encode(lat, lon, p)
      gh != null && gh.length == p &&
        gh.forall("0123456789bcdefghjkmnpqrstuvwxyz".contains(_))
    }

  property("geohash prefix: same point, shorter precision is a prefix") =
    forAll(Gen.chooseNum(-90.0, 90.0), Gen.chooseNum(-180.0, 180.0)) { (lat, lon) =>
      val g12 = GeohashExpression.encode(lat, lon, 12)
      (1 to 11).forall(p => GeohashExpression.encode(lat, lon, p) == g12.take(p))
    }

  property("simhash of empty and singleton") = Prop {
    SimHash64.compute(arr(Nil)) == 0L &&
      SimHash64.compute(arr(Seq(-1L))) == -1L
  }
}
