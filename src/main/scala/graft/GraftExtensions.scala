package graft

import graft.expressions.{CdcBoundaries, CmsEstimate, DotProduct, GeohashExpression, HashedShingles, KllMergeAgg, KllQuantile, KllSketchAgg, KmvMergeAgg, KmvSketchAgg, MinHashBands, NfcNormalize, QuantileBucket, SimHash64}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/**
 * Session extensions: registers graft's native expressions so they are
 * callable from SQL (`SELECT geohash(lat, lon, 6)`,
 * `minhash_bands(hashes, 128, 32)`, `simhash64(hashes)`,
 * `dot_product(a, b)`). Install with
 * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
 * post-hoc via [[GraftFunctions.register]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    // size(array_intersect(a, b)) over long sets → IntersectionSize
    // (count without materializing the intersection array)
    ext.injectOptimizerRule(_ => graft.expressions.RewriteIntersectionSize)
  }
}

object GraftFunctions {

  type Descriptor = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def geohashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(lat, lon) =>
      GeohashExpression(Cast(lat, DoubleType), Cast(lon, DoubleType), 6)
    case Seq(lat, lon, Literal(p: Int, _)) =>
      GeohashExpression(Cast(lat, DoubleType), Cast(lon, DoubleType), p)
    case _ => throw new IllegalArgumentException(
      "geohash(lat, lon[, precision]) expects 2 or 3 arguments (precision literal)")
  }

  private def minhashBandsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(arr, Literal(numPerms: Int, _), Literal(bands: Int, _)) =>
      MinHashBands(arr, numPerms, bands, 42L)
    case Seq(arr, Literal(numPerms: Int, _), Literal(bands: Int, _), Literal(seed: Long, _)) =>
      MinHashBands(arr, numPerms, bands, seed)
    case _ => throw new IllegalArgumentException(
      "minhash_bands(hashes, numPerms, bands[, seed]) expects literal config args")
  }

  private def simhashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(arr) => SimHash64(arr)
    case _ => throw new IllegalArgumentException("simhash64(hashes) expects 1 argument")
  }

  private def kllSketchBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(v) => KllSketchAgg(Cast(v, DoubleType), 200)
    case Seq(v, Literal(k: Int, _)) => KllSketchAgg(Cast(v, DoubleType), k)
    case _ => throw new IllegalArgumentException(
      "kll_sketch_agg(value[, k]) expects a value column and a literal k")
  }

  private def kllMergeBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(sk) => KllMergeAgg(sk, 200)
    case Seq(sk, Literal(k: Int, _)) => KllMergeAgg(sk, k)
    case _ => throw new IllegalArgumentException(
      "kll_merge_agg(sketch[, k]) expects a sketch column and a literal k")
  }

  private def kllQuantileBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(sk, q) => KllQuantile(sk, Cast(q, DoubleType))
    case _ => throw new IllegalArgumentException(
      "kll_quantile(sketch, q) expects 2 arguments")
  }

  private def kmvSketchBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(h) => KmvSketchAgg(h, 512)
    case Seq(h, Literal(k: Int, _)) => KmvSketchAgg(h, k)
    case _ => throw new IllegalArgumentException(
      "kmv_sketch_agg(md5hash[, k]) expects a hash column and a literal k")
  }

  private def kmvMergeBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(sk) => KmvMergeAgg(sk, 512)
    case Seq(sk, Literal(k: Int, _)) => KmvMergeAgg(sk, k)
    case _ => throw new IllegalArgumentException(
      "kmv_merge_agg(sketch[, k]) expects a sketch column and a literal k")
  }

  private def cmsEstimateBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(sk, key) => CmsEstimate(sk, Cast(key, org.apache.spark.sql.types.LongType))
    case _ => throw new IllegalArgumentException(
      "cms_estimate(sketch, key) expects 2 arguments")
  }

  private def nfcBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(s) => NfcNormalize(Cast(s, org.apache.spark.sql.types.StringType))
    case _ => throw new IllegalArgumentException(
      "nfc_normalize(text) expects 1 argument")
  }

  private def dotBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) =>
      DotProduct(Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))
    case _ => throw new IllegalArgumentException("dot_product(a, b) expects 2 arguments")
  }

  // SQL integer literals are Int; config args declared Long accept both
  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(i: Int, _) => Some(i)
      case Literal(l: Long, _) if l.isValidInt => Some(l.toInt)
      case _ => None
    }
  }
  private object LongLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(i: Int, _) => Some(i.toLong)
      case Literal(l: Long, _) => Some(l)
      case _ => None
    }
  }

  private def hashedShinglesBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(s, IntLit(n)) =>
      HashedShingles(Cast(s, org.apache.spark.sql.types.StringType), n)
    case _ => throw new IllegalArgumentException(
      "hashed_shingles(text, n) expects a text column and a literal shingle size")
  }

  // defaults mirror ops.Text.cdcChunks (w=16, mod=64, base=31, prime=1000003)
  private def cdcBoundariesBuilder(args: Seq[Expression]): Expression = {
    val str = org.apache.spark.sql.types.StringType
    args match {
      case Seq(s) => CdcBoundaries(Cast(s, str), 16, 31L, 1000003L, 64)
      case Seq(s, IntLit(w), IntLit(m)) => CdcBoundaries(Cast(s, str), w, 31L, 1000003L, m)
      case Seq(s, IntLit(w), LongLit(b), LongLit(p), IntLit(m)) =>
        CdcBoundaries(Cast(s, str), w, b, p, m)
      case _ => throw new IllegalArgumentException(
        "cdc_boundaries(text[, w, mod | , w, base, prime, mod]) expects literal config args")
    }
  }

  private def quantileBucketBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(v, cuts) if cuts.foldable && cuts.dataType.isInstanceOf[ArrayType] =>
      val at = cuts.dataType.asInstanceOf[ArrayType]
      val data = cuts.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (data == null) throw new IllegalArgumentException(
        "quantile_bucket(value, cuts) got a null cuts array")
      val ds = data.toObjectArray(at.elementType).map {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: java.lang.Number => n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"quantile_bucket cuts must be numeric, got $other")
      }
      QuantileBucket(Cast(v, DoubleType), ds)
    case _ => throw new IllegalArgumentException(
      "quantile_bucket(value, cuts) expects a value column and a foldable numeric array")
  }

  val descriptors: Seq[Descriptor] = Seq(
    (FunctionIdentifier("geohash"),
      new ExpressionInfo(classOf[GeohashExpression].getName, "geohash"),
      geohashBuilder _),
    (FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      minhashBandsBuilder _),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      simhashBuilder _),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      dotBuilder _),
    (FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch_agg"),
      kllSketchBuilder _),
    (FunctionIdentifier("kll_merge_agg"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "kll_merge_agg"),
      kllMergeBuilder _),
    (FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[KllQuantile].getName, "kll_quantile"),
      kllQuantileBuilder _),
    (FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      cmsEstimateBuilder _),
    (FunctionIdentifier("kmv_sketch_agg"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch_agg"),
      kmvSketchBuilder _),
    (FunctionIdentifier("kmv_merge_agg"),
      new ExpressionInfo(classOf[KmvMergeAgg].getName, "kmv_merge_agg"),
      kmvMergeBuilder _),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      nfcBuilder _),
    (FunctionIdentifier("hashed_shingles"),
      new ExpressionInfo(classOf[HashedShingles].getName, "hashed_shingles"),
      hashedShinglesBuilder _),
    (FunctionIdentifier("cdc_boundaries"),
      new ExpressionInfo(classOf[CdcBoundaries].getName, "cdc_boundaries"),
      cdcBoundariesBuilder _),
    (FunctionIdentifier("quantile_bucket"),
      new ExpressionInfo(classOf[QuantileBucket].getName, "quantile_bucket"),
      quantileBucketBuilder _))

  // The RETRIEVAL stack (bm25*, rrfFuse, maxSim) is deliberately NOT in
  // this registry: those are multi-row RANKING shapes — tokenize →
  // grouped tf/df stats → per-(query, doc) aggregate → rank window —
  // i.e. whole SQL queries, not scalar/aggregate functions a registry
  // can hold (a scalar "bm25(q, d)" would need the corpus-global df and
  // avgdl inside the function, which is the index, not an argument).
  // They are still fully reachable from plain SQL: every building block
  // (split/explode/log/window + dot_product for the dense side) is a
  // SQL function, and CatalogSpec's retrieval-parity test issues the
  // whole BM25 + cosine + RRF hybrid as ONE spark.sql query against the
  // registered catalog tables, asserted equal to the operator pipeline.

  /** Register graft functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    descriptors.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
