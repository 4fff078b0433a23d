package graft.functions

import graft.expressions.{DotProduct, HashedShingleCounts, HashedShingles, IcwsBands, IntersectionSize, MinHashBands, SimHash64, WeightedIntersection, WeightedTotal}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge

/** Column wrappers over graft's native codegen hashing kernels. */
object Hashing {

  /** LSH band hashes of the MinHash signature of an array<bigint> of
   * shingle hashes — see [[graft.expressions.MinHashBands]]. */
  def minhashBands(shingleHashes: Column, numPerms: Int, bands: Int,
                   seed: Long = 42L): Column =
    GraftBridge.column(MinHashBands(
      GraftBridge.expression(shingleHashes), numPerms, bands, seed))

  /** Distinct xxhash64 word n-gram shingle hashes of a text column —
   * one codegen pass, no per-shingle allocation. */
  def hashedShingles(text: Column, n: Int): Column =
    GraftBridge.column(HashedShingles(GraftBridge.expression(text), n))

  /** 64-bit SimHash of an array<bigint> of token hashes. */
  def simhash64(tokenHashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokenHashes)))

  /** Distinct-common-element count of two array<bigint> sets without
   * materializing the intersection. */
  def intersectionSize(a: Column, b: Column): Column =
    GraftBridge.column(IntersectionSize(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Word n-gram shingles WITH term frequencies: interleaved sorted
   * (hash, count) array<bigint> — the multiset input of the weighted
   * MinHash family. */
  def hashedShingleCounts(text: Column, n: Int): Column =
    GraftBridge.column(HashedShingleCounts(GraftBridge.expression(text), n))

  /** ICWS weighted-MinHash LSH band hashes over an interleaved
   * (hash, count) multiset — see [[graft.expressions.IcwsBands]]. */
  def icwsBands(shingleCounts: Column, numPerms: Int, bands: Int,
                seed: Long = 42L): Column =
    GraftBridge.column(IcwsBands(
      GraftBridge.expression(shingleCounts), numPerms, bands, seed))

  /** Σ min(count) over the common hashes of two interleaved multiset
   * arrays — the weighted-Jaccard numerator. */
  def weightedIntersection(a: Column, b: Column): Column =
    GraftBridge.column(WeightedIntersection(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Σ count of an interleaved multiset array. */
  def weightedTotal(a: Column): Column =
    GraftBridge.column(WeightedTotal(GraftBridge.expression(a)))

  /** Strict left-fold dot product of two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a.cast("array<double>")),
      GraftBridge.expression(b.cast("array<double>"))))

  /** Content-defined chunk boundary positions (1-based codepoints) of a
   * text column — see [[graft.expressions.CdcBoundaries]]. */
  def cdcBoundaries(text: Column, w: Int, base: Long, prime: Long,
                    mod: Int): Column =
    GraftBridge.column(graft.expressions.CdcBoundaries(
      GraftBridge.expression(text), w, base, prime, mod))
}
