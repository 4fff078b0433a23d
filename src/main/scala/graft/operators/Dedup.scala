package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication family: exact (content-hash) plus the near-duplicate
 * operators a training-data pipeline needs (MinHash+LSH, SimHash,
 * n-gram Jaccard, embedding cosine — the last in [[Similarity]]).
 *
 * Reference anchor: utils/common_functions_raw.py:198 drop_duplicates
 * (sha256-of-JSON-struct content key) and
 * utils/common_functions_curated.py:191 add_hash_key (xxhash64-of-struct).
 */
object Dedup {

  /** Stable 64-bit content key over the given columns
   * (reference: common_functions_curated.py:191 add_hash_key). */
  def hashKey(df: DataFrame, cols: Seq[String], outCol: String = "hash_key"): DataFrame =
    df.withColumn(outCol, xxhash64(to_json(struct(cols.map(col): _*))))

  /** 256-bit content key, collision-safe at national-archive scale
   * (reference: common_functions_raw.py:198 drop_duplicates). */
  def contentKey(df: DataFrame, cols: Seq[String], outCol: String = "dedupe_key"): DataFrame =
    df.withColumn(outCol, sha2(to_json(struct(cols.map(col): _*)), 256))

  /**
   * Exact dedup on a content key: one row kept per distinct key.
   * Equivalent to the reference's dropDuplicates-on-hash; a hash
   * aggregation with map-side combine, no sort.
   */
  def exact(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.dropDuplicates(keyCols)

  /**
   * Deterministic exact dedup: keep the row minimizing `orderCol` within
   * each key group (e.g. smallest doc_id), and report group size.
   * min_by/count aggregate — single shuffle, partial-agg friendly.
   */
  def exactKeepFirst(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val payload = df.columns.filterNot(c => keyCols.contains(c)).toSeq
    val aggs = payload.map(c => min_by(col(c), col(orderCol)).as(c)) :+
      count(lit(1)).as("n_dups")
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Distinct word n-gram shingle set of a text column. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(Text.wordShingles(text, n))

  /** (id, sh, n_sh): per-document distinct shingle set and its size. */
  private def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame =
    docs.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))

  /** Shingle sets + their 64-bit hashes, materialized once per row so the
   * 128-perm signature re-mixes longs instead of re-hashing strings. */
  private def hashedShingleSets(docs: DataFrame, idCol: String, textCol: String,
                                n: Int): DataFrame =
    shingleSets(docs, idCol, textCol, n)
      .withColumn("shh", transform(col("sh"), s => xxhash64(s)))

  /**
   * Exact n-gram Jaccard similarity join via inverted index: explode
   * shingles, pair documents that share at least one (only such pairs can
   * have Jaccard > 0), count shared shingles per pair, then
   * |A∩B| / (|A|+|B|-|A∩B|) ≥ threshold.
   *
   * Scale posture: candidate volume is Σ_s freq(s)² — `maxShingleFreq`
   * drops degenerate stop-shingles (a frequency cap is the standard
   * inverted-index skew guard), keeping the pair space near-linear.
   * Pairs sharing only capped shingles are lost by construction; at a
   * near-dup threshold they would not pass anyway.
   */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double,
                   maxShingleFreq: Long = 1000L): DataFrame = {
    // invert on the 64-bit shingle HASHES, not the strings: the join keys
    // shuffled across the cluster are 8 bytes instead of ~8×n chars, and
    // equality tests in the shuffle-hash join are long compares
    val sets = hashedShingleSets(docs, idCol, textCol, n)
    val inv = sets.select(col("id"), col("n_sh"), explode(col("shh")).as("s"))
    // stop-shingle list is tiny (usually empty) → broadcast anti-join;
    // a count-over-window here would force a sort of the whole index.
    // The filtered index feeds three consumers (freq agg + both join
    // sides) → cache so the explode pipeline runs once.
    val stop = inv.groupBy("s").agg(count(lit(1)).as("freq"))
      .filter(col("freq") > maxShingleFreq).select("s")
    val kept = graft.CacheScope.persist(inv.join(broadcast(stop), Seq("s"), "left_anti"))
    val a = kept.select(col("s"), col("id").as("id_a"), col("n_sh").as("n_a"))
    val b = kept.select(col("s"), col("id").as("id_b"), col("n_sh").as("n_b"))
    // the inverted index is NOT broadcast-sized — force the shuffle hash
    // join both sides partitioned by shingle (the at-scale plan)
    a.hint("shuffle_hash").join(b, Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * MinHash signature over PRE-HASHED shingles: permutation p is
   * xxhash64(shingle_hash, p) — long-to-long mixing, no string re-hash
   * per permutation (strings are hashed once upstream). Signature
   * element p = min over shingles. Pure higher-order-function pipeline —
   * no UDF, no extra shuffle.
   */
  def minhashSignature(shingleHashes: Column, numPerms: Int): Column =
    transform(sequence(lit(0), lit(numPerms - 1)),
      p => array_min(transform(shingleHashes, h => xxhash64(h, p))))

  /**
   * MinHash + LSH banding near-duplicate join
   * (shingle → minhash → band → bucket-join → exact verify):
   *  1. signature of `numPerms` minhashes per doc;
   *  2. split into `bands` bands of numPerms/bands rows, hash each band;
   *  3. docs colliding in any (band, hash) bucket become candidates —
   *     an equi-join, not a cross join;
   *  4. candidates are verified with EXACT Jaccard on the shingle sets,
   *     so false positives are filtered and the output matches the exact
   *     join wherever LSH recall holds (P[miss] ≈ (1-t^r)^b, ~1e-4 at
   *     t=0.7 with 128/32).
   *
   * Skew guard: buckets larger than `maxBucketSize` are dropped (their
   * pairs are degenerate near-constant text at scale).
   */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, numPerms: Int = 128, bands: Int = 32,
                 threshold: Double = 0.7,
                 maxBucketSize: Long = 10000L): DataFrame = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    // only the hashed sets are carried: signature + banding happen inside
    // one codegen kernel, and verification intersects the hash arrays
    val sets = graft.CacheScope.persist(
      hashedShingleSets(docs, idCol, textCol, n)
        .select(col("id"), col("shh"), col("n_sh")))

    // empty docs are excluded from banding — they'd all collide in one
    // degenerate bucket (and an empty-vs-empty pair has no defined Jaccard)
    val banded = sets.filter(col("n_sh") > 0)
      .select(col("id"),
        posexplode(graft.functions.Hashing.minhashBands(col("shh"), numPerms, bands)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bh"))

    val bw = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
    val kept = banded.withColumn("bsz", count(lit(1)).over(bw))
      .filter(col("bsz") <= maxBucketSize)
    val cand = kept.select(col("band"), col("bh"), col("id").as("id_a"))
      .join(kept.select(col("band"), col("bh"), col("id").as("id_b")), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    cand
      .join(sets.select(col("id").as("id_a"), col("shh").as("sh_a"), col("n_sh").as("n_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("shh").as("sh_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * Connected components over near-duplicate pairs → cluster assignment
   * `(id, cluster_id)` where cluster_id is the component's minimum id.
   * Keep-one-per-cluster dedup is then `groupBy(cluster_id).min(id)`.
   *
   * Iterative min-label propagation: each round every node takes the min
   * label in its closed neighborhood; converges in O(component diameter)
   * rounds. Near-dup components are dense and shallow (diameter ≤ ~3),
   * so the loop is short; each round is one shuffle join + aggregation,
   * and `localCheckpoint` caps lineage growth so round N doesn't replay
   * rounds 1..N-1. Only nodes that appear in some pair are emitted.
   */
  def clusterPairs(pairs: DataFrame, aCol: String, bCol: String,
                   maxIter: Int = 20): DataFrame = {
    val edges = graft.CacheScope.persist(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
        .distinct())
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // min label among neighbors, joined back against own label
      val nbrMin = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(min("lbl").as("nlbl"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("nlbl"))
        .localCheckpoint(true)
      changed = updated.filter(col("nlbl") =!= col("lbl")).count()
      labels = updated.select(col("id"), col("nlbl").as("lbl"))
      iter += 1
    }
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /**
   * 64-bit SimHash over whitespace tokens: bit b of the signature is the
   * sign of Σ_tokens (±1 by bit b of xxhash64(token)). Token hashes are
   * materialized once per row; the 64 bit-counters run in one codegen
   * kernel pass ([[graft.expressions.SimHash64]]).
   */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              outCol: String = "simhash"): DataFrame =
    docs.select(col(idCol), col(textCol))
      .withColumn(outCol, graft.functions.Hashing.simhash64(
        transform(Text.tokens(col(textCol)), t => xxhash64(t))))

  /**
   * SimHash near-duplicate pairs with Hamming distance ≤ maxHamming:
   * 4 × 16-bit bands — any pair within Hamming ≤ 3 of a 64-bit key must
   * agree exactly on at least one band (pigeonhole), so the candidate
   * search is 4 equi-joins, verified with bit_count(xor).
   */
  def simhashNearDup(docs: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 3): DataFrame = {
    val sh = graft.CacheScope.persist(simhash(docs, idCol, textCol))
    val banded = sh.select(col(idCol).as("id"), col("simhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bh"))): _*))
          .as("bb"))
      .select(col("id"), col("simhash"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    banded.select(col("band"), col("bh"), col("id").as("id_a"), col("simhash").as("sh_a"))
      .join(banded.select(col("band"), col("bh"), col("id").as("id_b"), col("simhash").as("sh_b")),
        Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
