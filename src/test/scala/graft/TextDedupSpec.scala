package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Text analysis, dedup family, similarity, multimodal plumbing. */
@SlowTest
class TextDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away to the hills"
  private val nearDup = base.replace("lazy", "sleepy") // one token changed
  private val distinct = "completely different content with no overlap whatsoever in any token here at all"

  private def docs = Seq(
    (0L, base), (1L, nearDup), (2L, distinct), (3L, base) // 3 is an exact dup of 0
  ).toDF("doc_id", "text")

  test("tokenCount: whitespace vs regex tokens") {
    val out = Text.tokenCount(Seq((1L, "ab cd, ef!")).toDF("id", "text"), "text")
      .select("ws_tokens", "re_tokens").as[(Int, Int)].head()
    assert(out === ((3, 5))) // [ab, cd,, ef!] vs [ab, cd, ',', ef, '!']
  }

  test("qualityScore components and bounds") {
    val out = Text.qualityScore(docs, "text")
    val row = out.filter(col("doc_id") === 0).head()
    val score = row.getAs[Double]("quality_score")
    assert(score > 0.0 && score <= 1.0)
    assert(row.getAs[Double]("punct_ratio") === 0.0)
    assert(row.getAs[Int]("n_tokens") === 16)
  }

  test("languageId picks marker-heavy language, und on no hits") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze ist ein tier"),
      (3L, "xyzzy plugh qwerty")).toDF("id", "text")
    val out = Text.languageId(df, "text").orderBy("id")
      .select("lang_id").as[String].collect().toSeq
    assert(out === Seq("en", "de", "und"))
  }

  test("fingerprint: exact dups share all fingerprints, near-dups most, distinct none") {
    val fp = Text.fingerprint(docs, "text").select("doc_id", "fingerprints")
      .as[(Long, Seq[Long])].collect().toMap
    assert(fp(0L).toSet === fp(3L).toSet)
    val overlapNear = fp(0L).toSet.intersect(fp(1L).toSet).size.toDouble / fp(0L).size
    assert(overlapNear > 0.2, s"near-dup shares too few fingerprints: $overlapNear")
    assert(fp(0L).toSet.intersect(fp(2L).toSet).isEmpty)
  }

  test("exactKeepFirst keeps min-id row and counts dups") {
    val out = Dedup.exactKeepFirst(docs, Seq("text"), "doc_id")
      .filter(col("n_dups") > 1).select("doc_id", "n_dups").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((0L, 2L)))
  }

  test("ngramJaccard finds near-dup pair above threshold, not the distinct doc") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // near-dup
    assert(pairs.contains((0L, 3L))) // exact dup (jaccard 1.0)
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("minhashLsh candidates+verify equals exact jaccard join") {
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 128, 32, 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(lsh === exact)
  }

  test("simhash: identical docs identical signature; near-dups low hamming") {
    val pairs = Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = 10)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((0L, 3L)) === 0)
    assert(m.get((0L, 1L)).exists(_ <= 10))
    assert(!m.contains((0L, 2L)) || m((0L, 2L)) > 10)
  }

  test("cosine: identical=1, orthogonal=0") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding").withColumn("label", lit(0))
    val pairs = Similarity.embeddingNearDup(df, "vec_id", "embedding", Seq("label"), -1.0)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(math.abs(pairs((1L, 2L)) - 1.0) < 1e-12)
    assert(math.abs(pairs((1L, 3L))) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val em = Tables.embeddings(spark, sfDir)
    val out = Similarity.bruteForceTopK(em, em.filter(col("vec_id") === 0),
      "vec_id", "embedding", k = 3)
    val rows = out.orderBy("rank").select("cand_id", "cos").as[(Long, Double)].collect()
    assert(rows.length === 3)
    assert(rows.map(-_._2).toSeq === rows.map(-_._2).toSeq.sorted) // descending cos
    assert(!rows.map(_._1).contains(0L)) // excludes self
  }

  test("lshTopK results are a subset-ranking consistent with brute force") {
    val em = Tables.embeddings(spark, sfDir)
    val q = em.filter(col("vec_id") < 5)
    val lsh = Similarity.lshTopK(em, q, "vec_id", "embedding", k = 3, dim = 64)
      .select("query_id", "cand_id").as[(Long, Long)].collect()
    assert(lsh.nonEmpty)
    // every query finds only same-bucket candidates; sanity: no self matches
    assert(!lsh.exists(p => p._1 == p._2))
  }

  test("docSpanDedup removes repeats within a doc, never across docs") {
    val d = Seq(
      // doc 1: the first 5-word span repeats verbatim at position 1
      (1L, "a b c d e a b c d e f g h i j"),
      // doc 2 STARTS with doc 1's span — must be untouched (map-only,
      // no cross-doc state)
      (2L, "a b c d e x y z w v"),
      (3L, "p q r")).toDF("doc_id", "text")
    val r = operators.Text.docSpanDedup(d, "doc_id", "text", spanWords = 5)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getString(2))).toMap
    assert(r(1L) === (2L, "a b c d e f g h i j"))
    assert(r(2L) === (2L, "a b c d e x y z w v"))
    assert(r(3L) === (1L, "p q r")) // short doc: one partial span, kept
  }

  test("zipfSlope fits ln/ln over the ranked token counts") {
    // counts 4/2/1 -> strictly decreasing: slope strictly negative;
    // and a perfectly flat corpus fits slope 0
    val d = Seq((1L, "a a b"), (2L, "a a b c")).toDF("doc_id", "text")
    val r = operators.Text.zipfSlope(d, "text", topN = 3).head
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) < 0.0)
    val flat = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(math.abs(operators.Text.zipfSlope(flat, "text", topN = 3)
      .head.getDouble(1)) < 1e-12)
  }

  test("multimodal pack + decode roundtrip: counts and checksum deterministic") {
    val packed = Multimodal.packBinary(docs, "doc_id", "text", "text/plain")
    assert(packed.schema("media").dataType.typeName === "binary")
    val out = Multimodal.decodeFeatures(packed)
    val r = out.filter(col("doc_id") === 0).head()
    assert(r.getAs[Int]("n_bytes") === base.length)
    assert(r.getAs[Int]("n_frames") === (base.length + 63) / 64)
    val expectChecksum = base.getBytes("UTF-8").foldLeft(0L)((a, b) => a * 31 + (b & 0xFF))
    assert(r.getAs[Long]("checksum") === expectChecksum)
    // identical payloads → identical checksums
    val c = out.filter(col("doc_id").isin(0L, 3L)).select("checksum").as[Long].collect()
    assert(c.toSet.size === 1)
  }
}
