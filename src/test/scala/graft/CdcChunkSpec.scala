package graft

import graft.operators.Text
import org.apache.spark.sql.functions._

/**
 * Content-defined chunking: the O(len) rolling-hash kernel must equal
 * the O(len·w) declarative fold position for position, and the whole
 * point of CDC — chunk identity surviving a content SHIFT — is asserted
 * as a measured property against fixed-width splitting.
 */
class CdcChunkSpec extends SparkSpecBase {
  import spark.implicits._

  private val W = 16
  private val Mod = 64
  private val Base = 31L
  private val Prime = 1000003L

  test("CdcBoundaries kernel equals the declarative per-window fold") {
    val texts = Seq(
      "key agg row scan slow fast table value part hash value table part",
      "a" * 200,
      ("the quick brown fox jumps over the lazy dog " * 10).trim,
      "short",           // below the window: no boundary possible
      "",                // empty
      "héllo wörld — ünïcode view of the çhunker façade " * 4,
      null.asInstanceOf[String])
    val df = texts.toDF("t")
    val kernel = graft.functions.Hashing.cdcBoundaries(
      col("t"), W, Base, Prime, Mod)
    val hof = when(length(col("t")) >= W,
      filter(sequence(lit(W), length(col("t"))), i =>
        aggregate(sequence(i - (W - 1), i), lit(0L),
          (acc, j) => (acc * Base + ascii(col("t").substr(j, lit(1)))) % Prime)
          % Mod === 0))
      .otherwise(when(col("t").isNull, lit(null))
        .otherwise(array().cast("array<int>")))
    val rows = df.select(col("t"), kernel.as("k"), hof.cast("array<int>").as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null parity: ${r.get(0)}")
      if (!r.isNullAt(1))
        assert(r.getSeq[Int](1) === r.getSeq[Int](2),
          s"boundary mismatch on '${String.valueOf(r.get(0)).take(40)}…'")
    }
    // the fixture must actually exercise boundaries
    assert(rows.exists(r => !r.isNullAt(1) && r.getSeq[Int](1).nonEmpty),
      "no text in the fixture produced a boundary — gate is vacuous")
  }

  test("CDC chunk hashes survive a front insertion; fixed-width ones do not") {
    val docText = Tables.documents(spark, sfDir)
      .filter(length(col("text")) > 300)
      .orderBy("doc_id").select("text").as[String].head()
    val shifted = "Z" + docText
    val two = Seq((1L, docText), (2L, shifted)).toDF("doc_id", "text")

    val cdc = Text.cdcChunks(two, "doc_id", "text")
      .select("doc_id", "chunk_md5").as[(Long, String)].collect()
    val cdcA = cdc.filter(_._1 == 1L).map(_._2).toSet
    val cdcB = cdc.filter(_._1 == 2L).map(_._2).toSet

    def fixedHashes(t: String): Set[String] =
      t.grouped(64).map(s => java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString).toSet
    val fixA = fixedHashes(docText)
    val fixB = fixedHashes(shifted)

    val cdcShared = (cdcA intersect cdcB).size.toDouble / cdcA.size
    val fixShared = (fixA intersect fixB).size.toDouble / fixA.size
    assert(cdcA.size >= 3, s"doc produced only ${cdcA.size} CDC chunks")
    // all but the first chunk re-align after the insertion
    assert(cdcShared >= (cdcA.size - 1.0) / cdcA.size - 1e-9,
      s"CDC shared only $cdcShared of chunks across a 1-char shift")
    assert(cdcShared > fixShared,
      s"CDC ($cdcShared) did not beat fixed-width ($fixShared) under shift")
  }
}
