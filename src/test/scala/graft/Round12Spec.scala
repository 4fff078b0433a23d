package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Text}

/** Round-12 wave: perceptual-hash image near-dup (dHash + banded
  * Hamming pairs), n-way scored language ID with confidence margin,
  * and the seed-trained classifier curation path. */
class Round12Spec extends SparkSpecBase {
  import spark.implicits._

  // --- dHash -------------------------------------------------------------------

  test("dHash recovers the reference hash bit-for-bit through the real codec") {
    val ids = Seq(0L, 1L, 7L, 8L, 9L, 63L, 64L, 123L, 511L)
    val got = Multimodal.dHash(
        Multimodal.packDHashImages(ids.toDF("doc_id"), "doc_id"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id =>
      assert(got(id) === Multimodal.referenceDHash(id),
        s"decode->resize->gradient path broke the hash for id $id")
    }
  }

  test("dHash is invariant to a global brightness shift (gradient signs survive)") {
    // same walk pattern, +40 luma everywhere: every horizontal gradient
    // sign is unchanged, so the perceptual hash must be identical
    def render(docId: Long, lift: Int): Array[Byte] = {
      val hash = Multimodal.referenceDHash(docId)
      val img = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8) {
        var v = 128 + lift
        img.setRGB(0, y, (v << 16) | (v << 8) | v)
        for (x <- 0 until 8) {
          v += (if ((hash >>> (y * 8 + x) & 1L) == 1L) 1 else -1)
          img.setRGB(x + 1, y, (v << 16) | (v << 8) | v)
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val packed = Seq((5L, render(5L, 0)), (1005L, render(5L, 40)))
      .toDF("doc_id", "media")
    val hashes = Multimodal.dHash(packed).as[(Long, Long)].collect().toMap
    assert(hashes(5L) === hashes(1005L),
      "brightness shift must not move a difference hash")
    assert(hashes(5L) === Multimodal.referenceDHash(5L))
  }

  test("dHash: null and undecodable media yield null hashes, not a dead job") {
    val packed = Seq(
      (1L, Multimodal.renderDHashPng(1L)),
      (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
    val rows = Multimodal.dHash(packed).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(rows(1L).isDefined && rows(2L).isEmpty && rows(3L).isEmpty)
  }

  test("imageNearDup banded pairs match brute-force Hamming over the same hashes") {
    val ids = (0L until 200L).toDF("doc_id")
    val hashed = graft.CacheScope.persist(
      Multimodal.dHash(Multimodal.packDHashImages(ids, "doc_id")))
    val banded = Multimodal.imageNearDup(hashed, "doc_id", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val a = hashed.select(col("doc_id").as("id_a"), col("dhash").as("h_a"))
    val b = hashed.select(col("doc_id").as("id_b"), col("dhash").as("h_b"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded === brute, "blocked candidate scheme missed or invented pairs")
    // fixture structure: every intra-class pair (8 consecutive ids) sits
    // at Hamming exactly 2 (two distinct member-bit flips)
    assert(brute.nonEmpty && brute.forall(_._3 == 2))
    assert(brute.size === 25 * (8 * 7 / 2), "25 full classes x C(8,2) pairs")
  }

  // --- n-way scored language ID ---------------------------------------------------

  test("languageIdScored: clear English text wins with a positive margin") {
    val df = Seq((1L, "the cat and the dog of the house is here"))
      .toDF("doc_id", "text")
    val r = Text.languageIdScored(df, "text")
      .select("lang_pred", "score_milli", "margin_milli")
      .as[(String, Long, Long)].head()
    assert(r._1 === "en")
    // 3x" the "(1000) + " and "(1000) + " of "(800) + " is "(700) + "th"
    // hits: "the"x3 + nothing else = 150*3 ... compute exactly:
    // " the " occurs 3x? "the cat and the dog of the house is here":
    // padded: " the cat and the dog of the house is here " ->
    // " the " x3 = 3000, " and " 1000, " of " 800, " is " 700,
    // "th" in the/the/the = 3 -> 450, "ing " 0 => 5950
    assert(r._2 === 5950L, s"exact integer score, got ${r._2}")
    assert(r._3 > 0, "margin must be positive for a one-language text")
  }

  test("languageIdScored: no profile hit -> und with zero score and margin") {
    val df = Seq((1L, "zzz qqq xxx")).toDF("doc_id", "text")
    val r = Text.languageIdScored(df, "text")
      .select("lang_pred", "score_milli", "margin_milli")
      .as[(String, Long, Long)].head()
    assert(r === (("und", 0L, 0L)))
  }

  test("languageIdScored: exact tie takes profile order and margin 0") {
    // " of " (en 800) and " ist " (de 800), no char-gram side hits:
    // both languages score exactly 800
    val df = Seq((1L, "xx of yy ist zz")).toDF("doc_id", "text")
    val r = Text.languageIdScored(df, "text")
      .select("lang_pred", "score_milli", "margin_milli")
      .as[(String, Long, Long)].head()
    assert(r._1 === "en", "tie-break must follow profile order")
    assert(r._3 === 0L, "a tie is zero confidence")
  }

  test("languageIdScored: null text scores as und, not an NPE/ANSI throw") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, " le la et les "))
      .toDF("doc_id", "text")
    val got = Text.languageIdScored(df, "text")
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(got(1L) === "und")
    assert(got(2L) === "fr")
  }

  // --- seed-trained classifier (unseen-bucket default path) ---------------------

  test("seed-trained scoring uses the default weight for buckets the seed never saw") {
    // seed vocabulary is disjoint from the scored doc: every feature of
    // the scored doc falls back to the unseen-bucket default, so its
    // score is bias + n_feats * default — checkable in closed form
    val seed = Seq((1L, "aaa bbb", true), (2L, "ccc ddd", false))
      .toDF("doc_id", "text", "pos")
    val model = Text.linearClassifierTrain(seed, "text", col("pos"),
      buckets = 1024, bigrams = false)
    val scored = Text.linearClassifierScore(
        Seq((9L, "eee fff ggg")).toDF("doc_id", "text"), model,
        "doc_id", "text", buckets = 1024, bigrams = false)
      .select("score").as[Double].head()
    // tt = rt = 2 features each side; default w = ln(1/(2+1024)) - ln(1/(2+1024)) = 0
    // bias = ln(1+1) - ln(1+1) = 0 -> score exactly 0.0
    assert(scored === 0.0,
      s"symmetric seed + unseen features must score exactly bias=0, got $scored")
  }
}
