package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-4 additions: real image codec path, measured ANN/simhash/
  * fingerprint gates, and the advisor-flagged robustness fixes
  * (string-id cluster convergence, unblocked-cosine guard). */
@SlowTest
class Round4Spec extends SparkSpecBase {
  import spark.implicits._

  // --- real image codec ---------------------------------------------------

  test("packImages produces decodable PNGs; imageFeatures verifies every pixel") {
    val docs = Seq(0L, 1L, 17L, 255L, 300L).toDF("doc_id")
    val out = Multimodal.imageFeatures(
        Multimodal.packImages(docs, "doc_id"),
        verifyPixel = Some(Multimodal.referencePixel))
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, r) <- out) {
      val (w, h) = Multimodal.referenceDims(id)
      assert(r.getInt(1) === w && r.getInt(2) === h)
      assert(r.getInt(3) === w * h)
      assert(r.getBoolean(5), s"pixel roundtrip failed for doc $id")
      // pixel_sum = w * sum_y (id+y)%256 — the oracle's closed form
      val expect = w.toLong * (0 until h).map(y => (id + y) % 256).sum
      assert(r.getLong(4) === expect)
      // 4x4 nearest-neighbor luma thumbnail in [0,1]
      val feats = r.getSeq[Float](6)
      assert(feats.length === 16 && feats.forall(f => f >= 0f && f <= 1f))
    }
  }

  test("imageFeatures yields a null-dims row (not a crash) on undecodable media") {
    val junk = Seq((7L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
    val r = Multimodal.imageFeatures(junk).head()
    assert(r.isNullAt(1) && r.isNullAt(4) && !r.getBoolean(5))
  }

  test("sampleFrames decodes only sampled frames and matches the frame formula") {
    val docs = Seq(0L, 1L, 2L, 3L, 42L).toDF("doc_id")
    val out = Multimodal.sampleFrames(Multimodal.packFrames(docs, "doc_id"), stride = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, r) <- out) {
      val n = Multimodal.referenceFrameCount(id)
      val sampledIdx = 0 until n filter (_ % 2 == 0)
      assert(r.getInt(1) === n)
      assert(r.getInt(2) === sampledIdx.length)
      assert(r.getLong(3) ===
        sampledIdx.map(f => Multimodal.referenceFrameValue(id, f).toLong).sum)
    }
  }

  test("sampleFrames stride=1 samples every frame") {
    val docs = Seq(3L).toDF("doc_id") // 4 frames
    val r = Multimodal.sampleFrames(Multimodal.packFrames(docs, "doc_id"), stride = 1).head()
    assert(r.getInt(2) === 4)
  }

  // --- clusterPairs convergence on non-integral ids (advisor fix) ---------

  test("clusterPairs converges correctly on STRING ids (no decimal-cast shortcut)") {
    // chain a-b-c-d plus isolated pair x-y: min-label propagation needs
    // >1 round on the chain; the old decimal-sum test nulled out on
    // strings and declared instant convergence
    val pairs = Seq(("d", "c"), ("c", "b"), ("b", "a"), ("x", "y"))
      .toDF("id_a", "id_b")
    val got = Dedup.clusterPairs(pairs, "id_a", "id_b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("clusterPairs still converges on long ids (sum fast path)") {
    val pairs = Seq((4L, 3L), (3L, 2L), (2L, 1L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.clusterPairs(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  // --- similarity guards and measured gates --------------------------------

  test("embeddingNearDup with empty blockCols requires explicit opt-in") {
    val df = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.embeddingNearDup(df, "vec_id", "embedding", Seq.empty, 0.9)
    }
    // opted in: runs (trivially empty result for a single vector)
    assert(Similarity.embeddingNearDup(df, "vec_id", "embedding", Seq.empty, 0.9,
      allowUnblocked = true).count() === 0)
  }

  test("recallAtK: identical retrieval has recall 1; disjoint has recall 0") {
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("query_id", "cand_id")
    val qs = Seq(1L, 2L, 3L).toDF("query_id")
    val same = Similarity.recallAtK(truth, truth, qs, 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(same(1L) === 1.0 && same(2L) === 0.5 && same(3L) === 0.0)
    val disjoint = Seq((1L, 99L)).toDF("query_id", "cand_id")
    val none = Similarity.recallAtK(disjoint, truth, qs, 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(none(1L) === 0.0)
  }

  test("multi-table lshTopK recall dominates a single table on planted neighbors") {
    // 50 base vectors + planted near-duplicates of the first 5 (tiny
    // perturbation → cos ≈ 1): multi-table LSH must find the planted
    // neighbor as top-1 for every query
    val rng = new scala.util.Random(7)
    val base = (0 until 50).map(i => (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat)))
    val planted = (0 until 5).map(i =>
      (100L + i, base(i)._2.map(v => v + 0.01f * rng.nextGaussian().toFloat)))
    val em = (base ++ planted).toDF("vec_id", "embedding")
    val q = em.filter(col("vec_id") >= 100)
    val lsh = Similarity.lshTopK(em, q, "vec_id", "embedding", k = 1, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0 until 5).foreach { i =>
      assert(lsh.get(100L + i).contains(i.toLong),
        s"planted neighbor of query ${100 + i} not retrieved")
    }
  }

  test("simhashParity reports zero missed/extra pairs inside the pigeonhole bound") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "completely different content about spark engines"))
      .toDF("doc_id", "text")
    // maxHamming = 3 is the largest value 4x16-bit banding certifies:
    // <= 3 differing bits cannot touch all four bands
    val r = Dedup.simhashParity(docs, "doc_id", "text", maxHamming = 3).head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 0L && r.getLong(2) === 0L)
    // beyond the bound the certificate is refused, not silently wrong
    intercept[IllegalArgumentException] {
      Dedup.simhashParity(docs, "doc_id", "text", maxHamming = 10)
    }
  }

  test("fingerprintGate: sound, in bounds, and deterministic per text group") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k l"), // exact dup of 1
      (3L, "one two three four five six seven"),
      (4L, "short"), // fewer tokens than k → no shingles
      (5L, ""))
      .toDF("doc_id", "text")
    val rows = Text.fingerprintGate(docs, "doc_id", "text").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getBoolean(1), s"unsound fingerprints for doc ${r.getLong(0)}")
      assert(r.getBoolean(2), s"fingerprint count out of bounds for doc ${r.getLong(0)}")
      assert(r.getInt(3) === 1, s"nondeterministic fingerprints for doc ${r.getLong(0)}")
    }
  }

  // --- span dedup / mixture / sketch gate ----------------------------------

  test("spanDedup removes repeated spans globally, keeps first occurrence in order") {
    val w = (1 to 10).map(i => s"w$i").mkString(" ") // one 10-word span "w1..w10"
    val docs = Seq(
      (1L, s"$w unique tail one"),     // spans: [w1..w10], [unique tail one]
      (2L, s"$w unique tail one"),     // exact dup of doc 1 → fully removed
      (3L, s"fresh words here $w"))    // span [fresh...w7], [w8 w9 w10] — different chunking
      .toDF("doc_id", "text")
    val out = Text.spanDedup(docs, "doc_id", "text", spanWords = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) === ((2L, s"$w unique tail one")))
    assert(out(2L) === ((0L, ""))) // every span already seen in doc 1
    // doc 3's spans are chunked differently so they are NOT dups of doc 1
    assert(out(3L)._1 === 2L)
  }

  test("spanDedup keeps a doc-internal repeated span only once") {
    val s10 = (1 to 10).map(i => s"x$i").mkString(" ")
    val docs = Seq((5L, s"$s10 $s10")).toDF("doc_id", "text") // span repeats at pos 0 and 1
    val out = Text.spanDedup(docs, "doc_id", "text", spanWords = 10).head()
    assert(out.getLong(1) === 1L && out.getString(2) === s10)
  }

  test("chunkDocs: stride windows overlap correctly, short tail kept") {
    val docs = Seq((1L, (1 to 20).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Text.chunkDocs(docs, "doc_id", "text", chunkTokens = 8, stride = 4)
      .collect().map(r => r.getInt(1) -> r.getString(2)).toMap
    // starts at 0,4,8,12,16 — 5 chunks; chunk 1 overlaps chunk 0 by 4 tokens
    assert(chunks.size === 5)
    assert(chunks(0) === (1 to 8).map(i => s"w$i").mkString(" "))
    assert(chunks(1) === (5 to 12).map(i => s"w$i").mkString(" "))
    assert(chunks(4) === (17 to 20).map(i => s"w$i").mkString(" ")) // short tail
  }

  test("capPerStratum keeps at most N per stratum, deterministically") {
    val docs = (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val out = Sampling.capPerStratum(docs, "doc_id", "lang", 10)
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 10L, "b" -> 10L))
    // pure function of the keys: same selection on rerun
    assert(out.collect().toSet ===
      Sampling.capPerStratum(docs, "doc_id", "lang", 10).collect().toSet)
  }

  test("exactKeepBest keeps the highest-rank duplicate, smallest tiebreak on rank ties") {
    val docs = Seq(
      (1L, "same text", 2), (2L, "same text", 9), (3L, "same text", 9),
      (4L, "other", 1))
      .toDF("doc_id", "text", "pri")
    val out = Dedup.exactKeepBest(docs, Seq("text"), "pri", "doc_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    // rank 9 beats 2; tie between docs 2 and 3 → smallest doc_id (2)
    assert(out("same text") === ((2L, 3L)))
    assert(out("other") === ((4L, 1L)))
  }

  test("exactKeepBest tiebreaks on STRING ids too (negation lives on the rank)") {
    val docs = Seq(
      ("u-b", "same", 5), ("u-a", "same", 5), ("u-z", "same", 2))
      .toDF("doc_id", "text", "pri")
    val out = Dedup.exactKeepBest(docs, Seq("text"), "pri", "doc_id").head()
    assert(out.getString(1) === "u-a" && out.getLong(3) === 3L)
  }

  test("sampleFrames yields a null-counts row (not a crash) on null/corrupt media") {
    val rows = Seq(
      (1L, null.asInstanceOf[Array[Byte]]),
      (2L, Array[Byte](0, 0, 0, 9, 1, 2)), // length prefix beyond payload
      (3L, Array[Byte](0, 0, 0, 2, 7, 7))) // 2 bytes that are not a PNG
      .toDF("doc_id", "media")
    val out = Multimodal.sampleFrames(rows, stride = 1)
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out === Map(1L -> true, 2L -> true, 3L -> true))
  }

  test("mixturePlan: binding stratum keeps everything, ratios hit the target weights") {
    val docs = (1 to 400).map(i => (i.toLong, if (i <= 200) "en" else if (i <= 300) "de" else "fr"))
      .toDF("doc_id", "lang")
    val plan = Sampling.mixturePlan(docs, "lang", Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // t_max = min(200/.5, 100/.3, 100/.2) = 333.3 (de binds)
    assert(plan("de")._2 === 1.0)
    assert(math.abs(plan("en")._2 - (0.5 * (100 / 0.3) / 200)) < 1e-12)
    assert(math.abs(plan("fr")._2 - (0.2 * (100 / 0.3) / 100)) < 1e-12)
    // excluded stratum never appears
    val plan2 = Sampling.mixturePlan(docs, "lang", Map("en" -> 1.0))
    assert(plan2.collect().map(_.getString(0)).toSeq === Seq("en"))
  }

  test("mixtureSample realizes approximately the target mixture deterministically") {
    val docs = (1 to 2000).map(i =>
      (i.toLong, if (i % 4 != 0) "en" else "de")).toDF("doc_id", "lang") // 1500 en / 500 de
    val out = Sampling.mixtureSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.5))
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // t_max = min(1500/.5, 500/.5) = 1000 → ~500 of each
    assert(counts("de") > 400 && math.abs(counts("en") - counts("de")) < 120,
      s"mixture off target: $counts")
    // deterministic: same rows on a re-run
    assert(out.collect().toSet === Sampling.mixtureSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.5)).collect().toSet)
  }

  test("approxDistinctGate: sketch within tolerance, exact counts right") {
    val df = (1 to 5000).map(i => (i.toLong % 321, s"t${i % 7}")).toDF("k", "t")
    val out = Quality.approxDistinctGate(df, Seq("k", "t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toList
    assert(out.contains(("k", 321L, true)) && out.contains(("t", 7L, true)), out.toString)
  }

  // --- zscore zero-std guard ----------------------------------------------

  test("zscore emits null (not NaN/inf) for constant-valued groups") {
    val df = Seq((1L, 5.0), (1L, 5.0), (1L, 5.0), (2L, 1.0), (2L, 3.0))
      .toDF("g", "v")
    val z = Analytics.zscore(df, Seq("g"), "v").collect()
    assert(z.filter(_.getLong(0) == 1L).forall(_.isNullAt(2)))
    assert(z.filter(_.getLong(0) == 2L).forall(r => !r.isNullAt(2)))
  }

  // --- CurateDocuments keeps token-less docs unless floored ----------------

  test("CurateDocuments does not silently drop token-less docs at minEntropy=0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and more text here to pass quality"),
      (2L, ""))
      .toDF("doc_id", "text")
    val out = Pipelines.curate(docs)
    // doc 2 fails the quality floor (too short), but the entropy JOIN
    // itself must not be the thing that drops it: with quality floor 0
    // and entropy floor 0 both docs survive
    assert(out.count() === 2)
  }

  private object Pipelines {
    def curate(docs: org.apache.spark.sql.DataFrame) =
      graft.pipelines.CurateDocuments.run(docs,
        graft.pipelines.CurateDocuments.Config(
          idCol = "doc_id", textCol = "text", minQuality = 0.0))
  }
}
