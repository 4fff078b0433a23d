package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Multimodal, Similarity, Text}

/** Round-12 second wave: decayed feature mergeability, BFS hop rings vs a
  * driver reference, CCNet perplexity buckets, the embedding distance
  * profile, and the audio (PCM16) modality. */
@SlowTest
class Round12bSpec extends SparkSpecBase {
  import spark.implicits._

  // --- decayedAgg --------------------------------------------------------------

  private val H = 3600L // 1h half-life for the tests

  test("decayedAgg: T1 state folds into a T2 refresh with one multiply (merge ≡ full recompute)") {
    val events = Seq(
      (1L, 1000L, 10.0), (1L, 3000L, 6.0), (1L, 7000L, 4.0),
      (2L, 500L, 1.0), (2L, 9000L, 2.0),
      (3L, 200L, 5.0) // no delta events for key 3: pure decay of old state
    ).toDF("k", "ts_sec", "v")
    val t1 = 4000L
    val t2 = 9500L
    val state1 = Analytics.decayedAgg(
      events.filter(col("ts_sec") <= t1), Seq("k"), "ts_sec", "v", t1, H)
    val delta = Analytics.decayedAgg(
      events.filter(col("ts_sec") > t1), Seq("k"), "ts_sec", "v", t2, H)
    val full = Analytics.decayedAgg(events, Seq("k"), "ts_sec", "v", t2, H)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val fade = math.pow(0.5, (t2 - t1).toDouble / H)
    val merged = state1.select(col("k"),
        (col("decayed_sum") * fade).as("s1"),
        (col("decayed_weight") * fade).as("w1"), col("n").as("n1"))
      .join(delta.select(col("k"), col("decayed_sum").as("s2"),
        col("decayed_weight").as("w2"), col("n").as("n2")), Seq("k"), "full")
      .select(col("k"),
        (coalesce(col("s1"), lit(0.0)) + coalesce(col("s2"), lit(0.0))).as("s"),
        (coalesce(col("w1"), lit(0.0)) + coalesce(col("w2"), lit(0.0))).as("w"),
        (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L))).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(merged.keySet === full.keySet)
    merged.foreach { case (k, (s, w, n)) =>
      val (fs, fw, fn) = full(k)
      assert(math.abs(s - fs) < 1e-9 && math.abs(w - fw) < 1e-9 && n === fn,
        s"merge drifted from full recompute for key $k: ($s,$w,$n) vs ($fs,$fw,$fn)")
    }
  }

  test("decayedAgg: events after asOf are excluded (no future leakage), weight halves per half-life") {
    val events = Seq((1L, 0L, 8.0), (1L, H, 8.0), (1L, 3 * H, 99.0)).toDF("k", "ts_sec", "v")
    val r = Analytics.decayedAgg(events, Seq("k"), "ts_sec", "v", asOfSec = H, halfLifeSec = H)
      .collect().head
    // at asOf=H: event@0 weighs 0.5, event@H weighs 1.0, event@3H excluded
    assert(r.getLong(3) === 2L)
    assert(math.abs(r.getDouble(1) - (8.0 * 0.5 + 8.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.5) < 1e-12)
  }

  // --- bfsHops -----------------------------------------------------------------

  test("bfsHops matches a driver BFS on a branching graph (min-hop, cap, unreachable absent)") {
    // deterministic pseudo-random directed graph on 40 nodes, out-degree 2
    val edges = (0 until 40).flatMap(u =>
      Seq((u.toLong, ((u * 17 + 3) % 40).toLong), (u.toLong, ((u * 29 + 11) % 40).toLong)))
    val maxHops = 4
    val seedSet = Seq(0L, 7L)
    // driver reference BFS
    val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    var dist = seedSet.map(_ -> 0).toMap
    var frontier = seedSet.toSet
    for (h <- 1 to maxHops) {
      val nxt = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- dist.keySet
      dist = dist ++ nxt.map(_ -> h)
      frontier = nxt
    }
    val got = Analytics.bfsHops(edges.toDF("a", "b"),
        "a", "b", seedSet.toDF("node"), "node", maxHops)
      .as[(Long, Int)].collect().toMap
    assert(got === dist.map { case (k, v) => k -> v },
      "distributed frontier BFS must equal the driver reference exactly")
  }

  test("bfsHops: maxHops=0 returns the seed rings only") {
    val got = Analytics.bfsHops(Seq((1L, 2L)).toDF("a", "b"),
      "a", "b", Seq(1L).toDF("node"), "node", maxHops = 0)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0))
  }

  // --- perplexityBuckets -------------------------------------------------------

  test("perplexityBuckets: ntile balance and head-to-tail monotone score bands per language") {
    val docs = Tables.documents(spark, sfDir)
    val b = Text.perplexityBuckets(docs, "doc_id", "text", "lang", nBuckets = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val langs = b.keys.map(_._1).toSet
    langs.foreach { l =>
      val sizes = (1 to 3).map(i => b((l, i))._1)
      assert(sizes.max - sizes.min <= 1, s"ntile buckets must balance within 1 for $l: $sizes")
      // bucket 1 = head (most fluent): its score band sits at or above bucket 2's, etc.
      (1 to 2).foreach { i =>
        assert(b((l, i))._2 >= b((l, i + 1))._3,
          s"bucket $i min_lp must be >= bucket ${i + 1} max_lp for $l")
      }
    }
  }

  // --- sequentialGreedyDrop (shared by NearDupStream + ImageDedupStream) -------

  test("sequentialGreedyDrop equals the driver greedy fold on randomized pair graphs") {
    import graft.operators.Dedup
    val rng = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val n = 6 + rng.nextInt(20)
      val ids = (0 until n).map(_.toLong)
      // random verified-pair graph, id-ordered, ~20% density
      val pairs = (for {
        i <- ids; j <- ids if i < j && rng.nextInt(5) == 0
      } yield (i, j)).toSeq
      if (pairs.nonEmpty) {
        // driver reference: ascending ids, drop iff a pair links to a kept id
        val pairSet = pairs.toSet
        val kept = scala.collection.mutable.ArrayBuffer[Long]()
        val droppedRef = scala.collection.mutable.Set[Long]()
        val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
        members.foreach { m =>
          if (kept.exists(k => pairSet((k, m)) || pairSet((m, k)))) droppedRef += m
          else kept += m
        }
        val got = Dedup.sequentialGreedyDrop(pairs.toDF("id_a", "id_b"),
          "id_a", "id_b").as[Long].collect().toSet
        assert(got === droppedRef.toSet,
          s"trial $trial (n=$n, ${pairs.size} pairs): got $got, want $droppedRef")
      }
    }
  }

  // --- modularity --------------------------------------------------------------

  test("modularity: separated cliques score 0.5, the trivial partition scores 0, unassigned nodes refuse") {
    // two disjoint K4s: 6 intra edges each, m = 12, degree mass 12 per side
    val clique = (base: Long) => for {
      i <- 0 to 3; j <- (i + 1) to 3
    } yield (base + i, base + j)
    val edges = (clique(0L) ++ clique(100L)).toDF("a", "b")
    val goodMemb = (0L to 3L).map((_, 0L)).++((100L to 103L).map((_, 1L)))
      .toDF("node", "comm")
    val good = Analytics.modularity(edges, "a", "b", goodMemb, "node", "comm")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(good(0L) === ((4L, 6L, 12L, 6.0 / 12 - 0.25)))
    assert(good(1L) === ((4L, 6L, 12L, 6.0 / 12 - 0.25)))
    assert(good.values.map(_._4).sum === 0.5, "clean split must score Q = 0.5")

    val oneMemb = ((0L to 3L) ++ (100L to 103L)).map((_, 0L)).toDF("node", "comm")
    val one = Analytics.modularity(edges, "a", "b", oneMemb, "node", "comm")
      .collect().map(_.getDouble(4)).sum
    assert(one === 0.0, "the everything-in-one-community partition must score exactly 0")

    // in-plan gate (raise_error on the degree-agg grouping key): fires
    // at execution, walk the SparkException chain
    val partial = (0L to 3L).map((_, 0L)).toDF("node", "comm")
    val e = intercept[Throwable] {
      Analytics.modularity(edges, "a", "b", partial, "node", "comm").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("membership")), msgs(e).mkString(" | "))
  }

  // --- mannKendall -------------------------------------------------------------

  test("mannKendall: monotone series saturates S, constant series nulls z, ties correct the variance") {
    val rows =
      (1 to 10).map(i => ("up", i.toDouble, i.toDouble)) ++          // strictly increasing
      (1 to 10).map(i => ("down", i.toDouble, -i.toDouble)) ++       // strictly decreasing
      (1 to 10).map(i => ("flat", i.toDouble, 7.0)) ++               // constant: Var = 0
      (1 to 10).map(i => ("tied", i.toDouble, (i / 2).toDouble))     // tie pairs
    val got = Analytics.mannKendall(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    val maxS = 10L * 9 / 2
    val varNoTies = 10.0 * 9 * 25 / 18
    assert(got("up") === ((10L, maxS, varNoTies, Some((maxS - 1) / math.sqrt(varNoTies)))))
    assert(got("down")._2 === -maxS && got("down")._4.get < 0)
    assert(got("flat")._2 === 0L && got("flat")._3 === 0.0 && got("flat")._4.isEmpty,
      "a constant series must have Var 0 and a null z, not a division blowup")
    // tied: y = floor(i/2) gives 5 tie-pairs of size 2 (t=2 each)
    // and one of size... i=1..10 -> y in {0,1,1,2,2,3,3,4,4,5}: four t=2 groups
    val tieSum = 4L * (2 * 1 * 9) // t(t-1)(2t+5) = 2*1*9 per t=2 group
    assert(got("tied")._3 === (10.0 * 9 * 25 - tieSum) / 18,
      s"tie correction drifted: ${got("tied")._3}")
    assert(got("tied")._2 > 0 && got("tied")._2 < maxS)
  }

  test("mannKendall refuses an over-ceiling group loudly") {
    // in-plan gate: fires at execution, walk the SparkException chain
    val big = (1 to 50).map(i => ("g", i.toDouble, i.toDouble)).toDF("g", "x", "y")
    val e = intercept[Throwable] {
      Analytics.mannKendall(big, Seq("g"), "x", "y", maxGroup = 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("maxGroup")), msgs(e).mkString(" | "))
  }

  // --- rankBiasedOverlap -------------------------------------------------------

  test("rankBiasedOverlap: identical lists score the closed-form max, disjoint score 0, order matters") {
    val k = 5; val p = 0.9
    val ids = (1 to k).map(_.toLong)
    def ranking(q: Long, items: Seq[Long]) =
      items.zipWithIndex.map { case (i, r) => (q, i, r + 1) }
    val a = (ranking(1L, ids) ++ ranking(2L, ids) ++ ranking(3L, ids))
      .toDF("q", "item", "rank")
    val b = (ranking(1L, ids) ++                       // identical
        ranking(2L, ids.map(_ + 100)) ++               // disjoint
        ranking(3L, ids.reverse))                      // same set, reversed
      .toDF("q", "item", "rank")
    val got = Analytics.rankBiasedOverlap(a, b, "q", "item", "rank", k, p)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val maxRbo = (1 - p) * (1 to k).map(d => math.pow(p, d - 1)).sum
    assert(math.abs(got(1L)._1 - maxRbo) < 1e-12 && got(1L)._2 === k.toLong,
      s"identical lists must score (1-p)*sum p^(d-1) = $maxRbo, got ${got(1L)}")
    assert(got(2L) === ((0.0, 0L)), "disjoint lists must emit an explicit 0")
    assert(got(3L)._1 > 0 && got(3L)._1 < maxRbo - 1e-9,
      s"a reversed ranking must score strictly between 0 and $maxRbo: ${got(3L)}")
    assert(got(3L)._2 === k.toLong, "reversed list still shares all k items")
  }

  // --- distanceProfile ---------------------------------------------------------

  test("distanceProfile: bins partition C(sampleN,2) pairs and band edges hold") {
    val em = Tables.embeddings(spark, sfDir)
    val n = math.min(100L, em.count()).toInt
    val prof = Similarity.distanceProfile(em, "vec_id", "embedding",
      sampleN = 100, bins = 20).collect()
    assert(prof.map(_.getLong(1)).sum === n.toLong * (n - 1) / 2)
    prof.foreach { r =>
      val (bin, lo) = (r.getInt(0), r.getDouble(4))
      val (mn, mx) = (r.getDouble(2), r.getDouble(3))
      assert(bin >= 0 && bin < 20)
      assert(mn >= lo - 1e-12 && mx <= lo + 0.1 + 1e-12 || bin == 19 && mx <= 1.0 + 1e-12,
        s"bin $bin holds cosines outside [$lo, ${lo + 0.1}]: [$mn, $mx]")
      assert(mn <= mx)
    }
  }

  // --- audioFrames -------------------------------------------------------------

  test("audioFrames: decode->frame->energy matches the analytic reference exactly") {
    val ids = Seq(0L, 1L, 8L, 63L, 191L)
    val got = Multimodal.audioFrames(Multimodal.packPcm(ids.toDF("doc_id"), "doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getLong(3), r.getInt(4), r.getBoolean(5))).toMap
    ids.foreach { id =>
      val n = Multimodal.referenceSampleCount(id)
      val frames = (n + Multimodal.AudioFrameLen - 1) / Multimodal.AudioFrameLen
      (0 until frames).foreach { f =>
        val ks = f * Multimodal.AudioFrameLen until math.min(n, (f + 1) * Multimodal.AudioFrameLen)
        val ss = ks.map(Multimodal.referenceSample(id, _))
        val energy = ss.map(s => s.toLong * s).sum
        val expect = (ks.size, energy, ss.map(math.abs).max,
          energy < ks.size * Multimodal.SilenceMeanSquare)
        assert(got((id, f)) === expect, s"frame ($id, $f) drifted from the reference")
      }
      // tail frame carries its true short length when n is not a multiple
      if (n % Multimodal.AudioFrameLen != 0)
        assert(got((id, frames - 1))._1 === n % Multimodal.AudioFrameLen)
    }
    // quiet fixture docs (id ≡ 0 mod 8) are silent in EVERY frame; the
    // rest go quiet exactly on the (id + frame) ≡ 0 (mod 4) gap frames
    assert(got.filter(_._1._1 % 8 == 0).values.forall(_._4),
      "amplitude-32 docs must land under the silence gate in every frame")
    got.filter(_._1._1 % 8 != 0).foreach { case ((id, f), (_, _, _, silent)) =>
      assert(silent === ((id + f) % 4 == 0),
        s"doc $id frame $f: silence must follow the fixture's gap pattern")
    }
  }

  test("speechSegments: islands of consecutive voiced frames, driver-checked") {
    val ids = Seq(1L, 2L, 3L, 8L, 190L)
    val frames = Multimodal.audioFrames(Multimodal.packPcm(ids.toDF("doc_id"), "doc_id"))
    val got = Multimodal.speechSegments(frames)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getLong(3)))
      .toMap
    // driver reference: fold the analytic frames into runs
    val expect = scala.collection.mutable.Map[(Long, Int), (Int, Long)]()
    ids.foreach { id =>
      val n = Multimodal.referenceSampleCount(id)
      val nf = (n + Multimodal.AudioFrameLen - 1) / Multimodal.AudioFrameLen
      var runStart = -1; var runLen = 0; var runEnergy = 0L
      def flush(): Unit = if (runLen > 0) {
        expect((id, runStart)) = (runLen, runEnergy); runStart = -1; runLen = 0; runEnergy = 0L
      }
      (0 until nf).foreach { f =>
        val ks = f * Multimodal.AudioFrameLen until math.min(n, (f + 1) * Multimodal.AudioFrameLen)
        val ss = ks.map(Multimodal.referenceSample(id, _))
        val energy = ss.map(s => s.toLong * s).sum
        if (energy < ks.size * Multimodal.SilenceMeanSquare) flush()
        else {
          if (runLen == 0) runStart = f
          runLen += 1; runEnergy += energy
        }
      }
      flush()
    }
    assert(got === expect.toMap,
      "segment extraction must equal the driver islands fold")
    // quiet docs contribute no segments at all
    assert(!got.keys.exists(_._1 == 8L))
    // a long voiced doc has >= 2 segments (the mod-4 gap splits it)
    assert(got.keys.count(_._1 == 190L) >= 2)
  }

  test("audioFrames: null and odd-length payloads yield null rows, not a dead job") {
    val packed = Seq(
      (1L, Array[Byte](0, 1, 0, 1)),
      (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
    val rows = Multimodal.audioFrames(packed).collect()
      .map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(!rows(1L) && rows(2L) && rows(3L))
  }
}
