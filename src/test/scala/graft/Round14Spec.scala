package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/**
 * Round-14 operators: the FULL Leiden loop, the single-linkage cut of
 * the minimum spanning forest, and the DQ-composed staging pipeline.
 * (The weighted streaming near-dup twin lives in NearDupStreamSpec's
 * sibling test; the q_leiden / q_single_link oracles carry the
 * bit-for-bit cross-engine certification — these specs pin the
 * THEOREMS the oracles can't state: connectivity guarantees,
 * dendrogram equivalence at every threshold, idempotence.)
 */
@SlowTest
class Round14Spec extends SparkSpecBase {
  import spark.implicits._

  // the deterministic 2-out graph on 97 nodes (the q_louvain fixture's
  // shape, rebuilt data-independently): i → (31i+7)%97 and (57i+13)%97
  private def fixtureEdges = (0 until 97).flatMap(i =>
    Seq((i.toLong, (31L * i + 7) % 97), (i.toLong, (57L * i + 13) % 97)))
    .toDF("a", "b")

  private def components(edges: Seq[(Long, Long)], nodes: Set[Long])
      : Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    nodes.foreach(n => parent.getOrElseUpdate(n, n))
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  // --- Leiden full loop -----------------------------------------------------

  test("leidenCommunities: every community connected where Louvain leaves ten broken; deterministic; idempotent under refine") {
    val edges = fixtureEdges
    val edgeList = edges.select(least(col("a"), col("b")), greatest(col("a"), col("b")))
      .filter(col("a") =!= col("b")).distinct()
      .as[(Long, Long)].collect().toSeq
    val adj = edgeList.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }

    def disconnectedComms(memb: Map[Long, Long]): Seq[Long] =
      memb.groupBy(_._2).collect { case (c, ns) if ns.size > 1 =>
        val members = ns.keySet
        val seen = scala.collection.mutable.Set(members.head)
        val stack = scala.collection.mutable.Stack(members.head)
        while (stack.nonEmpty) {
          val x = stack.pop()
          adj.getOrElse(x, Set.empty).foreach { y =>
            if (members(y) && !seen(y)) { seen += y; stack.push(y) } }
        }
        (c, seen.size != members.size)
      }.collect { case (c, true) => c }.toSeq

    val louvain = Analytics.louvainCommunities(edges, "a", "b", moveRounds = 4)
      .as[(Long, Long)].collect().toMap
    val leiden = Analytics.leidenCommunities(edges, "a", "b",
      moveRounds = 4, maxLevels = 2)
      .as[(Long, Long)].collect().toMap

    // the defect Leiden exists to repair, planted by the fixture itself:
    // one-shot Louvain's partition of this graph contains internally
    // DISCONNECTED communities; the full loop's output contains none
    assert(disconnectedComms(louvain).nonEmpty,
      "fixture no longer breaks Louvain — the repair is untested")
    assert(disconnectedComms(leiden).isEmpty,
      s"Leiden emitted disconnected communities: ${disconnectedComms(leiden)}")

    // idempotence: refining an all-connected partition changes nothing
    val memb = leiden.toSeq.toDF("node", "comm")
    val refined = Analytics.refineCommunities(edges, "a", "b",
      memb, "node", "comm").as[(Long, Long)].collect().toMap
    // refine relabels to component-min ids; compare PARTITIONS
    assert(refined.groupBy(_._2).values.map(_.keySet).toSet ===
      leiden.groupBy(_._2).values.map(_.keySet).toSet,
      "refine changed an all-connected Leiden partition")

    // determinism: a second run is identical
    val again = Analytics.leidenCommunities(edges, "a", "b",
      moveRounds = 4, maxLevels = 2).as[(Long, Long)].collect().toMap
    assert(again === leiden)
  }

  test("leidenCommunities recovers planted cliques joined by bridges") {
    // three 6-cliques, one bridge edge between consecutive cliques
    val cliques = (0 until 3).flatMap { c =>
      val ids = (0 until 6).map(i => (c * 10 + i).toLong)
      for (i <- ids; j <- ids if i < j) yield (i, j)
    }
    val bridges = Seq((5L, 10L), (15L, 20L))
    val edges = (cliques ++ bridges).toDF("a", "b")
    val got = Analytics.leidenCommunities(edges, "a", "b",
      moveRounds = 4, maxLevels = 2)
      .as[(Long, Long)].collect().toMap
    (0 until 3).foreach { c =>
      val labels = (0 until 6).map(i => got((c * 10 + i).toLong)).toSet
      assert(labels.size === 1, s"clique $c split: $labels")
    }
    assert(got.values.toSet.size === 3,
      s"expected exactly the three cliques, got ${got.values.toSet}")
  }

  // --- single-linkage cut ----------------------------------------------------

  test("singleLinkCut equals thresholded-graph components at EVERY threshold; heights match the Kruskal dendrogram") {
    // seeded pseudo-random weighted graph (deterministic, no RNG object)
    val wedges = (0 until 60).flatMap { i =>
      Seq((i.toLong, (17L * i + 5) % 60, (i * 13 + 3) % 23),
        (i.toLong, (29L * i + 11) % 60, (i * 7 + 1) % 23))
    }.collect { case (u, v, w) if u != v =>
      (math.min(u, v), math.max(u, v), w.toDouble)
    }.distinct
    // parallel (u,v) pairs collapse to min w — mirror the operator's rule
    val collapsed = wedges.groupBy(e => (e._1, e._2))
      .map { case ((u, v), es) => (u, v, es.map(_._3).min) }.toSeq
    val edf = collapsed.toDF("u", "v", "w")
    val msf = Analytics.minimumSpanningForest(edf, "u", "v", "w").cache()
    val nodes = collapsed.flatMap(e => Seq(e._1, e._2)).toSet

    // driver-side Kruskal with the same (w, u, v) tie perturbation →
    // the identical unique forest; its t-cut heights are the reference
    val kruskal = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      val picked = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
      collapsed.sortBy(e => (e._3, e._1, e._2)).foreach { case (u, v, w) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) {
          parent(math.max(ru, rv)) = math.min(ru, rv)
          picked += ((u, v, w))
        }
      }
      picked.toSeq
    }
    assert(msf.as[(Long, Long, Double)].collect().toSet === kruskal.toSet,
      "Borůvka forest differs from the Kruskal reference")

    val thresholds = collapsed.map(_._3).distinct.sorted ++ Seq(-1.0, 1e9)
    thresholds.foreach { t =>
      val got = Analytics.singleLinkCut(msf, "u", "v", "w", t)
        .as[(Long, Long, Option[Double])].collect()
      // clusters ≡ components of the ORIGINAL graph thresholded at t
      // (the MST/single-linkage equivalence, at every cut height)
      val want = components(
        collapsed.filter(_._3 <= t).map(e => (e._1, e._2)), nodes)
      val gotMap = got.map(r => r._1 -> r._2).toMap
      assert(gotMap === want, s"clusters differ at t=$t")
      // merge height per cluster = the largest kept forest edge in it
      val keptForest = kruskal.filter(_._3 <= t)
      val heightWant = keptForest.groupBy(e => want(e._1))
        .map { case (c, es) => c -> es.map(_._3).max }
      got.foreach { case (_, c, h) =>
        assert(h === heightWant.get(c),
          s"merge_dist mismatch at t=$t cluster $c: got $h want ${heightWant.get(c)}")
      }
    }
  }

  // --- DBSCAN* ---------------------------------------------------------------

  test("dbscanStar matches the driver-side DBSCAN* definition on a planted variable-density fixture") {
    import graft.operators.Similarity
    // two tight planted clusters + far-flung noise, all deterministic
    val pts: Seq[(Long, Array[Double])] =
      (0 until 12).map(i => (i.toLong, Array(i * 0.01, 0.0))) ++
      (0 until 12).map(i => (100L + i, Array(10.0 + i * 0.01, 5.0))) ++
      (0 until 6).map(i => (900L + i, Array(100.0 + 7 * i, -50.0 - 13 * i)))
    val df = pts.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val k = 4
    val eps2 = 1.0
    val got = Similarity.dbscanStar(df, "vec_id", "embedding",
        k = k, eps2 = eps2, sampleN = 1000)
      .as[(Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    // driver-side DBSCAN*: core = k-th-NN d2 <= eps2; clusters =
    // components of {core pairs with d2 <= eps2}; non-core = noise
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byId = pts.toMap
    val coreIds = pts.collect { case (id, v)
      if pts.filter(_._1 != id).map(p => d2(v, p._2)).sorted.apply(k - 1) <= eps2
      => id }.toSet
    val corePairs = for {
      (a, va) <- pts; (b, vb) <- pts
      if a < b && coreIds(a) && coreIds(b) && d2(va, vb) <= eps2
    } yield (a, b)
    val want = components(corePairs, coreIds)

    pts.foreach { case (id, _) =>
      val (cl, isCore) = got(id)
      assert(isCore === coreIds(id), s"core flag wrong for $id")
      if (coreIds(id)) assert(cl === Some(want(id)), s"cluster wrong for $id")
      else assert(cl.isEmpty, s"noise $id must have NULL cluster")
    }
    // the planted structure: exactly the two clusters, noise = the 6 outliers
    val clusters = got.collect { case (_, (Some(c), _)) => c }.toSet
    assert(clusters === Set(0L, 100L), s"got clusters $clusters")
    assert(got.count(_._2._1.isEmpty) === 6)

    // the HIERARCHY route agrees with the flat cut (the papers'
    // equivalence): cutting the mutual-reachability MST at eps² gives
    // the same clusters on core points (noise = mreach singletons)
    val mre = Similarity.mutualReachabilityEdges(df, "vec_id", "embedding",
      k = k, sampleN = 1000)
    val msf = Analytics.minimumSpanningForest(mre, "u", "v", "w")
    val ladder = Analytics.singleLinkCut(msf, "u", "v", "w", eps2)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r._2).toMap
    coreIds.foreach { id =>
      assert(ladder(id) === got(id)._1.get,
        s"MST-cut route disagrees with the flat cut at $id")
    }
    pts.collect { case (id, _) if !coreIds(id) => id }.foreach { id =>
      assert(ladder(id) === id, s"noise $id must be an mreach singleton")
    }
  }

  // --- k-means|| init ----------------------------------------------------------

  test("kmeansParallelInit covers planted clusters, weights partition the corpus, deterministic") {
    import graft.operators.Similarity
    // three tight planted clusters, 40 points each, far apart — a
    // correct init MUST land one center in each (an md5-pick of 3
    // random points misses a cluster ~4 times in 9)
    val pts: Seq[(Long, Seq[Double])] =
      (0 until 40).map(i => (i.toLong, Seq(i * 0.01, 0.0))) ++
      (0 until 40).map(i => (200L + i, Seq(50.0 + i * 0.01, 30.0))) ++
      (0 until 40).map(i => (400L + i, Seq(-40.0 + i * 0.01, -60.0)))
    val df = pts.toDF("vec_id", "embedding")
    val got = Similarity.kmeansParallelInit(df, "vec_id", "embedding",
        k = 3, oversample = 4, rounds = 3)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got.length === 3, got.mkString(","))
    // one pick per planted cluster
    def clusterOf(id: Long): Long = id / 200
    assert(got.map(r => clusterOf(r._2)).toSet === Set(0L, 1L, 2L),
      s"picks ${got.mkString(",")} miss a planted cluster")
    // rank-1 is the heaviest candidate; every weight is positive
    assert(got.head._3 === got.map(_._3).max)
    assert(got.forall(_._3 > 0))
    // deterministic end to end
    val again = Similarity.kmeansParallelInit(df, "vec_id", "embedding",
        k = 3, oversample = 4, rounds = 3)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq === got.toSeq)
    // degenerate: k larger than the distinct-point spread still returns
    // every coverage-adding pick exactly once (the value<=0 stop)
    val tiny = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)),
      (3L, Seq(9.0, 9.0))).toDF("vec_id", "embedding")
    val picks = Similarity.kmeansParallelInit(tiny, "vec_id", "embedding",
        k = 3, oversample = 2, rounds = 2)
      .as[(Int, Long, Long)].collect()
    assert(picks.length <= 2, s"duplicate-point picks: ${picks.mkString(",")}")
  }

  // --- DQ-composed staging pipeline -------------------------------------------

  test("RawToStaging.runWithDq: poisoned rows route to both quarantines and the DQ reports see them") {
    import graft.pipelines.RawToStaging
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    val raw = Seq(
      ("2024-01-01 10:00:00", "7", "10.0", "20.0", "30.0"),
      ("2024-01-01 11:00:00", "7", "11.0", "21.0", "35.0"),
      ("2024-01-01 12:00:00", "8", "95.0", "20.0", "30.0"),  // bad lat → validity quarantine
      ("2024-01-01 13:00:00", "9", "12.0", "22.0", "-5.0"),  // negative speed → DQ quarantine
      ("2024-01-01 14:00:00", "10", "13.0", "23.0", "40.0"))
      .toDF("base_datetime", "mmsi", "LAT", "LON", "sog")
    val cfg = RawToStaging.Config(
      columnMapping = Map("base_datetime" -> "ts", "mmsi" -> "user_id",
        "LAT" -> "lat", "LON" -> "lon", "sog" -> "speed"),
      schema = Seq("user_id" -> LongType, "ts" -> StringType,
        "lat" -> DoubleType, "lon" -> DoubleType, "speed" -> DoubleType),
      tsCol = "ts",
      validCondition = df => graft.operators.Cleanse.validCoords(col("lat"), col("lon")),
      clampCaps = Map("speed" -> 100.0),
      dedupCols = Seq("user_id", "ts", "lat", "lon"),
      speedCol = "speed", speedThreshold = 50.0)
    val dq = RawToStaging.DqConfig(
      expectations = Seq(
        "speed_non_negative" -> (col("speed") >= 0.0),
        "user_present" -> col("user_id").isNotNull),
      benfordOn = Some("speed"),
      kAnonymityOn = Some((Seq("user_id"), 2)))
    val (clean, validityQ, dqQ, reports) = RawToStaging.runWithDq(raw, cfg, dq)

    assert(validityQ.count() === 1) // the bad-lat row, exactly as run()
    val dqRows = dqQ.select(col("user_id"), col("_violations")).collect()
    assert(dqRows.length === 1 && dqRows.head.getLong(0) === 9L)
    assert(dqRows.head.getSeq[String](1) === Seq("speed_non_negative"))
    assert(clean.count() === 3 &&
      clean.filter(col("user_id") === 9L).isEmpty)
    // clean keeps the staged schema — no _violations residue
    assert(!clean.columns.contains("_violations"))

    val expRows = reports("expectations").as[(String, Long, Long)].collect()
    assert(expRows.map(_._3).distinct.toSeq === Seq(4L), "n_rows = staged count")
    assert(expRows.collect { case ("speed_non_negative", v, _) => v }.head === 1L)
    assert(expRows.collect { case ("user_present", v, _) => v }.head === 0L)
    // benford emits one chi2/mad summary row per group (one group here);
    // n counts only the POSITIVE speeds (30, 35, 40 — the -5 is excluded)
    val bf = reports("benford").collect()
    assert(bf.length === 1 && bf.head.getAs[Long]("n") === 3L,
      bf.mkString)
    val ka = reports("k_anonymity").collect().head
    assert(ka.getAs[Long]("n_rows") === 4L)
    // users 8..10 are singleton classes below k=2; user 7 has two rows
    assert(ka.getAs[Long]("risky_classes") === 2L,
      reports("k_anonymity").collect().mkString)
  }
}
