package graft

import graft.operators.{Analytics, Similarity}
import org.apache.spark.sql.functions._

/**
 * Round-15 operators: the batched single-link ladder (one CC pass for
 * every rung), HDBSCAN excess-of-mass cluster extraction, the fitted
 * k-means|| → Lloyd composition, and the perplexity-bucket rank
 * rewrite. The oracles carry the cross-engine certification — these
 * specs pin the THEOREMS the oracles can't state: batched ≡ per-rung,
 * eom stability selection vs a driver-side reference, fitted-init
 * inertia dominance, rank ≡ window-ntile.
 */
@SlowTest
class Round15Spec extends SparkSpecBase {
  import spark.implicits._

  // the Round14Spec seeded weighted graph (deterministic, no RNG)
  private def weightedEdges: Seq[(Long, Long, Double)] = {
    val wedges = (0 until 60).flatMap { i =>
      Seq((i.toLong, (17L * i + 5) % 60, (i * 13 + 3) % 23),
        (i.toLong, (29L * i + 11) % 60, (i * 7 + 1) % 23))
    }.collect { case (u, v, w) if u != v =>
      (math.min(u, v), math.max(u, v), w.toDouble)
    }.distinct
    wedges.groupBy(e => (e._1, e._2))
      .map { case ((u, v), es) => (u, v, es.map(_._3).min) }.toSeq
  }

  test("singleLinkCutLadder: every rung identical to the per-rung singleLinkCut (labels, heights, singletons)") {
    val edf = weightedEdges.toDF("u", "v", "w")
    val msf = Analytics.minimumSpanningForest(edf, "u", "v", "w").cache()
    val thresholds = Seq(-1.0, 3.0, 7.0, 11.0, 22.0, 1e9)
    val ladder = Analytics.singleLinkCutLadder(msf, "u", "v", "w", thresholds)
      .as[(Double, Long, Long, Option[Double])].collect()
      .groupBy(_._1)
    thresholds.foreach { t =>
      val want = Analytics.singleLinkCut(msf, "u", "v", "w", t)
        .as[(Long, Long, Option[Double])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val got = ladder(t).map(r => r._2 -> (r._3, r._4)).toMap
      assert(got === want, s"ladder rung t=$t differs from the direct cut")
    }
  }

  // --- HDBSCAN excess-of-mass extraction -------------------------------------

  /** Independent driver-side HDBSCAN-eom reference: thresholded-CC rung
   * ladder over ALL distinct pairwise mutual-reachability weights (no
   * merge tree, no union-find sequencing — a structurally different
   * route to the same condensed tree). Returns id → selected-cluster
   * min-member-id (None = noise). */
  private def refHdbscan(pts: Seq[(Long, Array[Double])], k: Int,
                         m: Int): Map[Long, Option[Long]] = {
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val core = pts.map { case (id, v) =>
      id -> pts.filter(_._1 != id).map(p => d2(v, p._2)).sorted.apply(k - 1)
    }.toMap
    val mre = for { (a, va) <- pts; (b, vb) <- pts if a < b }
      yield (a, b, math.max(d2(va, vb), math.max(core(a), core(b))))
    val ws = mre.map(_._3).distinct.sorted
    def compsAt(t: Double): Map[Long, Long] = {
      // reuse the union-find-free closure: iterate min-label propagation
      val nodes = pts.map(_._1).toSet
      val adj = mre.filter(_._3 <= t)
        .flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
      var lbl = nodes.map(n => n -> n).toMap
      var changed = true
      while (changed) {
        changed = false
        val next = lbl.map { case (n, l) =>
          val cand = (adj.getOrElse(n, Seq.empty).map(lbl) :+ l).min
          if (cand != l) changed = true
          n -> cand
        }
        lbl = next
      }
      lbl
    }
    // condensed clusters via the rung ladder (splits happen AT the
    // upper rung's weight)
    case class RC(parent: Int, birth: Double)
    val cs = scala.collection.mutable.ArrayBuffer[RC]()
    val stab = scala.collection.mutable.ArrayBuffer[Double]()
    val kids = scala.collection.mutable.ArrayBuffer[List[Int]]()
    def nc(parent: Int, birth: Double): Int = {
      cs += RC(parent, birth); stab += 0.0; kids += Nil
      if (parent >= 0) kids(parent) = cs.size - 1 :: kids(parent)
      cs.size - 1
    }
    val exit = scala.collection.mutable.Map[Long, Int]()
    val root = nc(-1, 0.0)
    // active cluster -> current members
    var active = Map(root -> pts.map(_._1).toSet)
    for (j <- (ws.size - 2) to -1 by -1) {
      val splitLam = 1.0 / math.max(ws(j + 1), 1e-12)
      val comp = if (j < 0) pts.map(p => p._1 -> p._1).toMap else compsAt(ws(j))
      val nextActive = scala.collection.mutable.Map[Int, Set[Long]]()
      active.foreach { case (c, members) =>
        val parts = members.groupBy(comp).values.toSeq
        val (big, small) = parts.partition(_.size >= m)
        small.foreach { p =>
          stab(c) += p.size * (splitLam - cs(c).birth)
          p.foreach(id => exit(id) = c)
        }
        if (big.size >= 2) {
          stab(c) += big.map(_.size).sum * (splitLam - cs(c).birth)
          big.foreach(p => nextActive(nc(c, splitLam)) = p)
        } else big.headOption.foreach(p => nextActive(c) = p)
      }
      active = nextActive.toMap
    }
    // eom selection, root excluded, children created after parents
    val sel = Array.fill(cs.size)(false)
    val hat = Array.fill(cs.size)(0.0)
    def desel(c: Int): Unit = { sel(c) = false; kids(c).foreach(desel) }
    for (c <- (cs.size - 1) to 0 by -1) {
      val sumCh = kids(c).map(hat).sum
      if (kids(c).isEmpty) { sel(c) = c != root; hat(c) = stab(c) }
      else if (c != root && stab(c) > sumCh) {
        kids(c).foreach(desel); sel(c) = true; hat(c) = stab(c)
      } else hat(c) = sumCh
    }
    val raw = pts.map { case (id, _) =>
      var c = exit.getOrElse(id, -1)
      while (c >= 0 && !sel(c)) c = cs(c).parent
      id -> c
    }.toMap
    val minId = raw.toSeq.collect { case (id, c) if c >= 0 => (c, id) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).min }
    raw.map { case (id, c) => id -> (if (c >= 0) Some(minId(c)) else None) }
  }

  /** Variable-density fixture: one ultra-tight cluster, one diffuse
   * cloud of two lobes, far-flung noise (fewer than minClusterSize
   * outliers — five would legitimately BE a cluster) — all gaps
   * distinct (no weight ties), every coordinate deterministic. */
  private def hdbscanFixture: Seq[(Long, Array[Double])] =
    (0 until 12).map(i =>
      (i.toLong, Array(i * 0.01 + i * i * 0.001, 0.0))) ++
    (0 until 10).map(i =>
      (200L + i, Array(50.0 + i * (1.0 + 0.01 * i), 30.0))) ++
    (0 until 10).map(i =>
      (300L + i, Array(50.0 + i * (1.0 + 0.01 * i), 42.0))) ++
    (0 until 4).map(i =>
      (900L + i, Array(500.0 + 31.0 * i, -200.0 - 17.0 * i)))

  test("hdbscanClusters matches the independent rung-ladder reference; tight cluster survives while the diffuse cloud splits") {
    val pts = hdbscanFixture
    val df = pts.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val (k, m) = (3, 5)
    val got = Similarity.hdbscanClusters(df, "vec_id", "embedding",
        k = k, minClusterSize = m, sampleN = 1000)
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = refHdbscan(pts, k, m)
    pts.foreach { case (id, _) =>
      assert(got(id)._1 === want(id), s"label mismatch at $id")
    }
    // planted structure: the tight cluster is ONE selected cluster, the
    // diffuse cloud resolves into its two lobes, the outliers are noise
    // — exactly what no single DBSCAN* eps can produce on this data
    assert((0 until 12).map(i => got(i.toLong)._1).toSet === Set(Some(0L)))
    assert((0 until 10).map(i => got(200L + i)._1).toSet === Set(Some(200L)))
    assert((0 until 10).map(i => got(300L + i)._1).toSet === Set(Some(300L)))
    (0 until 4).foreach(i => assert(got(900L + i)._1.isEmpty,
      s"outlier ${900 + i} must be noise"))
    // every selected cluster respects minClusterSize; stability positive
    val sizes = got.values.flatMap(_._1).groupBy(identity).map(_._2.size)
    assert(sizes.forall(_ >= m))
    assert(got.values.collect { case (Some(_), s) => s.get }.forall(_ > 0))
    // deterministic end to end
    val again = Similarity.hdbscanClusters(df, "vec_id", "embedding",
        k = k, minClusterSize = m, sampleN = 1000)
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(again === got)
  }

  test("hdbscanClusters: single-blob corpus is all noise (roots never selected), noise-only corpus too") {
    // one blob + caterpillar noise: the condensed tree never true-splits,
    // so the only cluster is the root — allow_single_cluster=False
    val pts = (0 until 10).map(i =>
      (i.toLong, Seq(i * 0.01 + i * i * 0.001, 0.0))) ++
      (0 until 4).map(i => (900L + i, Seq(300.0 + 41.0 * i, -100.0 - 23.0 * i)))
    val df = pts.toDF("vec_id", "embedding")
    val got = Similarity.hdbscanClusters(df, "vec_id", "embedding",
        k = 3, minClusterSize = 5, sampleN = 1000)
      .as[(Long, Option[Long], Option[Double])].collect()
    assert(got.length === 14)
    assert(got.forall(_._2.isEmpty), s"single-blob run must be all noise")
  }

  // --- k-means|| → Lloyd composition ------------------------------------------

  test("kmeansCentroidsFitted: covers every planted blob and ends at inertia <= the md5-pick init's at equal rounds") {
    // Round14's planted blobs: an md5-pick of 3 misses a blob ~4 in 9 —
    // the fitted init must not
    val pts: Seq[(Long, Seq[Double])] =
      (0 until 40).map(i => (i.toLong, Seq(i * 0.01, 0.0))) ++
      (0 until 40).map(i => (200L + i, Seq(50.0 + i * 0.01, 30.0))) ++
      (0 until 40).map(i => (400L + i, Seq(-40.0 + i * 0.01, -60.0)))
    val df = pts.toDF("vec_id", "embedding")
    def inertia(cent: Array[(Int, Int, Double)]): Double = {
      val byCell = cent.groupBy(_._1).map { case (c, xs) =>
        c -> xs.sortBy(_._2).map(_._3) }
      pts.map { case (_, v) =>
        byCell.values.map(c =>
          v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum).min
      }.sum
    }
    val iters = 3
    val fitted = Similarity.kmeansCentroidsFitted(df, "vec_id", "embedding",
      k = 3, iters = iters).as[(Int, Int, Double)].collect()
    val hashed = Similarity.kmeansCentroids(df, "vec_id", "embedding",
      k = 3, iters = iters).as[(Int, Int, Double)].collect()
    val (fi, hi) = (inertia(fitted), inertia(hashed))
    assert(fi <= hi + 1e-9, s"fitted inertia $fi exceeds md5-init $hi")
    // one fitted centroid lands in EACH planted blob
    val centers = fitted.groupBy(_._1).map { case (_, xs) =>
      xs.sortBy(_._2).map(_._3).toSeq }
    val blobs = Seq(Seq(0.2, 0.0), Seq(50.2, 30.0), Seq(-39.8, -60.0))
    blobs.foreach { b =>
      assert(centers.exists(c =>
        c.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum < 4.0),
        s"no fitted centroid near blob $b: $centers")
    }
    // deterministic
    val again = Similarity.kmeansCentroidsFitted(df, "vec_id", "embedding",
      k = 3, iters = iters).as[(Int, Int, Double)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq ===
      fitted.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("singleLinkCutLadder: in-plan refusal on node ids outside [0, nodeSpan)") {
    val edf = Seq((1L, 5L, 1.0), (5L, 9L, 2.0)).toDF("u", "v", "w")
    val ex = intercept[Exception] {
      Analytics.singleLinkCutLadder(edf, "u", "v", "w", Seq(2.0),
        nodeSpan = 8L).collect()
    }
    assert(ex.getMessage != null)
  }
}
