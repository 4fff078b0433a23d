package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/**
 * Round-13 operators. Louvain: the distributed synchronous local-move +
 * one-coarsening implementation must equal a sequential replay of the
 * SAME integer-score algorithm (pure function of the graph — engine-
 * and visit-order-independent), and must OPTIMIZE modularity: Q(louvain)
 * beats Q(LPA) on a fixture where label propagation degenerates.
 */
class Round13Spec extends SparkSpecBase {
  import spark.implicits._

  // --- sequential Louvain reference ------------------------------------------

  /** Plain-Scala replay of [[Analytics.louvainCommunities]]: same
    * synchronous rounds, same exact-integer score 2m·k − d_i·d_c^{−i},
    * same smallest-label ties, same single coarsening. */
  private def louvainRef(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct

    def md5Parity(n: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(n.toString.getBytes("UTF-8"))
      // first hex nibble = high nibble of byte 0
      ((d(0) >> 4) & 0xf) % 2
    }

    def phase(adj: Map[Long, Seq[(Long, Long)]], self: Map[Long, Long],
              r: Int): Map[Long, Long] = {
      val nodes = adj.keySet ++ self.keySet
      val deg = nodes.map(n => n ->
        (adj.getOrElse(n, Nil).map(_._2).sum + 2 * self.getOrElse(n, 0L))).toMap
      val w2 = deg.values.sum
      var lbl = nodes.map(n => n -> n).toMap
      for (i <- 1 to r) {
        val cur = lbl
        val dc = cur.toSeq.groupBy(_._2)
          .map { case (c, ns) => c -> ns.map(x => deg(x._1)).sum }
        lbl = nodes.map { n =>
          val k = adj.getOrElse(n, Nil).groupBy(e => cur(e._1))
            .map { case (c, es) => c -> es.map(_._2).sum }
          val cands = k + (cur(n) -> k.getOrElse(cur(n), 0L))
          val best = cands.toSeq.minBy { case (c, kk) =>
            val dcx = dc(c) - (if (c == cur(n)) deg(n) else 0L)
            (-(w2 * kk - deg(n) * dcx), c)
          }._1
          // parity-alternated adoption (the anti-oscillation rule)
          n -> (if (md5Parity(n) == i % 2) best else cur(n))
        }.toMap
      }
      lbl
    }

    val adj1 = und.flatMap { case (a, b) => Seq((a, (b, 1L)), (b, (a, 1L))) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    val c1 = phase(adj1, Map.empty, rounds)
    val tagged = und.map { case (a, b) => (c1(a), c1(b)) }
    val adj2 = tagged.filter { case (x, y) => x != y }
      .flatMap { case (x, y) => Seq((x, (y, 1L)), (y, (x, 1L))) }
      .groupBy(_._1)
      .map { case (n, xs) =>
        n -> xs.groupBy(_._2._1).toSeq
          .map { case (m, es) => (m, es.map(_._2._2).sum) }
      }
    val self2 = tagged.filter { case (x, y) => x == y }
      .groupBy(_._1).map { case (c, xs) => c -> xs.size.toLong }
    val c2 = phase(adj2, self2, rounds)
    und.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(n => n -> c2.getOrElse(c1(n), c1(n))).toMap
  }

  private def modQ(edges: Seq[(Long, Long)], memb: Map[Long, Long]): Double =
    Analytics.modularity(edges.toDF("a", "b"), "a", "b",
        memb.toSeq.toDF("node", "comm"), "node", "comm")
      .agg(sum("q_contrib")).head.getDouble(0)

  test("louvainCommunities: separated cliques resolve to themselves at Q = 0.5") {
    val clique = (base: Long) => for {
      i <- 0 to 3; j <- (i + 1) to 3
    } yield (base + i, base + j)
    val edges = clique(0L) ++ clique(100L)
    val got = Analytics.louvainCommunities(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val comms = got.groupBy(_._2).values.map(_.keys.toSet).toSet
    assert(comms === Set((0L to 3L).toSet, (100L to 103L).toSet), got)
    assert(math.abs(modQ(edges, got) - 0.5) < 1e-12)
  }

  test("louvainCommunities matches the sequential reference on a random graph") {
    val rnd = new scala.util.Random(1313)
    val edges = Seq.fill(400)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val got = Analytics.louvainCommunities(edges.toDF("a", "b"), "a", "b",
      moveRounds = 3).as[(Long, Long)].collect().toMap
    assert(got === louvainRef(edges, 3))
  }

  test("louvainCommunities OPTIMIZES Q: recovers a planted partition LPA collapses") {
    // planted partition: four 8-cliques joined by LADDERED bridges (one
    // per node position between adjacent blocks). The dense inter-block
    // ladder is LPA's pathology — the smallest label invades across the
    // bridges round after round until everything is one community
    // (Q = 0 exactly); Louvain's ΔQ greedy refuses the merges and
    // recovers the four planted blocks
    val clique = (b: Long) => for {
      i <- 0 to 7; j <- (i + 1) to 7
    } yield (b + i, b + j)
    val blocks = Seq(0L, 100L, 200L, 300L)
    val ladder = for (b <- 0 until 3; i <- 0 to 7)
      yield (blocks(b) + i, blocks(b + 1) + i)
    val edges = blocks.flatMap(clique) ++ ladder
    val louv = Analytics.louvainCommunities(edges.toDF("a", "b"), "a", "b",
      moveRounds = 8).as[(Long, Long)].collect().toMap
    val lpa = Analytics.lpaCommunities(edges.toDF("a", "b"), "a", "b",
      iters = 8).as[(Long, Long)].collect().toMap
    val planted = blocks.map(b => (b to b + 7).toSet).toSet
    assert(louv.groupBy(_._2).values.map(_.keys.toSet).toSet === planted,
      s"louvain must recover the planted blocks: $louv")
    val (qLouv, qLpa) = (modQ(edges, louv), modQ(edges, lpa))
    info(s"Q(louvain) = $qLouv, Q(lpa) = $qLpa")
    assert(qLouv > qLpa && qLouv > 0.5,
      s"louvain must out-optimize LPA here: $qLouv vs $qLpa")
    assert(lpa.values.toSet.size === 1 && math.abs(qLpa) < 1e-12,
      "fixture sanity: LPA must actually collapse (else pick a denser ladder)")
  }
}
