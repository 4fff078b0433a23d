package graft

import graft.operators.Similarity
import graft.sources.{LakeWriter, StateStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Round-10 second wave: the ANN index as a MATERIALIZED VIEW of the
 * state store (CDF → pqIndexApplyChanges ≡ frozen-codebook re-encode
 * of the current state), and optimistic-concurrency snapshot publish
 * (racing writers serialize onto a linear version history; claims are
 * reaped by vacuum; contention past maxAttempts fails loudly).
 */
class Round10bSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-r10b-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Deterministic 8-dim vector per (id, salt) — salt lets an "update"
   * genuinely move the vector. */
  private def vec(id: Long, salt: Long): Seq[Double] =
    Seq.tabulate(8)(j => ((id * 31 + j * 17 + salt * 7) % 10).toDouble)

  private def frame(rows: Seq[(Long, Long)]): DataFrame =
    rows.map { case (id, salt) => (id, vec(id, salt)) }.toDF("id", "vec")

  test("CDF-maintained PQ index equals a frozen-codebook re-encode of current state") {
    val root = tmpDir("cdfidx")
    // v1: ids 1..40; v2: ids 1..5 updated (salt 1) + 41..48 inserted;
    // v3: ids 6,7 deleted
    StateStore.merge(spark, root, "0001",
      frame((1L to 40L).map(i => (i, 0L))), keys = Seq("id"),
      sumCols = Nil, replaceCols = Seq("vec"))
    StateStore.merge(spark, root, "0002",
      frame((1L to 5L).map(i => (i, 1L)) ++ (41L to 48L).map(i => (i, 0L))),
      keys = Seq("id"), sumCols = Nil, replaceCols = Seq("vec"))
    StateStore.deleteKeys(spark, root, "0003",
      Seq(6L, 7L).toDF("id"), keyCols = Seq("id"))

    val stateV1 = StateStore.read(spark, root, before = Some("0002")).get
    val current = StateStore.read(spark, root).get
    val index0 = Similarity.pqIndexBuild(stateV1, "id", "vec",
      dim = 8, m = 4, ks = 4, iters = 1)

    val feed = StateStore.changesBetween(spark, root, keys = Seq("id"),
      fromBefore = Some("0002"), toBefore = None)
    val types = feed.groupBy("change_type").count().as[(String, Long)]
      .collect().toMap
    assert(types.getOrElse("insert", 0L) == 8, s"feed inserts: $types")
    assert(types.getOrElse("delete", 0L) == 2, s"feed deletes: $types")
    assert(types.getOrElse("update_postimage", 0L) == 5, s"feed updates: $types")

    val maintained = Similarity.pqIndexApplyChanges(index0, feed, "id", "vec")
    // truth: encode the CURRENT state from scratch with the SAME frozen
    // codebooks — pqIndexAppend onto an emptied-codes twin is exactly
    // that path, and its own ≡-re-encode gate is Round9Spec's
    val truth = Similarity.pqIndexAppend(
      index0.copy(codes = index0.codes.limit(0)), current, "id", "vec")

    def codeSet(ix: Similarity.PqIndex): Set[(Long, Int, Int, Double)] =
      ix.codes.select(col("cand_id").cast("long"), col("sub").cast("int"),
          col("code").cast("int"), col("nrm_c").cast("double"))
        .as[(Long, Int, Int, Double)].collect().toSet
    val got = codeSet(maintained)
    val want = codeSet(truth)
    assert(got === want,
      s"maintained-only: ${(got -- want).take(4)}; truth-only: ${(want -- got).take(4)}")
    assert(!got.exists(r => r._1 == 6L || r._1 == 7L), "deleted ids survive")
    assert((41L to 48L).forall(i => got.exists(_._1 == i)), "inserts missing")
    // an updated id whose vector moved must not keep its v1 norm
    val nrm1V1 = codeSet(index0).find(_._1 == 1L).get._4
    val nrm1Now = got.find(_._1 == 1L).get._4
    assert(math.abs(nrm1V1 - nrm1Now) > 1e-9,
      "update fixture vacuous: id 1's vector did not move")
    maintained.release(); truth.release(); index0.release()
  }

  test("pqIndexDelete removes exactly the target ids' code rows") {
    val base = frame((1L to 20L).map(i => (i, 0L)))
    val ix = Similarity.pqIndexBuild(base, "id", "vec", dim = 8, m = 4,
      ks = 4, iters = 1)
    val after = Similarity.pqIndexDelete(ix, Seq(3L, 9L).toDF("id"), "id")
    val kept = after.codes.select(col("cand_id").cast("long")).distinct()
      .as[Long].collect().toSet
    assert(kept === ((1L to 20L).toSet -- Set(3L, 9L)))
    assert(after.codes.count() == ix.codes.count() - 2 * ix.m,
      "delete touched non-target rows")
    after.release(); ix.release()
  }

  /** Independent driver-side MMR greedy for the replay gate. */
  private def refMmr(pool: Seq[(Long, Double, Seq[Double])], k: Int,
                     lambda: Double): Seq[(Long, Int)] = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0
      else a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
    }
    val remaining = scala.collection.mutable.ArrayBuffer(pool.sortBy(_._1): _*)
    val sel = scala.collection.mutable.ArrayBuffer[(Long, Double, Seq[Double])]()
    val out = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      val scored = remaining.map { c =>
        val pen = if (sel.isEmpty) 0.0 else sel.map(s => cos(c._3, s._3)).max
        (c, lambda * c._2 - (1 - lambda) * pen)
      }
      val best = scored.maxBy { case (c, s) => (s, -c._1) }._1
      remaining -= best
      sel += best
      out += ((best._1, rank))
      rank += 1
    }
    out.toSeq
  }

  test("mmrRerank: lambda=1 is plain relevance top-k; replay; redundancy demoted") {
    // pool for one query: two near-duplicate high-rel candidates (10,
    // 11) + a diverse mid-rel one (12) + filler
    val pool = Seq(
      (10L, 0.95, Seq(1.0, 0.0, 0.0, 0.0)),
      (11L, 0.94, Seq(0.99, 0.05, 0.0, 0.0)),   // near-dup of 10
      (12L, 0.80, Seq(0.0, 1.0, 0.0, 0.0)),     // orthogonal
      (13L, 0.60, Seq(0.0, 0.0, 1.0, 0.0)),
      (14L, 0.40, Seq(0.5, 0.5, 0.5, 0.0)))
    val df = pool.map { case (c, r, v) => (1L, c, r, v) }
      .toDF("query_id", "cand_id", "rel", "vec")

    val pure = Similarity.mmrRerank(df, "query_id", "cand_id", "rel",
        "vec", k = 5, lambda = 1.0)
      .orderBy("rank").select("cand_id").as[Long].collect().toSeq
    assert(pure === Seq(10L, 11L, 12L, 13L, 14L),
      s"lambda=1 must be relevance order: $pure")

    val div = Similarity.mmrRerank(df, "query_id", "cand_id", "rel",
        "vec", k = 3, lambda = 0.5)
      .orderBy("rank").select("cand_id").as[Long].collect().toSeq
    assert(div.head == 10L, s"first pick must be max-rel: $div")
    assert(div(1) == 12L,
      s"near-dup 11 must be demoted below diverse 12 at lambda=0.5: $div")

    // randomized replay across many queries ≡ the independent reference
    val rnd = new scala.util.Random(42)
    val multi = (1L to 20L).flatMap { q =>
      (0 until 12).map { i =>
        (q, q * 100 + i, rnd.nextDouble(),
          Seq.fill(6)(rnd.nextDouble() * 2 - 1))
      }
    }
    val multiDf = multi.toDF("query_id", "cand_id", "rel", "vec")
      .repartition(7) // partitioning must not matter
    val got = Similarity.mmrRerank(multiDf, "query_id", "cand_id", "rel",
        "vec", k = 5, lambda = 0.3)
      .select(col("query_id"), col("cand_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    val want = multi.groupBy(_._1).flatMap { case (q, rows) =>
      refMmr(rows.map(r => (r._2, r._3, r._4)), k = 5, lambda = 0.3)
        .map { case (c, rk) => (q, c, rk) }
    }.toSet
    assert(got === want,
      s"got-only: ${(got -- want).take(4)}; want-only: ${(want -- got).take(4)}")

    // pool-size contract
    val big = (0 until 30).map(i => (1L, i.toLong, 0.5, Seq(1.0, 0.0)))
      .toDF("query_id", "cand_id", "rel", "vec")
    val e = intercept[org.apache.spark.SparkException] {
      Similarity.mmrRerank(big, "query_id", "cand_id", "rel", "vec",
        k = 3, maxCandidates = 10).collect()
    }
    assert(e.getMessage.contains("maxCandidates") ||
      Option(e.getCause).exists(_.getMessage.contains("maxCandidates")))
  }

  test("OCC publish: racing writers serialize onto a linear history") {
    val root = tmpDir("occ")
    def t(n: Int): Map[String, DataFrame] =
      Map("t" -> Seq((n, s"writer$n")).toDF("k", "who"))

    val v1 = LakeWriter.publishSnapshotOcc(t(1), root)
    assert(v1 == "000000000001", s"first OCC version: $v1")

    // race: between the outer writer's resolution and its claim, a
    // competitor publishes at the SAME resolved version (including the
    // committed-marker ABA case: the competitor's claim is already gone)
    var hookCalls = 0
    val vOuter = LakeWriter.publishSnapshotOcc(t(2), root,
      beforeCommit = { _ =>
        hookCalls += 1
        if (hookCalls == 1) {
          val vRace = LakeWriter.publishSnapshotOcc(t(3), root)
          assert(vRace == "000000000002", s"competitor version: $vRace")
        }
      })
    assert(vOuter == "000000000003",
      s"loser must retry past the winner, got $vOuter")
    assert(hookCalls == 2, s"expected exactly one retry, hook ran $hookCalls")
    val versions = LakeWriter.committedSnapshotVersions(spark, root)
    assert(versions == Seq("000000000001", "000000000002", "000000000003"),
      s"history not linear: $versions")
    // newest snapshot is the outer writer's; the competitor's is intact
    assert(LakeWriter.readSnapshotTable(spark, root, "t")
      .select("who").as[String].head() == "writer2")
    assert(LakeWriter.readSnapshotTable(spark, root, "t",
        before = Some("000000000003"))
      .select("who").as[String].head() == "writer3")
    // no claim files linger after successful commits
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claims = f.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("_claim_v="))
    assert(claims.isEmpty, s"leftover claims: ${claims.toSeq}")
  }

  test("OCC publish: contention past maxAttempts fails loudly; vacuum reaps claims") {
    val root = tmpDir("occ-contend")
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    LakeWriter.publishSnapshotOcc(
      Map("t" -> Seq((0, "w")).toDF("k", "who")), root)
    // a hostile racer steals every resolved version by pre-creating the
    // claim file between resolution and the CAS
    val err = intercept[IllegalStateException] {
      LakeWriter.publishSnapshotOcc(
        Map("t" -> Seq((1, "x")).toDF("k", "who")), root, maxAttempts = 3,
        beforeCommit = { v =>
          f.create(new org.apache.hadoop.fs.Path(root, s"_claim_v=$v"),
            false).close()
        })
    }
    assert(err.getMessage.contains("claim races"))
    // the stolen claims are uncommitted and fresh: a graced vacuum keeps
    // them (a live writer may hold them)...
    LakeWriter.vacuumSnapshots(spark, root, keepLast = 10)
    val live = f.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("_claim_v="))
    assert(live.length == 3, s"graced vacuum must keep fresh claims: ${live.toSeq}")
    // ...and a zero-grace vacuum reaps them as abandoned
    LakeWriter.vacuumSnapshots(spark, root, keepLast = 10,
      uncommittedGraceMs = 0L)
    val reaped = f.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("_claim_v="))
    assert(reaped.isEmpty, s"zero-grace vacuum left claims: ${reaped.toSeq}")
    // with the claims reaped, their version numbers are FREE again —
    // resolution falls back to committed-max + 1
    val vNext = LakeWriter.publishSnapshotOcc(
      Map("t" -> Seq((2, "y")).toDF("k", "who")), root)
    assert(vNext == "000000000002",
      s"reaped claims should free their numbers: $vNext")
  }

  test("pqReconstruct: decompressed vectors stay close to the originals on clustered data") {
    // clustered fixture (the regime PQ codebooks are FOR): 4 well-
    // separated centers with small per-dim jitter
    val rows = (0L until 400L).map { i =>
      val c = (i % 4).toInt
      (i, Seq.tabulate(8)(j =>
        c * 10.0 + (if (j % 4 == c) 5.0 else 0.0) +
          ((i * 31 + j * 17) % 5 - 2) * 0.1))
    }
    val em = rows.toDF("id", "vec")
    val idx = Similarity.pqIndexBuild(em, "id", "vec", dim = 8, m = 4,
      ks = 8, iters = 3)
    val recon = Similarity.pqReconstruct(idx)
    assert(recon.count() === 400, "reconstruction lost rows")
    val joined = em.select(col("id").as("cand_id"),
        col("vec").cast("array<double>").as("orig"))
      .join(recon, "cand_id")
      .select(Similarity.cosine(col("orig"), col("vec")).as("cos"))
    val minCos = joined.agg(min("cos")).head.getDouble(0)
    assert(minCos > 0.99,
      s"reconstruction fidelity collapsed: min cos = $minCos")
    // dims intact
    assert(recon.select(size(col("vec"))).distinct().head.getInt(0) === 8)
  }
}
