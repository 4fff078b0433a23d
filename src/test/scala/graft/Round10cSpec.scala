package graft

import graft.operators.{StateOps, Text}
import graft.sources.StateStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Round-10 third wave: incremental view maintenance of additive
 * aggregates from a CDF feed (retractions, null transitions, group
 * drops), and CDF-driven text-index maintenance (BM25 postings +
 * trigram postings as materialized views of the document store).
 */
class Round10cSpec extends SparkSpecBase {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("ivmAggregate ≡ direct aggregate: updates, deletes, inserts, null transitions, group drops") {
    val v1 = Seq(
      (1L, "a", Some(5.0)), (2L, "a", Some(3.0)),   // a: update 1→null
      (3L, "b", Some(7.0)), (4L, "b", None),        // b: update 3: 7→9
      (5L, "c", Some(2.0)),                         // c: deleted whole
      (6L, "d", None),                              // d: deleted whole (null row)
      (8L, "f", Some(1.0))                          // f: last value →null: SUM null
    ).toDF("id", "grp", "value")
    val v2 = Seq(
      (1L, "a", Option.empty[Double]), (2L, "a", Some(3.0)),
      (3L, "b", Some(9.0)), (4L, "b", None),
      (7L, "e", Some(4.0)),                         // e: fresh group
      (8L, "f", Option.empty[Double])
    ).toDF("id", "grp", "value")
    val feed = StateStore.diffStates(v1, v2, Seq("id"))
    val maintained = StateOps.ivmAggregate(
      StateOps.aggTable(v1, Seq("grp"), Seq("value")),
      feed, Seq("grp"), Seq("value"))
    val direct = StateOps.aggTable(v2, Seq("grp"), Seq("value"))
    assert(sortedRows(maintained) === sortedRows(direct),
      s"maintained:\n${sortedRows(maintained)}\ndirect:\n${sortedRows(direct)}")
    // the interesting cells, pinned explicitly: f keeps its row but SUM
    // returns to NULL (nv=0); c and d DROP (no row, like the direct agg)
    val byGrp = maintained.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2)), r.getLong(3))))
      .toMap
    assert(byGrp("f") === ((1L, None, 0L)), s"f did not return to NULL: $byGrp")
    assert(!byGrp.contains("c") && !byGrp.contains("d"), s"dropped groups survive: $byGrp")
    assert(byGrp("a") === ((2L, Some(3.0), 1L)), s"a wrong: $byGrp")
  }

  test("ivmAggregate from an empty base (all-insert feed) and to empty (all-delete feed)") {
    val v1 = Seq.empty[(Long, String, Option[Double])].toDF("id", "grp", "value")
    val v2 = Seq((1L, "a", Some(2.0)), (2L, "b", Some(3.0))).toDF("id", "grp", "value")
    val up = StateOps.ivmAggregate(StateOps.aggTable(v1, Seq("grp"), Seq("value")),
      StateStore.diffStates(v1, v2, Seq("id")), Seq("grp"), Seq("value"))
    assert(sortedRows(up) === sortedRows(StateOps.aggTable(v2, Seq("grp"), Seq("value"))))
    val down = StateOps.ivmAggregate(StateOps.aggTable(v2, Seq("grp"), Seq("value")),
      StateStore.diffStates(v2, v1, Seq("id")), Seq("grp"), Seq("value"))
    assert(down.count() === 0, "full-delete feed left aggregate rows behind")
  }

  test("CDF-maintained BM25 postings and trigram index equal a rebuild of the new state") {
    val v1 = Seq(
      (1L, "the cat sat"), (2L, "dog park dog park trail"),
      (3L, "red fish blue fish"), (4L, "hello world")).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "the cat sat"), (2L, "dog beach"),          // 2 updated
      (3L, "red fish blue fish"),                      // 4 deleted
      (5L, "green eggs and ham")).toDF("doc_id", "text") // 5 inserted
    val feed = StateStore.diffStates(v1, v2, Seq("doc_id"))

    val maintained = Text.bm25PostingsApplyChanges(
      Text.bm25Postings(v1, "doc_id", "text"), feed, "doc_id", "text")
    val rebuilt = Text.bm25Postings(v2, "doc_id", "text")
    assert(sortedRows(maintained) === sortedRows(rebuilt),
      "maintained postings diverge from a rebuild")

    // the assembled scoring view serves queries identically to a
    // from-scratch index over the new state (df/N/avgdl re-derived)
    val qs = Seq((100L, "dog fish"), (101L, "green cat")).toDF("qid", "qtext")
    val servedM = Text.bm25ScoreIndex(Text.bm25Assemble(maintained), qs,
      "qid", "qtext", k = 3, scoreRoundDecimals = Some(6))
    val servedR = Text.bm25TopK(v2, qs, "doc_id", "text", "qid", "qtext",
      k = 3, scoreRoundDecimals = Some(6))
    assert(sortedRows(servedM) === sortedRows(servedR),
      "maintained index scores queries differently from a rebuild")

    val trgM = Text.trigramIndexApplyChanges(
      Text.trigramIndex(v1, "doc_id", "text"), feed, "doc_id", "text")
    val trgR = Text.trigramIndex(v2, "doc_id", "text")
    assert(sortedRows(trgM) === sortedRows(trgR),
      "maintained trigram postings diverge from a rebuild")
  }

  // --- All-but-the-top: power-iteration top PC + removal ---------------------

  private val PcDim = 16

  /** x = s·u + ε: dominant direction u with large spread s, small
   * deterministic per-dim noise. */
  private def pcFixture: (org.apache.spark.sql.DataFrame, Array[Double]) = {
    val raw = Array.tabulate(PcDim)(j => math.sin(j + 1.0))
    val un = math.sqrt(raw.map(x => x * x).sum)
    val u = raw.map(_ / un)
    val rows = Seq.tabulate(2000) { i =>
      val s = ((i * 2654435761L % 1000) / 100.0 - 5.0) * 10.0
      val v = Array.tabulate(PcDim)(j =>
        s * u(j) + ((i * 31 + j * 17) % 7 - 3) * 0.01)
      (i.toLong, v.toSeq)
    }
    (rows.toDF("id", "vec"), u)
  }

  test("topPc recovers a planted dominant direction; removeTopPc flattens it") {
    val (df, u) = pcFixture
    val (mu, pc) = graft.operators.Similarity.topPc(df, "vec", PcDim)
    val cosUv = math.abs(u.zip(pc).map { case (a, b) => a * b }.sum) /
      math.sqrt(pc.map(x => x * x).sum)
    assert(cosUv > 0.99, s"top PC missed the planted direction: |cos|=$cosUv")

    val uLit = array(u.toSeq.map(lit): _*)
    def varAlongU(frame: org.apache.spark.sql.DataFrame, vc: String): Double =
      frame.select(graft.operators.Similarity.dot(col(vc).cast("array<double>"),
          uLit).as("p"))
        .agg((avg(col("p") * col("p")) - avg("p") * avg("p")).as("v"))
        .head.getDouble(0)
    val before = varAlongU(df, "vec")
    val removed = graft.operators.Similarity.removeTopPc(
      df, "id", "vec", PcDim, fitted = Some((mu, pc)))
    val after = varAlongU(removed, "v_out")
    assert(after < before * 0.01,
      s"removal left variance along u: $after vs $before")
    // removal preserves dimensionality and row count
    assert(removed.select(size(col("v_out"))).distinct().head.getInt(0) === PcDim)
    assert(removed.count() === 2000)
  }

  // --- trigram index as a tri-bucketed catalog table -------------------------

  test("bucketed trigram index: a search scans only the pattern's buckets") {
    val docs = Seq(
      (1L, "the merge batch ran"), (2L, "scan slow table"),
      (3L, "merge batch again here"), (4L, "window sort line"),
      (5L, "nothing of note")).toDF("doc_id", "text")
    Text.trigramIndex(docs, "doc_id", "text")
      .createOrReplaceTempView("trgm_mem")
    graft.sources.LakeWriter.writeBucketed(
      spark.table("trgm_mem"), "trgm_bkt", "tri", nBuckets = 16)
    // autoBucketedScan turns the bucketed layout OFF for scans with no
    // interesting distribution (pure filters) — but bucket PRUNING only
    // happens on a bucketed scan, so pin it on for the probe
    val prevAuto = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val index = spark.table("trgm_bkt")
      val hits = Text.trigramSearch(docs, index, "doc_id", "text", "merge batch")
        .orderBy("doc_id")
        .as[(Long, Long)].collect().toSeq
      assert(hits === Seq((1L, 5L), (3L, 1L)), s"bucketed search wrong: $hits")
      // the scale claim from the index docstring, proven on the plan:
      // the probe's isin reaches the scan as bucket pruning — only the
      // pattern's own trigram buckets are read
      val pats = "merge batch".sliding(3).toSeq.distinct
      val scan = index.filter(col("tri").isin(pats: _*))
        .queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of 16".r
        .findFirstMatchIn(scan)
      assert(sel.isDefined, s"no bucket pruning in scan:\n${scan.take(1500)}")
      assert(sel.get.group(1).toInt < 16,
        s"probe read every bucket: ${sel.get.group(0)}")
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        prevAuto)
      spark.sql("DROP TABLE IF EXISTS trgm_bkt")
    }
  }

  // --- CHECK-constraint expectations -----------------------------------------

  test("expectationsSplit: NULL passes, violations carry reasons, clean keeps schema") {
    import graft.operators.Quality
    val df = Seq(
      (1L, Some(5.0), "click"),          // clean
      (2L, Some(-1.0), "click"),         // value_nonneg
      (3L, None, "view"),                // null value: CHECK semantics → passes
      (4L, Some(2.0), "bogus"),          // type_known
      (5L, Some(-9.0), "bogus")          // both
    ).toDF("id", "value", "event_type")
    val checks = Seq(
      "value_nonneg" -> (col("value") >= 0),
      "type_known" -> col("event_type").isin("click", "view"))
    val (clean, quarantined) = Quality.expectationsSplit(df, checks)
    assert(clean.columns.toSeq === df.columns.toSeq, "clean schema changed")
    assert(clean.select("id").as[Long].collect().sorted === Array(1L, 3L))
    val reasons = quarantined
      .select(col("id"), col("_violations"))
      .as[(Long, Seq[String])].collect().toMap
    assert(reasons === Map(
      2L -> Seq("value_nonneg"), 4L -> Seq("type_known"),
      5L -> Seq("value_nonneg", "type_known")), s"reasons wrong: $reasons")
    // the report agrees with the split
    val rep = Quality.expectationsReport(df, checks)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep === Map("value_nonneg" -> ((2L, 5L)), "type_known" -> ((2L, 5L))))
  }

  // --- Unicode NFC normalization ---------------------------------------------

  test("NFC normalize: composed \u2261 decomposed, ligatures preserved, idempotent, SQL-callable") {
    import graft.functions.Strings
    val df = Seq(
      (1L, "caf\u00e9"),        // e-acute precomposed (already NFC)
      (2L, "cafe\u0301"),       // e + combining acute (NFD): same bytes after NFC
      (3L, "ma\u00dfe"),        // eszett must NOT casefold to "ss" (lower, not NFKC)
      (4L, "\ufb01sh"),         // fi ligature: NFC preserves it (expansion is NFKC)
      (5L, "  A\t\n B  "),     // whitespace collapse + trim + lower
      (6L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = df.select(col("id"), Strings.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === out(2L), s"NFC did not unify accent encodings: $out")
    assert(out(1L) === Some("caf\u00e9"))
    assert(out(3L) === Some("ma\u00dfe"), "lowercase wrongly NFKC-folded eszett")
    assert(out(4L).get.contains('\ufb01'), "NFC wrongly expanded the fi ligature")
    assert(out(5L) === Some("a b"), s"whitespace recipe wrong: ${out(5L)}")
    assert(out(6L) === None, "null must stay null")
    // idempotent
    val twice = df.filter(col("text").isNotNull)
      .select(Strings.normalizeText(Strings.normalizeText(col("text"))).as("n2"),
        Strings.normalizeText(col("text")).as("n1"))
      .filter(not(col("n2") <=> col("n1"))).count()
    assert(twice === 0, "normalizeText is not idempotent")
    // the whole point: exact dedup after normalization catches the pair
    val deduped = graft.operators.Dedup.exactKeepFirst(
      df.filter(col("text").isNotNull)
        .select(col("id").as("doc_id"),
          Strings.normalizeText(col("text")).as("text")),
      Seq("text"), "doc_id")
    assert(deduped.count() === 4, "normalized exact dedup missed the NFC pair")
    // SQL registration
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT nfc_normalize('cafe\u0301') AS n")
      .as[String].head()
    assert(viaSql === "caf\u00e9", s"SQL surface wrong: $viaSql")
  }

  // --- k-core peeling --------------------------------------------------------

  /** Driver reference: literal iterative peeling. */
  private def refKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    var changed = true
    while (changed) {
      val deg = es.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter { case (a, b) => keep(a) && keep(b) }
      changed = next.size != es.size
      es = next
    }
    es.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size }
  }

  test("kCore: K5 survives 4-core, long tail cascades off a cycle, tree empties") {
    // K5 on 1..5, a tail 5-10-11-12, and a pendant 13 on node 1
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val edges = (k5 ++ Seq((5L, 10L), (10L, 11L), (11L, 12L), (1L, 13L)))
      .toDF("a", "b")
    val core4 = graft.operators.Analytics.kCore(edges, "a", "b", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core4 === (1L to 5L).map(_ -> 4L).toMap, s"4-core wrong: $core4")
    // k=2: the K5 plus nothing else survives (tail and pendant cascade
    // off one node at a time — multi-round peeling)
    val core2 = graft.operators.Analytics.kCore(edges, "a", "b", k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(core2 === (1L to 5L).toSet, s"2-core wrong: $core2")
    // a pure path has no 2-core at all
    val path = (1L to 20L).sliding(2).map(s => (s.head, s.last)).toSeq.toDF("a", "b")
    assert(graft.operators.Analytics.kCore(path, "a", "b", k = 2).count() === 0)
  }

  test("kCore matches the driver reference on a randomized graph (dups/reversed/self-loops)") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val df = edges.toDF("a", "b")
    for (k <- Seq(2, 3, 5)) {
      val got = graft.operators.Analytics.kCore(df, "a", "b", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      val want = refKCore(edges, k)
      assert(got === want, s"k=$k: got ${got.size} nodes, want ${want.size}")
    }
  }

  test("topPc on an all-identical corpus is zero (no NaN); removal = centering") {
    val df = Seq.tabulate(50)(i => (i.toLong, Seq.fill(PcDim)(3.5)))
      .toDF("id", "vec")
    val (mu, pc) = graft.operators.Similarity.topPc(df, "vec", PcDim)
    assert(mu.forall(_ == 3.5), s"mean wrong: ${mu.toSeq}")
    assert(pc.forall(_ == 0.0), s"degenerate pc not zeroed: ${pc.toSeq}")
    val removed = graft.operators.Similarity.removeTopPc(
      df, "id", "vec", PcDim, fitted = Some((mu, pc)))
    val vals = removed.select(explode(col("v_out"))).distinct()
      .collect().map(_.getDouble(0))
    assert(vals.toSeq === Seq(0.0), s"centering wrong: ${vals.toSeq}")
  }
}
