package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Plan-property regression tests: the 100 TB posture claims in SURVEY §4
 * as executable assertions. A change that silently turns a broadcast
 * join into a sort-merge join, loses a pushed filter, or adds a second
 * window shuffle fails HERE, not in a cluster bill.
 */
@SlowTest
class PlanSpec extends SparkSpecBase {

  // plan BUILD runs inside a CacheScope: operators persist fan-out
  // intermediates at construction time, and without a scope those
  // registrations leak into the session cache manager — a later suite
  // building the SAME sub-plan (ShuffleBudgetSpec measuring q_feat_prop)
  // then silently reads/materializes the leaked cache and measures a
  // different plan than it would standalone
  private def plan(name: String): String = CacheScope.scoped {
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
  }

  private def count(hay: String, needle: String): Int =
    needle.r.findAllMatchIn(hay).size

  test("dim lookups broadcast — fact side never shuffles") {
    val p = plan("q_lookup_join")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dim join degraded to sort-merge")
  }

  test("selective filters are pushed into the parquet scan") {
    val p = plan("q_timeline")
    assert(p.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]")
      || p.contains("PushedFilters: [EqualTo(user_id,7)"), p.take(2000))
  }

  test("column pruning reaches the scan: 4-column projection reads 4 columns") {
    val p = plan("q_normalize")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.split(",").length === 4, s"scan reads more than projected: $read")
  }

  test("sessionization family plans exactly one shuffle") {
    // q_stay_points belongs here: its per-run groupBy keys on
    // (user_id, stay_id) — a superset of the window key — so the window's
    // hash partitioning satisfies the aggregation and no second shuffle
    for (q <- Seq("q_sessionize", "q_traj_sample", "q_session_summary",
        "q_stay_points")) {
      val p = plan(q)
      val exchanges = count(p, "(?<!Reused)Exchange (hash|range)")
      assert(exchanges === 1, s"$q wants 1 shuffle, got $exchanges")
    }
  }

  test("brute-force ANN broadcasts the query side (big side unshuffled)") {
    val p = plan("q_ann_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("rollups use partial (map-side) aggregation") {
    val p = plan("q_daily_metrics")
    assert(p.contains("partial_"), "no partial aggregation before the shuffle")
  }

  test("as-of join plans one shuffle, not an inequality join") {
    val p = plan("q_asof")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(2000))
    assert(count(p, "(?<!Reused)Exchange hash") <= 2, p.take(2000))
  }

  test("range join is an equi-join on buckets, never a nested loop") {
    val p = plan("q_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("decontamination broadcasts the probe side") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("analytics window families plan exactly one shuffle") {
    for (q <- Seq("q_transitions", "q_interarrival", "q_ntile", "q_rolling")) {
      val p = plan(q)
      val exchanges = count(p, "(?<!Reused)Exchange (hash|range)")
      // lag/window + groupBy share the per-entity partitioning where
      // possible; never more than two exchanges end-to-end
      assert(exchanges <= 2, s"$q wants <=2 shuffles, got $exchanges\n${p.take(2000)}")
    }
  }

  test("pivot and histogram are single partial-agg'd shuffles") {
    for (q <- Seq("q_pivot", "q_histogram")) {
      val p = plan(q)
      assert(p.contains("partial_"), s"$q lost map-side combine")
      assert(count(p, "(?<!Reused)Exchange (hash|range)") === 1, p.take(2000))
    }
  }

  test("blocklist scrub broadcasts the blocklist (corpus never shuffles)") {
    val p = plan("q_blocklist")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "blocklist anti join degraded to sort-merge")
  }

  test("label centroids partial-aggregate before the shuffle") {
    val p = plan("q_centroid")
    assert(p.contains("partial_"), "centroid components not pre-summed per partition")
  }

  test("tfidf: corpus-size side is broadcast, token join keyed high-cardinality") {
    val p = plan("q_tfidf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "n_docs scalar frame should broadcast")
  }

  test("codegen kernels run inside WholeStageCodegen") {
    val df = Tables.documents(spark, sfDir).select(
      graft.functions.Hashing.hashedShingles(col("text"), 3).as("shh"))
    // the `*(n)` prefix marks a WholeStageCodegen stage in plan toString
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("hashed_shingles")),
      p.take(1000))
  }

  test("multi-table LSH: bucket probe and rank joins broadcast the query side") {
    val p = plan("q_ann_lsh")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the big candidate side must never be sort-merge-shuffled against
    // the tiny query side
    assert(!p.contains("SortMergeJoin"), "LSH probe degraded to sort-merge")
  }

  test("IVF: centroid subplan is persisted, not recomputed per broadcast") {
    val p = plan("q_ann_ivf")
    assert(p.contains("InMemoryTableScan"),
      "ivf centroids should come from the persisted frame\n" + p.take(2000))
  }

  test("lshTopK plan construction runs zero Spark jobs (no eager driver action)") {
    val em = Tables.embeddings(spark, sfDir)
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    // building the plan (not running it) must not launch a job — the old
    // implementation probed the vector dim with .head() here
    Similarity.lshTopK(em, em.limit(5), "vec_id", "embedding", k = 3, dim = 64)
      .queryExecution.executedPlan
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after === before, s"plan construction launched ${after - before} job(s)")
  }

  test("StateStore bucket filter prunes partition directories at the scan") {
    val root = java.nio.file.Files.createTempDirectory("graft-plan-state").toString
    val deltas = {
      import spark.implicits._
      (1 to 40).map(i => (s"e$i", 1.0)).toDF("entity", "dist")
    }
    graft.sources.StateStore.merge(spark, root, "2024-01-01", deltas,
      Seq("entity"), Seq("dist"), nBuckets = 8)
    // a one-key delta: the merge's pruned read must hit ONE bucket dir
    graft.sources.StateStore.merge(spark, root, "2024-01-02",
      deltas.limit(1), Seq("entity"), Seq("dist"), nBuckets = 8)
    val day2 = new java.io.File(s"$root/v=2024-01-02")
      .listFiles().filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(day2.length === 1, s"expected 1 touched bucket, got ${day2.length}")
  }

  test("span dedup finds first occurrences with a partial agg, not a corpus window") {
    val p = plan("q_span_dedup")
    assert(p.contains("partial_min") || p.contains("partial_"),
      "first-occurrence search lost map-side combine\n" + p.take(2000))
    assert(!p.contains("Window"), "span dedup degraded to a window over the corpus")
  }

  test("mixture sample broadcasts the per-stratum plan (corpus never shuffles)") {
    val p = plan("q_mixture_sample")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "mixture plan join degraded to sort-merge")
  }

  test("skew profile: one partial-agg groupBy, top-k via TakeOrdered, no window") {
    val p = plan("q_skew_profile")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k keys should be TakeOrdered, not a global sort\n" + p.take(2000))
    assert(!p.contains("Window"), "key profile degraded to a window over all keys")
    assert(p.contains("partial_count") || p.contains("partial_"),
      "per-key counts lost map-side combine")
  }

  test("delta dedup probes the index with equi-joins; archive verify is semi-join-pruned") {
    val p = plan("q_dedup_delta")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "delta dedup planned a cross join\n" + p.take(2000))
    assert(p.contains("LeftSemi"),
      "archive re-hash should be pruned to candidate ids via a semi join\n" + p.take(2000))
  }

  test("PMI joins key on tokens (high cardinality); corpus total broadcasts") {
    val p = plan("q_cooccur")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the one-row corpus total should broadcast\n" + p.take(2000))
  }

  test("global weighted sample plans TakeOrdered, not a full sort or window") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "w")
    val p = operators.Sampling.weightedSample(df, "id", "w", k = 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      "global weighted top-k should be per-partition top-k + k-row merge\n" + p.take(2000))
    assert(!p.contains("Window"), "global draw degraded to a single-partition window")
  }

  test("column profile branches prune each scan to its one column") {
    val p = plan("q_col_profile")
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(reads.nonEmpty && reads.forall(_.split(",").length === 1),
      s"a profile branch reads more than its own column: $reads")
  }

  test("inverted index: postings agg is partial; no window over the corpus") {
    val p = plan("q_inverted_index")
    assert(p.contains("partial_"), "df counts lost map-side combine")
    assert(!p.contains("Window"), "posting lists degraded to a corpus window")
  }

  test("JL fidelity gate broadcasts the query side; projection stays in codegen") {
    val p = plan("q_rand_proj")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side should broadcast\n" + p.take(2000))
    // the `*(n)` prefix marks a WholeStageCodegen stage in plan toString
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("dot_product")),
      "sign-row dot products fell out of codegen\n" + p.take(2000))
  }

  test("chi-square: one partial-agg pass over the data; margins broadcast") {
    val p = plan("q_chi2")
    assert(p.contains("partial_"), "contingency counts lost map-side combine")
    assert(!p.contains("SortMergeJoin"),
      "margin joins degraded to sort-merge (they are margin-sized)\n" + p.take(2000))
  }

  test("triangles: hash joins on the hinted sides, no cartesian anywhere") {
    val p = plan("q_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "triangle join degraded to all-pairs\n" + p.take(2000))
    assert(p.contains("ShuffledHashJoin"),
      "shuffle_hash hints lost — SMJ would sort the O(m^1.5) wedge side\n" + p.take(2000))
  }

  test("interval overlap join stays an equi-join with a partial-agg rollup") {
    val p = plan("q_interval_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "overlap join degraded to all-pairs\n" + p.take(2000))
    assert(p.contains("partial_"), "per-user rollup lost map-side combine")
  }

  test("EWMA and anomaly flags plan exactly one shuffle (window family)") {
    for (q <- Seq("q_ewma", "q_anomaly")) {
      val p = plan(q)
      val exchanges = count(p, "(?<!Reused)Exchange (hash|range)")
      assert(exchanges === 1, s"$q wants 1 shuffle, got $exchanges")
    }
  }

  test("interval merge keys its rollup on the window partitioning (no extra shuffle)") {
    val p = plan("q_interval_merge")
    val exchanges = count(p, "(?<!Reused)Exchange (hash|range)")
    assert(exchanges === 1, s"interval merge wants 1 shuffle, got $exchanges")
  }

  test("SemDeDup: centroids broadcast; the within-cell join is an equi-join") {
    val p = plan("q_semdedup")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroid assignment lost its broadcast\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "within-cell compare degraded to a cartesian\n" + p.take(2000))
  }

  test("duplicated spans: partial-agg'd seed count, semi-join pruning, no cartesian") {
    val p = plan("q_dup_spans")
    assert(p.contains("partial_"), "seed count lost map-side combine")
    assert(p.contains("LeftSemi"), "duplicated-position filter is not a semi-join\n" + p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("SCD2 and course features never degrade to non-window joins") {
    for (q <- Seq("q_scd2", "q_course")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q grew a join — window family only\n" + p.take(2000))
      assert(count(p, "(?<!Reused)Exchange (hash|range)") <= 2,
        s"$q wants at most 2 shuffles")
    }
  }

  test("encounters plans a (band, bucket) equi-join, never a cross join") {
    val p = plan("q_encounters")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "proximity join degraded to all-pairs\n" + p.take(2000))
    assert(p.contains("partial_"), "per-pair rollup lost map-side combine")
  }

  test("within-doc span dedup is map-only: ZERO exchanges, no window, no join") {
    // the operator's whole scale claim is that it is a pure expression
    // over the scan — any shuffle appearing here means someone turned it
    // back into a corpus-level pass
    val p = plan("q_doc_span_dedup")
    assert(count(p, "(?<!Reused)Exchange (hash|range)") === 0,
      s"docSpanDedup grew a shuffle\n${p.take(2000)}")
    assert(!p.contains("Window") && !p.contains("Join"), p.take(2000))
  }

  test("queryable-current SCD2: groupBy reuses the window exchange (one shuffle)") {
    // scd2Current's scaladoc claims the per-key max_by aggregation rides
    // the window's (key)-hash partitioning — assert it stays ONE shuffle
    // end-to-end so a refactor can't silently re-shuffle the change log
    val p = plan("q_scd2_current")
    val exchanges = count(p, "(?<!Reused)Exchange (hash|range)")
    assert(exchanges === 1,
      s"scd2Current wants 1 shuffle, got $exchanges\n${p.take(2000)}")
    assert(!p.contains("Join"), "scd2Current grew a join — window+agg family only")
  }

  test("DSIR: broadcast feature model, TakeOrdered draw, no global window") {
    val p = plan("q_dsir")
    assert(count(p, "TakeOrderedAndProject") === 1,
      "the gumbel draw should be per-partition top-k + k-row merge\n" + p.take(2000))
    assert(count(p, "Window \\[") === 0, "draw degraded to a single-partition window")
    assert(p.contains("BroadcastHashJoin"), "feature log-ratio table should broadcast")
    assert(!p.contains("SortMergeJoin"), "corpus shuffled on the feature key")
  }

  test("PQ ANN: broadcast code/LUT joins, rank pushed down, no sort-merge") {
    val p = plan("q_ann_pq")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "PQ scoring degraded past broadcast joins\n" + p.take(2000))
    assert(p.contains("WindowGroupLimit"),
      "top-k rank lost the group-limit pushdown (full per-query sort)")
    assert(p.contains("partial_sum"), "ADC sum lost map-side combine")
  }

  test("BM25: query terms broadcast into the token join; no corpus cartesian") {
    val p = plan("q_bm25")
    assert(p.contains("BroadcastHashJoin"),
      "query-term join lost its broadcast\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "corpus-side cartesian appeared (N/avgdl must ride a broadcast)")
    assert(p.contains("partial_sum"), "per-(query,doc) score sum lost map-side combine")
    assert(p.contains("WindowGroupLimit"),
      "top-k rank lost the group-limit pushdown")
  }

  test("RRF fusion: union of bounded lists, partial-agg'd sum, rank pushed down") {
    val p = plan("q_rrf_hybrid")
    assert(p.contains("partial_sum"), "fusion sum lost map-side combine")
    assert(p.contains("WindowGroupLimit"),
      "fused top-k lost the group-limit pushdown")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("MaxSim: query bag broadcast (nested-loop on the BROADCAST side only), two partial aggs") {
    val p = plan("q_maxsim")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "query-bag join is not broadcast\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "corpus self-join appeared — MaxSim must scan the corpus once")
    assert(p.contains("partial_max") && p.contains("partial_sum"),
      "per-qvec max / per-doc sum lost map-side combine")
  }

  test("dynamic partition pruning: a dim filter prunes lake partitions at runtime") {
    // the 100 TB join shape: a y/m/d-partitioned fact joined to a small
    // filtered dim must scan only the dim's surviving partitions — DPP
    // injects the dim's day-set into the fact scan's partition filters
    // at runtime (no manual predicate on the fact side)
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    import spark.implicits._
    val fact = (1 to 8).flatMap(d => (1 to 50).map(i =>
      (2024, 1, d, i.toLong, d * 100.0 + i)))
      .toDF("year", "month", "day", "key", "v")
    sources.LakeWriter.writePartitioned(fact, s"$dir/fact")
    // the dim must be a real source (not a pre-folded LocalRelation) so
    // its filter survives as a plan node for the DPP rule to harvest
    Seq((1, "keep"), (2, "keep"), (3, "drop")).toDF("day", "tag")
      .write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val joined = sources.LakeWriter.read(spark, s"$dir/fact")
      .join(broadcast(dim).filter(col("tag") === "keep"), Seq("day"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      "fact scan lost dynamic partition pruning — every partition would " +
        "be read despite the dim filter\n" + p.take(2000))
    assert(joined.count() === 100L) // 2 surviving days × 50 rows
  }

  test("quantile rollup: KLL sketch aggs partial-agg before their shuffles") {
    val p = plan("q_quantile_rollup")
    assert(p.contains("partial_kll_sketch_agg"),
      "daily KLL build lost map-side combine\n" + p.take(2000))
    assert(p.contains("partial_kll_merge_agg"),
      "rollup merge lost map-side combine\n" + p.take(2000))
    // the exact gate side joins at rollup cardinality — a handful of
    // (month, event_type) rows — so the join must be broadcast
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "rollup-vs-exact gate join stopped broadcasting\n" + p.take(2000))
  }

  test("corpus overlap: sketch side is map-only bottom-k, not a distinct shuffle") {
    val p = plan("q_corpus_overlap")
    // the exact gate pays its distinct aggregates; the SKETCH branches
    // must contribute only bounded TakeOrdered merges (k rows), never a
    // sort of the corpus hashes
    assert(count(p, "TakeOrderedAndProject") >= 3,
      "KMV bottom-k stopped planning as TakeOrdered (global sort crept in)\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "a k-row sketch join planned as SMJ — broadcast lost\n" + p.take(2000))
  }

  test("sketch rollup: both sketch passes partial-agg before their shuffles") {
    val p = plan("q_sketch_rollup")
    assert(p.contains("partial_hllsketchagg") || p.contains("partial_hll"),
      "daily sketch build lost map-side combine\n" + p.take(2000))
    assert(!p.contains("Join") || !p.contains("SortMergeJoin"), p.take(500))
  }

  test("binary ANN: hamming shortlist rank is group-limit pushed, queries broadcast") {
    val p = plan("q_ann_binary")
    // without WindowGroupLimit the corpus x queries hamming rows would
    // ALL shuffle to |queries| partitions for the rank — the pushdown
    // keeps per-partition partial top-shortlist ahead of the exchange,
    // which is the entire BQ scale story
    assert(p.contains("WindowGroupLimit"),
      "hamming shortlist lost the group-limit pushdown\n" + p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side stopped broadcasting\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("attribution plans one data shuffle: the channel agg rides partial-agg on window output") {
    val p = plan("q_attribution")
    val exchanges = count(p, "(?<!Reused)Exchange (hash|range)")
    // one user-keyed exchange for the window; the channel groupBy adds
    // its own tiny post-window exchange but must partial-agg first
    assert(exchanges <= 2, s"q_attribution wants <= 2 shuffles, got $exchanges\n" + p.take(2000))
    assert(p.contains("partial_count"), "channel agg lost map-side combine")
    assert(!p.contains("Join"), "attribution must not plan a self-join\n" + p.take(1000))
  }

  test("IVM: the CDF diff is one key-equi full-outer join; delta agg partial-aggs") {
    val p = plan("q_ivm")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "diffStates degraded past an equi-join\n" + p.take(2000))
    assert(p.contains("FullOuter"), "state diff lost its full-outer key join")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "maintained aggregate lost map-side combine")
  }

  test("whole surface: no CartesianProduct; every global window is bounded or justified") {
    // Sweeping plan-hygiene lock over EVERY query (plans only, nothing
    // executes). Two 100 TB killers:
    //  1. CartesianProduct — 1-row model/stat crossJoins plan as
    //     BroadcastNestedLoopJoin, so any CartesianProduct is a real
    //     unkeyed join.
    //  2. An UNPARTITIONED WindowExec over unbounded input — the
    //     single-task funnel. Allowed when the window's subtree is
    //     rank/limit-pruned (TakeOrderedAndProject / WindowGroupLimit
    //     feeds it ≤ N rows), or for the allowlisted queries whose
    //     window input is bounded BY CONSTRUCTION:
    //     q_budget_select (≤ nBuckets bucket rows), q_ks_test
    //     (enforced-cardinality CDF), q_rolling_distinct (one sketch
    //     row per day; the dim-keyed variant partitions instead),
    //     q_maxsim (the windowed count IS the in-plan broadcast-batch
    //     gate, and it runs over the query batch — the side that very
    //     gate bounds), q_spearman / q_mannwhitney (fractionalRank /
    //     rank-sum cumulative windows over DISTINCT-value rows — the
    //     documented bounded-cardinality contract; mannWhitneyU also
    //     enforces it with the ksTest approx-distinct gate),
    //     q_negsample (the cumulative-slot window runs over the
    //     VOCABULARY table — vocab-sized by construction, it then
    //     broadcasts into the range join),
    //     q_epoch_order / q_er_snm / q_ppl_buckets / q_vocab (the
    //     globalRowNumber offset frame: the cumulative window runs over
    //     ONE count row PER SHUFFLE PARTITION of the range-sorted input
    //     — bounded by cluster width, never data — then broadcasts back;
    //     the data-sized path is the range-partitioned sort itself).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val boundedByConstruction =
      Set("q_budget_select", "q_ks_test", "q_rolling_distinct", "q_maxsim",
        "q_spearman", "q_mannwhitney", "q_negsample",
        "q_epoch_order", "q_er_snm", "q_ppl_buckets", "q_vocab")
    def expand(p: SparkPlan): Seq[SparkPlan] =
      (p match { case a: AdaptiveSparkPlanExec => expand(a.executedPlan); case x => Seq(x) }) ++
        p.children.flatMap(expand) ++ p.subqueries.flatMap(expand)
    def boundedBelow(w: SparkPlan): Boolean = expand(w).exists {
      case _: TakeOrderedAndProjectExec | _: WindowGroupLimitExec => true
      case _ => false
    }
    val cartesians = scala.collection.mutable.ArrayBuffer[String]()
    val funnels = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan
      val nodes = expand(plan)
      if (nodes.exists(_.getClass.getSimpleName == "CartesianProductExec"))
        cartesians += name
      val unbounded = nodes.exists {
        case w: WindowExec => w.partitionSpec.isEmpty && !boundedBelow(w)
        case _ => false
      }
      if (unbounded && !boundedByConstruction(name)) funnels += name
    }
    assert(cartesians.isEmpty, s"CartesianProduct planned in: $cartesians")
    assert(funnels.isEmpty,
      s"unbounded single-task global window planned in: $funnels — " +
        "partition it, prune it, or justify it on the allowlist")
  }

  test("distance profile: fixed sample broadcast self-join, zero shuffle exchanges") {
    val p = plan("q_dist_profile")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(count(p, "(?<!Reused)Exchange (hash|range)") === 0,
      "the constant-work QA profile grew a shuffle")
  }

  test("decayed features: weights fold map-side — one partial-agg'd shuffle") {
    val p = plan("q_decay_agg")
    assert(count(p, "(?<!Reused)Exchange (hash|range)") === 1,
      s"decayedAgg wants 1 shuffle\n${p.take(2000)}")
    assert(p.contains("partial_sum") || p.contains("partial"), p.take(2000))
  }

  test("voiced segments: run rollup rides the per-clip window partitioning — one shuffle") {
    // groupBy (doc_id, _grp) keys a superset of the window's doc_id
    // partitioning, so the window exchange satisfies the aggregation
    val p = plan("q_audio_segments")
    assert(count(p, "(?<!Reused)Exchange (hash|range)") === 1,
      s"speechSegments wants 1 shuffle\n${p.take(2000)}")
  }

  test("classifier: train partial-aggs the bucket counts; inference is join-free map work") {
    val p = plan("q_ft_classify")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "count-table aggregation lost map-side combine\n" + p.take(2000))
    // the 1-row model rides broadcast nested-loop crossJoins; any
    // SortMergeJoin/CartesianProduct means the corpus started shuffling
    // for what must be a broadcast of a model artifact
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "classifier plan degraded past model broadcasts\n" + p.take(2000))
  }

  test("frontier caps: the cap table broadcasts; one stratum window") {
    val p = plan("q_domain_caps")
    assert(p.contains("BroadcastHashJoin"),
      "cap-table join lost its broadcast\n" + p.take(2000))
    assert(count(p, "WindowExec|Window\\b") >= 1 &&
      !p.contains("CartesianProduct"), p.take(2000))
  }

  private val Similarity = graft.operators.Similarity
}
