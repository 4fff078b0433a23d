package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Entity resolution: find records that describe the same real-world
 * entity under typos, formatting drift and partial fields — the record
 * counterpart of the document near-dup family (see DEDUP.md for the
 * decision tree; this family covers the "my duplicates are ROWS with
 * fuzzy FIELDS, not documents" branch).
 *
 * The scale shape is the standard two-phase split every production ER
 * system uses:
 *
 *  1. CANDIDATE GENERATION bounds the pair space — equi-blocking
 *     ([[blockCandidates]]) and sorted-neighborhood ([[snmCandidates]]).
 *     Never all-pairs: blocking joins each block independently (Σ b²
 *     pairs, with an enforced per-block ceiling so one degenerate key
 *     cannot go quadratic), SNM is n·(w−1) pairs by construction —
 *     LINEAR in the corpus, the asymptotic safety net when no blocking
 *     key is trustworthy.
 *  2. PAIR SCORING ([[scorePairs]]) is a map-only fold over the
 *     candidate frame after two id-equi-joins against the slimmed
 *     record table — per-field similarities (edit-distance ratio for
 *     strings, agreement flags for categoricals, scaled absolute
 *     difference for numerics) combined into one weighted score in
 *     [0, 1], a fixed-order Fellegi–Sunter-style linear match rule.
 *     Everything is codegen'd builtin expressions (`levenshtein`,
 *     `greatest`, `abs`) — no UDFs.
 *
 * Matched pairs feed [[Dedup.clusterPairs]] (min-label connected
 * components) for transitive entity ids ([[entities]]), exactly as the
 * document near-dup family does — one CC implementation serves both.
 */
object EntityResolution {

  /**
   * Candidate pairs via equi-blocking: records sharing a composite
   * block key pair up (`id_a < id_b`), one row per pair with the block
   * key attached. Rows with a NULL in any block column generate no
   * candidates (a null key is evidence of nothing — standard blocking
   * semantics; route suspect rows through a second, coarser pass
   * instead).
   *
   * `maxBlock` is the quadratic-blowup guard: blocks larger than it
   * are SKIPPED ENTIRELY (Σ b² over degenerate keys — an empty-string
   * city, a default phone — is how real ER jobs die at scale; a too-big
   * block means the key is not discriminating there, and the fix is a
   * finer key or [[snmCandidates]], not a bigger cluster). Skipped mass
   * is observable: [[blockProfile]] reports per-block sizes with a
   * `skipped` flag so the cap is never silent.
   *
   * One partial-agg'd shuffle for the block sizes, one self-join
   * shuffled on the block key (both sides share the exchange). Pair
   * count ≤ Σ min(b, maxBlock)² — bounded, and linear when block
   * cardinality grows with the data (the realistic regime: name
   * prefixes, postcodes).
   */
  def blockCandidates(records: DataFrame, idCol: String,
                      blockCols: Seq[String], maxBlock: Int = 1000): DataFrame = {
    require(blockCols.nonEmpty, "blockCandidates needs at least one block column")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    val keyed = records
      .filter(blockCols.map(col(_).isNotNull).reduce(_ && _))
      .select(col(idCol) +: blockCols.map(col): _*)
    val sizes = keyed.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") >= 2 && col("_bn") <= maxBlock)
      .drop("_bn")
    val inBlock = keyed.join(sizes, blockCols)
    val a = inBlock.select(col(idCol).as("id_a") +: blockCols.map(col): _*)
    val b = inBlock.select(col(idCol).as("id_b") +: blockCols.map(col): _*)
    a.join(b, blockCols).filter(col("id_a") < col("id_b"))
      .select(col("id_a") +: col("id_b") +: blockCols.map(col): _*)
  }

  /**
   * Per-block size profile with the [[blockCandidates]] skip verdict —
   * the observability half of the `maxBlock` cap: `(block cols, n,
   * n_pairs, skipped)` where `n_pairs` is the C(n,2) the block WOULD
   * contribute. Sum `n_pairs` over `skipped = false` to predict the
   * candidate volume before paying for it (the planning query a 100 TB
   * ER run starts with).
   */
  def blockProfile(records: DataFrame, idCol: String,
                   blockCols: Seq[String], maxBlock: Int = 1000): DataFrame = {
    records
      .filter(blockCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("n_pairs", (col("n") * (col("n") - 1) / 2).cast("long"))
      .withColumn("skipped", col("n") > maxBlock)
  }

  /**
   * Sorted-neighborhood candidate pairs: records within `window`
   * positions of each other in the global `sortCols` order pair up —
   * exactly n·(window−1) − O(window²) pairs, LINEAR in the corpus no
   * matter how the keys are distributed. The classic complement to
   * blocking (Hernández–Stolfo SNM): a typo in the block key breaks
   * equi-blocking but usually not sort adjacency.
   *
   * `sortCols` must be a TOTAL order (append the id as a tie-break) —
   * the pair set is only well-defined against a deterministic ranking.
   *
   * Distribution: the global rank comes from [[Analytics.globalRowNumber]]
   * (range-partitioned sort + per-partition offsets, no single-partition
   * window). Each row then emits its neighborhood bucket ⌊(rank−1)/w⌋
   * and that bucket + 1; the other side keys on its own bucket alone, so
   * a qualifying pair (0 < rank_b − rank_a ≤ w−1 implies bucket_b ∈
   * {bucket_a, bucket_a+1}) meets on EXACTLY one key — the meet-once
   * discipline the encounter/interval joins use, no post-dedup needed.
   */
  def snmCandidates(records: DataFrame, idCol: String,
                    sortCols: Seq[String], window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val ranked = Analytics.globalRowNumber(
      records.select((idCol +: sortCols).distinct.map(col): _*),
      sortCols.map(col), outCol = "_rn")
      .withColumn("_bkt", floor((col("_rn") - 1) / window))
    val a = ranked
      .select(col(idCol).as("id_a"), col("_rn").as("_rn_a"), col("_bkt"))
      .withColumn("_k", explode(array(col("_bkt"), col("_bkt") + 1)))
      .drop("_bkt")
    val b = ranked
      .select(col(idCol).as("id_b"), col("_rn").as("_rn_b"), col("_bkt").as("_k"))
    a.join(b, "_k")
      .filter((col("_rn_b") - col("_rn_a")).between(1, window - 1))
      .select(col("id_a"), col("id_b"),
        (col("_rn_b") - col("_rn_a")).as("rank_dist"))
  }

  /**
   * Fellegi–Sunter-style linear pair scoring over a candidate frame
   * (`id_a`, `id_b`): per-field similarities, each weighted, normalized
   * by total weight to a `score` in [0, 1].
   *
   *  - `stringCols` `(col, weight)` → `sim_<col>`: 1 − levenshtein /
   *    max(length) (1.0 when both empty, and when both NULL; 0.0 when
   *    exactly one side is NULL — a missing field is evidence against,
   *    two missing fields are vacuous agreement).
   *  - `exactCols` `(col, weight)` → `eq_<col>`: null-safe equality as
   *    0/1.
   *  - `numericCols` `(col, weight, scale)` → `num_<col>`:
   *    max(0, 1 − |a−b|/scale), same null rule as strings.
   *
   * The fold adds terms in declaration order then divides once — plain
   * IEEE doubles in a fixed order, reproducible bit-for-bit by an
   * external engine. Map-only after the two id-equi-joins (at scale:
   * sort-merge on the id, the candidate frame already carries both ids;
   * the record table is slimmed to exactly the scored fields first so
   * the join moves no dead columns).
   */
  def scorePairs(records: DataFrame, candidates: DataFrame, idCol: String,
                 stringCols: Seq[(String, Double)] = Seq.empty,
                 exactCols: Seq[(String, Double)] = Seq.empty,
                 numericCols: Seq[(String, Double, Double)] = Seq.empty): DataFrame = {
    val fields = (stringCols.map(_._1) ++ exactCols.map(_._1) ++
      numericCols.map(_._1)).distinct
    require(fields.nonEmpty, "scorePairs needs at least one field rule")
    val totalW = stringCols.map(_._2).sum + exactCols.map(_._2).sum +
      numericCols.map(_._2).sum
    require(totalW > 0, "scorePairs needs positive total weight")
    val slim = records.select((idCol +: fields).map(col): _*)
    def side(sfx: String) =
      slim.select(slim.columns.map(c => col(c).as(s"${c}_$sfx")): _*)
    // join on frame-qualified columns and drop the side ids immediately:
    // when idCol is literally "id", the renamed side column "id_a" has the
    // same NAME as the candidate frame's pair column — qualification keeps
    // the condition unambiguous and the drop restores name uniqueness
    val cand = candidates.select("id_a", "id_b")
    val aSide = side("a")
    val bSide = side("b")
    val joined = cand
      .join(aSide, cand("id_a") === aSide(s"${idCol}_a"))
      .drop(aSide(s"${idCol}_a"))
      .join(bSide, cand("id_b") === bSide(s"${idCol}_b"))
      .drop(bSide(s"${idCol}_b"))

    def nullRuled(c: String)(sim: Column): Column =
      when(col(s"${c}_a").isNull && col(s"${c}_b").isNull, lit(1.0))
        .when(col(s"${c}_a").isNull || col(s"${c}_b").isNull, lit(0.0))
        .otherwise(sim)

    val simExprs: Seq[(String, Column, Double)] =
      stringCols.map { case (c, w) =>
        val g = greatest(length(col(s"${c}_a")), length(col(s"${c}_b")))
        val sim = nullRuled(c)(when(g === 0, lit(1.0)).otherwise(
          lit(1.0) - levenshtein(col(s"${c}_a"), col(s"${c}_b"))
            .cast("double") / g))
        (s"sim_$c", sim, w)
      } ++ exactCols.map { case (c, w) =>
        (s"eq_$c", when(col(s"${c}_a") <=> col(s"${c}_b"), lit(1.0))
          .otherwise(lit(0.0)), w)
      } ++ numericCols.map { case (c, w, scale) =>
        require(scale > 0, s"numeric scale for $c must be > 0")
        val sim = nullRuled(c)(greatest(lit(0.0),
          lit(1.0) - abs(col(s"${c}_a") - col(s"${c}_b")) / scale))
        (s"num_$c", sim, w)
      }
    val score = simExprs.map { case (_, c, w) => c * w }.reduce(_ + _) / totalW
    joined.select(
      col("id_a") +: col("id_b") +:
        simExprs.map { case (n, c, _) => c.as(n) } :+ score.as("score"): _*)
  }

  /** [[scorePairs]] filtered to `score >= threshold` — the match set. */
  def matches(records: DataFrame, candidates: DataFrame, idCol: String,
              threshold: Double,
              stringCols: Seq[(String, Double)] = Seq.empty,
              exactCols: Seq[(String, Double)] = Seq.empty,
              numericCols: Seq[(String, Double, Double)] = Seq.empty): DataFrame =
    scorePairs(records, candidates, idCol, stringCols, exactCols, numericCols)
      .filter(col("score") >= threshold)

  /**
   * Transitive entity assignment: match pairs → min-label connected
   * components ([[Dedup.clusterPairs]] — the same CC that serves the
   * document near-dup family) → every record keyed by its `entity_id`
   * (its own id when unmatched). Left join against the label frame,
   * which at scale is the already-materialized match stage.
   */
  def entities(records: DataFrame, matchPairs: DataFrame,
               idCol: String, maxIter: Int = 50): DataFrame = {
    // min-label propagation needs DIAMETER rounds, and ER match graphs
    // chain (consecutive near-identical records each matching the next)
    // far longer than near-dup document clusters do — hence a higher
    // ceiling than the document family's default 20
    val labels = Dedup.clusterPairs(matchPairs, "id_a", "id_b", maxIter)
      .withColumnRenamed("id", idCol)
    records.join(labels, Seq(idCol), "left")
      .withColumn("entity_id", coalesce(col("cluster_id"), col(idCol)))
      .drop("cluster_id")
  }

  /** Entity-size profile: `(entity_size, n_entities, n_records)` —
   * the one-page answer to "how much identity collapse did ER find".
   * Two partial-agg'd shuffles over id-sized rows. */
  def entityProfile(records: DataFrame, matchPairs: DataFrame,
                    idCol: String, maxIter: Int = 50): DataFrame =
    entityProfileOf(entities(records, matchPairs, idCol, maxIter))

  /** The profile rollup alone, for callers that already hold (and maybe
   * share) an [[entities]] labeling — two partial-agg'd shuffles over
   * id-sized rows, no CC loop re-paid. */
  def entityProfileOf(entities: DataFrame): DataFrame =
    entities
      .groupBy("entity_id").agg(count(lit(1)).as("entity_size"))
      .groupBy("entity_size").agg(
        count(lit(1)).as("n_entities"),
        sum("entity_size").as("n_records"))

  /**
   * Pairwise CLUSTER-AGREEMENT metrics between two labelings of the
   * same records — the ER evaluation harness (predicted entities vs a
   * gold standard, or two candidate-generation strategies against each
   * other), and a general clustering comparator (dedup clusters vs
   * truth works identically). Uses the contingency identity so NO pair
   * set is ever materialized: with n_ij = |A_i ∩ B_j|,
   * shared pairs = Σ_ij C(n_ij, 2), A's pairs = Σ_i C(|A_i|, 2),
   * B's = Σ_j C(|B_j|, 2); precision = shared/A, recall = shared/B
   * (reading A as prediction and B as truth), F1 harmonic. One id-equi
   * join + one partial-agg'd contingency groupBy + 1-row rollups —
   * the pair-level numbers of an O(n²) comparison at O(n) cost, which
   * is the only way to score ER output at 100 TB.
   *
   * Records missing from either labeling drop (inner join — evaluate
   * on the common id set); zero-pair sides yield NULL ratios rather
   * than a divide-by-zero.
   */
  def clusterAgreement(a: DataFrame, b: DataFrame, idCol: String,
                       aLblCol: String = "entity_id",
                       bLblCol: String = "entity_id"): DataFrame = {
    val j = a.select(col(idCol), col(aLblCol).as("_la"))
      .join(b.select(col(idCol), col(bLblCol).as("_lb")), idCol)
    val cont = j.groupBy("_la", "_lb").agg(count(lit(1)).as("n"))
    def c2(c: Column): Column = (c * (c - 1) / 2).cast("long")
    val tp = cont.agg(sum(c2(col("n"))).as("shared_pairs"),
      sum(col("n")).as("n_ids"))
    val ap = cont.groupBy("_la").agg(sum("n").as("n"))
      .agg(sum(c2(col("n"))).as("a_pairs"))
    val bp = cont.groupBy("_lb").agg(sum("n").as("n"))
      .agg(sum(c2(col("n"))).as("b_pairs"))
    def ratio(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den).otherwise(lit(null))
    tp.crossJoin(ap).crossJoin(bp)
      .withColumn("precision", ratio(col("shared_pairs"), col("a_pairs")))
      .withColumn("recall", ratio(col("shared_pairs"), col("b_pairs")))
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull &&
          col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall")
            / (col("precision") + col("recall")))
          .otherwise(lit(null)))
  }

  /**
   * Fellegi–Sunter EM weight ESTIMATION — the principled way to set the
   * [[scorePairs]] weights instead of guessing them: from UNLABELED
   * candidate pairs with per-field boolean agreement columns, estimate
   * each field's m = P(agree | match) and u = P(agree | non-match) plus
   * the match prior p, by EM over the two-class naive-Bayes mixture
   * (Fellegi–Sunter 1969; Winkler's EM formulation).
   *
   * Per iteration: the E-step posterior w(pair) = p·Πf(γf ? mf : 1−mf)
   * over the mixture is ONE map-side expression (products in field
   * declaration order), the M-step is ONE partial-agg'd aggregation to
   * a single driver row (2+2·F doubles — model-artifact scale, the
   * kmeansCentroids collect discipline); the next iteration embeds the
   * updated parameters as plan literals. `iters` is small and fixed
   * (default 2) so an external engine replays the whole estimation as a
   * chained CTE.
   *
   * Output: one row per field — `(field, m, u, w_agree, w_disagree,
   * prior)` where w_agree = log2(m/u) and w_disagree =
   * log2((1−m)/(1−u)) are the classic agreement/disagreement log-odds
   * weights (feed them back as a [[scorePairs]]-style linear rule, or
   * threshold Σ per-pair weights directly). Empty input returns the
   * init parameters unchanged (nothing to learn ≠ a crash).
   */
  def emWeights(agreements: DataFrame, fieldCols: Seq[String],
                iters: Int = 2, initM: Double = 0.9, initU: Double = 0.1,
                initP: Double = 0.1): DataFrame = {
    require(fieldCols.nonEmpty, "emWeights needs at least one field column")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(initM > 0 && initM < 1 && initU > 0 && initU < 1 &&
      initP > 0 && initP < 1, "init parameters must lie strictly in (0,1)")
    val spark = agreements.sparkSession
    // each EM iteration runs ONE aggregation over the agreement frame —
    // which upstream is typically a full scorePairs over millions of
    // candidates (levenshtein et al.). Persist the boolean projection
    // once (F bits per pair) so the expensive scoring is paid once, not
    // once per iteration (q_er_em at the sf1 tier: 2 scoring passes → 1).
    val agr = graft.CacheScope.persist(
      agreements.select(fieldCols.map(col): _*))
    var m = fieldCols.map(_ => initM)
    var u = fieldCols.map(_ => initU)
    var p = initP
    for (_ <- 1 to iters) {
      val pm = fieldCols.zip(m).map { case (f, mf) =>
        when(col(f), lit(mf)).otherwise(lit(1.0 - mf)) }.reduce(_ * _)
      val pu = fieldCols.zip(u).map { case (f, uf) =>
        when(col(f), lit(uf)).otherwise(lit(1.0 - uf)) }.reduce(_ * _)
      val w = lit(p) * pm / (lit(p) * pm + lit(1.0 - p) * pu)
      val aggs =
        sum(w).as("sw") +: count(lit(1)).as("n") +:
          fieldCols.flatMap(f => Seq(
            sum(when(col(f), w).otherwise(lit(0.0))).as(s"ma_$f"),
            sum(when(col(f), lit(1.0) - w).otherwise(lit(0.0))).as(s"ua_$f")))
      val r = agr.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getAs[Long]("n")
      if (n > 0) {
        val sw = r.getAs[Double]("sw")
        val swn = n - sw
        // a degenerate posterior (all-match or all-non-match) would zero a
        // denominator; freeze that side's parameters instead of NaN-ing
        if (sw > 0) m = fieldCols.map(f => r.getAs[Double](s"ma_$f") / sw)
        if (swn > 0) u = fieldCols.map(f => r.getAs[Double](s"ua_$f") / swn)
        p = sw / n
      }
    }
    import scala.jdk.CollectionConverters._
    val rows = fieldCols.indices.map { i =>
      org.apache.spark.sql.Row(fieldCols(i), m(i), u(i),
        math.log(m(i) / u(i)) / math.log(2.0),
        math.log((1.0 - m(i)) / (1.0 - u(i))) / math.log(2.0), p)
    }
    spark.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(
      Seq("field" -> "string", "m" -> "double", "u" -> "double",
        "w_agree" -> "double", "w_disagree" -> "double", "prior" -> "double")
        .map { case (nm, tp) => org.apache.spark.sql.types.StructField(nm,
          org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(tp)) }))
  }
}
