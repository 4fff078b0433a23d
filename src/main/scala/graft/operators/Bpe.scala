package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BPE merge-rule learning (Sennrich et al., ACL'16) over a distributed
 * corpus — the tokenizer-training half of a training-data pipeline
 * (vocabulary/fertility profiling already lives in [[Text]]; this
 * learns the merges those profiles evaluate).
 *
 * Word-level formulation: symbols start as whitespace tokens and each
 * round merges the globally most frequent ADJACENT symbol pair
 * (ties: lexicographically smallest pair — deterministic cross-run),
 * applying it left-to-right non-overlapping, exactly the reference
 * greedy algorithm.
 *
 * Scale shape per round: adjacent-pair counting is one partial-agg'd
 * groupBy over ~|corpus tokens| rows; the winning pair is a 1-row
 * `limit(1)` collect (the learned rule IS a scalar — this is model
 * fitting, not a data path); the merge itself is a map-only fold over
 * each document's symbol array. N merges = N rounds, the same
 * iterate-with-lineage-cut discipline as PageRank/k-means here
 * ([[Analytics.pageRank]], [[Similarity.kmeans]]). A merged symbol is
 * the space-join of its parts, so merging composes across rounds and
 * the final symbols read back as token n-grams.
 */
object Bpe {

  /** Left-to-right non-overlapping single-pair merge of a symbol array:
   * fold that replaces a trailing `l` followed by the current `r` with
   * the joined symbol — "a a a" under (a,a) becomes ["a a", "a"], the
   * BPE rule. `try_element_at` keeps the empty-accumulator probe
   * null-safe under ANSI. */
  def mergePair(syms: Column, l: String, r: String): Column = {
    val merged = l + " " + r
    aggregate(syms, array().cast("array<string>"), (acc, t) =>
      when(try_element_at(acc, lit(-1)) === lit(l) && t === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(t))))
  }

  /**
   * Learn `numMerges` merge rules. Returns
   * `(merges, tokenized)`: merges = one row per learned rule
   * `(step, left, right, pair_count)` in learning order; tokenized =
   * `(id, syms)` — every document's symbol array after all merges.
   * Stops early when no pair reaches `minCount`.
   */
  def learn(docs: DataFrame, idCol: String, textCol: String,
            numMerges: Int, minCount: Long = 2L): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    var syms = graft.CacheScope.persist(
      docs.filter(col(textCol).isNotNull)
        .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("syms")))
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val best = syms
        .select(explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect() // 1 row: the round's learned rule
      if (best.isEmpty || best.head.getLong(2) < minCount) done = true
      else {
        val (l, r, c) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        learned += ((step, l, r, c))
        // eager localCheckpoint: cuts the per-round HOF lineage AND
        // materializes the round (3^N plan growth otherwise)
        val next = syms.withColumn("syms", mergePair(col("syms"), l, r))
          .localCheckpoint(true)
        syms.unpersist(false)
        syms = next
        step += 1
      }
    }
    (learned.toSeq.toDF("step", "left", "right", "pair_count"), syms)
  }

  /**
   * ENCODE a corpus with an already-learned merge table — the tokenizer
   * APPLICATION half ([[learn]] is training): every production pipeline
   * trains merges once on a sample and then encodes 100 TB of text with
   * the frozen rules, so this path must be map-only and rule-count-
   * independent in plan size.
   *
   * The merge table is a MODEL ARTIFACT (bounded: a real tokenizer
   * learns ~32k rules ≈ a few MB), so it collects once to the driver and
   * broadcasts — the same scalar/model treatment as PQ codebooks and
   * k-means centroids, not a data-path collect. Application is
   * `mapPartitions` BY NECESSITY, argued like the image codec: N rules
   * as chained Catalyst HOF folds would build an O(N)-deep plan (the
   * 3^N lineage problem [[learn]] cuts per round), while here one
   * imperative pass per document applies all rules.
   *
   * Per doc the encoder applies rules IN LEARNED ORDER, each
   * left-to-right non-overlapping — definitionally [[learn]]'s own
   * application, so encoding the training corpus reproduces `learn`'s
   * tokenized output EXACTLY (the BpeSpec parity gate). This sequential
   * order is also equivalent to the lowest-rank-first priority rule HF
   * tokenizers use: a merge can only create adjacencies involving its
   * NEW symbol, and a rule whose side equals that symbol string was
   * necessarily learned later, so applying rule k never creates an
   * occurrence of rule j < k. A per-doc symbol-presence set skips the
   * (vast majority of) rules whose parts aren't in the doc in O(1)
   * without scanning the symbol array.
   *
   * Null text encodes like [[learn]] treats it: dropped.
   */
  /** Viterbi-best segmentation of a token sequence under piece
   * log-probs: dp over positions with `maxLen` lookback, transitions
   * scored dp(j) + logp(piece). STRICT improvement keeps the smallest
   * j — the LONGEST piece — on exact score ties, so the segmentation
   * is a pure function of (tokens, table). Unknown SINGLE tokens score
   * `unkLogp` (encode-time fallback; during training every single is
   * in the vocabulary); unknown longer spans are not pieces. Shared by
   * the distributed E-step, the encoder, and the spec's sequential
   * reference — one definition, zero drift. */
  def viterbiSegment(tokens: IndexedSeq[String],
                     logp: scala.collection.Map[String, Double],
                     maxLen: Int, unkLogp: Double): Seq[String] = {
    val n = tokens.length
    if (n == 0) return Seq.empty
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    val bp = new Array[String](n + 1)
    dp(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (dp(j) > Double.NegativeInfinity) {
          val piece = tokens.slice(j, i).mkString(" ")
          val lp = logp.get(piece) match {
            case Some(x) => x
            case None => if (i - j == 1) unkLogp else Double.NegativeInfinity
          }
          val cand = dp(j) + lp
          if (cand > dp(i)) { dp(i) = cand; back(i) = j; bp(i) = piece }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var pos = n
    while (pos > 0) { out += bp(pos); pos = back(pos) }
    out.reverse.toSeq
  }

  /**
   * Unigram-LM tokenizer training (Kudo, ACL'18 — the SentencePiece
   * algorithm actually shipped by the T5/LLaMA-family pipelines, where
   * [[learn]] is the GPT-2-family BPE): pieces carry PROBABILITIES and
   * a text's tokenization is the Viterbi-most-probable segmentation,
   * not a replay of greedy merges. Word-level formulation like the BPE
   * half: "characters" are whitespace tokens, pieces are token n-grams.
   *
   * The [[learn]] discipline throughout — bounded rounds, partial-agg
   * counts, model-artifact collects:
   *  1. SEED: every token n-gram of length ≤ `maxPieceLen` with
   *     count ≥ `minCount`, plus ALL single tokens (segmentability
   *     guarantee) — one explode + partial-agg'd groupBy, top-`maxSeed`
   *     halves by (count desc, piece asc) collected as the initial
   *     model;
   *  2. EM (hard/Viterbi variant, deterministic): E-step re-segments
   *     the corpus under the current log-probs — map-only with the
   *     broadcast table — and partial-aggs piece counts (vocab-bounded
   *     collect); M-step recomputes logp = ln c − ln Σc on the driver,
   *     folding the total in lexicographic piece order (one defined
   *     summation order = one reproducible double). Single tokens
   *     Viterbi may orphan (always covered by longer pieces) smooth to
   *     count 0.5 — they must survive as fallbacks, never at −∞;
   *  3. PRUNE schedule: after each `emRounds` block, drop the
   *     lowest-expected-count non-single pieces — min(⌈pruneFrac·|V|⌉,
   *     |V|−targetVocab) of them, ties (count asc, piece asc) — until
   *     the vocabulary fits `targetVocab`, then one final EM block.
   *
   * Returns (pieces = (piece, cnt, logp) in lexicographic order,
   * tokenized = (id, syms) — the corpus under the final Viterbi).
   * Every tie anywhere breaks lexicographically, so the result is a
   * pure function of the corpus (the BpeSpec/driver-reference gate).
   */
  def learnUnigram(docs: DataFrame, idCol: String, textCol: String,
                   targetVocab: Int, maxPieceLen: Int = 4,
                   emRounds: Int = 2, pruneFrac: Double = 0.2,
                   minCount: Long = 2L, maxSeed: Int = 1 << 20)
      : (DataFrame, DataFrame) = {
    require(targetVocab >= 1 && maxPieceLen >= 1 && emRounds >= 1,
      "learnUnigram needs targetVocab/maxPieceLen/emRounds >= 1")
    require(pruneFrac > 0 && pruneFrac < 1, "pruneFrac in (0,1)")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = graft.CacheScope.persist(
      docs.filter(col(textCol).isNotNull)
        .select(col(idCol).cast("long").as("id"),
          Text.tokens(col(textCol)).as("syms")))

    // seed n-gram counts, one pass: (piece, len) exploded per doc
    val gramCounts = toks.select(explode(flatten(
        transform(sequence(lit(1), lit(maxPieceLen)), len =>
          when(size(col("syms")) >= len,
            transform(sequence(lit(1), size(col("syms")) - len + 1),
              i => struct(array_join(slice(col("syms"), i, len), " ").as("p"),
                len.as("len"))))
            .otherwise(array().cast("array<struct<p:string,len:int>>"))))).as("g"))
      .groupBy(col("g.p").as("piece"), col("g.len").as("len"))
      .agg(count(lit(1)).as("cnt"))
    val singles = gramCounts.filter(col("len") === 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(maxSeed / 2)
      .select("piece", "cnt").as[(String, Long)].collect()
    val multis = gramCounts.filter(col("len") > 1 && col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("piece").asc).limit(maxSeed / 2)
      .select("piece", "cnt").as[(String, Long)].collect()
    val singleSet = singles.map(_._1).toSet
    var counts = scala.collection.immutable.SortedMap[String, Long]() ++
      singles ++ multis

    // M-step: logp from counts, singles smoothed to 0.5 when orphaned;
    // the total folds in the SortedMap's lexicographic order
    def logProbs(c: scala.collection.immutable.SortedMap[String, Long])
        : Map[String, Double] = {
      val smoothed = c.map { case (p, n) =>
        p -> (if (n == 0 && singleSet(p)) 0.5 else n.toDouble)
      }
      val total = smoothed.values.foldLeft(0.0)(_ + _)
      smoothed.map { case (p, x) =>
        p -> (if (x == 0.0) Double.NegativeInfinity
              else math.log(x) - math.log(total))
      }.toMap
    }

    def emBlock(): Unit = {
      for (_ <- 1 to emRounds) {
        val bV = spark.sparkContext.broadcast(logProbs(counts))
        val seg = toks.as[(Long, Seq[String])].mapPartitions { it =>
          val lp = bV.value
          it.flatMap { case (_, syms) =>
            // finite UNK floor: singles past the maxSeed cap must still
            // segment (their counts fall outside the model and are
            // simply not collected); −∞ would leave dp unreachable.
            // lp's key set IS the model vocabulary, so the map-side
            // semi-filter bounds the groupBy/collect by |V| (UNK
            // singles Viterbi emits past the maxSeed cap never reach
            // the driver — counts.getOrElse discarded them anyway)
            viterbiSegment(syms.toIndexedSeq, lp, maxPieceLen, -1e9)
              .filter(lp.contains) }
        }.toDF("piece").groupBy("piece").agg(count(lit(1)).as("cnt"))
          .as[(String, Long)].collect().toMap
        counts = counts.map { case (p, _) => p -> seg.getOrElse(p, 0L) }
      }
    }

    var guard = 0
    while (counts.size > targetVocab && guard < 1000) {
      guard += 1
      emBlock()
      val nDrop = math.min(
        math.ceil(counts.size * pruneFrac).toInt,
        counts.size - targetVocab)
      val doomed = counts.toSeq.filterNot { case (p, _) => singleSet(p) }
        .sortBy { case (p, n) => (n, p) }.take(nDrop).map(_._1)
      counts = counts -- doomed
      // all multis gone but still above target: singles are never
      // pruned (segmentability), so the loop must stop
      if (doomed.isEmpty) guard = 1000
    }
    emBlock()

    val finalLp = logProbs(counts)
    val pieces = counts.toSeq.map { case (p, n) => (p, n, finalLp(p)) }
      .toDF("piece", "cnt", "logp")
    (pieces, encodeUnigram(docs, idCol, textCol, pieces))
  }

  /**
   * ENCODE with a frozen unigram-LM piece table — [[encode]]'s twin for
   * [[learnUnigram]]: the table is a model artifact (collect +
   * broadcast), application is one map-only Viterbi per document, plan
   * size independent of vocabulary. Tokens outside the vocabulary fall
   * back to an UNK score of (min finite logp − 10) — any segmentation
   * avoiding them wins, but coverage gaps still segment
   * deterministically. Encoding the training corpus reproduces
   * [[learnUnigram]]'s own tokenized output exactly (same Viterbi, same
   * table).
   */
  def encodeUnigram(docs: DataFrame, idCol: String, textCol: String,
                    pieces: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val table = pieces.select(col("piece").cast("string"),
        col("logp").cast("double"))
      .as[(String, Double)].collect().toMap // model artifact: bounded
    val maxLen = if (table.isEmpty) 1
      else table.keysIterator.map(_.count(_ == ' ') + 1).max
    val finite = table.valuesIterator.filter(_ > Double.NegativeInfinity)
    val unk = if (finite.isEmpty) -1e9 else finite.min - 10.0
    val bV = spark.sparkContext.broadcast(table)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val lp = bV.value
        it.map { case (id, text) =>
          (id, viterbiSegment(text.split(" ", -1).toIndexedSeq, lp,
            maxLen, unk))
        }
      }.toDF("id", "syms")
  }

  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rules = merges.select(col("step").cast("int"),
        col("left").cast("string"), col("right").cast("string"))
      .as[(Int, String, String)].collect().sortBy(_._1)
      .map { case (_, l, r) => (l, r) } // model artifact: bounded, ordered
    val bRules = spark.sparkContext.broadcast(rules)
    val in = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
    in.mapPartitions { it =>
      val rs = bRules.value
      it.map { case (id, text) =>
        // split(text, " ") keeps ALL empty strings (java regex, limit -1)
        var syms = text.split(" ", -1).toIndexedSeq
        val present = scala.collection.mutable.HashSet.empty[String]
        syms.foreach(present += _)
        rs.foreach { case (l, r) =>
          if (present.contains(l) && present.contains(r)) {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var merged = false
            syms.foreach { t =>
              if (out.nonEmpty && out.last == l && t == r) {
                out.remove(out.length - 1)
                out += (l + " " + r)
                merged = true
              } else out += t
            }
            if (merged) {
              syms = out.toIndexedSeq
              present += (l + " " + r)
              // l/r may still occur elsewhere; the set is a SUPERSET
              // filter (false positives cost one scan, never wrongness)
            }
          }
        }
        (id, syms.toSeq)
      }
    }.toDF("id", "syms")
  }
}
