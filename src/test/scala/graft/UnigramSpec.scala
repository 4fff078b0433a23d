package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/**
 * Unigram-LM tokenizer training ≡ the sequential reference: same seed
 * vocabulary, same hard-EM piece counts, same lexicographic-fold
 * M-step, same pruning schedule, same final Viterbi — piece for piece
 * and logp for logp. Plus the encode parity / losslessness gates and
 * the fertility comparison against BPE the q_fertility frame asks for.
 */
class UnigramSpec extends SparkSpecBase {
  import spark.implicits._

  /** Sequential replay of learnUnigram (shares Bpe.viterbiSegment — the
    * algorithm under test is the DISTRIBUTED plumbing around it). */
  private def reference(corpus: Seq[(Long, String)], targetVocab: Int,
                        maxPieceLen: Int, emRounds: Int, pruneFrac: Double,
                        minCount: Long)
      : (Seq[(String, Long, Double)], Map[Long, Seq[String]]) = {
    val docs = corpus.map { case (id, t) => id -> t.split(" ", -1).toIndexedSeq }
    val raw = scala.collection.mutable.Map[(String, Int), Long]()
    for ((_, toks) <- docs; len <- 1 to maxPieceLen;
         i <- 0 to toks.length - len) {
      val p = toks.slice(i, i + len).mkString(" ")
      raw((p, len)) = raw.getOrElse((p, len), 0L) + 1
    }
    val singles = raw.collect { case ((p, 1), c) => p -> c }.toMap
    val multis = raw.collect { case ((p, l), c) if l > 1 && c >= minCount => p -> c }
    var counts = scala.collection.immutable.SortedMap[String, Long]() ++
      singles ++ multis
    val singleSet = singles.keySet

    def logProbs(c: scala.collection.immutable.SortedMap[String, Long]) = {
      val sm = c.map { case (p, n) =>
        p -> (if (n == 0 && singleSet(p)) 0.5 else n.toDouble) }
      val total = sm.values.foldLeft(0.0)(_ + _)
      sm.map { case (p, x) =>
        p -> (if (x == 0.0) Double.NegativeInfinity
              else math.log(x) - math.log(total)) }.toMap
    }
    def emBlock(): Unit = for (_ <- 1 to emRounds) {
      val lp = logProbs(counts)
      val seg = scala.collection.mutable.Map[String, Long]()
      docs.foreach { case (_, toks) =>
        Bpe.viterbiSegment(toks, lp, maxPieceLen, -1e9)
          .foreach(p => seg(p) = seg.getOrElse(p, 0L) + 1) }
      counts = counts.map { case (p, _) => p -> seg.getOrElse(p, 0L) }
    }
    var guard = 0
    while (counts.size > targetVocab && guard < 1000) {
      guard += 1
      emBlock()
      val nDrop = math.min(math.ceil(counts.size * pruneFrac).toInt,
        counts.size - targetVocab)
      val doomed = counts.toSeq.filterNot { case (p, _) => singleSet(p) }
        .sortBy { case (p, n) => (n, p) }.take(nDrop).map(_._1)
      counts = counts -- doomed
      if (doomed.isEmpty) guard = 1000
    }
    emBlock()
    val lp = logProbs(counts)
    val maxLen = if (counts.isEmpty) 1
      else counts.keysIterator.map(_.count(_ == ' ') + 1).max
    val finite = lp.values.filter(_ > Double.NegativeInfinity)
    val unk = if (finite.isEmpty) -1e9 else finite.min - 10.0
    val toked = docs.map { case (id, toks) =>
      id -> Bpe.viterbiSegment(toks, lp, maxLen, unk) }.toMap
    (counts.toSeq.map { case (p, n) => (p, n, lp(p)) }, toked)
  }

  private val corpus = Seq(
    1L -> "new york city is big and new york city is loud",
    2L -> "i love new york city and new york pizza",
    3L -> "the city is big the city is old",
    4L -> "pizza in new york is big",
    5L -> "old and loud and big")

  test("learnUnigram ≡ the sequential reference: pieces, counts, logps, tokenization") {
    val df = corpus.toDF("doc_id", "text")
    val (piecesDf, tokedDf) = Bpe.learnUnigram(df, "doc_id", "text",
      targetVocab = 20, maxPieceLen = 3, emRounds = 2, pruneFrac = 0.3)
    val gotPieces = piecesDf.as[(String, Long, Double)].collect().toSeq
      .sortBy(_._1)
    val gotToked = tokedDf.as[(Long, Seq[String])].collect().toMap
    val (wantPieces, wantToked) = reference(corpus, 20, 3, 2, 0.3, 2L)
    assert(gotPieces === wantPieces.sortBy(_._1))
    assert(gotToked === wantToked)
    // the point of the exercise: multi-token pieces survive training
    assert(gotPieces.exists { case (p, n, _) => p == "new york city" && n > 0 },
      s"the repeated phrase must become a piece: $gotPieces")
  }

  test("encodeUnigram reproduces training tokenization; segmentation is lossless; held-out UNK is deterministic") {
    val df = corpus.toDF("doc_id", "text")
    val (piecesDf, tokedDf) = Bpe.learnUnigram(df, "doc_id", "text",
      targetVocab = 20, maxPieceLen = 3, emRounds = 2, pruneFrac = 0.3)
    val re = Bpe.encodeUnigram(df, "doc_id", "text", piecesDf)
      .as[(Long, Seq[String])].collect().toMap
    assert(re === tokedDf.as[(Long, Seq[String])].collect().toMap)
    // lossless: pieces re-concatenate to the original token stream
    corpus.foreach { case (id, t) =>
      assert(re(id).mkString(" ") === t, s"doc $id lost tokens") }
    // held-out doc with an unseen token still segments, deterministically
    val held = Seq(9L -> "new york city has zzz pizza").toDF("doc_id", "text")
    val h1 = Bpe.encodeUnigram(held, "doc_id", "text", piecesDf)
      .as[(Long, Seq[String])].head()
    assert(h1._2.mkString(" ") === "new york city has zzz pizza")
    assert(h1._2.contains("new york city"), s"held-out: ${h1._2}")
  }

  test("fertility: unigram-LM undercuts BPE at a comparable extra-piece budget") {
    val df = corpus.toDF("doc_id", "text")
    def fert(toked: Map[Long, Seq[String]]): Double = {
      val pieces = toked.values.map(_.size).sum.toDouble
      val words = corpus.map(_._2.split(" ", -1).length).sum.toDouble
      pieces / words
    }
    val nSingles = corpus.flatMap(_._2.split(" ", -1)).distinct.size
    val (_, uniToked) = Bpe.learnUnigram(df, "doc_id", "text",
      targetVocab = nSingles + 6, maxPieceLen = 3, emRounds = 2,
      pruneFrac = 0.3)
    val (_, bpeToked) = Bpe.learn(df, "doc_id", "text", numMerges = 6)
    val (fu, fb) = (
      fert(uniToked.as[(Long, Seq[String])].collect().toMap),
      fert(bpeToked.select(col("id"), col("syms")).as[(Long, Seq[String])]
        .collect().toMap))
    info(s"fertility: unigram $fu vs BPE $fb (1.0 = no grouping)")
    assert(fu < 1.0, "unigram must actually group tokens")
    assert(fu <= fb + 1e-12,
      s"Viterbi-global unigram should not lose to greedy BPE here: $fu vs $fb")
  }
}
