package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/**
 * BPE merge learning ≡ the reference greedy algorithm run on the
 * driver: same merge sequence (max count, lexicographic tie-break),
 * same left-to-right non-overlapping application, same final symbol
 * arrays — including the "a a a" overlap rule and early stop.
 */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference learner: plain Scala on collected token lists. */
  private def reference(corpus: Seq[Seq[String]], numMerges: Int,
                        minCount: Long)
      : (Seq[(Int, String, String, Long)], Seq[Seq[String]]) = {
    var docs = corpus
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      docs.foreach(d => d.indices.dropRight(1).foreach { i =>
        counts((d(i), d(i + 1))) = counts.getOrElse((d(i), d(i + 1)), 0L) + 1
      })
      val best = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minCount =>
          merges += ((step, l, r, c))
          val joined = l + " " + r
          docs = docs.map { d =>
            val out = scala.collection.mutable.ArrayBuffer[String]()
            d.foreach { t =>
              if (out.nonEmpty && out.last == l && t == r) {
                out.remove(out.length - 1); out += joined
              } else out += t
            }
            out.toSeq
          }
          step += 1
        case _ => done = true
      }
    }
    (merges.toSeq, docs)
  }

  test("learned merges and final symbols equal the reference greedy fold") {
    val texts = Seq(
      "the cat sat on the mat",
      "the cat ate the cat food",
      "a a a a a b a a",          // overlap rule: "a a" merges pair-wise
      "on the mat the cat sat",
      "x")                        // single-token doc: no pairs
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (mergesDf, symsDf) = Bpe.learn(df, "doc_id", "text", numMerges = 6)

    val got = mergesDf.as[(Int, String, String, Long)].collect().toSeq
      .sortBy(_._1)
    val (want, wantDocs) = reference(texts.map(_.split(" ").toSeq), 6, 2L)
    assert(got === want, s"merge sequence diverged:\n got: $got\nwant: $want")
    assert(got.nonEmpty, "fixture learned no merges — gate is vacuous")

    val gotDocs = symsDf.orderBy("id").as[(Long, Seq[String])].collect()
      .map(_._2).toSeq
    assert(gotDocs === wantDocs, s"final symbols diverged:\n$gotDocs\n$wantDocs")

    // the overlap doc must have merged pair-wise, not greedily re-merged
    val aDoc = gotDocs(2)
    assert(aDoc.count(_ == "a a") >= 2 || aDoc.contains("a a a a"),
      s"overlap rule visibly wrong: $aDoc")
  }

  /** Reference encoder: apply a learned merge list sequentially,
   * left-to-right non-overlapping — learn's own application rule. */
  private def refEncode(doc: Seq[String],
                        merges: Seq[(String, String)]): Seq[String] = {
    var d = doc
    merges.foreach { case (l, r) =>
      val out = scala.collection.mutable.ArrayBuffer[String]()
      d.foreach { t =>
        if (out.nonEmpty && out.last == l && t == r) {
          out.remove(out.length - 1); out += (l + " " + r)
        } else out += t
      }
      d = out.toSeq
    }
    d
  }

  test("encode with the learned table reproduces learn's own tokenized corpus") {
    val texts = Seq(
      "the cat sat on the mat",
      "the cat ate the cat food",
      "a a a a a b a a",
      "on the mat the cat sat",
      "x")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (mergesDf, symsDf) = Bpe.learn(df, "doc_id", "text", numMerges = 6)
    val want = symsDf.orderBy("id").as[(Long, Seq[String])].collect().toSeq
    val got = Bpe.encode(df, "doc_id", "text", mergesDf)
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq
    assert(got === want,
      "encode(training corpus, learned rules) must equal learn's output")
  }

  test("encode on held-out docs equals the reference application; lossless") {
    val train = Seq(
      "the cat sat on the mat",
      "the cat ate the cat food",
      "on the mat the cat sat")
    val trainDf = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (mergesDf, _) = Bpe.learn(trainDf, "doc_id", "text", numMerges = 5)
    val rules = mergesDf.orderBy("step")
      .as[(Int, String, String, Long)].collect().toSeq
      .map { case (_, l, r, _) => (l, r) }
    assert(rules.nonEmpty, "fixture learned no rules — held-out gate vacuous")

    val heldOut = Seq(
      "the cat sat the cat sat",   // dense in learned pairs
      "mat on cat the",            // symbols present, few adjacencies
      "zebra unknown tokens only", // nothing learned applies
      "the cat")                   // exactly one learned pair
    val hoDf = heldOut.zipWithIndex.map { case (t, i) => (100L + i, t) }
      .toDF("doc_id", "text")
    val got = Bpe.encode(hoDf, "doc_id", "text", mergesDf)
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq
    val want = heldOut.zipWithIndex.map { case (t, i) =>
      (100L + i, refEncode(t.split(" ", -1).toSeq, rules))
    }
    assert(got === want, s"held-out encode diverged:\n got: $got\nwant: $want")

    // losslessness: splitting every symbol back on spaces recovers the
    // original whitespace token stream
    got.zip(heldOut).foreach { case ((_, syms), text) =>
      assert(syms.flatMap(_.split(" ", -1)) === text.split(" ", -1).toSeq,
        s"encode lost tokens for '$text'")
    }
  }

  test("early stop: no pair at minCount ends learning") {
    val df = Seq((1L, "p q r"), (2L, "s t u")).toDF("doc_id", "text")
    val (merges, _) = Bpe.learn(df, "doc_id", "text", numMerges = 4)
    assert(merges.isEmpty, "all pairs are hapax — nothing should be learned")
  }
}
