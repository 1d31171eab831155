package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Text-analysis kernels whose gate queries pin the corpus-level shape;
  * these cases pin the local edge semantics. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfTopTerms: ubiquitous terms score tf·1, rare terms rank first") {
    val docs = Seq(
      (1L, "shared shared rare1"),
      (2L, "shared unique2"),
      (3L, "shared filler filler")).toDF("doc_id", "text")
    val got = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, Int, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // "shared" appears in all 3 docs: idf = ln(4/4) + 1 = 1 → score = tf
    val sharedRow = got(2L).find(_._3 == "shared").get
    assert(math.abs(sharedRow._4 - 1.0) < 1e-12, sharedRow)
    // doc 1: "rare1" (df=1, idf = ln(4/2)+1 ≈ 1.693) outranks
    // "shared" (tf=2, score 2.0)? no — 2.0 > 1.693: shared first, rare1 second
    assert(got(1L).map(_._3).toSeq == Seq("shared", "rare1"), got(1L).toSeq)
    // doc 2: unique2 (≈1.693) outranks shared (1.0)
    assert(got(2L).map(_._3).toSeq == Seq("unique2", "shared"), got(2L).toSeq)
    // doc 3: filler tf=2 · 1.693 outranks shared 1.0
    assert(got(3L).map(_._3).toSeq == Seq("filler", "shared"), got(3L).toSeq)
  }

  test("bigramLmScore: reference-like text scores lower, OOV floors not NaN") {
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran on the mat")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "the cat sat on the mat"),   // all bigrams seen
      (11L, "zork quux blorp frotz")).toDF("doc_id", "text") // all unseen
    val got = graft.text.TextOps.bigramLmScore(docs, ref, "doc_id", "text")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L)._2 == 5L && got(11L)._2 == 3L, got)
    assert(!got(10L)._1.isNaN && !got(11L)._1.isNaN)
    assert(got(10L)._1 < got(11L)._1, got) // familiar text = lower log-ppl
    // fully-OOV bigram probability is exactly 1/V (V = 6 distinct ref
    // tokens: the/cat/sat/ran/on/mat): every nll in doc 11 is ln(6)
    assert(math.abs(got(11L)._1 - math.log(6)) < 1e-12, got(11L))
  }

  test("tfidfTopTerms plans a WindowGroupLimit for the per-doc top-k") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 3)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
