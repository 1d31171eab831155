package graft

import org.apache.spark.sql.functions._
import graft.similarity.Kmeans
import graft.text.Curation

/** Mixing / embedding-statistics wave: deterministic k-means, robust
  * centroid outliers, temperature weights, heavy hitters. */
class MixSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")

  test("kmeans separates two planted blobs and reports exact sizes") {
    // ids 0,1 seed the two clusters; members sit near each seed
    val df = vecs(
      0L -> Seq(0.0, 0.0), 1L -> Seq(10.0, 10.0),
      2L -> Seq(0.5, 0.2), 3L -> Seq(9.5, 10.2),
      4L -> Seq(-0.3, 0.4), 5L -> Seq(10.3, 9.6))
    val got = Kmeans.fitStats(df, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 3L, 0L), (1L, 3L, 1L)), got.toSeq)
  }

  test("kmeans is partitioning-independent (decimal centroid sums)") {
    val base = (0L until 40L).map(i =>
      (i, Seq(math.sin(i * 0.7), math.cos(i * 1.3), (i % 7) * 0.1)))
    val a = Kmeans.fitStats(vecs(base: _*).repartition(1),
      "vec_id", "embedding", k = 3, iters = 3).collect().toSeq
    val b = Kmeans.fitStats(vecs(base: _*).repartition(13),
      "vec_id", "embedding", k = 3, iters = 3).collect().toSeq
    assert(a == b, s"\n$a\n$b")
  }

  test("kmeans keeps a centroid that loses all members") {
    // k=3 but only two distinct points: cluster 1's seed (dup of 0)
    // empties on the first assignment and must survive untouched
    val df = vecs(0L -> Seq(0.0), 1L -> Seq(0.0), 2L -> Seq(5.0))
    val got = Kmeans.fitStats(df, "vec_id", "embedding", k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 2L), (2L, 1L)), got.toSeq)
  }

  test("centroidOutliers flags exactly the planted far vector") {
    val near = (0L until 20L).map(i => (i, Seq(1.0 + (i % 3) * 0.01, 0.0)))
    val df = vecs((near :+ (99L -> Seq(50.0, 50.0))): _*)
    val got = Kmeans.centroidOutliers(df, "vec_id", "embedding", nMads = 3.0)
      .select("vec_id").as[Long].collect().toSet
    assert(got == Set(99L), got)
  }

  test("temperatureMix: alpha=1 is proportional, alpha->0 flattens") {
    val df = Seq.tabulate(90)(i => (if (i < 80) "big" else "small", 100L))
      .toDF("source", "n_chars")
    val p1 = Curation.temperatureMix(df, "source", "n_chars", 1.0)
      .select("source", "prob").as[(String, Double)].collect().toMap
    assert(math.abs(p1("big") - 8.0 / 9.0) < 1e-4, p1) // 8000 of 9000 chars
    val p0 = Curation.temperatureMix(df, "source", "n_chars", 0.001)
      .select("source", "prob").as[(String, Double)].collect().toMap
    assert(math.abs(p0("big") - 0.5) < 0.01, p0)
  }

  test("heavyHitters counts occurrences vs documents and breaks ties by gram") {
    val df = Seq(
      (1L, "a b c a b c"), // "a b c" x2 (and wrap grams)
      (2L, "a b c d"),
      (3L, "x y z")).toDF("doc_id", "text")
    val got = Curation.heavyHitters(df, "doc_id", "text", n = 3, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.head == ("a b c", 3L, 2L), got.toSeq)
    assert(got(1)._2 <= 3L)
  }

  test("heavyHitters top-k is a distributed TakeOrdered merge, not a global sort") {
    val df = Seq.tabulate(50)(i => (i.toLong, s"w$i x$i y$i z$i"))
      .toDF("doc_id", "text")
    val plan = Curation.heavyHitters(df, "doc_id", "text", n = 2, k = 5)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
