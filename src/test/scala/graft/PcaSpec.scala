package graft

import org.apache.spark.sql.functions._
import graft.similarity.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")

  test("covariance matches the hand-computed 2x2 sample covariance") {
    // x = [1,2,3], y = [2,4,6]: var(x)=1, var(y)=4, cov=2
    val df = vecs(0L -> Seq(1.0, 2.0), 1L -> Seq(2.0, 4.0), 2L -> Seq(3.0, 6.0))
    val got = Pca.covariance(df, "embedding", dims = 2)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(got == Map((0, 0) -> 1.0, (0, 1) -> 2.0, (1, 1) -> 4.0), got)
  }

  test("fit recovers a planted dominant axis and orders eigenvalues") {
    // variance 100 along (1,1)/sqrt2, tiny along the orthogonal axis
    val rows = (0 until 40).map { i =>
      val t = (i - 20) * 1.0
      val eps = (i % 3 - 1) * 0.01
      (i.toLong, Seq(t + eps, t - eps, 0.0))
    }
    val comps = Pca.fit(vecs(rows: _*), "embedding", dims = 3, k = 2)
      .collect()
      .groupBy(_.getInt(0))
      .map { case (c, rs) =>
        c -> (rs.sortBy(_.getInt(1)).map(_.getDouble(2)), rs.head.getDouble(3), rs.head.getDouble(4))
      }
    val (w0, ev0, frac0) = comps(0)
    val (_, ev1, frac1) = comps(1)
    val s = 1.0 / math.sqrt(2)
    assert(math.abs(w0(0) - s) < 0.01 && math.abs(w0(1) - s) < 0.01 && math.abs(w0(2)) < 0.01, w0.toSeq)
    assert(ev0 > 100 * ev1, (ev0, ev1))
    assert(frac0 > 0.99 && frac1 < 0.01, (frac0, frac1))
  }

  test("fit components are orthonormal after deflation") {
    val rows = (0 until 30).map(i =>
      (i.toLong, Seq(math.sin(i * 0.9) * 3, math.cos(i * 0.4) * 2, (i % 5) * 0.5, 0.1 * i)))
    val comps = Pca.fit(vecs(rows: _*), "embedding", dims = 4, k = 3)
      .collect().groupBy(_.getInt(0))
      .map { case (c, rs) => c -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    for (i <- 0 until 3) assert(math.abs(dot(comps(i), comps(i)) - 1.0) < 1e-3, s"norm $i")
    for (i <- 0 until 3; j <- i + 1 until 3)
      assert(math.abs(dot(comps(i), comps(j))) < 1e-2, s"ortho $i,$j")
  }

  test("randomProjection is linear, sign-stable, and shuffle-free") {
    val df = vecs(
      0L -> Seq.fill(8)(1.0),
      1L -> Seq.fill(8)(2.0),     // 2x the first vector
      2L -> Seq.fill(8)(0.0))
    val proj = Pca.randomProjection(df, "vec_id", "embedding", k = 4, dims = 8)
    val got = proj.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (k <- 0L until 4L) {
      assert(math.abs(got((1L, k)) - 2 * got((0L, k))) < 1e-6, s"k=$k")
      assert(got((2L, k)) == 0.0)
    }
    // scale shape: a pure projection — no Exchange anywhere in the plan
    val plan = proj.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan)
  }
}
