package graft

import org.apache.spark.sql.functions._
import graft.similarity.KCenter

/** k-center greedy (farthest-point) diversity selection — Gonzalez's
  * 2-approximation, the coreset-selection primitive (arXiv:1708.00489).
  * Oracle parity of the gate row is q_kcenter_select; this spec pins
  * determinism across partitionings and the diversity property itself.
  */
class KCenterSpec extends SparkSpec {
  import spark.implicits._

  private def grid: org.apache.spark.sql.DataFrame =
    // 3 tight clusters far apart + the seed corner; greedy must visit
    // every cluster before densifying any one of them
    Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(0.1f, 0f)), (2L, Seq(0f, 0.1f)),
      (10L, Seq(100f, 0f)), (11L, Seq(100.1f, 0f)),
      (20L, Seq(0f, 100f)), (21L, Seq(0f, 100.1f)),
      (30L, Seq(100f, 100f))).toDF("vec_id", "embedding")

  test("greedy visits every far cluster before densifying one") {
    val sel = KCenter.select(grid, "vec_id", "embedding", k = 4)
      .orderBy("sel_order").collect()
    assert(sel.head.getLong(1) == 0L) // seed = smallest id
    // the next three picks are one per far cluster (order by distance)
    val picked = sel.map(_.getLong(1)).toSet
    assert(Set(10L, 11L).intersect(picked).nonEmpty)
    assert(Set(20L, 21L).intersect(picked).nonEmpty)
    assert(picked.contains(30L))
    // sel_dist is non-increasing after the seed (greedy invariant)
    val dists = sel.drop(1).map(_.getDouble(2))
    assert(dists.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("selection is identical across partitionings") {
    val a = KCenter.select(grid.repartition(1), "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val b = KCenter.select(grid.repartition(7), "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(a == b)
  }

  test("per-iteration scan prunes to the id+vector columns") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val e = emb.select(col("vec_id").cast("long").as("vid"),
      transform(col("embedding"), x => x.cast("double")).as("ve"))
    val plan = e.queryExecution.executedPlan.toString()
    val read = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(read.contains("vec_id") && read.contains("embedding") &&
      !read.contains("label"), read)
  }
}
