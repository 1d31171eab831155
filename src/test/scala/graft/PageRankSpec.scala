package graft

import graft.graph.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def nodesOf(ids: Long*) = ids.toDF("v")
  private def edgesOf(es: (Long, Long)*) = es.toDF("src", "dst")

  test("star graph: the hub out-ranks every spoke, symmetric spokes tie exactly") {
    // undirected star 0-{1,2,3,4}: symmetrized edges
    val es = (1L to 4L).flatMap(i => Seq((0L, i), (i, 0L)))
    val got = PageRank.run(nodesOf(0L, 1L, 2L, 3L, 4L), edgesOf(es: _*),
        d = 0.85, iters = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert((1L to 4L).forall(i => got(0L) > got(i)), got)
    assert((2L to 4L).forall(i => got(i) == got(1L)), got) // exact tie: same recipe
  }

  test("isolated vertices settle at the reset mass and chains accumulate downstream") {
    // directed chain 0 -> 1 -> 2 plus isolated 9
    val got = PageRank.run(nodesOf(0L, 1L, 2L, 9L),
        edgesOf((0L, 1L), (1L, 2L)), d = 0.85, iters = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val reset = math.floor((1 - 0.85) / 4.0 * 1e9 + 0.5) / 1e9
    assert(got(9L) == reset, got)   // nothing points at 9
    assert(got(0L) == reset, got)   // nothing points at 0 either
    assert(got(2L) > got(1L) && got(1L) > got(0L), got)
  }

  test("deep iteration keeps the plan bounded (lineage truncation)") {
    // 25 iterations: without the every-5 localCheckpoint the optimizer
    // would see all 25 iterations of join+agg lineage and driver
    // planning time grows superlinearly; with it the final plan covers
    // at most 5 iterations
    val es = (0L until 40L).flatMap(i => Seq((i, (i + 1) % 40), ((i + 1) % 40, i)))
    val got = PageRank.run(nodesOf(0L until 40L: _*), edgesOf(es: _*),
      d = 0.85, iters = 25)
    val planNodes = got.queryExecution.optimizedPlan
      .collect { case p => p }.size
    assert(planNodes < 60, s"optimized plan has $planNodes nodes — truncation broken?")
    // the symmetric ring is rank-uniform at every iteration depth
    val ranks = got.collect().map(_.getDouble(1)).distinct
    assert(ranks.length == 1, ranks.toSeq)
  }

  test("tol early-stop lands on the rounded fixpoint: result independent of the cap") {
    // d=0.5 contracts fast (0.5^k < 0.5e-9 by k≈31), so the 9-dp-pinned
    // ranks hit an EXACT fixpoint well inside the cap; tol=0 then stops,
    // and the result must not depend on how large the cap was
    val es = (0L until 12L).map(i => (i, (i + 1) % 12)) ++ Seq((0L, 6L), (3L, 9L))
    val a = PageRank.run(nodesOf(0L until 12L: _*), edgesOf(es: _*),
      d = 0.5, iters = 60, tol = Some(0d)).orderBy("v").collect().toSeq
    val b = PageRank.run(nodesOf(0L until 12L: _*), edgesOf(es: _*),
      d = 0.5, iters = 120, tol = Some(0d)).orderBy("v").collect().toSeq
    assert(a == b, s"\ncap60=$a\ncap120=$b")
  }

  test("ranks are partitioning-independent (decimal contribution sums)") {
    val es = (0L until 60L).flatMap(i => Seq((i, (i * 7) % 60), ((i * 7) % 60, i)))
    val a = PageRank.run(nodesOf(0L until 60L: _*), edgesOf(es: _*).repartition(1),
      d = 0.85, iters = 4).orderBy("v").collect().toSeq
    val b = PageRank.run(nodesOf(0L until 60L: _*), edgesOf(es: _*).repartition(13),
      d = 0.85, iters = 4).orderBy("v").collect().toSeq
    assert(a == b)
  }
}
