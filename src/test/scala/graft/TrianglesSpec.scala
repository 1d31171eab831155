package graft

import graft.graph.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(es: (Long, Long)*) = es.toDF("a", "b")

  test("K4 yields 3 triangles per node; a pendant edge contributes none") {
    // complete graph on {0,1,2,3} (4 triangles, each node in 3) plus the
    // pendant edge 3-9
    val es = (for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)) :+ (3L, 9L)
    val got = Triangles.perNode(pairsOf(es: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), got)
  }

  test("a 4-cycle has no triangles; adding one chord creates exactly two") {
    val cycle = pairsOf((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))
    assert(Triangles.perNode(cycle).count() == 0L)
    val chord = pairsOf((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (0L, 2L))
    val got = Triangles.perNode(chord)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // triangles {0,1,2} and {0,2,3}: chord endpoints in both
    assert(got == Map(0L -> 2L, 1L -> 1L, 2L -> 2L, 3L -> 1L), got)
  }

  test("degree-ordered orientation counts each triangle once under heavy skew") {
    // star hub 0 connected to 1..20, and spokes i—(i+1) chained: each
    // consecutive spoke pair closes one triangle through the hub
    val star = (1L to 20L).map(i => (0L, i))
    val chain = (1L until 20L).map(i => (i, i + 1))
    val got = Triangles.perNode(pairsOf((star ++ chain): _*))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(0L) == 19L, got) // hub participates in all 19
    assert(got(1L) == 1L && got(20L) == 1L, got)   // chain ends: one each
    assert((2L until 20L).forall(i => got(i) == 2L), got)
  }
}
