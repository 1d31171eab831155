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

  test("orientation keeps per-vertex work bounded by oriented out-degree: a hub fans out nothing") {
    // pure star: hub 0 has degree 40, every leaf degree 1. Orientation
    // directs every edge leaf -> hub, so the hub's out-degree is ZERO and
    // total wedge work is 0 — vs C(40,2) = 780 wedges had the hub fanned
    // out its neighbor pairs. This is the skew guard that survives a
    // power-law graph: per-vertex work is C(out-degree, 2), never
    // C(degree, 2).
    val star = pairsOf((1L to 40L).map(i => (0L, i)): _*)
    val outDeg = Triangles.orient(star)
      .groupBy("u").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!outDeg.contains(0L), s"hub has out-edges: $outDeg")
    assert(outDeg.values.forall(_ == 1L), outDeg) // each leaf: 1 out-edge
    assert(Triangles.perNode(star).count() == 0L)
    // mixed graph: K4 glued to the star through vertices 1..4 (each also
    // keeps its hub edge, so K4 members have undirected degree 4) —
    // every vertex's oriented out-degree stays <= 4 even though the
    // hub's undirected degree is 40, and the K4 triangles still count
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val mixed = pairsOf(((1L to 40L).map(i => (0L, i)) ++ k4): _*)
    val mixedOut = Triangles.orient(mixed)
      .groupBy("u").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(mixedOut.getOrElse(0L, 0L) == 0L, mixedOut)
    assert(mixedOut.values.forall(_ <= 4L), mixedOut)
    // 4 K4 triangles + 6 hub triangles {0,i,j} over K4 edges: every K4
    // vertex sits in 3 + 3, the hub in all 6
    val tri = Triangles.perNode(mixed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 4L).forall(i => tri(i) == 6L), tri)
  }

  test("maxOutDegree cap: exact when cap >= oriented degrees, bounded undercount below") {
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val mixed = pairsOf(((1L to 40L).map(i => (0L, i)) ++ k4): _*)
    // oriented out-degrees max at 4 (vertex 1) — a cap of 4 is lossless
    val capped = Triangles.perNode(mixed, maxOutDegree = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 4L).forall(i => capped(i) == 6L), capped)
    // a cap of 1 bounds per-vertex wedge work at C(1,2)=0: no wedges can
    // form, so the approximation degrades to zero triangles — bounded
    // work, documented undercount
    assert(Triangles.perNode(mixed, maxOutDegree = Some(1)).count() == 0L)
  }
}
