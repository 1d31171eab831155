package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected simple graph — the
  * local-clustering signal of a document-similarity graph: a doc whose
  * near-dup neighbors are also near-dups of EACH OTHER sits in a dense
  * template/boilerplate cluster, not a chain of incidental overlaps.
  *
  * Degree-ordered orientation (the standard distributed scheme): every
  * undirected edge is directed from its lower-(degree, id) endpoint to
  * the higher one, so each triangle {x<y<z} is found exactly once as the
  * wedge (x→y, x→z) closed by (y→z), and the wedge fan-out per vertex is
  * bounded by its OUT-degree ≤ O(√m) — a celebrity node of degree d
  * generates O(√m·√m)=O(m) wedges instead of the O(d²) a naive
  * neighbor-pair explode would (the reason orientation is the only shape
  * that survives a power-law graph at 100 TB). Two shuffle joins total;
  * nothing collects.
  *
  * Skew guard at hub vertices: a top-degree hub is the TAIL of almost
  * every incident edge after orientation (its neighbors nearly all have
  * lower degree), so its own wedge fan-out collapses — the wedges that
  * would form at the hub form instead at its low-degree neighbors, each
  * bounded by that neighbor's oriented out-degree. A pure star's hub
  * generates ZERO wedges (TrianglesSpec pins this), the same role
  * large-star/small-star play in Dedup.connectedComponents. At sf1 this
  * query is the heaviest absolute gate row (~174 s) because the wedge
  * VOLUME grows ~1036× per decade on the similarity graph — that is
  * candidate work, not engine skew; the measured time grows 9× UNDER
  * the wedge growth (BENCH_SF1.md). If a future corpus still melts a
  * partition, the escape hatch is capping oriented out-degree (drop or
  * sample out-edges above ~√m) — an approximation, so it is not wired
  * into the exact oracle-gated path.
  */
object Triangles {
  /** Degree-ordered orientation: every undirected edge directed from its
    * lower-(degree, id) endpoint to the higher, with the head's order
    * key carried for wedge dedup. Exposed so specs can assert the
    * bounded-work property (per-vertex wedges = C(out-degree, 2)). */
  private[graft] def orient(pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("a"), col("b"))
    val deg = p.select(col("a").as("v"))
      .unionAll(p.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val withDeg = p
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    withDeg.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("w"), col("db").as("dw")))
        .otherwise(
          struct(col("b").as("u"), col("a").as("w"), col("da").as("dw")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"), col("e.dw").as("dw"))
  }

  /** Per-node triangle participation counts.
    * @param pairs unique undirected edges as canonical pairs (columns
    *              `a` < `b`, one row per edge — the shape
    *              [[graft.dedup.Dedup.jaccardPairs]] emits)
    * @param maxOutDegree the documented hub escape hatch, OFF by default:
    *              when set, each vertex keeps only its `k`
    *              lowest-(head-degree, head-id) out-edges, bounding
    *              per-vertex wedge work at C(k, 2) on any graph. This
    *              UNDERCOUNTS triangles whose lowest-ranked vertex
    *              exceeds the cap — an approximation for corpora whose
    *              oriented degrees still melt a partition; the exact
    *              oracle-gated path never sets it.
    * @return (v, n_triangles) for every vertex in ≥1 triangle */
  def perNode(pairs: DataFrame,
              maxOutDegree: Option[Int] = None): DataFrame = {
    // NO eager pair/oriented materialization: ReusedExchange already
    // deduplicates the repeated references, and an r18 A/B measured
    // the localCheckpoints as net overhead at bench shape.
    val oriented0 = orient(pairs)
    val oriented = maxOutDegree match {
      case None => oriented0
      case Some(k) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("u").orderBy(col("dw"), col("w"))
        oriented0.withColumn("__r", row_number().over(w))
          .filter(col("__r") <= k).drop("__r")
    }
    // wedges at the lowest-ranked vertex of each would-be triangle: two
    // out-edges of u, ordered so each unordered out-pair appears once
    val wedges = oriented.select(col("u"), col("w").as("v1"), col("dw").as("d1"))
      .join(oriented.select(col("u"), col("w").as("v2"), col("dw").as("d2")),
        Seq("u"))
      .filter(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("v1") < col("v2")))
    // close the wedge: the oriented edge v1 → v2 must exist
    val tris = wedges
      .join(oriented.select(col("u").as("v1"), col("w").as("v2")),
        Seq("v1", "v2"))
      .select(col("u").as("x"), col("v1").as("y"), col("v2").as("z"))
    tris.select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
  }
}
