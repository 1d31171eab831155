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
  */
object Triangles {
  /** Per-node triangle participation counts.
    * @param pairs unique undirected edges as canonical pairs (columns
    *              `a` < `b`, one row per edge — the shape
    *              [[graft.dedup.Dedup.jaccardPairs]] emits)
    * @return (v, n_triangles) for every vertex in ≥1 triangle */
  def perNode(pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("a"), col("b"))
    val deg = p.select(col("a").as("v"))
      .unionAll(p.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val withDeg = p
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    // orient low-(degree, id) → high; carry the head's order key for the
    // wedge dedup below
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("w"), col("db").as("dw")))
        .otherwise(
          struct(col("b").as("u"), col("a").as("w"), col("da").as("dw")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"), col("e.dw").as("dw"))
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
