package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge relation — the centrality pass of a
  * document-similarity graph (e.g. near-dup edges from
  * [[graft.dedup.Dedup.jaccardPairs]]): high-rank docs are the "canonical"
  * representatives a curation pipeline keeps or weights up.
  *
  * Fixed-iteration simplified PageRank:
  * rank₀ = 1/N;  rankₜ₊₁(v) = (1−d)/N + d·Σ_{u→v} rankₜ(u)/deg(u).
  * Dangling mass is dropped (deterministic; the standard simplification
  * when ranks are used ordinally). Every cross-row reduction rounds its
  * terms to 12 dp and accumulates in DECIMAL, and each iteration's ranks
  * round to 9 dp — the whole trace is partitioning-independent and
  * bit-reproducible by a relational engine unrolling the same
  * iterations.
  *
  * Scale: per iteration, one shuffle join of the edge relation against
  * the rank relation (both partitioned by the join key) plus a
  * partial-aggregated contribution shuffle — the textbook distributed
  * PageRank topology. Nothing ever collects; N is the only driver-side
  * scalar. At 100 TB the edge relation dominates and AQE handles its
  * skew (a celebrity node's in-edges partial-aggregate map-side).
  */
object PageRank {
  /** Iterations between lineage truncations — deep enough to amortize
    * the eager materialization, shallow enough that the optimizer never
    * sees more than ~5 iterations of plan. */
  private val CheckpointEvery = 5

  private def fr(c: Column, scale: Int): Column = {
    val p = math.pow(10d, scale.toDouble)
    floor(c * p + 0.5d) / p
  }

  /** @param nodes single-column vertex relation (column `v`)
    * @param edges directed edge relation (columns `src`, `dst`);
    *              symmetrize before calling for undirected graphs
    * @param d     damping factor (0.85 conventionally)
    * @param iters fixed iteration count (upper bound when `tol` is set)
    * @param tol   optional early stop: end when no rank moved more than
    *              `tol` across one iteration, checked only at checkpoint
    *              boundaries (one driver-side scalar per
    *              [[CheckpointEvery]] iterations — ranks are 9-dp-pinned,
    *              so `tol = 0` stops at the exact rounded fixpoint and
    *              further iterations provably change nothing)
    * @return (v, rank) for every vertex */
  def run(nodes: DataFrame, edges: DataFrame, d: Double, iters: Int,
          tol: Option[Double] = None): DataFrame = {
    val n = nodes.count()
    require(n > 0, "PageRank.run: empty vertex set")
    val nD = n.toDouble
    val reset = (1d - d) / nD
    // NO eager edge materialization: Spark's ReusedExchange already
    // deduplicates the (expensive) edge derivation across the
    // iteration joins, and an r18 A/B measured the eager
    // localCheckpoint as pure overhead at bench shape (the extra
    // materialization jobs outweigh the planning it saves).
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = nodes.select(col("v"), lit(1d / nD).as("r"))
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val prev = ranks // ≤ CheckpointEvery iterations of lineage
      val contrib = edges
        .join(ranks.withColumnRenamed("v", "src"), "src")
        .join(deg, "src")
        .groupBy(col("dst").as("v"))
        .agg(sum(fr(col("r") / col("deg"), 12).cast("decimal(38,12)"))
          .cast("double").as("s"))
      ranks = nodes.join(contrib, Seq("v"), "left")
        .select(col("v"),
          fr(lit(reset) + lit(d) * coalesce(col("s"), lit(0d)), 9).as("r"))
      it += 1
      // lineage truncation: without it each iteration's plan embeds the
      // whole previous plan and DRIVER planning time grows superlinearly
      // with iters — same cure as Dedup.connectedComponents. Values are
      // 9-dp-pinned per iteration, so checkpointing never changes them.
      if (it % CheckpointEvery == 0 && it < iters) {
        ranks = ranks.localCheckpoint()
        tol.foreach { eps =>
          // compare THIS iteration against the one before it — a
          // consecutive-step delta, so eps=0 certifies a true fixpoint
          // (the update is deterministic: unchanged input ⇒ unchanged
          // output), not a longer-period cycle
          val delta = ranks
            .join(prev.withColumnRenamed("r", "rp"), "v")
            .agg(max(abs(col("r") - col("rp")))).head().getDouble(0)
          if (delta <= eps) converged = true
        }
      }
    }
    ranks.select(col("v"), col("r").as("rank"))
  }
}
