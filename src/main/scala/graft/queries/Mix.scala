package graft.queries

import org.apache.spark.sql.functions._
import graft.similarity.{Kmeans, Pca}
import graft.text.Curation
import Q._

/** Fifth-wave battery: corpus-mixing and embedding-statistics operators —
  * deterministic k-means cluster balance, robust centroid-distance
  * outliers, temperature-scaled source weights, heavy-hitter n-grams.
  */
object Mix {
  val defs: Map[String, QueryFn] = Map(
    // ---- deterministic Lloyd k-means over the embedding corpus --------
    // k lowest-id seeds, 2 Lloyd steps, final assignment; decimal-exact
    // centroid means so the trace is engine- and partition-independent.
    "q_kmeans" -> ((s, dir) =>
      Kmeans.fitStats(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 4, iters = 2)),

    // ---- robust embedding hygiene: centroid-distance MAD outliers -----
    "q_embedding_outliers" -> ((s, dir) =>
      Kmeans.centroidOutliers(t(s, dir, "embeddings"), "vec_id", "embedding",
        nMads = 3.0, keepCols = Seq("label"))),

    // ---- temperature-scaled source mixing weights (α = 0.3) -----------
    "q_temperature_mix" -> ((s, dir) =>
      Curation.temperatureMix(
          t(s, dir, "documents").select("source", "n_chars"),
          "source", "n_chars", alpha = 0.3)
        .orderBy("source")),

    // ---- global heavy-hitter word trigrams -----------------------------
    "q_heavy_hitters" -> ((s, dir) =>
      Curation.heavyHitters(t(s, dir, "documents"), "doc_id", "text",
          n = 3, k = 20)
        .orderBy(col("n_occ").desc, col("gram"))),

    // ---- embedding covariance (first 8 dims, decimal-exact) -----------
    "q_embedding_cov" -> ((s, dir) =>
      Pca.covariance(t(s, dir, "embeddings"), "embedding", dims = 8)
        .orderBy("i", "j")),

    // ---- deterministic md5-signed random projection to 8 dims ---------
    "q_random_projection" -> ((s, dir) =>
      Pca.randomProjection(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 8, dims = 64)
        .orderBy("vec_id", "k")),

    // ---- k-center greedy diversity selection (Gonzalez farthest-point;
    // coreset selection, arXiv:1708.00489): k passes, each a broadcast-
    // literal distance projection + one TakeOrdered(1) — nothing
    // corpus-quadratic, driver state = k vectors
    "q_kcenter_select" -> ((s, dir) =>
      graft.similarity.KCenter.select(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8).orderBy("sel_order")))

  /** k-center oracle: the greedy unrolled as CTE stages — sK = step-K
    * winner, dK = running min distance after adding it. Distances use
    * the embedding-topk unnest-sum form (float→double casts and
    * float-product terms are exact, so both engines compare identical
    * doubles). */
  private def kcenterOracle(k: Int): String = {
    def dist(a: String, b: String) =
      s"(SELECT sum((x - y) * (x - y)) FROM (SELECT unnest($a) AS x, unnest($b) AS y))"
    val base =
      """e AS (SELECT vec_id,
           list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ve
         FROM embeddings),
       s1 AS (SELECT vec_id, ve, 0.0 AS md FROM e ORDER BY vec_id LIMIT 1),
       d1 AS (SELECT e.vec_id AS vec_id, e.ve AS ve,
           """ + dist("e.ve", "c.ve") + """ AS md
         FROM e CROSS JOIN s1 c)"""
    val steps = (2 to k).map { i =>
      s"""s$i AS (SELECT vec_id, ve, md FROM d${i - 1}
           ORDER BY md DESC, vec_id LIMIT 1),
         d$i AS (SELECT d.vec_id AS vec_id, d.ve AS ve,
             least(d.md, ${dist("d.ve", "c.ve")}) AS md
           FROM d${i - 1} d CROSS JOIN s$i c)"""
    }.mkString(",\n       ")
    val rows = (1 to k).map { i =>
      s"SELECT ${i}::BIGINT AS sel_order, vec_id, floor(md * 1e6 + 0.5)/1e6 AS sel_dist FROM s$i"
    }.mkString("\n         UNION ALL ")
    s"WITH $base,\n       $steps\n         $rows\n         ORDER BY sel_order"
  }

  val oracles: Map[String, String] = Map(
    "q_kcenter_select" -> kcenterOracle(8),
    // three assignment passes (a1/a2 Lloyd, a3 final) with decimal-exact
    // means between them; distances are index-order zipped-unnest sums —
    // the same IEEE sequence as the engine's aggregate(zip_with(...)).
    "q_kmeans" ->
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         dims AS (SELECT unnest(generate_series(1,64)) AS pos),
         c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
         d1 AS (SELECT e.vec_id, c0.cid,
             (SELECT sum((x-y)*(x-y))
              FROM (SELECT unnest(e.v) AS x, unnest(c0.cv) AS y)) AS dist
           FROM e CROSS JOIN c0),
         a1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) rn
           FROM d1) WHERE rn = 1),
         m1 AS (SELECT a1.cid, dims.pos,
             CAST(sum(CAST(e.v[dims.pos] AS DECIMAL(28,9))) AS DOUBLE)
               / count(*) AS c
           FROM a1 JOIN e USING(vec_id) CROSS JOIN dims GROUP BY 1, 2),
         m1l AS (SELECT cid, list(c ORDER BY pos) AS cv FROM m1 GROUP BY 1),
         d2 AS (SELECT e.vec_id, m1l.cid,
             (SELECT sum((x-y)*(x-y))
              FROM (SELECT unnest(e.v) AS x, unnest(m1l.cv) AS y)) AS dist
           FROM e CROSS JOIN m1l),
         a2 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) rn
           FROM d2) WHERE rn = 1),
         m2 AS (SELECT a2.cid, dims.pos,
             CAST(sum(CAST(e.v[dims.pos] AS DECIMAL(28,9))) AS DOUBLE)
               / count(*) AS c
           FROM a2 JOIN e USING(vec_id) CROSS JOIN dims GROUP BY 1, 2),
         m2l AS (SELECT cid, list(c ORDER BY pos) AS cv FROM m2 GROUP BY 1),
         d3 AS (SELECT e.vec_id, m2l.cid,
             (SELECT sum((x-y)*(x-y))
              FROM (SELECT unnest(e.v) AS x, unnest(m2l.cv) AS y)) AS dist
           FROM e CROSS JOIN m2l),
         a3 AS (SELECT vec_id, cid, dist FROM (SELECT vec_id, cid, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) rn
           FROM d3) WHERE rn = 1)
         SELECT a3.cid AS cluster, CAST(count(*) AS BIGINT) AS n,
           min(a3.vec_id) AS min_vec,
           floor(sqrt((SELECT sum(x*x)
             FROM (SELECT unnest(any_value(m2l.cv)) AS x)))*1e6+0.5)/1e6
             AS c_norm,
           CAST(sum(CAST(floor(a3.dist*1e6+0.5)/1e6 AS DECIMAL(38,6)))
             AS DOUBLE) AS inertia
         FROM a3 JOIN m2l USING(cid) GROUP BY 1 ORDER BY 1""",
    "q_embedding_outliers" ->
      """WITH e AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         dims AS (SELECT unnest(generate_series(1,64)) AS pos),
         c AS (SELECT pos,
             CAST(sum(CAST(v[pos] AS DECIMAL(28,9))) AS DOUBLE)/count(*) AS cv
           FROM e CROSS JOIN dims GROUP BY 1),
         cl AS (SELECT list(cv ORDER BY pos) AS cv FROM c),
         d AS (SELECT vec_id, label,
             sqrt((SELECT sum((x-y)*(x-y))
               FROM (SELECT unnest(e.v) AS x, unnest(cl.cv) AS y))) AS dist
           FROM e CROSS JOIN cl),
         m AS (SELECT quantile_cont(dist, 0.5) AS med FROM d),
         md AS (SELECT quantile_cont(abs(dist - m.med), 0.5) AS mad
           FROM d CROSS JOIN m)
         SELECT vec_id, label,
           floor(dist*1e6+0.5)/1e6 AS dist,
           floor(abs(dist - (SELECT med FROM m))*1e6+0.5)/1e6 AS dev
         FROM d
         WHERE abs(dist - (SELECT med FROM m)) > 3.0*(SELECT mad FROM md)
         ORDER BY vec_id""",
    "q_temperature_mix" ->
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_size
           FROM documents GROUP BY 1),
         w AS (SELECT source, n_docs, n_size,
             floor(pow(CAST(n_size AS DOUBLE), 0.3)*1e6+0.5)/1e6 AS w FROM g),
         t AS (SELECT CAST(sum(CAST(w AS DECIMAL(38,6))) AS DOUBLE) AS tw,
             sum(n_docs) AS td FROM w)
         SELECT source, n_docs, n_size,
           floor(w/t.tw*1e6+0.5)/1e6 AS prob,
           floor(w/t.tw*t.td/n_docs*1e6+0.5)/1e6 AS epochs
         FROM w CROSS JOIN t ORDER BY source""",
    "q_heavy_hitters" ->
      """WITH w AS (SELECT doc_id,
             string_split(regexp_replace(lower(text),'\s+',' ','g'),' ') AS ws
           FROM documents),
         g AS (SELECT doc_id, unnest(list_transform(
             generate_series(1, len(ws)-2),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram FROM w)
         SELECT gram, CAST(count(*) AS BIGINT) AS n_occ,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         FROM g GROUP BY 1 ORDER BY n_occ DESC, gram LIMIT 20""",
    "q_embedding_cov" ->
      """WITH e AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         dims AS (SELECT unnest(generate_series(1, 8)) AS pos),
         m AS (SELECT pos,
             CAST(sum(CAST(v[pos] AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS mu
           FROM e CROSS JOIN dims GROUP BY 1),
         n AS (SELECT count(*) AS n FROM e),
         d AS (SELECT a.pos AS pi, b.pos AS pj
           FROM dims a JOIN dims b ON a.pos <= b.pos),
         t AS (SELECT d.pi, d.pj,
             floor((e.v[d.pi] - mi.mu) * (e.v[d.pj] - mj.mu) * 1e9 + 0.5) / 1e9
               AS term
           FROM e CROSS JOIN d
             JOIN m mi ON mi.pos = d.pi JOIN m mj ON mj.pos = d.pj)
         SELECT CAST(pi - 1 AS INT) AS i, CAST(pj - 1 AS INT) AS j,
           floor(CAST(sum(CAST(term AS DECIMAL(38,9))) AS DOUBLE) / (n.n - 1)
             * 1e6 + 0.5) / 1e6 AS cov
         FROM t CROSS JOIN n GROUP BY 1, 2, n.n ORDER BY 1, 2""",
    "q_random_projection" ->
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         ks AS (SELECT unnest(generate_series(0, 7)) AS k),
         ds AS (SELECT unnest(generate_series(1, 64)) AS pos),
         s AS (SELECT k, pos,
             CASE WHEN substr(md5(CAST(pos - 1 AS VARCHAR) || '_' ||
                 CAST(k AS VARCHAR)), 1, 1) BETWEEN '0' AND '7'
               THEN 1.0 ELSE -1.0 END AS sg
           FROM ks CROSS JOIN ds)
         SELECT e.vec_id, s.k AS k,
           floor(CAST(sum(CAST(floor(e.v[s.pos] * s.sg * 1e9 + 0.5)
             AS BIGINT)) AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 AS proj
         FROM e CROSS JOIN s GROUP BY 1, 2 ORDER BY 1, 2""")
}
