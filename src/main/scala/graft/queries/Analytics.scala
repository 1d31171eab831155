package graft.queries

import org.apache.spark.sql.functions._
import graft.text.CorpusStats
import Q._

/** Sixth-wave battery: corpus statistics and event analytics — per-doc
  * entropy, PMI collocations, per-source KL drift, source overlap
  * matrix, asymmetric containment, and weekly cohort retention.
  */
object Analytics {
  val defs: Map[String, QueryFn] = Map(
    // ---- per-document unigram entropy (quality signal) ----------------
    "q_word_entropy" -> ((s, dir) =>
      CorpusStats.wordEntropy(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // ---- PMI collocation mining (top-20, min pair count 5) ------------
    "q_pmi" -> ((s, dir) =>
      CorpusStats.pmiCollocations(t(s, dir, "documents"), "text",
        minCount = 5L, k = 20)),

    // ---- per-source distribution drift: KL(source || corpus) ----------
    "q_source_kl" -> ((s, dir) =>
      CorpusStats.sourceKl(t(s, dir, "documents"), "source", "text")
        .orderBy("source")),

    // ---- source x source distinct-trigram overlap matrix --------------
    "q_cross_overlap" -> ((s, dir) =>
      CorpusStats.crossOverlap(t(s, dir, "documents"), "source", "text", n = 3)
        .orderBy("src_a", "src_b")),

    // ---- asymmetric containment (sub-document duplication) ------------
    "q_containment" -> ((s, dir) =>
      CorpusStats.containmentPairs(t(s, dir, "documents"), blockCol = "source",
          n = 3, threshold = 0.5)
        .orderBy("doc_a", "doc_b")),

    // ---- weekly cohort retention over the event stream ----------------
    // cohort = the user's first active epoch-week; one partial-agg
    // shuffle on user_id (per-user week set is bounded by the horizon),
    // then a small shuffle on the (cohort, offset) matrix.
    "q_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val wk = ev.select(col("user_id"), Q.tsUs(ev).as("us"))
        .select(col("user_id"), expr("us div 604800000000").as("wk"))
      wk.groupBy("user_id").agg(array_sort(collect_set(col("wk"))).as("wks"))
        .select(element_at(col("wks"), 1).as("cwk"), explode(col("wks")).as("wk"))
        .groupBy((col("cwk") * lit(604800000000L)).as("cohort_week"),
          (col("wk") - col("cwk")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }))

  private val W =
    """SELECT doc_id, source,
         string_split(regexp_replace(lower(text),'\s+',' ','g'),' ') AS ws
       FROM documents"""

  val oracles: Map[String, String] = Map(
    "q_word_entropy" ->
      s"""WITH w AS ($W),
         c AS (SELECT doc_id, w, count(*) AS c
           FROM (SELECT doc_id, unnest(ws) AS w FROM w) GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS n_distinct,
           floor((log2(sum(c)) -
             CAST(sum(CAST(floor(c*log2(c)*1e9+0.5)/1e9 AS DECIMAL(38,9)))
               AS DOUBLE) / sum(c)) * 1e6 + 0.5) / 1e6 AS entropy
         FROM c GROUP BY 1 ORDER BY 1""",
    "q_pmi" ->
      s"""WITH w AS ($W),
         uc AS (SELECT w, count(*) AS cw
           FROM (SELECT unnest(ws) AS w FROM w) GROUP BY 1),
         bcAll AS (SELECT pair, count(*) AS n_pair FROM (
             SELECT unnest(list_transform(generate_series(1, len(ws)-1),
               i -> ws[i] || ' ' || ws[i+1])) AS pair
             FROM w WHERE len(ws) >= 2) GROUP BY 1),
         bc AS (SELECT * FROM bcAll WHERE n_pair >= 5),
         tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n_tot FROM uc),
         btot AS (SELECT CAST(sum(n_pair) AS BIGINT) AS b_tot FROM bcAll)
         SELECT bc.pair, CAST(bc.n_pair AS BIGINT) AS n_pair,
           floor((ln(bc.n_pair) + 2*ln(tot.n_tot) - ln(btot.b_tot)
             - ln(c1.cw) - ln(c2.cw)) * 1e6 + 0.5) / 1e6 AS pmi
         FROM bc CROSS JOIN tot CROSS JOIN btot
         JOIN uc c1 ON c1.w = string_split(bc.pair, ' ')[1]
         JOIN uc c2 ON c2.w = string_split(bc.pair, ' ')[2]
         ORDER BY pmi DESC, pair LIMIT 20""",
    "q_source_kl" ->
      s"""WITH w AS ($W),
         wc AS (SELECT source, w, count(*) AS c
           FROM (SELECT source, unnest(ws) AS w FROM w) GROUP BY 1, 2),
         cw AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM wc GROUP BY 1),
         ts AS (SELECT source, CAST(sum(c) AS BIGINT) AS ts FROM wc GROUP BY 1),
         n AS (SELECT CAST(sum(ts) AS BIGINT) AS n FROM ts)
         SELECT wc.source, CAST(sum(wc.c) AS BIGINT) AS n_tokens,
           floor(CAST(sum(CAST(floor((wc.c / ts.ts) *
               (ln(wc.c) - ln(ts.ts) - ln(cw.cw) + ln(n.n)) * 1e12 + 0.5) / 1e12
             AS DECIMAL(38,12))) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS kl
         FROM wc JOIN cw USING(w) JOIN ts USING(source) CROSS JOIN n
         GROUP BY 1 ORDER BY 1""",
    "q_cross_overlap" ->
      s"""WITH w AS ($W),
         sg AS (SELECT DISTINCT source, gram FROM (
           SELECT source, unnest(list_distinct(list_transform(
             generate_series(1, len(ws)-2),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS gram
           FROM w WHERE len(ws) >= 3)),
         n AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sg GROUP BY 1),
         i AS (SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_shared
           FROM sg a JOIN sg b USING(gram) WHERE a.source < b.source
           GROUP BY 1, 2)
         SELECT src_a, src_b, n_shared,
           floor(n_shared / (na.n + nb.n - n_shared) * 1e6 + 0.5) / 1e6
             AS jaccard
         FROM i JOIN n na ON i.src_a = na.source
                JOIN n nb ON i.src_b = nb.source
         ORDER BY src_a, src_b""",
    "q_containment" ->
      s"""WITH w AS ($W),
         g AS (SELECT doc_id, source, unnest(list_distinct(list_transform(
             generate_series(1, len(ws)-2),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS gram
           FROM w WHERE len(ws) >= 3),
         n AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
         i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
           FROM g a JOIN g b ON a.gram = b.gram AND a.source = b.source
             AND a.doc_id <> b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b,
           floor(inter / n.n * 1e6 + 0.5) / 1e6 AS containment
         FROM i JOIN n ON i.doc_a = n.doc_id
         WHERE inter / n.n >= 0.5
         ORDER BY doc_a, doc_b""",
    "q_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
             epoch_us(ts) // 604800000000 AS wk FROM events),
         c AS (SELECT user_id, min(wk) AS cwk FROM uw GROUP BY 1)
         SELECT c.cwk * 604800000000 AS cohort_week,
           uw.wk - c.cwk AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
         FROM uw JOIN c USING(user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""")
}
