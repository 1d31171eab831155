package graft

/** Structural plan assertions for the scale-critical gate queries: the
  * properties that keep each plan viable at 100 TB, pinned so a
  * refactor that silently reintroduces a cartesian product, a global
  * window, or an un-broadcast dimension join fails CI — not just the
  * bench counters after the fact. */
class PlanAuditSpec extends SparkSpec {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.toRdd.count() // drive AQE to the final plan
    df.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)
  }

  private val heavy = Seq(
    "q_tpch_pricing", "q_join_revenue", "q_top_customers",
    "q_dedup_minhash", "q_dedup_simhash", "q_dedup_cluster",
    "q_embedding_topk", "q_embedding_pairs", "q_ann_lsh", "q_ann_ivf",
    "q_ann_pq", "q_pipeline_curate", "q_decontaminate", "q_pack_bins",
    "q_stratified_sample", "q_rollup_routed", "q_pivot", "q_asof_join",
    "q_range_join", "q_dedup_canonical", "q_decontaminate_report",
    "q_dup_ngram_rate", "q_sessionize", "q_asof_tolerance",
    "q_dup_spans", "q_dedup_substring", "q_shuffle_export",
    // waves 5-11: corpus statistics, event analytics, graph, sketches
    "q_containment", "q_cross_overlap", "q_heavy_hitters", "q_word_entropy",
    "q_pmi", "q_source_kl", "q_countmin", "q_weighted_sample", "q_zipf",
    "q_retention", "q_transition_matrix", "q_rfm", "q_hopping_window",
    "q_pagerank", "q_temperature_mix", "q_random_projection",
    // wave 16+: graph triangles, perplexity buckets, LSH audit, chunking
    "q_triangles", "q_perplexity_buckets", "q_source_cap",
    "q_vocab_coverage", "q_lsh_bucket_stats", "q_chunk_fixed",
    "q_hard_negatives", "q_fuzzy_vocab")
    // DSIR and the quality classifier are audited via their lazy inner
    // plans in a dedicated test below: the production forms
    // localCheckpoint the scored relation, which truncates the lineage
    // these generic asserts read

  test("no cartesian products in any heavy gate query") {
    heavy.foreach { name =>
      val plan = executedPlan(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${plan.take(2000)}")
    }
  }

  test("no unpartitioned windows (single-partition trap) in heavy queries") {
    heavy.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.queryExecution.toRdd.count()
      val tree = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val bad = tree.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$name has a global window: $bad")
    }
  }

  test("small-side joins broadcast: queries vs corpus, eval grams vs corpus") {
    Seq("q_embedding_topk", "q_decontaminate", "q_hard_negatives").foreach { name =>
      val plan = executedPlan(name)
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastExchange"), s"$name does not broadcast:\n${plan.take(2000)}")
    }
  }

  test("DSIR + quality-classifier inner plans: scale shapes, no cartesian, no global window") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // materialize=false yields the exact plan the production forms
    // execute eagerly inside localCheckpoint — auditable lineage.
    // The calibration audit reads plattCalibrate's OWN plan shape, so a
    // synthetic join-free scored relation keeps the input out of the
    // join count (the production input's doc join is audited via the
    // q_quality_calibrated gate row).
    val scoredForCal = docs.select(col("doc_id"), col("source"),
      (pmod(xxhash64(col("doc_id")), lit(1000)).cast("double") / 1000.0d)
        .as("score"),
      when(col("lang") === "en", 1.0d).otherwise(0.0d).as("y"))
    val inner = Seq(
      "dsir" -> graft.text.Dsir.weightedScores(docs, "doc_id", "text",
        col("source") === "src1", materialize = false),
      "quality" -> graft.text.QualityClassifier.trainAndScore(docs,
        "doc_id", "text", col("lang") === "en", materialize = false),
      "calibrate" -> graft.text.Calibration.plattCalibrate(scoredForCal,
        "doc_id", "source", "score", "y", materialize = false))
    inner.foreach { case (name, df) =>
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==")(0)
      name match {
        case "dsir" =>
          // DSIR still broadcasts its B=1024-row weight table into the
          // doc-keyed scoring aggregation
          assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
            s"$name scoring does not broadcast the weight table:\n${plan.take(2000)}")
        case _ =>
          // r18: classifier scoring and Platt calibration inline their
          // bounded parameter tables as literals — the scale assertion
          // is NO join of any kind in the scoring/calibration pass
          assert(!plan.contains("Join"),
            s"$name scoring plans a join (expected literal-parameter projection):\n${plan.take(2000)}")
      }
      assert(!plan.contains("CartesianProduct"), s"$name:\n${plan.take(2000)}")
      val tree = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val bad = tree.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$name has a global window: $bad")
    }
  }

  test("parquet scans prune columns: pricing reads only the needed lineitem fields") {
    val plan = executedPlan("q_tpch_pricing")
    val read = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(read.nonEmpty, plan.take(1000))
    assert(!read.contains("l_comment") && !read.contains("l_shipinstruct"),
      s"scan reads unused columns: $read")
  }

  test("rollup routing scans the rollup table, not the raw table") {
    val plan = executedPlan("q_rollup_routed")
    // the registered rollup lives under a graft_route temp dir; the raw
    // events.parquet must not appear in the final scan set
    assert(plan.contains("graft_route"), plan.take(2000))
    assert(!plan.contains("events.parquet"), plan.take(2000))
  }

  test("tiered routing picks the HOUR rollup over the MIN one for day-scale buckets") {
    val plan = executedPlan("q_rollup_tiered")
    assert(plan.contains("graft_route"), plan.take(2000)) // HOUR tier dir
    assert(!plan.contains("graft_tmin"), plan.take(2000)) // MIN tier must lose
    assert(!plan.contains("events.parquet"), plan.take(2000))
  }

  test("freshness horizon unions the raw tail with closed rollup buckets") {
    val plan = executedPlan("q_rollup_fresh")
    assert(plan.contains("graft_fresh"), plan.take(2000)) // partial rollup scanned
    assert(plan.contains("events.parquet"), plan.take(2000)) // tail scanned
    assert(plan.contains("Union"), plan.take(2000))
  }

  test("stream-maintained rollup routes through sidecar-loaded metadata") {
    // q_rollup_stream registers NOTHING by hand: the rollup was written
    // by Watch.maintainRollup and the routing comes from
    // RollupRouting.load on the persisted _graft_rollup.json. The plan
    // must read the streamed rollup for closed hours AND union the raw
    // tail past the watermark-derived horizon (the final open hour).
    val plan = executedPlan("q_rollup_stream")
    assert(plan.contains("graft_rstream"), plan.take(2000))
    assert(plan.contains("events.parquet"), plan.take(2000)) // fresh tail
    assert(plan.contains("Union"), plan.take(2000))
  }

  test("stratified sampling plans a WindowGroupLimit (rank pushdown)") {
    val plan = executedPlan("q_stratified_sample")
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }
}
