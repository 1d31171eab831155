package graft

import org.apache.spark.sql.SparkSession

/** Prints physical plans of representative queries and greps them for the
  * properties that matter at 100 TB: parquet filter pushdown, pruned read
  * schemas, broadcast joins for dims, and shuffle counts.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.core.Sessions.local(4)
    val interesting = Seq(
      "q_sql_select",      // filter+projection pushdown to scan
      "q_tpch_pricing",    // agg pushdown shape / partial agg
      "q_join_revenue",    // broadcast of dims
      "q_timewindow_locf", // spine join
      "q_last_per_tag",    // max_by hash agg (no window over raw)
      "q_embedding_topk",  // broadcast NL join
      "q_dedup_jaccard",   // blocked self-join
      "q_tql_pipeline",    // TQL compile → single plan with pushdown
      "q_rollup_routed")   // optimizer rule answers from the rollup table
    interesting.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.queryExecution.toRdd.count() // materialize THIS plan so AQE settles
      val plan = df.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==")(0) // AQE echoes the pre-adaptive plan below
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(formatted).toList
      val readSchema = "ReadSchema: [^\\n]+".r.findAllIn(formatted).toList
      val nBroadcast = "BroadcastExchange".r.findAllMatchIn(plan).length
      // "Exchange" also matches inside every "BroadcastExchange" — subtract
      val nShuffles = "Exchange".r.findAllMatchIn(plan).length - nBroadcast
      val wsc = "\\*\\(\\d+\\)".r.findAllMatchIn(plan).map(_.matched).toSet.size
      println(s"=== $name ===")
      println(s"  shuffles=$nShuffles broadcasts=$nBroadcast codegenSpans=$wsc")
      pushed.take(3).foreach(p => println(s"  $p"))
      readSchema.take(3).foreach(r => println(s"  $r"))
      if (args.contains("-v")) println(formatted)
    }
    spark.stop()
  }
}
