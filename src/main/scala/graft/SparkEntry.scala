package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Analytics, Core, Extra, Mix, Synth, TextPipeline, TimeSeries, TqlQueries, Wave16}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY §2) as runnable DataFrame
  * builders; `oracleSql` holds the DuckDB-equivalent SQL for each
  * SQL-expressible entry (hash-compared by the driver). Entries without
  * an oracle (minhash/simhash/kalman/lsh — engine-specific hashes or
  * recursive state) get the weaker rows-only check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Core.defs("q_tpch_pricing")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Core.defs ++ TimeSeries.defs ++ TextPipeline.defs ++ Synth.defs ++ TqlQueries.defs ++ Extra.defs ++ Mix.defs ++ Analytics.defs ++ Wave16.defs

  def oracleSql: Map[String, String] =
    Core.oracles ++ TimeSeries.oracles ++ TextPipeline.oracles ++ Synth.oracles ++ TqlQueries.oracles ++ Extra.oracles ++ Mix.oracles ++ Analytics.oracles ++ Wave16.oracles
}
