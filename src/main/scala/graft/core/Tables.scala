package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet star schema (TESTDATA.md).
  *
  * At 100 TB these would be catalog tables over time/key-partitioned
  * parquet/Delta; here a thin path-based facade. All reads go through
  * `spark.read.parquet` so Catalyst column pruning and filter pushdown
  * reach the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (idempotent) for SQL-surface use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

/** Pre-expansion rebalance (optimization guide §2.5, "input skew"): a
  * corpus arriving in fewer splits than the cluster is wide — one small
  * file locally, a skewed directory at scale — would run a CPU-heavy
  * row expansion (tokenize + n-gram explode + per-gram hashing) on
  * those few threads while the rest of the cluster idles. The cheap
  * pre-shuffle of raw rows buys full-width expansion; a no-op whenever
  * the source is already at least cluster-wide. Streaming frames have
  * no static partitioning to inspect (micro-batch width is the
  * source's concern), so they rebalance unconditionally. */
object Par {
  def expand(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.isStreaming) df.repartition(par)
    else if (df.rdd.getNumPartitions < par) df.repartition(par)
    else df
  }

  /** Eager localCheckpoint that KEEPS the plan's shuffle width instead
    * of letting AQE coalesce it (r19): an iteration loop re-scans the
    * checkpointed relation many times, so a relation whose per-pass
    * work is non-trivial (the classifier's per-doc feature arrays:
    * ~0.2 s of decimal folds per pass at sf0.1) must not collapse to
    * one partition just because it is smaller than the AQE advisory
    * size — the coalesce saves one stage's scheduling overhead once
    * but serializes every later pass. No extra exchange: only the
    * checkpoint execution's coalesce step is disabled, so at scale
    * (where AQE would not coalesce anyway) the plan is identical.
    * Only for relations whose downstream reductions are order-free
    * (decimal/count discipline) — partition contents change. */
  def checkpointWide(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = s.conf.get(key, "true")
    s.conf.set(key, "false")
    try df.localCheckpoint(eager = true)
    finally s.conf.set(key, prev)
  }

  /** Drop the storage blocks behind eager localCheckpoints whose LAST
    * consumer has materialized (r19, guide §5): the ContextCleaner only
    * frees checkpoint blocks when the frame is GC'd, so a long-lived
    * JVM running hundreds of queries accumulates dead blocks that
    * compete with execution memory. A locally-checkpointed RDD is not
    * recomputable — never call this on a frame that will be read again
    * (returned results stay alive; only intermediates are freed). */
  def freeCheckpoint(dfs: DataFrame*): Unit = dfs.foreach { df =>
    try df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case _: Throwable => () }
  }
}
