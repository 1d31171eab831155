package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's canonical configuration.
  *
  * Conventions (see SURVEY.md §1.2, §4):
  *  - session timezone UTC (oracle parity),
  *  - parquet TIMESTAMP(NANOS) columns surface as epoch-ns LongType
  *    (`spark.sql.legacy.parquet.nanosAsLong`) — the engine's native time
  *    representation is epoch nanoseconds, like the reference's `datetime`
  *    (reference: machbase/neo-server `mods/server/http_write.go:56`,
  *    default `timeformat=ns`),
  *  - AQE on (runtime shuffle coalescing + skew-join handling at scale).
  */
object Sessions {
  /** Apply graft defaults to a builder; caller picks master/parallelism. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    // machbase datetime-as-int64 SQL arithmetic (plans/MachTime.Coerce):
    // strictly additive resolution rule, the mixed forms it rewrites are
    // analysis errors without it
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // let AQE coalesce CACHED plans too (off by default): the iterative
    // kernels (classifier GD, Platt fit, kmeans) persist a small
    // intermediate and then run many tiny stages over it — without this
    // the cache pins the static shuffle-partition count and every
    // iteration pays that many near-empty tasks. Scale-adaptive: at
    // production sizes partitions exceed the advisory size and nothing
    // coalesces (optimization guide §2.2).
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // full JVM charset set for CSV sources (EUC-JP etc., like the
    // reference's charset() option)
    .config("spark.sql.legacy.javaCharsets", "true")
    .config("spark.ui.enabled", "false")

  /** Install graft's optimizer rules on an existing session. Safe by
    * default: rollup routing is a no-op until a rollup is registered. */
  def installRules(s: SparkSession): SparkSession = {
    val route = new graft.plans.RollupRouting.Route(s)
    if (!s.experimental.extraOptimizations.exists(_.isInstanceOf[graft.plans.RollupRouting.Route]))
      s.experimental.extraOptimizations = s.experimental.extraOptimizations :+ route
    s
  }

  /** Local session for tests/benchmarks. */
  def local(cores: Int = 4, shufflePartitions: Int = 0): SparkSession = {
    val sp = if (shufflePartitions > 0) shufflePartitions else cores
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", sp.toString)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    installRules(s)
  }
}
