package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: time named SparkEntry queries in isolation.
  *
  * Usage: `sbt "runMain graft.DevTime q_dup_spans q_dedup_substring"`
  * (env `SPARK_GRAFT_SF_DIR` picks the scale, default sf0.1;
  * `SPARK_GRAFT_EXPLAIN=1` additionally prints the executed plan).
  *
  * Deliberately separate from [[Bench]]: Bench's drift detection keys
  * off `bench_full.json`, so a filtered run must never overwrite that
  * record — this main writes nothing.
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.configure(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
    ).getOrCreate()
    graft.core.Sessions.installRules(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s best=${runs.min}%.3f s  runs=${runs.map(r => f"$r%.3f").mkString(",")}")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
