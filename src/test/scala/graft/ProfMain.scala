package graft
// dev-only profiling entry (Test scope): sbt "Test/runMain graft.ProfMain <sfDir> q_a q_b..."
object ProfMain {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val spark = graft.core.Sessions.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    graft.core.Sessions.installRules(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"[prof] $name ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    time("warmup") { SparkEntry.queries("q_dedup_exact")(spark, dir).queryExecution.toRdd.count() }
    for (i <- 1 to 2; q <- args.drop(1))
      time(s"$q#$i") { SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count() }
    spark.stop()
  }
}
