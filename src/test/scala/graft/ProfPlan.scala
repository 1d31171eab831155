package graft
object ProfPlan {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val spark = graft.core.Sessions.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    graft.core.Sessions.installRules(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    df.queryExecution.toRdd.count()
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
