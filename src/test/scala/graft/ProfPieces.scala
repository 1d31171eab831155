package graft
object ProfPieces {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val spark = graft.core.Sessions.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    graft.core.Sessions.installRules(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"[prof] $name ${(System.nanoTime - t0) / 1e9}%.2f s ($n rows)")
    }
    val docs = spark.read.parquet(dir + "/documents.parquet")
    time("warmup") { docs.count() }
    val sub = docs.filter(col("doc_id") < 300)
    val toks = sub.select(col("doc_id"),
      explode(split(regexp_replace(lower(col("text")), "\\s+", " "), " ")).as("term"))
    time("toks") { toks.queryExecution.toRdd.count() }
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    time("tf") { tf.queryExecution.toRdd.count() }
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    time("df") { df_.queryExecution.toRdd.count() }
    val n = toks.agg(count_distinct(col("doc_id")).as("n_docs"))
    time("n") { n.queryExecution.toRdd.count() }
    val joined = tf.join(df_, "term").crossJoin(broadcast(n))
    time("join") { joined.queryExecution.toRdd.count() }
    val full = graft.text.TextOps.tfidfTopTerms(sub, "doc_id", "text", 3)
    time("full") { full.queryExecution.toRdd.count() }
    time("full2") { full.queryExecution.toRdd.count() }
    spark.stop()
  }
}
