package graft

/** Dev-only: apples-to-apples timing of hardNegatives guard variants
  * (plain broadcast vs stats-guard vs count-guard). */
object ProfHn {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def emb = spark.read.parquet(s"$dir/embeddings.parquet")

    def plain() = {
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          transform(col("embedding"), x => x.cast("double")).as("qe"))
      val e = emb.select(col("vec_id").as("eid"), col("label").as("elabel"),
        transform(col("embedding"), x => x.cast("double")).as("ee"))
      val scored = e.join(broadcast(q),
        col("qid") =!= col("eid") && col("qlabel") =!= col("elabel"))
        .withColumn("cos_sim", graft.functions.ArrayExprs.cosineSim(
          spark, col("qe"), col("ee")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos_sim").desc, col("eid").asc)
      scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("eid"),
          (floor(col("cos_sim") * 1e6 + 0.5) / 1e6).as("cos_sim"))
        .orderBy("qid", "rnk")
    }
    def guarded() = graft.similarity.Ann.hardNegatives(
        emb.filter(col("vec_id") < 5), emb, k = 5, labelCol = "label")
      .select(col("qid"), col("rnk"), col("eid"),
        (floor(col("cos_sim") * 1e6 + 0.5) / 1e6).as("cos_sim"))
      .orderBy("qid", "rnk")

    for ((name, f) <- Seq("plain" -> (() => plain()),
                          "guarded" -> (() => guarded()))) {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-8s best=${times.min}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
