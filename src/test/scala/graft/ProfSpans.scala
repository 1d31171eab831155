package graft
// dev-only A/B: gram-string vs xxhash64-gram duplicateSpans shuffles.
// sbt "Test/runMain graft.ProfSpans /root/testdata/sf0.1"
object ProfSpans {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val spark = graft.core.Sessions.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = 5
    def words(text: org.apache.spark.sql.Column) =
      split(regexp_replace(lower(text), "\\s+", " "), " ")
    def grams(ws: org.apache.spark.sql.Column) =
      when(size(ws) >= n, transform(sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    def spans(hashGrams: Boolean) = {
      val pg0 = docs.select(col("doc_id"), words(col("text")).as("__ws"))
        .select(col("doc_id"), posexplode(grams(col("__ws"))).as(Seq("pos", "gram")))
      val pg = if (hashGrams)
        pg0.select(col("doc_id"), col("pos").cast("long").as("pos"), xxhash64(col("gram")).as("g"))
      else pg0.select(col("doc_id"), col("pos").cast("long").as("pos"), col("gram").as("g"))
      val dup = if (hashGrams) {
        // per-doc array_distinct BEFORE explode: one partial-agg shuffle,
        // no shuffle-distinct of the (id, gram) stream
        docs.select(words(col("text")).as("__ws"))
          .select(explode(array_distinct(
            transform(grams(col("__ws")), g => xxhash64(g)))).as("g"))
          .groupBy("g").agg(count(lit(1)).as("nd")).filter(col("nd") >= 2).select("g")
      } else pg.select(col("doc_id"), col("g")).distinct()
        .groupBy("g").agg(count(lit(1)).as("nd")).filter(col("nd") >= 2).select("g")
      val j = pg.join(dup, Seq("g"), "left_semi")
      val byPos = Window.partitionBy("doc_id").orderBy("pos")
      val prev = lag(col("pos"), 1).over(byPos)
      j.withColumn("brk", when(prev.isNull || col("pos") > prev + n, 1).otherwise(0))
        .withColumn("isl", sum(col("brk")).over(byPos))
        .groupBy(col("doc_id"), col("isl"))
        .agg(min("pos").as("s"), (max("pos") + (n - 1)).as("e"), count(lit(1)).as("ng"))
    }
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"[prof] $name ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    time("warmup") { spans(hashGrams = true).queryExecution.toRdd.count() }
    for (i <- 1 to 4) {
      time(s"string#$i") { spans(hashGrams = false).queryExecution.toRdd.count() }
      time(s"xxhash#$i") { spans(hashGrams = true).queryExecution.toRdd.count() }
    }
    spark.stop()
  }
}
