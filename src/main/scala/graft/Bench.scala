package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * measures the append (ingest) path against the reference's published
  * numbers (BASELINE.md: tag_simple 1.49M rows/s/core, tag_data wide rows
  * 58k rows/s/core on the native engine).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.core.Sessions.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
    ).getOrCreate()
    graft.core.Sessions.installRules(spark)
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warm-up so the first measured query isn't charged for
    // codegen compiler + executor spin-up.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // ---- ingest benchmark (BASELINE append-path comparison) ----------
    // tag_simple shape: (name varchar, time ns-long, value double)
    val ingestRows = 32000000L
    val simple = spark.range(ingestRows).select(
      concat(lit("tag-"), pmod(col("id"), lit(500)).cast("string")).as("name"),
      (lit(1704067200000000000L) + col("id") * 1000L).as("time"),
      (pmod(col("id"), lit(100000)).cast("double") / 100d).as("value"))
    val simpleDir = Files.createTempDirectory("graft_ingest_simple").toString
    val t1 = System.nanoTime()
    simple.write.mode("append").parquet(simpleDir)
    val simpleSec = (System.nanoTime() - t1) / 1e9
    // tag_data shape: 14 columns incl. json/ipv4/varchar extras
    val wideRows = 4000000L
    val wide = spark.range(wideRows).select(
      concat(lit("tag-"), pmod(col("id"), lit(500)).cast("string")).as("name"),
      (lit(1704067200000000000L) + col("id") * 1000L).as("time"),
      col("id").cast("double").as("value"),
      (col("id") % 32767).cast("short").as("short_value"),
      (col("id") % 65535).cast("int").as("ushort_value"),
      (col("id") % 2147483647L).cast("int").as("int_value"),
      col("id").as("uint_value"),
      col("id").as("long_value"),
      col("id").cast("decimal(20,0)").as("ulong_value"),
      concat(lit("str_"), col("id").cast("string")).as("str_value"),
      concat(lit("{\"k\":"), pmod(col("id"), lit(100)).cast("string"), lit("}")).as("json_value"),
      concat(lit("192.168."), pmod(col("id"), lit(255)).cast("string"), lit(".1")).as("ipv4_value"),
      lit("::1").as("ipv6_value"),
      col("id").cast("string").cast("binary").as("bin_value"))
    val wideDir = Files.createTempDirectory("graft_ingest_wide").toString
    val t2 = System.nanoTime()
    wide.write.mode("append").parquet(wideDir)
    val wideSec = (System.nanoTime() - t2) / 1e9

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val ingest =
      s"""{"tag_simple_rows_per_sec":${(ingestRows / simpleSec).toLong},""" +
      s""""tag_simple_rows_per_sec_core":${(ingestRows / simpleSec / cpus).toLong},""" +
      s""""tag_data_rows_per_sec":${(wideRows / wideSec).toLong},""" +
      s""""tag_data_rows_per_sec_core":${(wideRows / wideSec / cpus).toLong}}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ingest":$ingest,"sf":"$sfDir"}""")
    // clean up ingest scratch
    Seq(simpleDir, wideDir).foreach { d =>
      try {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(d)).deleteRecursively()
      } catch { case _: Throwable => }
    }
    spark.stop()
  }
}
