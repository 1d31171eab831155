package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Lake
import graft.plans.RollupRouting
import graft.time.TimeFns

class RollupRoutingSpec extends SparkSpec {
  import spark.implicits._

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString).mkString(",")
          case _ => ""
        }
    }

  test("bucket aggregates are routed onto the rollup table") {
    val rawPath = Files.createTempDirectory("graft_raw").toString + "/t"
    val rollupPath = Files.createTempDirectory("graft_roll").toString + "/r"
    // 2 tags × 3 hours of integer-valued data (exact double sums)
    val base = 1704067200000000000L
    val rows = for {
      tag <- Seq("a", "b"); h <- 0 until 3; i <- 0 until 10
    } yield (tag, base + h * TimeFns.NsPerHour + i * TimeFns.NsPerMin, (h * 10 + i).toDouble)
    rows.toDF("name", "time", "value").write.parquet(rawPath)

    val raw = spark.read.parquet(rawPath)
    Lake.rollup(raw, col("name"), col("time"), col("value"), "HOUR")
      .write.parquet(rollupPath)

    // direct result BEFORE routing is active
    def query = spark.read.parquet(rawPath)
      .groupBy(col("name"),
        TimeFns.roundTimeNs(col("time"), 3 * TimeFns.NsPerHour).as("bucket"))
      .agg(sum("value").as("s"), count("value").as("c"),
        min("value").as("mn"), max("value").as("mx"), avg("value").as("av"))
      .orderBy("name", "bucket")
    val direct = query.collect().map(_.toSeq)

    RollupRouting.register(rawPath, RollupRouting.Spec(
      rollupPath, TimeFns.NsPerHour, "name", "time", "value"))
    spark.experimental.extraOptimizations = Seq(new RollupRouting.Route(spark))
    try {
      val routed = query
      val scans = scanPaths(routed)
      assert(scans.exists(_.contains("graft_roll")), s"plan not rewritten: $scans")
      assert(!scans.exists(_.contains("graft_raw")), s"raw table still scanned: $scans")
      val got = routed.collect().map(_.toSeq)
      assert(got.toSeq == direct.toSeq)
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  test("aligned time-range filters route; misaligned ones do not") {
    val rawPath = Files.createTempDirectory("graft_raw3").toString + "/t"
    val rollupPath = Files.createTempDirectory("graft_roll3").toString + "/r"
    val base = 1704067200000000000L
    val rows = for {
      tag <- Seq("a", "b"); h <- 0 until 6; i <- 0 until 4
    } yield (tag, base + h * TimeFns.NsPerHour + i * TimeFns.NsPerMin, (h + i).toDouble)
    rows.toDF("name", "time", "value").write.parquet(rawPath)
    Lake.rollup(spark.read.parquet(rawPath), col("name"), col("time"), col("value"), "HOUR")
      .write.parquet(rollupPath)

    def windowed(lo: Long, hi: Long) = spark.read.parquet(rawPath)
      .filter(col("name") === "a" && col("time") >= lo && col("time") < hi)
      .groupBy(TimeFns.roundTimeNs(col("time"), 2 * TimeFns.NsPerHour).as("bucket"))
      .agg(sum("value").as("s"), count("value").as("c"))
      .orderBy("bucket")

    val alignedDirect = windowed(base + TimeFns.NsPerHour, base + 5 * TimeFns.NsPerHour).collect().map(_.toSeq)
    RollupRouting.register(rawPath, RollupRouting.Spec(
      rollupPath, TimeFns.NsPerHour, "name", "time", "value"))
    spark.experimental.extraOptimizations = Seq(new RollupRouting.Route(spark))
    try {
      // hour-aligned window → routed
      val routed = windowed(base + TimeFns.NsPerHour, base + 5 * TimeFns.NsPerHour)
      val scans = scanPaths(routed)
      assert(scans.exists(_.contains("graft_roll3")), s"not routed: $scans")
      assert(routed.collect().map(_.toSeq).toSeq == alignedDirect.toSeq)
      // misaligned (30-min offset) window → stays on raw
      val mis = windowed(base + 30 * TimeFns.NsPerMin, base + 5 * TimeFns.NsPerHour)
      assert(scanPaths(mis).exists(_.contains("graft_raw3")), "misaligned must not route")
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  test("NTZ-timestamp raw tables route through the tsNs conversion shape") {
    // mirrors the gate-query shape since the testdata moved to µs-naive
    // parquet timestamps: grouping on roundTimeNs(Q.tsNs(df)) and a
    // Q.tsRangeNs typed-literal filter must still hit the rollup
    val rawPath = Files.createTempDirectory("graft_rawntz").toString + "/t"
    val rollupPath = Files.createTempDirectory("graft_rollntz").toString + "/r"
    val base = 1704067200000000000L
    val rows = for {
      tag <- Seq("a", "b"); h <- 0 until 6; i <- 0 until 4
    } yield (tag,
      java.time.LocalDateTime.ofEpochSecond(
        (base + h * TimeFns.NsPerHour + i * TimeFns.NsPerMin) / 1000000000L,
        0, java.time.ZoneOffset.UTC),
      (h + i).toDouble)
    rows.toDF("name", "time", "value").write.parquet(rawPath)
    val raw = spark.read.parquet(rawPath)
    assert(raw.schema("time").dataType ==
      org.apache.spark.sql.types.TimestampNTZType, raw.schema("time").dataType.toString)
    Lake.rollup(raw, col("name"), graft.queries.Q.tsNs(raw, "time"),
      col("value"), "HOUR").write.parquet(rollupPath)

    def query = {
      val df = spark.read.parquet(rawPath)
      df.filter(graft.queries.Q.tsRangeNs(df,
          base + TimeFns.NsPerHour, base + 5 * TimeFns.NsPerHour, "time"))
        .groupBy(col("name"),
          TimeFns.roundTimeNs(graft.queries.Q.tsNs(df, "time"), 2 * TimeFns.NsPerHour).as("bucket"))
        .agg(sum("value").as("s"), count("value").as("c"),
          min("value").as("mn"), max("value").as("mx"))
        .orderBy("name", "bucket")
    }
    val direct = query.collect().map(_.toSeq)
    RollupRouting.register(rawPath, RollupRouting.Spec(
      rollupPath, TimeFns.NsPerHour, "name", "time", "value"))
    spark.experimental.extraOptimizations = Seq(new RollupRouting.Route(spark))
    try {
      val routed = query
      val scans = scanPaths(routed)
      assert(scans.exists(_.contains("graft_rollntz")), s"plan not rewritten: $scans")
      assert(!scans.exists(_.contains("graft_rawntz")), s"raw table still scanned: $scans")
      assert(routed.collect().map(_.toSeq).toSeq == direct.toSeq)
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  test("non-divisible bucket periods are NOT rewritten") {
    val rawPath = Files.createTempDirectory("graft_raw2").toString + "/t"
    val rollupPath = Files.createTempDirectory("graft_roll2").toString + "/r"
    Seq(("a", 1704067200000000000L, 1.0)).toDF("name", "time", "value")
      .write.parquet(rawPath)
    spark.read.parquet(rawPath).limit(0) // materialize schema
    Lake.rollup(spark.read.parquet(rawPath), col("name"), col("time"), col("value"), "HOUR")
      .write.parquet(rollupPath)
    RollupRouting.register(rawPath, RollupRouting.Spec(
      rollupPath, TimeFns.NsPerHour, "name", "time", "value"))
    spark.experimental.extraOptimizations = Seq(new RollupRouting.Route(spark))
    try {
      // 45-minute buckets don't divide the hourly rollup → no rewrite
      val q = spark.read.parquet(rawPath)
        .groupBy(TimeFns.roundTimeNs(col("time"), 45 * TimeFns.NsPerMin).as("bucket"))
        .agg(sum("value").as("s"))
      val scans = scanPaths(q)
      assert(scans.exists(_.contains("graft_raw2")), s"should still scan raw: $scans")
      assert(!scans.exists(_.contains("graft_roll2")), s"must not route: $scans")
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }
}
