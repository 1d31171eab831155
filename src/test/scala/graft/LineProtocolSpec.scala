package graft

import graft.server.{QueryDoor, TagTables}
import graft.sources.LineProtocol

/** Reproduces the reference's telegraf line-protocol ingest test
  * (TestLineProtocol, mods/server/http_test.go:1549-1618) and pins the
  * spi/do.go:10-80 conversion rules the reference only implies. */
class LineProtocolSpec extends SparkSpec {

  private val telegraf =
    """cpu,cpu=cpu-total,host=desktop usage_irq=0,usage_softirq=0.004171359446037821,usage_guest=0,usage_user=0.3253660367906774,usage_system=0.0792558294748905,usage_idle=99.59120677410203,usage_guest_nice=0,usage_nice=0,usage_iowait=0,usage_steal=0 1670975120000000000
      |system,host=desktop n_users=2i,load1=0.08,load5=0.1,load15=0.09,n_cpus=24i 1670975120000000000
      |system,host=desktop uptime=513536i 1670975120000000000
      |system,host=desktop uptime_format="5 days, 22:38" 1670975120000000000
      |processes,host=desktop zombies=0i,unknown=0i,dead=0i,paging=0i,total_threads=1084i,blocked=0i,stopped=0i,running=0i,sleeping=282i,total=426i,idle=144i 1670975120000000000""".stripMargin

  test("telegraf payload into a tag table, plain and gzip (http_test.go:1549-1618)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      """create tag table test (
        |NAME varchar(200) primary key,
        |TIME datetime basetime,
        |VALUE double summarized,
        |EXT_DATA json)""".stripMargin)
    try {
      val n = LineProtocol.writeTo(spark, "test", telegraf.getBytes("UTF-8"))
      // numeric fields only: cpu 10 + system 5 + uptime 1 + processes 11;
      // the string field uptime_format is skipped (spi/do.go:64-66)
      assert(n == 27L, n.toString)

      val rows = spark.table("test").collect()
      assert(rows.length == 27)
      val idle = rows.find(_.getString(0) == "cpu.usage_idle").get
      assert(idle.getDouble(2) == 99.59120677410203)
      assert(idle.getTimestamp(1).getTime == 1670975120000L)
      assert(!rows.exists(_.getString(0) == "system.uptime_format"))
      // EXT_DATA is json (not varchar) → the host tag is NOT captured
      assert(rows.forall(_.isNullAt(3)))

      // gzip'd payload decodes transparently (Content-Encoding: gzip)
      val buf = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(buf)
      gz.write(telegraf.getBytes("UTF-8")); gz.close()
      assert(LineProtocol.writeTo(spark, "test", buf.toByteArray) == 27L)
      assert(spark.table("test").count() == 54L)
    } finally QueryDoor.execute(spark, "drop table test")
  }

  test("varchar columns beyond (name,time,value) capture UPPERCASED tags (spi/do.go:29-44)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table lp2 (NAME varchar(200) primary key, TIME datetime basetime, VALUE double summarized, HOST varchar(80))")
    try {
      LineProtocol.writeTo(spark, "lp2",
        "cpu,host=desktop,dc=west usage=1.5 1670975120000000000".getBytes("UTF-8"))
      val row = spark.table("lp2").collect().head
      assert(row.getString(0) == "cpu.usage")
      assert(row.getString(3) == "desktop") // HOST matched; dc dropped
    } finally QueryDoor.execute(spark, "drop table lp2")
  }

  test("parser: escapes, types, precision, missing timestamp") {
    val p = LineProtocol.parseLine(
      """my\ app,ta\,g=a\=b s\ tr="say \"hi\", ok",n=3i,f=1.5,b=t 1670975120000""",
      precision = "ms")
    assert(p.measurement == "my app")
    assert(p.tags == Map("ta,g" -> "a=b"))
    assert(p.fields == Seq("s tr" -> "say \"hi\", ok", "n" -> 3L, "f" -> 1.5d, "b" -> true))
    assert(p.tsNs == 1670975120000L * 1000000L)

    val us = LineProtocol.parseLine("m v=1 1670975120000000", precision = "us")
    assert(us.tsNs == 1670975120000000L * 1000L)

    val ex = intercept[IllegalArgumentException] {
      LineProtocol.parseLine("m v=1")
    }
    assert(ex.getMessage == "no timestamp") // reference rejects untimed lines
  }

  test("distributed decode: mapPartitions over raw lines (the 100 TB path)") {
    import spark.implicits._
    val df = LineProtocol.parseDf(telegraf.split("\n").toSeq.toDS())
    assert(df.count() == 27L)
    val byName = df.filter($"name" === "system.load15").collect().head
    assert(byName.getDouble(2) == 0.09)
    assert(byName.getAs[Map[String, String]]("tags") == Map("host" -> "desktop"))
    // ready for the tag-table layout: (name, time, value) shape
    assert(df.columns.take(3).toSeq == Seq("name", "time", "value"))
  }
  test("a missing earlier tag must not shift later tags into its column (spi/do.go per-point columns)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table lp3 (NAME varchar(200) primary key, TIME datetime basetime, VALUE double summarized, HOST varchar(80), REGION varchar(80))")
    try {
      LineProtocol.writeTo(spark, "lp3",
        "cpu,region=west usage=1.5 1670975120000000000".getBytes("UTF-8"))
      val row = spark.table("lp3").collect().head
      assert(row.isNullAt(3), row.toString)     // HOST absent -> its slot null
      assert(row.getString(4) == "west")        // REGION lands in REGION
    } finally QueryDoor.execute(spark, "drop table lp3")
  }
}
