package graft

import graft.server.{QueryDoor, TagTables, WriteDoor}
import graft.sinks.Codecs

/** Reproduces the reference's `/db/write/:table` ingest battery
  * (TestHttpWrite, mods/server/http_test.go:1308-1548): JSON envelope /
  * NDJSON / CSV payloads (plain and gzip), partial columns, base64
  * binary, epoch-seconds timeformat — verified through the same
  * select-and-render round trip the reference asserts. */
class WriteDoorSpec extends SparkSpec {

  private val tick = 1705291859L // the reference's testTimeTick (epoch s)

  private def selectCsv(where: String): String =
    trimClose(Codecs.render(
      QueryDoor.execute(spark, s"select * from test_w where name = '$where'"),
      "CSV", Codecs.Options(heading = true, timeformat = Some("s"))))

  private def gzip(s: String): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(buf)
    gz.write(s.getBytes("UTF-8")); gz.close()
    buf.toByteArray
  }

  test("json / ndjson / csv write payloads land with the reference's render (http_test.go:1308-1548)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      """create tag table test_w (
        |name varchar(200) primary key,
        |time datetime basetime,
        |value double summarized,
        |jsondata json,
        |ival int,
        |sval short,
        |bval binary)""".stripMargin)
    try {
      // --- json envelope (rows + base64 binary like Go's json.Marshal)
      val json =
        s"""{"data":{"columns":["name","time","value","jsondata","ival","sval","bval"],
           |"rows":[["test_1",$tick,1.12,null,101,102,"AQI="],
           |["test_1",${tick + 1},2.23,null,201,202,"AwQ="]]}}""".stripMargin
      WriteDoor.write(spark, "test_w", json.getBytes("UTF-8"),
        "application/json", Map("timeformat" -> "s"))
      assert(selectCsv("test_1") ==
        "NAME,TIME,VALUE,JSONDATA,IVAL,SVAL,BVAL\n" +
        s"test_1,$tick,1.12,NULL,101,102,0x0102\n" +
        s"test_1,${tick + 1},2.23,NULL,201,202,0x0304\n")

      // --- ndjson (method=insert)
      val nd =
        s"""{"name":"test_2","time":$tick,"value":1.12,"jsondata":null,"ival":101,"sval":102,"bval":"AQI="}
           |{"name":"test_2","time":${tick + 1},"value":2.23,"jsondata":null,"ival":201,"sval":202,"bval":"AwQ="}""".stripMargin
      WriteDoor.write(spark, "test_w", nd.getBytes("UTF-8"),
        "application/x-ndjson", Map("timeformat" -> "s", "method" -> "insert"))
      assert(selectCsv("test_2").contains(s"test_2,$tick,1.12,NULL,101,102,0x0102"))

      // --- csv with case-insensitive header and base64 binary
      val csv =
        s"""name,TIME,Value,JSONDATA,ival,SVAL,BVAL
           |csv_1,$tick,1.12,,101,102,AQI=
           |csv_1,${tick + 1},2.23,,201,202,AwQ=""".stripMargin
      WriteDoor.write(spark, "test_w", csv.getBytes("UTF-8"),
        "text/csv", Map("timeformat" -> "s", "method" -> "insert", "header" -> "columns"))
      assert(selectCsv("csv_1") ==
        "NAME,TIME,VALUE,JSONDATA,IVAL,SVAL,BVAL\n" +
        s"csv_1,$tick,1.12,NULL,101,102,0x0102\n" +
        s"csv_1,${tick + 1},2.23,NULL,201,202,0x0304\n")

      // --- csv partial columns: unnamed columns go NULL
      val partial =
        s"""name,TIME,Value
           |csv_partial_1,$tick,1.12
           |csv_partial_1,${tick + 1},2.23""".stripMargin
      WriteDoor.write(spark, "test_w", partial.getBytes("UTF-8"),
        "text/csv", Map("timeformat" -> "s", "method" -> "append", "header" -> "columns"))
      assert(selectCsv("csv_partial_1") ==
        "NAME,TIME,VALUE,JSONDATA,IVAL,SVAL,BVAL\n" +
        s"csv_partial_1,$tick,1.12,NULL,NULL,NULL,NULL\n" +
        s"csv_partial_1,${tick + 1},2.23,NULL,NULL,NULL,NULL\n")

      // --- csv partial with one extra named column
      val partial2 =
        s"""name,TIME,Value,sval
           |csv_partial_2,$tick,1.12,102
           |csv_partial_2,${tick + 1},2.23,202""".stripMargin
      WriteDoor.write(spark, "test_w", partial2.getBytes("UTF-8"),
        "text/csv", Map("timeformat" -> "s", "method" -> "append", "header" -> "columns"))
      assert(selectCsv("csv_partial_2").contains(
        s"csv_partial_2,$tick,1.12,NULL,NULL,102,NULL"))

      // --- gzip'd csv (Content-Encoding / compress=gzip)
      val gzCsv =
        s"""name,TIME,Value,JSONDATA,ival,SVAL,bval
           |csv_gzip,$tick,1.12,,101,102,AQI=
           |csv_gzip,${tick + 1},2.23,,201,202,AwQ=""".stripMargin
      WriteDoor.write(spark, "test_w", gzip(gzCsv),
        "text/csv", Map("timeformat" -> "s", "method" -> "insert",
          "header" -> "columns", "compress" -> "gzip"))
      assert(selectCsv("csv_gzip").contains(s"csv_gzip,$tick,1.12,NULL,101,102,0x0102"))
    } finally QueryDoor.execute(spark, "drop table test_w")
  }
  test("ndjson: fields appearing only in later lines are kept (not dropped)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table test_nd (name varchar(200) primary key, time datetime basetime, value double summarized, ival int)")
    try {
      val nd =
        s"""{"name":"nd_a","time":$tick,"value":1.5}
           |{"name":"nd_b","time":${tick + 1},"value":2.5,"ival":7}""".stripMargin
      WriteDoor.write(spark, "test_nd", nd.getBytes("UTF-8"),
        "application/x-ndjson", Map("timeformat" -> "s"))
      val rows = spark.table("test_nd").orderBy("name").collect()
      assert(rows.length == 2)
      assert(rows(0).isNullAt(3))        // first line has no ival
      assert(rows(1).getInt(3) == 7, rows(1).toString) // later-line field kept
    } finally QueryDoor.execute(spark, "drop table test_nd")
  }
}
