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

  test("csv text timeformats decode wall-clock datetimes (csv_decode_test.go TestCsvDecoderTimeformat)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table test_tf (name varchar(200) primary key, time datetime basetime, value double summarized)")
    try {
      // "Default" named format: 2024-09-27 10:00:01.000 UTC → 1727431201
      val def1 =
        """my-car,2024-09-27 10:00:01.000,1.0001
          |my-car,2024-09-27 10:00:02.000,2.0002""".stripMargin
      WriteDoor.write(spark, "test_tf", def1.getBytes("UTF-8"),
        "text/csv", Map("timeformat" -> "Default", "tz" -> "UTC"))
      // literal Go layout with slash date + header row
      val go1 =
        """NAME,TIME,VALUE
          |go-car,2024/09/27 10:00:01,1.0001
          |go-car,2024/09/27 10:00:02,2.0002""".stripMargin
      WriteDoor.write(spark, "test_tf", go1.getBytes("UTF-8"),
        "text/csv", Map("timeformat" -> "2006/01/02 15:04:05", "tz" -> "UTC",
          "header" -> "columns"))
      val got = trimClose(Codecs.render(
        QueryDoor.execute(spark, "select * from test_tf"),
        "CSV", Codecs.Options(heading = true, timeformat = Some("s"))))
      assert(got ==
        "NAME,TIME,VALUE\n" +
        "my-car,1727431201,1.0001\nmy-car,1727431202,2.0002\n" +
        "go-car,1727431201,1.0001\ngo-car,1727431202,2.0002\n", got)
      // the Default fraction is OPTIONAL on parse (Go ".999"): fractionless
      // text under "Default" must land on the same instant
      WriteDoor.write(spark, "test_tf",
        "nf-car,2024-09-27 10:00:01,3.5".getBytes("UTF-8"),
        "text/csv", Map("timeformat" -> "Default", "tz" -> "UTC"))
      val nf = trimClose(Codecs.render(
        QueryDoor.execute(spark, "select * from test_tf where name = 'nf-car'"),
        "CSV", Codecs.Options(timeformat = Some("s"))))
      assert(nf == "nf-car,1727431201,3.5\n", nf)
      // the JSON envelope and NDJSON decoders share the text-timeformat
      // semantics (json_decode_test.go TestJsonDecoder case 3,
      // ndjson/decode_test.go TestNDJsonDecoder case 4)
      WriteDoor.write(spark, "test_tf",
        """{"data":{"columns":["name","time","value"],
          |"rows":[["js-car","2024-09-27 10:00:01.000",1.0001]]}}""".stripMargin
          .getBytes("UTF-8"),
        "application/json", Map("timeformat" -> "Default", "tz" -> "UTC"))
      WriteDoor.write(spark, "test_tf",
        """{"name":"nd-car","time":"2024/09/27 10:00:01","value":1.0001}"""
          .getBytes("UTF-8"),
        "application/x-ndjson",
        Map("timeformat" -> "2006/01/02 15:04:05", "tz" -> "UTC"))
      val js = trimClose(Codecs.render(
        QueryDoor.execute(spark,
          "select * from test_tf where name in ('js-car','nd-car') order by name"),
        "CSV", Codecs.Options(timeformat = Some("s"))))
      assert(js == "js-car,1727431201,1.0001\nnd-car,1727431201,1.0001\n", js)
    } finally QueryDoor.execute(spark, "drop table test_tf")
  }

  test("json decoder shapes: single bare row, rows wider than the columns list (json_test.go TestSingleRowDecoder/TestDecoder)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      """create tag table test_js (
        |name varchar(200) primary key,
        |time datetime basetime,
        |value double summarized,
        |iv int)""".stripMargin)
    try {
      // single bare row is one record
      WriteDoor.write(spark, "test_js",
        """["solo", 1676528839, 0.1234, 7]""".getBytes("UTF-8"),
        "application/json", Map("timeformat" -> "s"))
      // envelope rows WIDER than the listed columns decode positionally
      // against the table schema (the reference decoder ignores the list)
      WriteDoor.write(spark, "test_js",
        """{"data":{"columns":["name","time"],
          |"rows":[["wide", 1676528840, 0.2345, 9]]}}""".stripMargin
          .getBytes("UTF-8"),
        "application/json", Map("timeformat" -> "s"))
      val got = trimClose(Codecs.render(
        QueryDoor.execute(spark, "select * from test_js order by name"),
        "CSV", Codecs.Options(timeformat = Some("s"))))
      assert(got == "solo,1676528839,0.1234,7\nwide,1676528840,0.2345,9\n", got)
      // mixed-arity batch: arity decided PER ROW — the 2-wide row maps by
      // the listed names (iv goes NULL), the 4-wide row positionally
      // against the table schema; the narrow row must NOT be misassigned
      WriteDoor.write(spark, "test_js",
        """{"data":{"columns":["name","time"],
          |"rows":[["mixN", 1676528841], ["mixW", 1676528842, 0.5, 3]]}}"""
          .stripMargin.getBytes("UTF-8"),
        "application/json", Map("timeformat" -> "s"))
      val got2 = trimClose(Codecs.render(
        QueryDoor.execute(spark,
          "select * from test_js where name like 'mix%' order by name"),
        "CSV", Codecs.Options(timeformat = Some("s"))))
      assert(got2 == "mixN,1676528841,NULL,NULL\nmixW,1676528842,0.5,3\n", got2)
      // a row whose arity matches neither the listed columns nor the
      // table schema errors like the reference (json_decode.go:58-61
      // "number of columns not matched"), never zip-truncates
      val err = intercept[IllegalArgumentException] {
        WriteDoor.write(spark, "test_js",
          """{"data":{"columns":["name","time"],
            |"rows":[["bad", 1676528843, 0.9]]}}""".stripMargin
            .getBytes("UTF-8"),
          "application/json", Map("timeformat" -> "s"))
      }
      assert(err.getMessage.contains("number of columns not matched"),
        err.getMessage)
    } finally QueryDoor.execute(spark, "drop table test_js")
  }

  test("binaryformat=hex decodes 0x-hex binary cells; default stays base64 (http_write_test.go TestWriteBinaryFormat)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table wbin (name varchar(40) primary key, time datetime basetime, value binary)")
    try {
      WriteDoor.write(spark, "wbin",
        s"""{"data":{"columns":["NAME","TIME","VALUE"],"rows":[["json_base64",1691800174123456789,"AQKgsMDQ4PA="]]}}"""
          .getBytes("UTF-8"), "application/json", Map("method" -> "append"))
      WriteDoor.write(spark, "wbin",
        s"""{"data":{"columns":["NAME","TIME","VALUE"],"rows":[["json_hex",1691800174123456789,"0x0102a0b0c0d0e0f0"]]}}"""
          .getBytes("UTF-8"), "application/json",
        Map("method" -> "append", "binaryformat" -> "hex"))
      val got = trimClose(Codecs.render(
        QueryDoor.execute(spark, "select name, value from wbin order by name"),
        "CSV", Codecs.Options()))
      assert(got == "json_base64,0x0102a0b0c0d0e0f0\njson_hex,0x0102a0b0c0d0e0f0\n", got)
    } finally QueryDoor.execute(spark, "drop table wbin")
  }

  test("csv empty cells: varchar decodes to '', json/numerics to NULL (csv_decode_test.go TestCsvDecoder null-values)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      """create tag table test_nulls (
        |name varchar(200) primary key,
        |time datetime basetime,
        |value double summarized,
        |strv varchar(100),
        |jsv json,
        |iv int)""".stripMargin)
    try {
      WriteDoor.write(spark, "test_nulls",
        s"null.double,$tick,,,,".getBytes("UTF-8"),
        "text/csv", Map("timeformat" -> "s"))
      val r = spark.table("test_nulls").collect()(0)
      assert(r.isNullAt(r.fieldIndex("VALUE")))  // empty double → NULL
      assert(r.getString(r.fieldIndex("STRV")) == "") // empty varchar → ""
      assert(r.isNullAt(r.fieldIndex("JSV")))    // empty json → NULL
      assert(r.isNullAt(r.fieldIndex("IV")))     // empty int → NULL
      // quote-doubled JSON payload in a varchar cell survives the RFC-4180
      // unescape: "{""name"":1234}" → {"name":1234}
      WriteDoor.write(spark, "test_nulls",
        (s"""json.data,${tick + 1},1.5,"{""name"":1234}",,7""").getBytes("UTF-8"),
        "text/csv", Map("timeformat" -> "s"))
      val r2 = spark.table("test_nulls")
        .filter(org.apache.spark.sql.functions.col("NAME") === "json.data")
        .collect()(0)
      assert(r2.getString(r2.fieldIndex("STRV")) == """{"name":1234}""", r2)
      assert(r2.getInt(r2.fieldIndex("IV")) == 7)
    } finally QueryDoor.execute(spark, "drop table test_nulls")
  }
}
