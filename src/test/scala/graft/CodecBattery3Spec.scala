package graft

import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.DataFrame
import graft.sinks.Codecs
import graft.time.TimeFns

/** Third body-level pass over the four codec encoder batteries —
  * mods/codec/internal/{csv/csv_encode_test.go, json/json_encode_test.go,
  * ndjson/encode_test.go, box/box_encode_test.go} — covering the test
  * funcs earlier passes cited only behavior-level. Go-only branches
  * (sql.Null wrappers, unsigned ints, pointer cells, func() marshal
  * errors, Flush/Close call counting on Go streams) have no analogue on
  * the Spark-typed surface; everything wire-observable is pinned here.
  */
class CodecBattery3Spec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.from(Instant.ofEpochSecond(1691800174L, 123456789L))
  private val bin6 = Array[Byte](0x01, 0x02, 0x03, 0x04, 0x05, 0x06)

  // ---- json_encode_test.go ------------------------------------------------

  test("JSON envelope: epoch number / Go layout text / empty rows (json_encode_test.go:89-155 TestJsonEncode)") {
    val t1 = Timestamp.from(Instant.ofEpochSecond(1670380342L))
    val t2 = Timestamp.from(Instant.ofEpochSecond(1670380343L))
    val df = Seq(("my-car", t1, 1.0001d), ("my-car", t2, 2.0002d))
      .toDF("name", "time", "value")
    // utc-default: datetimes as epoch-ns NUMBERS
    val o0 = Codecs.Options(elapse = Some("1ms"))
    assert(Codecs.render(df, "JSON", o0) ==
      """{"data":{"columns":["name","time","value"],"types":["string","datetime","double"],""" +
      """"rows":[["my-car",1670380342000000000,1.0001],["my-car",1670380343000000000,2.0002]]},""" +
      """"success":true,"reason":"success","elapse":"1ms"}""")
    // utc-timeformat-s: epoch seconds, still a NUMBER
    val oS = o0.copy(timeformat = Some("s"))
    assert(Codecs.render(df, "JSON", oS).contains(
      """"rows":[["my-car",1670380342,1.0001],["my-car",1670380343,2.0002]]"""))
    // utc-timeformat: the Go layout 2006/01/02 15:04:05 renders quoted TEXT
    val layout = TimeFns.resolveNamedOrGoFormat("2006/01/02 15:04:05")._1
    val oT = o0.copy(timeformat = Some(layout))
    assert(Codecs.render(df, "JSON", oT).contains(
      """"rows":[["my-car","2022/12/07 02:32:22",1.0001],["my-car","2022/12/07 02:32:23",2.0002]]"""))
    // empty-result: full envelope with rows:[]
    val empty = Seq.empty[(String, Timestamp, Double)].toDF("name", "time", "value")
    assert(Codecs.render(empty, "JSON", o0) ==
      """{"data":{"columns":["name","time","value"],"types":["string","datetime","double"],""" +
      """"rows":[]},"success":true,"reason":"success","elapse":"1ms"}""")
  }

  test("JSON AppendJSONValue primitives: bool/ints/float32-precision/map (json_encode_test.go:314-350)") {
    val df = Seq((true, 5L, 1.25f, Map("k" -> "v"), "hello"))
      .toDF("b", "i64", "f32", "m", "s")
    val out = Codecs.render(df, "JSON",
      Codecs.Options(precision = 2, elapse = Some("1ms")))
    // float32 at precision 2 → 1.25; ints bare; map → nested object
    assert(out.contains(""""rows":[[true,5,1.25,{"k":"v"},"hello"]]"""), out)
  }

  test("JSON rowsFlatten: null cells stay null tokens inline (json_encode_test.go:253-282 TestJsonEncodeRowsFlatten)") {
    val df = Seq(
      ("car-1", Some(Timestamp.from(Instant.ofEpochSecond(1700000000L))), 1L, 1.25d),
      ("car-2", Option.empty[Timestamp], 2L, 2.5d))
      .toDF("name", "time", "seq", "value")
    val out = Codecs.render(df, "JSON",
      Codecs.Options(rowsFlatten = true, elapse = Some("1ms")))
    assert(out.contains(
      """"rows":["car-1",1700000000000000000,1,1.25,"car-2",null,2,2.5]"""), out)
  }

  test("JSON binary cells honor binaryformat, rownum interleaved (json_encode_test.go:434-466 TestBinaryFormat)") {
    def run(bf: String): String =
      Codecs.render(Seq((bf, bin6)).toDF("FORMAT", "BIN"), "JSON",
        Codecs.Options(rownum = true, heading = true, binaryFormat = bf,
          elapse = Some("1ms")))
    assert(run("preview").contains("""[[1,"preview","0x0102030405.."]]"""))
    assert(run("hex").contains("""[[1,"hex","0x010203040506"]]"""))
    assert(run("bytes").contains("""[[1,"bytes","[1 2 3 4 5 6]"]]"""))
    assert(run("base64").contains("""[[1,"base64","AQIDBAUG"]]"""))
    assert(run("_unknown_").contains("""[[1,"_unknown_","0x010203040506"]]"""))
  }

  // ---- ndjson/encode_test.go ----------------------------------------------

  test("NDJSON typed rows and nulls: every null cell keeps its key (encode_test.go:266-343 TestNdjsonEncodeTypedRowsAndNulls)") {
    val tm = Timestamp.from(Instant.ofEpochSecond(1700000000L))
    val df = Seq(
      (Some(tm), Some(3.5d), Some(1.25f), Some(true), Some(64L), Some("text"),
        Map("nested" -> 1L)),
      (Option.empty[Timestamp], Option.empty[Double], Option.empty[Float],
        Option.empty[Boolean], Option.empty[Long], Option.empty[String],
        Map.empty[String, Long]))
      .toDF("ptime", "pfloat64", "pfloat32", "nbool", "nint64", "nstring", "plain")
    val out = Codecs.render(df, "NDJSON", Codecs.Options())
    val lines = out.split("\n").filter(_.nonEmpty)
    assert(lines.length == 2, out)
    assert(lines(0) ==
      """{"ptime":1700000000000000000,"pfloat64":3.5,"pfloat32":1.25,""" +
      """"nbool":true,"nint64":64,"nstring":"text","plain":{"nested":1}}""", lines(0))
    // the null row renders explicit null tokens for EVERY key
    assert(lines(1) ==
      """{"ptime":null,"pfloat64":null,"pfloat32":null,""" +
      """"nbool":null,"nint64":null,"nstring":null,"plain":{}}""", lines(1))
  }

  test("NDJSON binary cells honor binaryformat with a ROWNUM key (encode_test.go:364-399 TestBinaryFormat)") {
    def run(bf: String): String =
      Codecs.render(Seq((bf, bin6)).toDF("FORMAT", "BIN"), "NDJSON",
        Codecs.Options(rownum = true, binaryFormat = bf)).split("\n").head
    assert(run("preview") == """{"ROWNUM":1,"FORMAT":"preview","BIN":"0x0102030405.."}""")
    assert(run("hex") == """{"ROWNUM":1,"FORMAT":"hex","BIN":"0x010203040506"}""")
    assert(run("bytes") == """{"ROWNUM":1,"FORMAT":"bytes","BIN":"[1 2 3 4 5 6]"}""")
    assert(run("base64") == """{"ROWNUM":1,"FORMAT":"base64","BIN":"AQIDBAUG"}""")
    assert(run("_unknown_") == """{"ROWNUM":1,"FORMAT":"_unknown_","BIN":"0x010203040506"}""")
  }

  // ---- csv_encode_test.go -------------------------------------------------

  test("CSV JSON-text cells quote with doubled quotes; binary hex (csv_encode_test.go:481-520 TestCsvEncoderAdditionalTypeBranches)") {
    val df = Seq(("""{"a":1}""", """{"b":2}""", Array[Byte](0x0a, 0x0b), 16L))
      .toDF("json_valid", "json_scalar", "ptr_bin", "u16")
    val out = Codecs.render(df, "CSV", Codecs.Options(heading = true))
    assert(out ==
      "json_valid,json_scalar,ptr_bin,u16\n" +
      "\"{\"\"a\"\":1}\",\"{\"\"b\"\":2}\",0x0a0b,16\n\n", out)
  }

  test("CSV typed row + all-null substituteNull row (csv_encode_test.go:344-396 TestCsvEncoderSqlAndGeoTypes)") {
    val kitchen = TimeFns.resolveNamedOrGoFormat("KITCHEN")._1
    val df = Seq(
      (Some(true), Some(3.5d), Some(16L), Some("text"), Some(ts), Some(1.25f)),
      (Option.empty[Boolean], Option.empty[Double], Option.empty[Long],
        Option.empty[String], Option.empty[Timestamp], Option.empty[Float]))
      .toDF("bool_v", "float_v", "int64_v", "string_v", "time_v", "float32_v")
    val out = Codecs.render(df, "CSV",
      Codecs.Options(heading = true, timeformat = Some(kitchen), nullAs = "N/A"))
    assert(out ==
      "bool_v,float_v,int64_v,string_v,time_v,float32_v\n" +
      "true,3.5,16,text,12:29:34AM,1.25\n" +
      "N/A,N/A,N/A,N/A,N/A,N/A\n\n", out)
  }

  // ---- box_encode_test.go -------------------------------------------------

  test("BOX epoch timeformats ns/us/ms (box_encode_test.go:70-119 TestNano, remaining forms)") {
    val df = Seq((3, "text some", ts)).toDF("col1", "col3", "col4")
    def run(f: String): String =
      Codecs.render(df, "BOX", Codecs.Options(heading = true, timeformat = Some(f)))
    // Catalyst timestamps are µs-precision: ns pins the µs-truncated tail
    assert(run("ns") == Seq(
      "+------+-----------+---------------------+",
      "| COL1 | COL3      | COL4                |",
      "+------+-----------+---------------------+",
      "| 3    | text some | 1691800174123456000 |",
      "+------+-----------+---------------------+",
      "").mkString("\n"))
    assert(run("us").contains("| 1691800174123456 |"))
    assert(run("ms").contains("| 1691800174123 |"))
  }

  test("BOX binary cells honor binaryformat in round style (box_encode_test.go:269-303 TestBinaryFormat)") {
    def run(bf: String): String =
      Codecs.render(Seq((bf, bin6)).toDF("FORMAT", "BIN"), "BOX",
        Codecs.Options(heading = true, rownum = true, boxStyle = "round",
          binaryFormat = bf))
    assert(run("preview").contains("│ 0x0102030405.. │"))
    assert(run("hex").contains("│ 0x010203040506 │"))
    assert(run("bytes").contains("│ [1 2 3 4 5 6] │"))
    assert(run("base64").contains("│ AQIDBAUG │"))
    assert(run("_unknown_").contains("│ 0x010203040506 │"))
  }

  test("BOX wide-rune cells pad by RUNE count like go-pretty (box_encode_test.go:305-360 TestBoxWide)") {
    // U+1F112 is a surrogate pair in UTF-16 but ONE rune to go-pretty's
    // width measure — the reference golden (FIXME included) shows the
    // extra pad space that rune-counting produces.
    val wide = "\uD83C\uDD12CD" // U+1F112 SQUARED LATIN CAPITAL LETTER C + "CD"
    val df = Seq(
      (0.0d, 1.234000d, -1.234000f, -1.234000d, wide, math.Pi),
      (0.0d, 1.234000d, -1.234000f, -1.234000d, "ABCD", math.Pi))
      .toDF("col1", "col2", "col3", "col4", "col5", "col6")
    val out = Codecs.render(df, "BOX",
      Codecs.Options(heading = true, rownum = true, boxStyle = "round"))
    val want = Seq(
      "╭────────┬──────┬───────┬────────┬────────┬──────┬───────────────────╮",
      s"│ ROWNUM │ COL1 │ COL2  │ COL3   │ COL4   │ COL5 │ COL6              │",
      "├────────┼──────┼───────┼────────┼────────┼──────┼───────────────────┤",
      s"│      1 │ 0    │ 1.234 │ -1.234 │ -1.234 │ $wide  │ 3.141592653589793 │",
      s"│      2 │ 0    │ 1.234 │ -1.234 │ -1.234 │ ABCD │ 3.141592653589793 │",
      "╰────────┴──────┴───────┴────────┴────────┴──────┴───────────────────╯",
      "").mkString("\n")
    assert(out == want, out)
  }
}
