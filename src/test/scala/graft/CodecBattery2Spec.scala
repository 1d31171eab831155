package graft

import java.sql.Timestamp
import java.time.Instant
import graft.sinks.Codecs
import graft.time.TimeFns

/** Second verbatim wave from the reference's codec-internal encoder
  * batteries: the NDJSON encoder options
  * (mods/codec/internal/ndjson/encode_test.go), the shared float
  * formatter (mods/codec/internal/float_test.go), and the BOX
  * bold-style precision table (mods/codec/internal/box/box_encode_test
  * .go TestBoxFloat2). Go-pointer/sql.Null wrapper plumbing has no
  * analogue on the Spark-typed surface; the wire bytes are the pin. */
class CodecBattery2Spec extends SparkSpec {
  import spark.implicits._

  private def carDf = Seq(
    ("my-car", Timestamp.from(Instant.ofEpochSecond(1670380342L)), 1.0001d),
    ("my-car", Timestamp.from(Instant.ofEpochSecond(1670380343L)), 2.0002d)
  ).toDF("name", "time", "value")

  test("NDJSON default ns: epoch-ns numbers, one object per line, blank close (TestJsonEncode case 1)") {
    val out = Codecs.render(carDf, "NDJSON", Codecs.Options())
    assert(out ==
      """{"name":"my-car","time":1670380342000000000,"value":1.0001}
        |{"name":"my-car","time":1670380343000000000,"value":2.0002}
        |
        |""".stripMargin)
  }

  test("NDJSON timeformat s renders epoch seconds as a NUMBER, not text (TestJsonEncode case 2)") {
    val out = Codecs.render(carDf, "NDJSON",
      Codecs.Options(timeformat = Some("s")))
    assert(out ==
      """{"name":"my-car","time":1670380342,"value":1.0001}
        |{"name":"my-car","time":1670380343,"value":2.0002}
        |
        |""".stripMargin)
  }

  test("NDJSON Go-layout timeformat + rownum quotes the time as text (TestJsonEncode case 3)") {
    val (pat, _) = TimeFns.resolveNamedOrGoFormat("2006/01/02 15:04:05")
    val out = Codecs.render(carDf, "NDJSON",
      Codecs.Options(timeformat = Some(pat), rownum = true))
    assert(out ==
      """{"ROWNUM":1,"name":"my-car","time":"2022/12/07 02:32:22","value":1.0001}
        |{"ROWNUM":2,"name":"my-car","time":"2022/12/07 02:32:23","value":2.0002}
        |
        |""".stripMargin)
  }

  test("NDJSON binary cells render 0x-hex under the default binaryformat (TestJsonEncode case 4)") {
    val df = Seq(
      ("my-car", Timestamp.from(Instant.ofEpochSecond(1670380342L)),
        Array[Byte](97, 98, 99)),
      ("my-car", Timestamp.from(Instant.ofEpochSecond(1670380343L)),
        Array[Byte](100, 101, 102))
    ).toDF("name", "time", "value")
    val (pat, _) = TimeFns.resolveNamedOrGoFormat("2006/01/02 15:04:05.000")
    val out = Codecs.render(df, "NDJSON",
      Codecs.Options(timeformat = Some(pat), rownum = true))
    assert(out ==
      """{"ROWNUM":1,"name":"my-car","time":"2022/12/07 02:32:22.000","value":"0x616263"}
        |{"ROWNUM":2,"name":"my-car","time":"2022/12/07 02:32:23.000","value":"0x646566"}
        |
        |""".stripMargin)
  }

  test("NDJSON float fields: trim/int-like/NaN/±Inf tokens (TestNdjsonEncodeFloatFormatting)") {
    def one(v: Double): String =
      Codecs.render(Seq(Tuple1(v)).toDF("value"), "NDJSON", Codecs.Options())
    assert(one(12.3400).contains("\"value\":12.34"))
    assert(one(10.0).contains("\"value\":10"))
    assert(one(Double.NaN).contains("\"value\":\"NaN\""))
    assert(one(Double.NegativeInfinity).contains("\"value\":\"-Inf\""))
    assert(one(Double.PositiveInfinity).contains("\"value\":\"+Inf\""))
  }

  test("NDJSON precision(2): runtime rounding, negzero, whole padding (TestNdjsonEncodeFloatFormattingWithPrecision)") {
    val df = Seq((20.55d - 22.2d, math.copySign(0d, -1d), 10d))
      .toDF("runtime", "negzero", "whole")
    val out = Codecs.render(df, "NDJSON", Codecs.Options(precision = 2))
    assert(out == "{\"runtime\":-1.65,\"negzero\":0.00,\"whole\":10.00}\n\n")
  }

  test("string substituteNull renders for EVERY null cell type (csv_encode_test.go TestCsvEncoderSqlAndGeoTypes null row)") {
    val df = Seq(
      (Some(true), Some(3.5d), Some(16), Some("text"),
        Some(Timestamp.from(Instant.ofEpochSecond(1691800174L))), Some(1.25f)),
      (Option.empty[Boolean], Option.empty[Double], Option.empty[Int],
        Option.empty[String], Option.empty[Timestamp], Option.empty[Float])
    ).toDF("bool_v", "float_v", "int32_v", "string_v", "time_v", "float32_v")
    val kitchen = TimeFns.resolveNamedOrGoFormat("KITCHEN")._1
    val out = Codecs.render(df, "CSV",
      Codecs.Options(heading = true, nullAs = "N/A", timeformat = Some(kitchen)))
    assert(out ==
      "bool_v,float_v,int32_v,string_v,time_v,float32_v\n" +
      "true,3.5,16,text,12:29:34AM,1.25\n" +
      "N/A,N/A,N/A,N/A,N/A,N/A\n\n", out)
  }

  test("shared float formatter branches (float_test.go TestAppendPrecisionFloat64 / TestFormatPrecisionFloat64)") {
    def f(v: Double, p: Int) = Codecs.goPrecisionFloat(v, p)
    assert(f(12.3400, -1) == "12.34")       // default trims trailing zeros
    assert(f(20.55 - 22.2, -1) == "-1.65")  // runtime expression rounds
    assert(f(3.1, 3) == "3.100")            // explicit precision keeps digits
    assert(f(10d, 2) == "10.00")            // integer fraction zero-padded
    assert(f(math.copySign(0d, -1d), -1) == "0") // negative zero normalized
    assert(f(Double.NaN, -1) == "NaN")
    assert(f(Double.NegativeInfinity, -1) == "-Inf")
    assert(f(Double.PositiveInfinity, -1) == "+Inf")
    assert(f(10.0, -1) == "10")
    assert(f(10.0, 4) == "10.0000")
  }

  // ---- json_test.go encoder-variant battery: the envelope under every
  // rows-shape × rownum combination, verbatim goldens (time cells are
  // ns-long-typed with a "datetime" type override, exactly the int64
  // rows the reference feeds its encoder) ----
  private def placeDf = Seq(
    ("name1", 1676432363333444555L, 0.1234d, "Office"),
    ("name2", 1676432364666777888L, 0.2345d, "Home")
  ).toDF("name", "time", "value", "place")
  private val placeTypes =
    Some(Seq("string", "datetime", "double", "string"))
  private def env(o: Codecs.Options): String = {
    val s = Codecs.render(placeDf, "JSON",
      o.copy(typesOverride = placeTypes))
    s.substring(0, s.lastIndexOf(",\"elapse"))
  }

  test("JSON envelope rows (json_test.go TestEncoder)") {
    assert(env(Codecs.Options()) ==
      """{"data":{"columns":["name","time","value","place"],"types":["string","datetime","double","string"],"rows":[["name1",1676432363333444555,0.1234,"Office"],["name2",1676432364666777888,0.2345,"Home"]]},"success":true,"reason":"success"""")
  }

  test("JSON envelope rownum prepends ROWNUM column + int64 type (TestEncoderWithRownum)") {
    assert(env(Codecs.Options(rownum = true)) ==
      """{"data":{"columns":["ROWNUM","name","time","value","place"],"types":["int64","string","datetime","double","string"],"rows":[[1,"name1",1676432363333444555,0.1234,"Office"],[2,"name2",1676432364666777888,0.2345,"Home"]]},"success":true,"reason":"success"""")
  }

  test("JSON envelope transpose renders column-major cols and IGNORES rownum (TestEncoderTranspose/WithRownum)") {
    val want =
      """{"data":{"columns":["name","time","value","place"],"types":["string","datetime","double","string"],"cols":[["name1","name2"],[1676432363333444555,1676432364666777888],[0.1234,0.2345],["Office","Home"]]},"success":true,"reason":"success""""
    assert(env(Codecs.Options(rowsFlatten = true, transpose = true)) == want)
    assert(env(Codecs.Options(rowsFlatten = true, transpose = true,
      rownum = true)) == want)
  }

  test("JSON envelope rowsFlatten: one flat rows array, rownum interleaves counters (TestEncoderRowsFlatten/WithRownum)") {
    assert(env(Codecs.Options(rowsFlatten = true)) ==
      """{"data":{"columns":["name","time","value","place"],"types":["string","datetime","double","string"],"rows":["name1",1676432363333444555,0.1234,"Office","name2",1676432364666777888,0.2345,"Home"]},"success":true,"reason":"success"""")
    assert(env(Codecs.Options(rowsFlatten = true, rownum = true)) ==
      """{"data":{"columns":["ROWNUM","name","time","value","place"],"types":["int64","string","datetime","double","string"],"rows":[1,"name1",1676432363333444555,0.1234,"Office",2,"name2",1676432364666777888,0.2345,"Home"]},"success":true,"reason":"success"""")
  }

  test("JSON envelope rowsArray: key-sorted objects, ROWNUM as a key (TestEncoderRowsArray/WithRownum)") {
    assert(env(Codecs.Options(rowsFlatten = true, rowsArray = true)) ==
      """{"data":{"columns":["name","time","value","place"],"types":["string","datetime","double","string"],"rows":[{"name":"name1","place":"Office","time":1676432363333444555,"value":0.1234},{"name":"name2","place":"Home","time":1676432364666777888,"value":0.2345}]},"success":true,"reason":"success"""")
    assert(env(Codecs.Options(rowsFlatten = true, rowsArray = true,
      rownum = true)) ==
      """{"data":{"columns":["ROWNUM","name","time","value","place"],"types":["int64","string","datetime","double","string"],"rows":[{"ROWNUM":1,"name":"name1","place":"Office","time":1676432363333444555,"value":0.1234},{"ROWNUM":2,"name":"name2","place":"Home","time":1676432364666777888,"value":0.2345}]},"success":true,"reason":"success"""")
  }

  // ---- templ battery (mods/codec/internal/templ/templ_test.go): the
  // Record surface driven exactly as the reference encoder drives it ----
  import graft.sinks.GoTemplate

  private def rec(num: Long, first: Boolean, last: Boolean, vs: Any*) =
    GoTemplate.Record(num, first, last, vs, Seq.empty)

  test("templ TEXT rows: Num/Value accessors (templ_test.go TestTemplEncoder hello_world_text)") {
    val t = GoTemplate.parse("{{.Num}},{{ .Value 0 }},{{ .Value 1 }}")
    assert(t.render(rec(1, first = true, last = false, "Hello", "World!"), Map.empty) == "1,Hello,World!")
    assert(t.render(rec(2, first = false, last = true, 3.14d, true), Map.empty) == "2,3.14,true")
  }

  test("templ IsFirst/IsLast head/tail markers (TestTemplEncoder first_last)") {
    val t = GoTemplate.parse(
      "{{ if .IsFirst }}-head-{{end}}\n<li>{{.Num}}: {{ .Value 0 }} {{ .Value 1 }}\n{{ if .IsLast }}-tail-{{end}}")
    val out =
      t.render(rec(1, first = true, last = false, "Hello", "World!"), Map.empty) +
      t.render(rec(2, first = false, last = true, 3.14d, true), Map.empty)
    assert(out == "-head-\n<li>1: Hello World!\n\n<li>2: 3.14 true\n-tail-", out)
  }

  test("templ empty input still executes once: IsEmpty branch (TestTemplEncoder first_last_empty)") {
    val tmpl = """{{ if .IsFirst }}-head-{{"\n"}}{{end}}
				{{- if not .IsEmpty -}}
				<li>{{.Num}}: {{ .Value 0 }} {{ .Value 1 }}
				{{- else }}
				{{- end }}
				{{- if .IsLast }}-tail-{{end}}"""
    val out = Codecs.render(
      carDf.filter("false"), "TEXT",
      Codecs.Options(template = Some(tmpl)))
    assert(out == "-head-\n-tail-", out)
  }

  test("templ .V column map and index .Values with toUpper/toLower pipes (TestTemplEncoder columns/values)") {
    val df = Seq(("a", 1.23d, true), ("b", 4.56d, false), ("c", 7.89d, true))
      .toDF("col1", "col2", "col3")
    val byName = Codecs.render(df, "TEXT", Codecs.Options(template = Some(
      """{{- .Num}}: {{ .V.col1 | toUpper }} {{ .V.col2 }} {{ .V.col3 }}{{ "\n" -}}""")))
    assert(byName == "1: A 1.23 true\n2: B 4.56 false\n3: C 7.89 true\n", byName)
    val df2 = Seq(("A", 1.23d, true), ("B", 4.56d, false), ("C", 7.89d, true))
      .toDF("col1", "col2", "col3")
    val byIndex = Codecs.render(df2, "TEXT", Codecs.Options(template = Some(
      """{{- .Num}}: {{ index .Values 0 | toLower }} {{ index .Values 1  }} {{ index .Values 2 }}{{ "\n" -}}""")))
    assert(byIndex == "1: a 1.23 true\n2: b 4.56 false\n3: c 7.89 true\n", byIndex)
  }

  test("templ format %f/%.2f pipe (templ_test.go TestFormat)") {
    val t1 = GoTemplate.parse("""{{ .Value 0 | format "%f" }}""")
    assert(t1.render(rec(1, first = true, last = true, 3.141592d), Map.empty) == "3.141592")
    val t2 = GoTemplate.parse("""{{ .Value 0 | format "%.2f" }}""")
    assert(t2.render(rec(1, first = true, last = true, 3.141592d), Map.empty) == "3.14")
  }

  test("templ timeformat with a Go layout in GMT and Asia/Seoul (templ_test.go TestTimeformat)") {
    val ts = Timestamp.from(Instant.ofEpochSecond(1633072800L))
    val gmt = GoTemplate.parse(
      """{{ .Value 0 | timeformat "2006-01-02 15:04:05" "GMT" }}""")
    assert(gmt.render(rec(1, first = true, last = true, ts), Map.empty) ==
      "2021-10-01 07:20:00")
    val seoul = GoTemplate.parse(
      """{{ .Value 0 | timeformat "2006-01-02 15:04:05" "Asia/Seoul" }}""")
    assert(seoul.render(rec(1, first = true, last = true, ts), Map.empty) ==
      "2021-10-01 16:20:00")
  }

  test("templ param/paramDefault feed the format pipe (templ_test.go TestParams)") {
    val params = Map("f" -> Seq("%.2f"))
    assert(GoTemplate.parse("""{{ param "f" }}""")
      .render(rec(1, first = true, last = true, 3.141592d), params) == "%.2f")
    assert(GoTemplate.parse("""{{ .Value 0 | format (param "f") }}""")
      .render(rec(1, first = true, last = true, 3.141592d), params) == "3.14")
    assert(GoTemplate.parse("""{{ .Value 0 | format (paramDefault "x" "%.4f") }}""")
      .render(rec(1, first = true, last = true, 3.141592d), params) == "3.1416")
  }

  test("templ HTML escapes .Value; ValueHTML/HTMLAttr/URL bypass it (templ_test.go TestUnsafeHTML)") {
    val t = GoTemplate.parse("Hello, {{ .Value 0 }}!\n" +
      """<div {{ .ValueHTMLAttr 1 }} href="{{ .ValueURL 2 }}">Hello, {{ .ValueHTML 0}}!</div>""")
    val out = t.render(
      rec(1, first = true, last = true,
        "<b>World</b>", """color="red"""", "http://example.com?q=123#tag"),
      Map.empty, htmlEscape = true)
    assert(out == "Hello, &lt;b&gt;World&lt;/b&gt;!\n" +
      """<div color="red" href="http://example.com?q=123#tag">Hello, <b>World</b>!</div>""", out)
  }

  test("templ HTML passes CSS-safe text through; ValueCSS is escape-exempt (templ_test.go TestUnsafeCSS)") {
    val t = GoTemplate.parse("body {{ .Value 0 }}\nbody {{ .ValueCSS 0 }}")
    val out = t.render(
      rec(1, first = true, last = true, "{ color: red; margin: 2px; }"),
      Map.empty, htmlEscape = true)
    assert(out == "body { color: red; margin: 2px; }\nbody { color: red; margin: 2px; }", out)
  }

  test("MARKDOWN cell type branches (md_test.go TestMarkdownAddRowTypes, Spark-typed subset)") {
    val (pat, trim) = TimeFns.resolveNamedOrGoFormat("2006/01/02 15:04:05.999")
    def md(df: org.apache.spark.sql.DataFrame): String =
      Codecs.render(df, "MARKDOWN",
        Codecs.Options(timeformat = Some(pat), trimFractionZeros = trim))
    def wrap(cell: String) = s"|value|\n|:-----|\n|$cell|\n"
    assert(md(Seq(Tuple1(Option.empty[String])).toDF("value")) == wrap("NULL"))
    assert(md(Seq(Tuple1(true)).toDF("value")) == wrap("true"))
    assert(md(Seq(Tuple1("text")).toDF("value")) == wrap("text"))
    // 1692670838086467000 ns → ".999" keeps the non-zero ms tail
    val tick = Timestamp.from(Instant.ofEpochSecond(1692670838L, 86467000L))
    assert(md(Seq(Tuple1(tick)).toDF("value")) == wrap("2023/08/22 02:20:38.086"))
    assert(md(Seq(Tuple1(1.25d)).toDF("value")) == wrap("1.250000")) // %f six fixed decimals
    assert(md(Seq(Tuple1(2.5f)).toDF("value")) == wrap("2.500000"))
    assert(md(Seq(Tuple1(3)).toDF("value")) == wrap("3"))
    assert(md(Seq(Tuple1(7L)).toDF("value")) == wrap("7"))
    assert(md(Seq(Tuple1(Array[Byte](97, 98, 99, 100, 101))).toDF("value")) ==
      wrap("0x6162636465"))
  }

  private val mdTemplate =
    """{{- if .IsFirst -}}|name|value|{{"\n"}}|:-----|:-----|{{"\n"}}{{- end -}}|{{ .Value 0 }}|{{ .Value 1 }}|{{"\n"}}{{- if .IsLast -}}> *Total* {{ .Num }} *records*{{"\n"}}{{- end -}}"""

  test("MARKDOWN(template) renders the templated table text (md_test.go TestMarkdownTemplatePathText)") {
    val df = Seq(("alpha", 1), ("beta", 2)).toDF("name", "value")
    val out = Codecs.render(df, "MARKDOWN",
      Codecs.Options(template = Some(mdTemplate)))
    assert(out ==
      "|name|value|\n|:-----|:-----|\n|alpha|1|\n|beta|2|\n> *Total* 2 *records*\n", out)
  }

  test("MARKDOWN(template, html) converts the templated markdown to XHTML (TestMarkdownTemplatePathTextHtml)") {
    val df = Seq(("alpha", 1), ("beta", 2)).toDF("name", "value")
    val out = Codecs.render(df, "MARKDOWN",
      Codecs.Options(template = Some(mdTemplate), htmlRender = true))
    val expect = Seq(
      "<div>",
      "<table>",
      "<thead>",
      "<tr>",
      "<th align=\"left\">name</th>",
      "<th align=\"left\">value</th>",
      "</tr>",
      "</thead>",
      "<tbody>",
      "<tr>",
      "<td align=\"left\">alpha</td>",
      "<td align=\"left\">1</td>",
      "</tr>",
      "<tr>",
      "<td align=\"left\">beta</td>",
      "<td align=\"left\">2</td>",
      "</tr>",
      "</tbody>",
      "</table>",
      "<blockquote>",
      "<p><em>Total</em> 2 <em>records</em></p>",
      "</blockquote>",
      "</div>").mkString("\n")
    assert(out == expect, s"\n$out")
  }

  test("MARKDOWN(template) on an empty result still executes once: IsEmpty (md_encode_internal_test.go)") {
    val df = Seq(("alpha", 1)).toDF("name", "value").filter("false")
    val out = Codecs.render(df, "MARKDOWN",
      Codecs.Options(template = Some("{{if .IsEmpty}}EMPTY{{end}}")))
    assert(out == "EMPTY", out)
  }

  test("MARKDOWN(html) template with heading + static table (TestMarkdownTemplatePathHtml)") {
    val df = Seq(("alpha", 1)).toDF("name", "value")
    val out = Codecs.render(df, "MARKDOWN",
      Codecs.Options(htmlRender = true, template = Some(
        "# Title\n\n|name|value|\n|:-----|:-----|\n|{{ .Value 0 }}|{{ .Value 1 }}|\n")))
    assert(out.contains("<div>"), out)
    assert(out.contains("<h1>Title</h1>"), out)
    assert(out.contains("<table>"), out)
    assert(out.contains("<td align=\"left\">alpha</td>"), out)
  }

  test("BOX bold style + precision(2) + rownum golden (box_encode_test.go TestBoxFloat2)") {
    val df = Seq(
      (0.0d, 1.234d, 1.234f, -1.234d, -1.234f, math.Pi),
      (0.005d, 1.235d, 1.235f, -1.235d, -1.235f, math.Pi)
    ).toDF("col1", "col2", "col3", "col4", "col5", "col6")
    val out = Codecs.render(df, "BOX",
      Codecs.Options(heading = true, rownum = true, precision = 2,
        boxStyle = "bold"))
    val expect = Seq(
      "┏━━━━━━━━┳━━━━━━┳━━━━━━┳━━━━━━┳━━━━━━━┳━━━━━━━┳━━━━━━┓",
      "┃ ROWNUM ┃ COL1 ┃ COL2 ┃ COL3 ┃ COL4  ┃ COL5  ┃ COL6 ┃",
      "┣━━━━━━━━╋━━━━━━╋━━━━━━╋━━━━━━╋━━━━━━━╋━━━━━━━╋━━━━━━┫",
      "┃      1 ┃ 0.00 ┃ 1.23 ┃ 1.23 ┃ -1.23 ┃ -1.23 ┃ 3.14 ┃",
      "┃      2 ┃ 0.01 ┃ 1.24 ┃ 1.24 ┃ -1.24 ┃ -1.24 ┃ 3.14 ┃",
      "┗━━━━━━━━┻━━━━━━┻━━━━━━┻━━━━━━┻━━━━━━━┻━━━━━━━┻━━━━━━┛",
      "").mkString("\n")
    assert(out == expect, s"\n$out")
  }

  test("templ eq/ne compare integral kinds exactly above 2^53 (Go template eq on int64)") {
    // two adjacent epoch-ns longs differ by 1 but share a double image;
    // doubleValue comparison would make eq true and ne false
    val a = 1691800174123456789L
    val b = 1691800174123456788L
    val t = GoTemplate.parse(
      "{{ if eq (.Value 0) (.Value 1) }}EQ{{ else }}NE{{ end }}" +
        "{{ if eq (.Value 0) (.Value 2) }} SAME{{ end }}" +
        "{{ if ne (.Value 0) (.Value 1) }} DIFF{{ end }}")
    val out = t.render(rec(1, first = true, last = true, a, b, a),
      Map.empty, htmlEscape = false)
    assert(out == "NE SAME DIFF", out)
    // mixed integral/floating still compares by value (literal 1 is Double)
    val t2 = GoTemplate.parse("{{ if eq (.Value 0) 1 }}ONE{{ end }}")
    assert(t2.render(rec(1, first = true, last = true, 1L),
      Map.empty, htmlEscape = false) == "ONE")
  }

  test("MARKDOWN(html) blockquote: bare '>' line splits paragraphs (goldmark GFM)") {
    val out = graft.server.Markdown.convert("> alpha\n>\n> beta\n")
    assert(out.contains(
      "<blockquote>\n<p>alpha</p>\n<p>beta</p>\n</blockquote>"), out)
    // no separator still merges with a soft break
    val one = graft.server.Markdown.convert("> alpha\n> beta\n")
    assert(one.contains("<blockquote>\n<p>alpha\nbeta</p>\n</blockquote>"), one)
  }
}
