package graft

import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.DataFrame
import graft.sinks.Codecs
import graft.time.TimeFns

/** Verbatim cases from the reference's codec-internal encoder battery
  * (mods/codec/internal/csv/csv_encode_test.go) — the parts observable
  * through the Spark-typed sink surface. Go-pointer/sql.Null wrapper
  * plumbing has no analogue here; the wire bytes are what's pinned.
  */
class CodecBatterySpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.from(Instant.ofEpochSecond(1691800174L, 123456789L))
  private def kitchen: String = TimeFns.resolveNamedOrGoFormat("KITCHEN")._1

  private def sixColDf(lastNull: Boolean): DataFrame = {
    val rows = Seq(
      (1, 3.141592d, "text some", ts, 98765L, Some(16)),
      (1, 3.141592d, "text some", ts, 98765L, if (lastNull) None else Some(16)))
    rows.toDF("col1", "col2", "col3", "col4", "col5", "col6")
  }

  test("CSV precision+KITCHEN+rownum (csv_encode_test.go TestCsvEncoder)") {
    val out = Codecs.render(sixColDf(lastNull = true), "CSV",
      Codecs.Options(heading = true, rownum = true, precision = 3,
        timeformat = Some(kitchen)))
    assert(out ==
      "ROWNUM,col1,col2,col3,col4,col5,col6\n" +
      "1,1,3.142,text some,12:29:34AM,98765,16\n" +
      "2,1,3.142,text some,12:29:34AM,98765,NULL\n\n")
  }

  test("numeric substituteNull renders through precision (TestCsvEncoderNullValue)") {
    val out = Codecs.render(sixColDf(lastNull = true), "CSV",
      Codecs.Options(heading = true, rownum = true, precision = 2,
        timeformat = Some(kitchen), nullAsNum = Some(1.234567d)))
    assert(out ==
      "ROWNUM,col1,col2,col3,col4,col5,col6\n" +
      "1,1,3.14,text some,12:29:34AM,98765,16\n" +
      "2,1,3.14,text some,12:29:34AM,98765,1.23\n\n")
  }

  test("epoch timeformats ns/us/ms/s (TestCsvTimeformat)") {
    // Catalyst timestamps are µs-precision, so the reference's ns-tail
    // digits are pinned at the µs boundary here; full-ns fidelity rides
    // the long-typed tag-table time columns instead.
    val df = Seq(Tuple1(ts)).toDF("t")
    def run(f: String): String =
      Codecs.render(df, "CSV", Codecs.Options(timeformat = Some(f))).trim
    assert(run("ns") == "1691800174123456000")
    assert(run("us") == "1691800174123456")
    assert(run("ms") == "1691800174123")
    assert(run("s") == "1691800174")
  }

  test("binaryformat preview/hex/bytes/base64/unknown (TestBinaryFormat)") {
    val df = Seq(Tuple1(Array[Byte](1, 2, 3, 4, 5, 6))).toDF("BIN")
    def run(bf: String): String =
      Codecs.render(df, "CSV", Codecs.Options(binaryFormat = bf)).trim
    assert(run("preview") == "0x0102030405..")
    assert(run("hex") == "0x010203040506")
    assert(run("bytes") == "[1 2 3 4 5 6]")
    assert(run("base64") == "AQIDBAUG")
    assert(run("_unknown_") == "0x010203040506")
  }

  test("binary default hex, BASE64 case-folds, empty/null cells (TestCsvEncoderBinaryMode)") {
    val df = Seq(
      (Array[Byte](1, 2), Array[Byte](3, 4), Array.empty[Byte], null.asInstanceOf[Array[Byte]]))
      .toDF("bin", "ptr_bin", "empty_bin", "nil_bin")
    assert(Codecs.render(df, "CSV", Codecs.Options(heading = true)) ==
      "bin,ptr_bin,empty_bin,nil_bin\n0x0102,0x0304,,NULL\n\n")
    assert(Codecs.render(df, "CSV",
      Codecs.Options(heading = true, binaryFormat = "BASE64")) ==
      "bin,ptr_bin,empty_bin,nil_bin\nAQI=,AwQ=,,NULL\n\n")
    val one = Seq(Tuple1(Array[Byte](0x0a, 0x0b))).toDF("bin")
    assert(Codecs.render(one, "CSV",
      Codecs.Options(heading = true, binaryFormat = "raw")) == "bin\n0x0a0b\n\n")
  }

  test("CSV float format matches JSON: 6-dec trim, ±Inf/NaN, -0 (TestCsvEncoderFloatFormattingMatchesJSON)") {
    val df = Seq((20.55d - 22.2d, 12.3400d, math.copySign(0d, -1d),
      Double.NaN, Double.NegativeInfinity, Double.PositiveInfinity))
      .toDF("runtime", "trimmed", "negzero", "nan", "ninf", "pinf")
    assert(Codecs.render(df, "CSV", Codecs.Options(heading = true)) ==
      "runtime,trimmed,negzero,nan,ninf,pinf\n-1.65,12.34,0,NaN,-Inf,+Inf\n\n")
  }

  test("NaN/Inf survive precision() without error") {
    val df = Seq((Double.NaN, Double.PositiveInfinity, 1.0 / 3)).toDF("a", "b", "c")
    assert(Codecs.render(df, "CSV", Codecs.Options(precision = 3)) ==
      "NaN,+Inf,0.333\n\n")
  }

  test("KITCHEN in KST renders shifted clock (TestCsvEncoderSetTimeLocation)") {
    val df = Seq(Tuple1(Timestamp.from(Instant.ofEpochSecond(1691800174L)))).toDF("ts")
    val out = Codecs.render(df, "CSV",
      Codecs.Options(heading = true, timeformat = Some(kitchen),
        tz = TimeFns.resolveTz("KST")))
    assert(out == "ts\n9:29:34AM\n\n")
  }

  test("BOX light style, rownum right-aligned, uppercase headers (box_encode_test.go TestBox1)") {
    val out = Codecs.render(sixColDf(lastNull = true), "BOX",
      Codecs.Options(heading = true, rownum = true, precision = 3,
        timeformat = Some(kitchen), boxStyle = "light"))
    val want = Seq(
      "┌────────┬──────┬───────┬───────────┬────────────┬───────┬──────┐",
      "│ ROWNUM │ COL1 │ COL2  │ COL3      │ COL4       │ COL5  │ COL6 │",
      "├────────┼──────┼───────┼───────────┼────────────┼───────┼──────┤",
      "│      1 │ 1    │ 3.142 │ text some │ 12:29:34AM │ 98765 │ 16   │",
      "│      2 │ 1    │ 3.142 │ text some │ 12:29:34AM │ 98765 │ NULL │",
      "└────────┴──────┴───────┴───────────┴────────────┴───────┴──────┘",
      "").mkString("\n")
    assert(out == want, out)
  }

  test("BOX double style shortest-float cells (TestBoxFloat)") {
    val df = Seq((0.0d, 1.234000d, 1.234000f, -1.234000d, -1.234000f, math.Pi))
      .toDF("col1", "col2", "col3", "col4", "col5", "col6")
    val out = Codecs.render(df, "BOX",
      Codecs.Options(heading = true, rownum = true, boxStyle = "double"))
    val want = Seq(
      "╔════════╦══════╦═══════╦═══════╦════════╦════════╦═══════════════════╗",
      "║ ROWNUM ║ COL1 ║ COL2  ║ COL3  ║ COL4   ║ COL5   ║ COL6              ║",
      "╠════════╬══════╬═══════╬═══════╬════════╬════════╬═══════════════════╣",
      "║      1 ║ 0    ║ 1.234 ║ 1.234 ║ -1.234 ║ -1.234 ║ 3.141592653589793 ║",
      "╚════════╩══════╩═══════╩═══════╩════════╩════════╩═══════════════════╝",
      "").mkString("\n")
    assert(out == want, out)
  }

  test("BOX default style epoch timeformats (TestNano, s form)") {
    val df = Seq((3, "text some", ts)).toDF("col1", "col3", "col4")
    val out = Codecs.render(df, "BOX",
      Codecs.Options(heading = true, timeformat = Some("s")))
    val want = Seq(
      "+------+-----------+------------+",
      "| COL1 | COL3      | COL4       |",
      "+------+-----------+------------+",
      "| 3    | text some | 1691800174 |",
      "+------+-----------+------------+",
      "").mkString("\n")
    assert(out == want, out)
  }

  test("MARKDOWN goldens: plain, xhtml, timeformat, brief (md_test.go fixtures)") {
    import java.nio.file.{Files, Paths}
    val dir = "/root/reference/mods/codec/internal/markdown/test"
    def fixture(n: String): String =
      new String(Files.readAllBytes(Paths.get(s"$dir/$n")), "UTF-8")
    // the reference harness compares whitespace-normalized (StringsEq)
    def norm(s: String): Seq[String] =
      s.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    val base = java.time.Instant.ofEpochSecond(1692670838L, 86467000L)
    val rows = (0 to 2).map(i =>
      (Timestamp.from(base.plusSeconds(i)), i.toDouble, i % 2 == 0))
    val df = rows.toDF("column0", "column1", "column2")
    val tf = TimeFns.resolveNamedOrGoFormat("2006/01/02 15:04:05.999")
    def run(o: Codecs.Options): String = Codecs.render(df, "MARKDOWN", o)

    assert(norm(run(Codecs.Options())) == norm(fixture("output_md.txt")))
    assert(norm(run(Codecs.Options(htmlRender = true))) ==
      norm(fixture("output_md.html")))
    assert(norm(run(Codecs.Options(timeformat = Some(tf._1),
      trimFractionZeros = tf._2))) == norm(fixture("output_timeformat.txt")))
    assert(norm(run(Codecs.Options(htmlRender = true, timeformat = Some(tf._1),
      trimFractionZeros = tf._2))) == norm(fixture("output_timeformat.html")))
    assert(norm(run(Codecs.Options(brief = 1, timeformat = Some(tf._1),
      trimFractionZeros = tf._2))) == norm(fixture("output_brief.txt")))
    assert(norm(run(Codecs.Options(htmlRender = true, brief = 1,
      timeformat = Some(tf._1), trimFractionZeros = tf._2))) ==
      norm(fixture("output_brief.html")))
  }

  test("delimiter option (TestCsvEncoderSetterPaths)") {
    val df = Seq((1, null.asInstanceOf[String])).toDF("a", "b")
    assert(Codecs.render(df, "CSV",
      Codecs.Options(heading = true, delimiter = ";")) == "a;b\n1;NULL\n\n")
  }
}
