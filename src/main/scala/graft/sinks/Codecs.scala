package graft.sinks

import java.io.{StringWriter, Writer}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Row-sink encoders (reference: mods/codec — CSV/JSON/NDJSON/MARKDOWN/BOX
  * encoders under mods/codec/internal, option plumbing
  * mods/codec/opts/generate.gen.go).
  *
  * These are presentation-edge codecs: they stream `df.toLocalIterator`
  * through a Writer, so only one partition's rows are ever resident on the
  * driver. For sharded bulk export use `df.write.csv/json` instead — these
  * implement the reference's *wire formats* (e.g. the `/db/query` JSON
  * envelope `{data:{columns,types,rows}}`).
  */
object Codecs {
  case class Options(
      delimiter: String = ",",
      heading: Boolean = false,
      rownum: Boolean = false,
      nullAs: String = "NULL",
      precision: Int = -1,
      /** datetime pattern (Java DateTimeFormatter) or epoch mode s/ms/us/ns */
      timeformat: Option[String] = None,
      tz: String = "UTC",
      /** JSON envelope: flatten rows into one array (reference rowsFlatten) */
      rowsFlatten: Boolean = false,
      /** trim trailing fraction zeros (the reference's .999-style formats) */
      trimFractionZeros: Boolean = false,
      /** JSON envelope columns/types override — SCRIPT nodes inherit the
        * reference's column metadata (input-node names, or `$.result`),
        * which may deliberately disagree with row arity
        * (fm_script_test.go:74-135 asserts exactly that). */
      colsOverride: Option[Seq[String]] = None,
      typesOverride: Option[Seq[String]] = None,
      /** TEXT/HTML sink Go-template (reference templ.go: executed once per
        * record) and the request params its param()/paramDefault() see */
      template: Option[String] = None,
      templateParams: Map[String, Seq[String]] = Map.empty,
      /** binary column rendering: hex (0x…), preview (first 5 bytes + ..),
        * base64, bytes ([1 2 3]) — the reference's binaryformat() option */
      binaryFormat: String = "hex",
      /** numeric substituteNull value — kept typed so the cell renders
        * through the float formatter (precision applies: csv_encode.go
        * AddRow feeds nullAlternative through the value switch) */
      nullAsNum: Option[Double] = None,
      /** JSON envelope: rows as {col:val} objects (reference rowsArray) */
      rowsArray: Boolean = false,
      /** JSON envelope: column-major "cols" arrays (reference transpose);
        * rowsArray wins when both are set (json_encode.go Open) */
      transpose: Boolean = false,
      /** fixed elapse text for byte-stable tests; None = measure */
      elapse: Option[String] = None,
      /** MARKDOWN brief mode: emit only the first N rows plus a
        * "| ... |" ellipsis row and a Total-records marker (md_encode.go
        * SetBrief/SetBriefCount; brief(true) = 5). 0 = off. */
      brief: Long = 0L,
      /** BOX table glyphs: default/light/double/bold/round */
      boxStyle: String = "default",
      /** BOX: vertical separators between columns (default true) */
      separateColumns: Boolean = true,
      /** BOX: outer border (default true) */
      drawBorder: Boolean = true,
      /** MARKDOWN(html(true)): render the table as goldmark-converted
        * XHTML in a <div> wrapper — md_encode.go:155-162 htmlRender */
      htmlRender: Boolean = false)

  /** Shortest round-trip decimal like Go's FormatFloat(v,'f',-1,64) — the
    * reference's CSV float format ("1", "1.5", not "1.0"). */
  private[graft] def goFloat(d: Double): String = {
    if (d.isNaN || d.isInfinite) return d.toString
    val s = java.lang.Double.toString(d)
    if (s.contains("E") || s.contains("e"))
      new java.math.BigDecimal(s).stripTrailingZeros().toPlainString
    else if (s.endsWith(".0")) s.dropRight(2)
    else s
  }

  /** Exact ±0.0 prints unsigned (sphere golden); tiny negative values
    * keep their sign after rounding ("-0.0000" in the Pi golden). */
  private def normZero(d: Double): Double = if (d == 0.0d) 0.0d else d

  private def fmtTime(inst: java.time.Instant, o: Options): String =
    o.timeformat match {
      case Some("s") | Some("s.str") => inst.getEpochSecond.toString
      case Some("ms") | Some("ms.str") => inst.toEpochMilli.toString
      case Some("us") | Some("us.str") =>
        (inst.getEpochSecond * 1000000L + inst.getNano / 1000).toString
      case Some("ns") | Some("ns.str") =>
        (inst.getEpochSecond * 1000000000L + inst.getNano).toString
      case Some(pattern) =>
        val out = java.time.format.DateTimeFormatter.ofPattern(pattern)
          .withZone(java.time.ZoneId.of(o.tz)).format(inst)
        // Go ".999" trim — shared policy in TimeFns.trimFractionZerosStr
        if (o.trimFractionZeros) graft.time.TimeFns.trimFractionZerosStr(out)
        else out
      // default timeformat is "ns" — epoch-ns integers (the reference's
      // util.NewTimeFormatter default, mods/util/types.go:85-94)
      case None => (inst.getEpochSecond * 1000000000L + inst.getNano).toString
    }

  /** the numeric epoch timeformats — JSON-rendered as numbers, not text */
  private val epochForms = Set("ns", "us", "ms", "s")

  /** machbase binary wire format: 0x-prefixed lowercase hex; an empty
    * chunk renders as an empty cell (task_test.go TestBytes). */
  private def binHex(b: Array[Byte]): String =
    if (b.isEmpty) "" else "0x" + b.map(x => f"$x%02x").mkString

  private def fmt(v: Any, o: Options): String = v match {
    case null => o.nullAsNum match {
      case Some(n) => goPrecisionFloat(n, o.precision)
      case None => o.nullAs
    }
    case b: Array[Byte] => o.binaryFormat.toLowerCase match {
      case "base64" => java.util.Base64.getEncoder.encodeToString(b)
      case "preview" =>
        if (b.length <= 5) binHex(b) else binHex(b.take(5)) + ".."
      // Go fmt %v of []byte — space-separated decimal (util/types.go
      // BinaryFormatter "bytes" mode)
      case "bytes" => if (b.isEmpty) "" else b.map(x => (x & 0xff).toString).mkString("[", " ", "]")
      case _ => binHex(b)
    }
    case t: java.sql.Timestamp => fmtTime(t.toInstant, o)
    case t: java.time.Instant => fmtTime(t, o)
    case t: java.time.LocalDateTime => fmtTime(t.toInstant(java.time.ZoneOffset.UTC), o)
    // CSV floats share the JSON float format — FormatPrecisionFloat64
    // (6-dec trimmed default, NaN/±Inf tokens), NOT shortest round-trip
    // (csv_encode.go:172-175; csv_encode_test.go
    // TestCsvEncoderFloatFormattingMatchesJSON pins 20.55-22.2 → -1.65)
    case d: Double => goPrecisionFloat(d, o.precision)
    case f: Float => goPrecisionFloat(f.toDouble, o.precision)
    // list-valued cells print their Go type token — the reference's CSV
    // encoder falls through fmt to the []any type (TestBoxplot chart)
    case _: scala.collection.Seq[_] => "[]interface {}"
    case x => x.toString
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jsonValue(v: Any, o: Options): String = v match {
    case null => "null"
    // binaryformat applies in JSON cells too (json_encode.go AddRow
    // routes []byte through binaryFormatter; json_encode_test.go
    // TestBinaryFormat pins all five modes)
    case b: Array[Byte] => "\"" + jsonEscape(fmt(b, o)) + "\""
    case s: String => "\"" + jsonEscape(s) + "\""
    case b: Boolean => b.toString
    // datetimes serialize as epoch NUMBERS for every numeric timeformat
    // (ns default, s/ms/us — ndjson/encode_test.go TestJsonEncode pins
    // `"time":1670380342` unquoted under timeformat "s"); only pattern
    // timeformats quote as text
    case t: java.sql.Timestamp =>
      if (o.timeformat.forall(epochForms)) fmtTime(t.toInstant, o)
      else "\"" + jsonEscape(fmtTime(t.toInstant, o)) + "\""
    case t: java.time.Instant =>
      if (o.timeformat.forall(epochForms)) fmtTime(t, o)
      else "\"" + jsonEscape(fmtTime(t, o)) + "\""
    case t: java.time.LocalDateTime =>
      val inst = t.toInstant(java.time.ZoneOffset.UTC)
      if (o.timeformat.forall(epochForms)) fmtTime(inst, o)
      else "\"" + jsonEscape(fmtTime(inst, o)) + "\""
    case d: java.lang.Double => jsonFloat(d, o.precision)
    case f: java.lang.Float => jsonFloat(f.toDouble, o.precision)
    case n: java.lang.Number => n.toString
    // dict()/list values: JSON objects and arrays (fm_monad dict)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, v) => "\"" + jsonEscape(k.toString) + "\":" + jsonValue(v, o) }
        .mkString("{", ",", "}")
    case s: scala.collection.Seq[_] =>
      s.map(jsonValue(_, o)).mkString("[", ",", "]")
    // struct cells (e.g. context()) render as JSON objects keyed by
    // field name — Go marshals structs the same way (fm_context.go's
    // NodeContext has no exported fields → "{}")
    case r: org.apache.spark.sql.Row =>
      r.schema match {
        case null => r.toSeq.map(jsonValue(_, o)).mkString("[", ",", "]")
        case s => s.fieldNames.zip(r.toSeq).map { case (k, v) =>
          "\"" + jsonEscape(k) + "\":" + jsonValue(v, o)
        }.mkString("{", ",", "}")
      }
    case other => "\"" + jsonEscape(other.toString) + "\""
  }

  /** JSON float rendering (reference mods/codec/internal/float.go:8-38):
    * fixed-width 'f' with trailing zeros KEPT when precision(p) is set
    * ("0.6628509149282410" at precision 16); default = 'f' with 6
    * decimals, trailing zeros and dot trimmed ("1", "0.916937"); NaN/±Inf
    * as quoted tokens. This deliberately differs from the CSV encoder's
    * shortest-round-trip format. */
  private def jsonFloat(d: Double, precision: Int): String =
    if (d.isNaN || d.isInfinite) "\"" + goPrecisionFloat(d, precision) + "\""
    else goPrecisionFloat(d, precision)

  /** FormatPrecisionFloat64 parity (mods/codec/internal/float.go): NaN/
    * ±Inf tokens, exact ±0 unsigned, fixed `precision` decimals when set,
    * else 6 decimals with trailing zeros and dot trimmed. Shared by the
    * CSV and JSON encoders (csv_encode.go:172, json_encode.go nested rows). */
  private[graft] def goPrecisionFloat(d: Double, precision: Int): String = {
    if (d.isNaN) return "NaN"
    if (d == Double.NegativeInfinity) return "-Inf"
    if (d == Double.PositiveInfinity) return "+Inf"
    if (d == 0.0d)
      return if (precision >= 0) fixedExact(0d, precision) else "0"
    if (precision >= 0) fixedExact(d, precision)
    else {
      var s = fixedExact(d, 6)
      while (s.endsWith("0")) s = s.dropRight(1)
      if (s.endsWith(".")) s = s.dropRight(1)
      s
    }
  }

  /** Go strconv.FormatFloat(v,'f',p,64) parity: round the EXACT binary
    * value half-to-even at p decimals. Java's `%.pf` instead pads the
    * shortest representation with zeros, which differs in the last digit
    * (seen in the FAKE_oscillator precision(16) golden). */
  private def fixedExact(d: Double, p: Int): String = {
    val bd = new java.math.BigDecimal(d)
      .setScale(p, java.math.RoundingMode.HALF_EVEN)
    val s = bd.toPlainString
    // Go keeps the sign when a tiny negative rounds to zero ("-0.0000",
    // Pi golden); BigDecimal normalizes it away
    if (d < 0 && bd.signum() == 0) "-" + s else s
  }

  /** CSV sink (reference mods/codec/internal/csv). */
  def csv(df: DataFrame, w: Writer, o: Options = Options()): Unit = {
    val cols = df.columns
    if (o.heading) {
      val head: Seq[String] = if (o.rownum) "ROWNUM" +: cols.toSeq else cols.toSeq
      w.write(head.mkString(o.delimiter)); w.write("\n")
    }
    // per-column null replacement (GROUP's per-aggregator nullValue —
    // string fills render raw while data cells keep float formatting)
    val defaultNull = o.nullAsNum match {
      case Some(n) => goPrecisionFloat(n, o.precision)
      case None => o.nullAs
    }
    val nullAs: Array[String] = df.schema.fields.map(f =>
      if (f.metadata.contains("nullas")) f.metadata.getString("nullas")
      else defaultNull)
    var i = 0L
    df.toLocalIterator().forEachRemaining { row =>
      i += 1
      val vals = row.toSeq.zipWithIndex.map { case (v, j) =>
        val cell = if (v == null) nullAs(j) else fmt(v, o)
        csvQuote(cell, o.delimiter)
      }
      val line = if (o.rownum) (i.toString +: vals) else vals
      w.write(line.mkString(o.delimiter)); w.write("\n")
    }
    // the reference encoder writes one extra newline at Close
    // (csv_encode.go Close; every tql_test ExpectCSV ends with a "\n"
    // element), so the wire body ends with a blank line
    w.write("\n")
  }

  /** RFC-4180 quoting like Go encoding/csv: wrap when the field contains
    * the delimiter, a quote, or a newline; double inner quotes. */
  private def csvQuote(s: String, delim: String): String =
    if (s.contains(delim) || s.contains("\"") || s.contains("\n") || s.contains("\r"))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** The `/db/query` JSON envelope: {"data":{"columns":[...],"types":[...],
    * "rows":[[...],...]},"success":true,"reason":"success","elapse":"…"}.
    * rowsArray renders rows as column-keyed objects; transpose renders
    * column-major "cols" arrays (rowsArray wins when both are set, and
    * rownum is ignored in transpose — json_encode.go Open/AddRow). */
  def jsonEnvelope(df: DataFrame, w: Writer, o: Options = Options()): Unit = {
    val t0 = System.nanoTime()
    val cols0 = o.colsOverride.getOrElse(df.columns.toSeq)
    val types0 = o.typesOverride.getOrElse(
      df.schema.fields.map(fieldTypeName).toSeq)
    val transposed = o.transpose && !o.rowsArray
    val useRownum = o.rownum && !transposed
    val cols = if (useRownum) "ROWNUM" +: cols0 else cols0
    val types = if (useRownum) "int64" +: types0 else types0
    // "any"-typed cells hold canonical JSON text — emit raw, like the
    // reference marshalling the yielded Go value directly
    val anyIdx: Set[Int] = types0.zipWithIndex.collect {
      case ("any", i) => i
      case ("dict", i) => i // BOXPLOT dict cells carry canonical JSON
    }.toSet
    w.write("""{"data":{"columns":[""")
    w.write(cols.map(c => "\"" + jsonEscape(c) + "\"").mkString(","))
    w.write("""],"types":[""")
    w.write(types.map(t => "\"" + t + "\"").mkString(","))
    if (transposed) w.write("""],"cols":[""") else w.write("""],"rows":[""")
    // gojson.Marshal parity for the rowsArray/transpose/rowsFlatten paths:
    // floats print shortest-round-trip, precision IGNORED
    // (json_encode.go marshals the Go value directly)
    def rawCell(v: Any, j: Int): String = v match {
      case s: String if j >= 0 && anyIdx(j) &&
        (s.startsWith("{") || s.startsWith("[")) => s
      case d: java.lang.Double => goFloat(normZero(d))
      case f: java.lang.Float => goFloat(normZero(f.toDouble))
      case other => jsonValue(other, o)
    }
    var first = true
    var i = 0L
    if (transposed) {
      val series = Array.fill(cols0.size)(Vector.newBuilder[String])
      df.toLocalIterator().forEachRemaining { row =>
        row.toSeq.zipWithIndex.foreach { case (v, j) =>
          if (j < series.length) series(j) += rawCell(v, j)
        }
      }
      w.write(series.map(_.result().mkString("[", ",", "]")).mkString(","))
    } else if (o.rowsArray) {
      df.toLocalIterator().forEachRemaining { row =>
        if (!first) w.write(",")
        first = false
        i += 1
        // Go marshals a map[string]any — keys sort lexicographically
        val pairs = cols0.zip(row.toSeq.zipWithIndex) ++
          (if (o.rownum) Seq("ROWNUM" -> (i.asInstanceOf[Any], -1)) else Nil)
        w.write(pairs.sortBy(_._1).map { case (c, (v, j)) =>
          "\"" + jsonEscape(c) + "\":" + rawCell(v, j)
        }.mkString("{", ",", "}"))
      }
    } else {
      df.toLocalIterator().forEachRemaining { row =>
        if (!first) w.write(",")
        first = false
        i += 1
        val base = row.toSeq.zipWithIndex.map {
          case (s: String, j) if anyIdx(j) &&
            (s.startsWith("{") || s.startsWith("[")) => s
          // rowsFlatten marshals through plain gojson.Marshal — shortest
          // form, precision IGNORED (json_encode.go:262-278); only the
          // nested-rows path applies AppendPrecisionFloat64
          case (d: java.lang.Double, _) if o.rowsFlatten => goFloat(normZero(d))
          case (f: java.lang.Float, _) if o.rowsFlatten => goFloat(normZero(f.toDouble))
          case (v, _) => jsonValue(v, o)
        }
        val cells = if (o.rownum) i.toString +: base else base
        if (o.rowsFlatten) w.write(cells.mkString(","))
        else w.write(cells.mkString("[", ",", "]"))
      }
    }
    val elapse = o.elapse.getOrElse(
      graft.time.TimeFns.goDurationString(System.nanoTime() - t0))
    w.write(s"""]},"success":true,"reason":"success","elapse":"$elapse"}""")
  }

  /** TEXT sink: Go-template per record, or raw space-joined values when no
    * template is set (reference templ.go:172-210). */
  def text(df: DataFrame, w: Writer, o: Options = Options(),
           htmlEscape: Boolean = false): Unit = {
    val colNames = o.colsOverride.getOrElse(df.columns.toSeq)
    o.template match {
      case None =>
        df.toLocalIterator().forEachRemaining { row =>
          w.write(row.toSeq.map(v => GoTemplate.fmtVal(v)).mkString(" "))
          w.write("\n")
        }
      case Some(src) =>
        val tmpl = GoTemplate.parse(src)
        val it = df.toLocalIterator()
        var num = 0L
        var pending: Option[Seq[Any]] = None
        def emit(values: Seq[Any], isLast: Boolean): Unit = {
          num += 1
          w.write(tmpl.render(GoTemplate.Record(num, num == 1, isLast, values,
            colNames), o.templateParams, htmlEscape))
        }
        while (it.hasNext) {
          pending.foreach(v => emit(v, isLast = false))
          pending = Some(it.next().toSeq)
        }
        pending match {
          case Some(v) => emit(v, isLast = true)
          case None =>
            // no rows: still execute once with an empty record (templ.go:153)
            w.write(tmpl.render(GoTemplate.Record(0, true, true, Seq.empty,
              colNames), o.templateParams, htmlEscape))
        }
    }
  }

  /** NDJSON sink: one object per row; rownum(true) prepends a ROWNUM
    * key (tql_test.go CSV_NDJSON golden). */
  def ndjson(df: DataFrame, w: Writer, o: Options = Options()): Unit = {
    val cols = df.columns
    var i = 0L
    df.toLocalIterator().forEachRemaining { row =>
      i += 1
      val base = cols.zip(row.toSeq).map { case (c, v) =>
        "\"" + jsonEscape(c) + "\":" + jsonValue(v, o)
      }
      val obj = if (o.rownum) ("\"ROWNUM\":" + i) +: base else base
      w.write(obj.mkString("{", ",", "}")); w.write("\n")
    }
    // trailing blank line at Close, like the reference (ndjson/encode.go)
    w.write("\n")
  }

  /** Go util.NumberFormat — thousands separators for the brief Total
    * marker. */
  private def numberFormat(n: Long): String =
    java.text.NumberFormat.getIntegerInstance(java.util.Locale.US).format(n)

  /** MARKDOWN table sink. Floats print %f-style (6 fixed decimals) unlike
    * CSV's shortest form — md_encode.go:226-231. rownum prepends a ROWNUM
    * column; brief truncates to the first N rows with an ellipsis row and
    * a Total marker (md_encode.go Close). */
  def markdown(df: DataFrame, w: Writer, o: Options = Options()): Unit = {
    val cols0 = df.columns.toSeq
    val cols = if (o.rownum) "ROWNUM" +: cols0 else cols0
    val mdOpts = o.copy(precision = if (o.precision >= 0) o.precision else 6)
    if (o.htmlRender) { markdownXhtml(df, w, mdOpts); return }
    w.write(cols.mkString("|", "|", "|")); w.write("\n")
    w.write(cols.map(_ => ":-----").mkString("|", "|", "|")); w.write("\n")
    var n = 0L
    df.toLocalIterator().forEachRemaining { row =>
      n += 1
      if (o.brief <= 0 || n <= o.brief) {
        val cells = row.toSeq.map(fmt(_, mdOpts))
        val line = if (o.rownum) n.toString +: cells else cells
        w.write(line.mkString("|", "|", "|")); w.write("\n")
      }
    }
    if (o.brief > 0 && n > o.brief) {
      // Go: strings.Repeat("| ... ", n) + "|"
      w.write(cols.map(_ => " ... ").mkString("|", "|", "|")); w.write("\n")
      w.write(s"\n> *Total* ${numberFormat(n)} *records*\n")
    } else if (n == 0) {
      // empty result marker (markdown encoder, task_test.go:1083-1093)
      w.write("\n> *No record*\n")
    }
  }

  /** MARKDOWN(html(true)) — the table converted to XHTML in a <div>, the
    * byte shape goldmark gives the reference's mdconv (left-aligned
    * `|:-----` columns → align="left"; empty cells have no attribute;
    * test/markdown_xhtml.txt golden). Empty results render the
    * "> *No record*" marker as its blockquote conversion. */
  private def markdownXhtml(df: DataFrame, w: Writer, o: Options): Unit = {
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val cols0 = df.columns.toSeq
    val cols = if (o.rownum) "ROWNUM" +: cols0 else cols0
    w.write("<div>\n")
    var n = 0L
    val body = new StringBuilder
    df.toLocalIterator().forEachRemaining { row =>
      n += 1
      if (o.brief <= 0 || n <= o.brief) {
        body.append("<tr>\n")
        val cells = row.toSeq.map(fmt(_, o))
        (if (o.rownum) n.toString +: cells else cells).foreach { s =>
          if (s.isEmpty) body.append("<td></td>\n")
          else body.append(s"""<td align="left">${esc(s)}</td>\n""")
        }
        body.append("</tr>\n")
      }
    }
    if (o.brief > 0 && n > o.brief) {
      body.append("<tr>\n")
      cols.foreach(_ => body.append("<td align=\"left\">...</td>\n"))
      body.append("</tr>\n")
    }
    if (n == 0) {
      w.write("<blockquote>\n<p><em>No record</em></p>\n</blockquote>\n")
    } else {
      w.write("<table>\n<thead>\n<tr>\n")
      cols.foreach(c => w.write(s"""<th align="left">${esc(c)}</th>\n"""))
      w.write("</tr>\n</thead>\n<tbody>\n")
      w.write(body.toString)
      w.write("</tbody>\n</table>\n")
      if (o.brief > 0 && n > o.brief)
        w.write(s"<blockquote>\n<p><em>Total</em> ${numberFormat(n)} <em>records</em></p>\n</blockquote>\n")
    }
    w.write("</div>")
  }

  /** BOX (ASCII table) sink — the reference renders through go-pretty
    * (box_encode.go): headers UPPERCASE, the ROWNUM column right-aligned,
    * data cells left-aligned, floats in shortest 'f' form (unlike CSV's
    * 6-dec trim), styles default/light/double/bold/round, and the
    * boxSeparateColumns/boxDrawBorder switches. Buffers rows for column
    * widths; use only on presentation-sized results, like the reference.
    */
  def box(df: DataFrame, w: Writer, o: Options = Options()): Unit = {
    // (TL, TM, TR, ML, MM, MR, BL, BM, BR, H, V)
    val g: Array[String] = o.boxStyle.toLowerCase match {
      case "light" => Array("┌", "┬", "┐", "├", "┼", "┤", "└", "┴", "┘", "─", "│")
      case "double" => Array("╔", "╦", "╗", "╠", "╬", "╣", "╚", "╩", "╝", "═", "║")
      case "bold" => Array("┏", "┳", "┓", "┣", "╋", "┫", "┗", "┻", "┛", "━", "┃")
      case "round" => Array("╭", "┬", "╮", "├", "┼", "┤", "╰", "┴", "╯", "─", "│")
      case _ => Array("+", "+", "+", "+", "+", "+", "+", "+", "+", "-", "|")
    }
    def boxCell(v: Any): String = v match {
      case null => "NULL"
      case d: Double =>
        if (o.precision >= 0) fixedExact(d, o.precision) else goFloat(d)
      case f: Float =>
        if (o.precision >= 0) fixedExact(f.toDouble, o.precision)
        else { // shortest float32 repr, like FormatFloat(..., -1, 32)
          val s = java.lang.Float.toString(f)
          if (s.endsWith(".0")) s.dropRight(2) else s
        }
      case other => fmt(other, o)
    }
    val cols0 = df.columns.toSeq.map(_.toUpperCase)
    val cols = if (o.rownum) "ROWNUM" +: cols0 else cols0
    var i = 0L
    val rows = df.collect().map { r =>
      i += 1
      val base = r.toSeq.map(boxCell)
      if (o.rownum) (i.toString +: base) else base
    }
    // go-pretty measures cell width in RUNES, not UTF-16 units — a
    // surrogate-pair cell (U+1F112 "(C)" + "CD") counts 3 runes, so it
    // gets one more pad space than its UTF-16 length suggests
    // (box_encode_test.go TestBoxWide pins exactly that, FIXME included)
    def runeLen(s: String): Int = s.codePointCount(0, s.length)
    val widths = cols.indices.map { c =>
      (runeLen(cols(c)) +: rows.map(r => runeLen(r(c))).toSeq).max
    }
    val sepCol = if (o.separateColumns) g(10) else " "
    def rule(l: String, m: String, r: String, outer: Boolean = true): Unit = {
      // the outer border toggles top/bottom/side rules; the header
      // separator stays (go-pretty Options.DrawBorder vs SeparateHeader)
      if (outer && !o.drawBorder) return
      val body = widths.map(wd => g(9) * (wd + 2))
        .mkString(if (o.separateColumns) m else g(9))
      if (o.drawBorder) w.write(l + body + r) else w.write(body)
      w.write("\n")
    }
    def line(vals: Seq[String], rightAlignFirst: Boolean): Unit = {
      val cells = vals.zip(widths).zipWithIndex.map { case ((v, wd), ci) =>
        if (rightAlignFirst && ci == 0 && o.rownum)
          (" " * (wd - runeLen(v))) + v
        else v + (" " * math.max(0, wd - runeLen(v)))
      }
      val (lb, rb) = if (o.drawBorder) (g(10) + " ", " " + g(10)) else ("", "")
      w.write(cells.mkString(lb, s" $sepCol ", rb)); w.write("\n")
    }
    rule(g(0), g(1), g(2))
    line(cols, rightAlignFirst = false)
    rule(g(3), g(4), g(5), outer = false)
    rows.foreach(r => line(r, rightAlignFirst = true))
    rule(g(6), g(7), g(8))
  }

  def render(df: DataFrame, format: String, o: Options = Options()): String = {
    val sw = new StringWriter()
    format.toUpperCase match {
      case "CSV" => csv(df, sw, o)
      case "JSON" => jsonEnvelope(df, sw, o)
      case "NDJSON" => ndjson(df, sw, o)
      case "MARKDOWN" =>
        // MARKDOWN(template) renders through the template engine
        // (tql_test.go CSV_payload_MAPVALUE_MARKDOWN_TEMPLATE); with
        // html(true) the TEMPLATED markdown text is goldmark-converted
        // to XHTML in a <div> (md_test.go TestMarkdownTemplatePathTextHtml)
        if (o.template.isDefined) {
          if (o.htmlRender) {
            val b = new StringWriter()
            text(df, b, o)
            sw.write("<div>\n")
            sw.write(graft.server.Markdown.convert(b.toString))
            sw.write("</div>")
          } else text(df, sw, o)
        } else markdown(df, sw, o)
      case "BOX" => box(df, sw, o)
      case "TEXT" => text(df, sw, o)
      // HTML templates escape interpolated values like Go html/template
      // (templ_test.go TestUnsafeHTML); TEXT never does (text/template)
      case "HTML" => text(df, sw, o, htmlEscape = true)
      case "DISCARD" => df.foreach(_ => ()) // materialize, emit nothing
      case f => throw new IllegalArgumentException(s"unknown sink format $f")
    }
    sw.toString
  }

  /** Column type name for the envelope — a `machtype` metadata key (set
    * by server.TagTables) wins over the Spark type mapping, since Spark
    * can't distinguish uint16/json/ipv4/… from their storage types. */
  private[graft] def fieldTypeName(f: StructField): String =
    if (f.metadata.contains("machtype")) f.metadata.getString("machtype")
    else typeName(f.dataType)

  private[graft] def typeName(t: DataType): String = t match {
    case StringType => "string"
    case DoubleType | FloatType => "double"
    case LongType | IntegerType | ShortType => "int64"
    case TimestampType | TimestampNTZType => "datetime"
    case BooleanType => "bool"
    case BinaryType => "bytes"
    case _: DecimalType => "double"
    case other => other.simpleString
  }
}
