package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** InfluxDB line-protocol ingest (reference: `POST /metrics/write` —
  * mods/server/http_write.go:466-584, table mapping spi/do.go:10-80).
  * Telegraf posts `measurement,tag=v field=v[,field=v…] [ts]` lines
  * (optionally gzip'd); each NUMERIC field becomes one tag-table row:
  *
  *   | tag table column | line protocol                                |
  *   |------------------|----------------------------------------------|
  *   | name             | measurement + '.' + field name               |
  *   | time             | timestamp (precision ns/us/ms)               |
  *   | value            | field value (non-numeric fields are skipped) |
  *
  * String-typed columns beyond (name,time,value) are filled from the
  * matching UPPERCASED tag key (HOST etc.); other tags are dropped.
  *
  * Parsing is a plain Scala kernel so the scale path can run it inside
  * `mapPartitions` over a text stream — the single-node HTTP handler and
  * the 100 TB batch ingest share one decoder.
  */
object LineProtocol {
  case class Point(measurement: String, tags: Map[String, String],
                   fields: Seq[(String, Any)], tsNs: Long)

  /** ns multiplier for the `?precision=` query param (ns default). */
  def precisionNs(precision: String): Long = precision match {
    case "us" => 1000L
    case "ms" => 1000000L
    case _ => 1L
  }

  // ---- decoder -------------------------------------------------------
  /** Parse one line; influxdata line-protocol escaping (`\,` `\ ` `\=`
    * in identifiers, quoted strings with `\"`/`\\`, `123i` ints, bools). */
  def parseLine(line: String, precision: String = "ns"): Point = {
    var i = 0
    val n = line.length
    def err(what: String) =
      throw new IllegalArgumentException(s"$what error: at ${i} in $line")

    def ident(stopAtEq: Boolean): String = {
      val sb = new StringBuilder
      while (i < n && { val c = line.charAt(i)
        c != ',' && c != ' ' && (!stopAtEq || c != '=') }) {
        val c = line.charAt(i)
        if (c == '\\' && i + 1 < n) { sb.append(line.charAt(i + 1)); i += 2 }
        else { sb.append(c); i += 1 }
      }
      sb.toString
    }

    val measurement = ident(stopAtEq = false)
    if (measurement.isEmpty) err("measurement")

    val tags = scala.collection.mutable.LinkedHashMap.empty[String, String]
    while (i < n && line.charAt(i) == ',') {
      i += 1
      val k = ident(stopAtEq = true)
      if (i >= n || line.charAt(i) != '=') err("tag")
      i += 1
      val v = ident(stopAtEq = true)
      tags.put(k, v)
    }
    if (i >= n || line.charAt(i) != ' ') err("tag")
    while (i < n && line.charAt(i) == ' ') i += 1

    def fieldValue(): Any = {
      if (i < n && line.charAt(i) == '"') {
        i += 1
        val sb = new StringBuilder
        while (i < n && line.charAt(i) != '"') {
          val c = line.charAt(i)
          if (c == '\\' && i + 1 < n) { sb.append(line.charAt(i + 1)); i += 2 }
          else { sb.append(c); i += 1 }
        }
        if (i >= n) err("field")
        i += 1
        sb.toString
      } else {
        val start = i
        while (i < n && line.charAt(i) != ',' && line.charAt(i) != ' ') i += 1
        val tok = line.substring(start, i)
        if (tok.isEmpty) err("field")
        else if (tok.endsWith("i") || tok.endsWith("u"))
          java.lang.Long.valueOf(tok.dropRight(1))
        else if (tok == "t" || tok == "T" || tok.equalsIgnoreCase("true")) Boolean.box(true)
        else if (tok == "f" || tok == "F" || tok.equalsIgnoreCase("false")) Boolean.box(false)
        else java.lang.Double.valueOf(tok)
      }
    }

    val fields = scala.collection.mutable.ArrayBuffer.empty[(String, Any)]
    var more = true
    while (more) {
      val k = ident(stopAtEq = true)
      if (i >= n || line.charAt(i) != '=') err("field")
      i += 1
      fields += (k -> fieldValue())
      if (i < n && line.charAt(i) == ',') i += 1 else more = false
    }
    if (fields.isEmpty) err("field")

    var tsNs = 0L
    if (i < n && line.charAt(i) == ' ') {
      while (i < n && line.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && line.charAt(i) != ' ') i += 1
      val tok = line.substring(start, i)
      if (tok.nonEmpty) tsNs = tok.toLong * precisionNs(precision)
    }
    if (tsNs == 0L)
      throw new IllegalArgumentException("no timestamp")
    Point(measurement, tags.toMap, fields.toSeq, tsNs)
  }

  /** Parse a payload (possibly gzip'd) into points; `#` comments and
    * blank lines skipped. */
  def parse(payload: Array[Byte], precision: String): Seq[Point] = {
    val text =
      if (payload.length >= 2 && (payload(0) & 0xFF) == 0x1F && (payload(1) & 0xFF) == 0x8B) {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(payload))
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      } else new String(payload, "UTF-8")
    parseText(text, precision)
  }

  def parseText(text: String, precision: String = "ns"): Seq[Point] =
    text.split("\n").toSeq.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(parseLine(_, precision))

  // ---- tag-table mapping (spi/do.go:25-80) ---------------------------
  /** one row per NUMERIC field: (measurement.field, ts, value double)
    * plus any string-typed extra columns matched by UPPERCASED tag key. */
  def toTagRows(p: Point, extraStringCols: Seq[String]): Seq[Seq[Any]] = {
    val upperTags = p.tags.map { case (k, v) => k.toUpperCase -> v }
    // every extra column gets a positional slot (absent tag → null) — a
    // prefix-packed row would slide later tags into the wrong column
    // when an earlier one is missing (reference builds the INSERT column
    // list per point, spi/do.go WriteLineProtocol)
    val extras = extraStringCols.map(c => upperTags.get(c).orNull)
    p.fields.flatMap {
      case (k, v: java.lang.Number) =>
        Some(Seq[Any](s"${p.measurement}.$k", java.lang.Long.valueOf(p.tsNs),
          java.lang.Double.valueOf(v.doubleValue())) ++ extras)
      case _ => None // strings/booleans are not insertable values
    }
  }

  /** The `/metrics/write?db=T` handler body: decode and insert into the
    * session tag table. Returns rows inserted. */
  def writeTo(spark: SparkSession, table: String, payload: Array[Byte],
              precision: String = "ns"): Long = {
    import graft.server.TagTables
    val desc = TagTables.descriptorFor(table).getOrElse(
      throw new IllegalArgumentException(s"column error: undefined table $table"))
    val extraStringCols = desc.drop(3).collect {
      case c if c.typ == "varchar" || c.typ == "text" => c.name
    }
    val base = desc.take(3).map(_.name)
    val cols = base ++ extraStringCols
    val rows = parse(payload, precision)
      .flatMap(p => toTagRows(p, extraStringCols))
    TagTables.insertAll(spark, table, cols, rows.iterator)
  }

  // ---- scale path ----------------------------------------------------
  /** Distributed decode: a Dataset of raw lines → (name, time, value,
    * tags) rows via mapPartitions — the shape `appendTagTable` ingests.
    * Telegraf fleets at 100 TB land here (text files / Kafka), not on
    * the driver-side HTTP handler. */
  def parseDf(lines: Dataset[String], precision: String = "ns"): DataFrame = {
    import lines.sparkSession.implicits._
    lines.filter(l => l.trim.nonEmpty && !l.trim.startsWith("#"))
      .mapPartitions { it =>
        it.flatMap { l =>
          val p = parseLine(l.trim, precision)
          p.fields.collect { case (k, v: java.lang.Number) =>
            (s"${p.measurement}.$k", p.tsNs, v.doubleValue(), p.tags)
          }
        }
      }.toDF("name", "time", "value", "tags")
  }
}
