package graft.server

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import scala.collection.mutable

/** The `POST /db/write/:table` ingest door (reference:
  * mods/server/http_write.go:27-250): JSON envelope, NDJSON, or CSV
  * payloads — optionally gzip'd — decoded against the target table's
  * schema and inserted/appended. `timeformat` interprets numeric time
  * values (epoch s/ms/us/ns); binary columns arrive base64 (both the
  * JSON `[]byte` marshaling and the CSV convention).
  *
  * This is the presentation-sized interactive path; bulk ingest stays on
  * `sinks.TableSinks` / `sources.LineProtocol.parseDf` (partitioned
  * writes). */
object WriteDoor {

  def write(spark: SparkSession, table: String, payload: Array[Byte],
            contentType: String, params: Map[String, String] = Map.empty): Long = {
    val body = decompress(payload, params.get("compress"))
    val timeformat = params.getOrElse("timeformat", "ns")
    val tz = params.getOrElse("tz", "UTC")
    val binFormat = params.getOrElse("binaryformat", "base64")
    // CSV field delimiter (mqtt_write.go:86-87 / http write `delimiter`)
    val delim = params.get("delimiter").filter(_.nonEmpty)
      .map(_.charAt(0)).getOrElse(',')
    val schema = TagTables.storageSchemaFor(table)
    def fieldOf(name: String): Option[StructField] =
      schema.fields.find(_.name.equalsIgnoreCase(name))

    val (columns, rows): (Seq[String], Iterator[Seq[Any]]) =
      contentType.toLowerCase.takeWhile(_ != ';').trim match {
        case "application/json" =>
          graft.script.Builtins.jsonParse(body) match {
            // bare array of rows: positional against the table's columns
            // (mqtt_test.go mqtt-write-json publishes `[[...],[...]]`);
            // a single bare row `["n", t, v]` is one record
            // (json_test.go TestSingleRowDecoder)
            case s: scala.collection.Seq[_] =>
              val isRows = s.forall(_.isInstanceOf[scala.collection.Seq[_]])
              val rws: Iterator[Seq[Any]] =
                if (isRows) s.iterator.map(r => asSeq(r))
                else Iterator.single(asSeq(s))
              (TagTables.columnsOf(table), rws)
            case parsed =>
              val root = asMap(parsed)
              val data = asMap(root.getOrElse("data", root))
              val cols = asSeq(data("columns")).map(String.valueOf(_))
              val rws = asSeq(data("rows")).map(r => asSeq(r))
              // the reference's envelope decoder is POSITIONAL against the
              // table schema and rejects any arity mismatch
              // (json_decode.go:58-61 "number of columns not matched"); the
              // "columns" list may be shorter than the rows (json_test.go
              // TestDecoder: 7 values, 4 listed names). We honor the listed
              // names when a row's arity matches them (partial/reordered
              // writes), decided PER ROW — a mixed-arity batch never
              // misassigns narrower rows — and a row matching neither arity
              // errors like the reference instead of zip-truncating.
              val tableCols = TagTables.columnsOf(table)
              val perRow = rws.iterator.zipWithIndex.map { case (r, i) =>
                if (r.size == cols.size) {
                  // remap into table order (buildRow treats explicit null
                  // and absent identically, so mixing arities is safe)
                  val byName = cols.map(_.toUpperCase).zip(r).toMap
                  tableCols.map(c => byName.getOrElse(c.toUpperCase, null))
                } else if (r.size == tableCols.size) r
                else throw new IllegalArgumentException(
                  s"rows[${i + 1}] number of columns not matched (${r.size});" +
                  s" table '${table.toUpperCase}' has ${tableCols.size} columns")
              }
              (tableCols, perRow)
          }
        case "application/x-ndjson" | "application/jsonl" =>
          val objs = body.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
            .map(l => asMap(graft.script.Builtins.jsonParse(l))).toSeq
          // union of keys across ALL objects (first-seen order): a field
          // appearing only in later lines must not be silently dropped
          val cols = objs.foldLeft(Vector.empty[String]) { (acc, o) =>
            acc ++ o.keys.filterNot(acc.contains)
          }
          (cols, objs.iterator.map(o => cols.map(c => o.getOrElse(c, null))))
        case "text/csv" =>
          val lines = body.split("\n").iterator.map(_.stripSuffix("\r"))
            .filter(_.nonEmpty).map(csvSplit(_, delim)).toSeq
          params.getOrElse("header", "") match {
            case "columns" =>
              (lines.head.map(_.trim), lines.tail.iterator.map(identity))
            case "skip" =>
              (TagTables.columnsOf(table), lines.tail.iterator.map(identity))
            case _ =>
              (TagTables.columnsOf(table), lines.iterator.map(identity))
          }
        case other =>
          throw new IllegalArgumentException(s"unsupported content type: $other")
      }

    val isCsv = contentType.toLowerCase.startsWith("text/csv")
    val coerced = rows.map { row =>
      columns.zip(row).map { case (c, v) =>
        convert(v, fieldOf(c), timeformat, tz, binFormat, csvEmptyIsNull = isCsv) }
    }
    // method=insert|append converge on the same columnar buffer here
    TagTables.insertAll(spark, table, columns, coerced)
  }

  private def decompress(payload: Array[Byte], compress: Option[String]): String =
    if (compress.contains("gzip") ||
      (payload.length >= 2 && (payload(0) & 0xFF) == 0x1F && (payload(1) & 0xFF) == 0x8B)) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(payload))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    } else new String(payload, "UTF-8")

  private def asMap(v: Any): mutable.LinkedHashMap[String, Any] = v match {
    case m: mutable.LinkedHashMap[_, _] =>
      m.asInstanceOf[mutable.LinkedHashMap[String, Any]]
    case other => throw new IllegalArgumentException(s"expected JSON object, got $other")
  }

  private def asSeq(v: Any): Seq[Any] = v match {
    case a: mutable.ArrayBuffer[_] => a.toSeq
    case s: Seq[_] => s
    case other => throw new IllegalArgumentException(s"expected JSON array, got $other")
  }

  /** wire value → JVM value for the target column (TagTables.coerce
    * finishes the job; here we resolve the wire conventions). */
  private def convert(v: Any, field: Option[StructField], timeformat: String,
                      tz: String, binFormat: String = "base64",
                      csvEmptyIsNull: Boolean = false): Any = {
    val target: Option[DataType] = field.map(_.dataType)
    // machtype distinguishes the string-backed column kinds: an empty CSV
    // cell decodes to "" ONLY for varchar/text (csv_decode_test.go
    // "null-values" pins "" at the varchar positions, nil at ipv4), while
    // json stays NULL (http_test.go:1308-1548 round-trip golden)
    def machtype: String = field.map { f =>
      if (f.metadata.contains("machtype")) f.metadata.getString("machtype")
      else ""
    }.getOrElse("")
    (v, target) match {
      case (null, _) => null
      case ("", Some(StringType)) if csvEmptyIsNull &&
          machtype == "string" => "" // varchar/text machtype (not json/ipv4)
      case ("", _) if csvEmptyIsNull => null
      case ("", Some(dt)) if dt != StringType => null
      case (s: String, Some(BinaryType)) =>
        // base64 by default; binaryformat=hex accepts 0x-prefixed hex
        // (http_write_test.go TestWriteBinaryFormat json_hex). Odd-length
        // hex is rejected like Go encoding/hex, never half-parsed.
        if (binFormat.equalsIgnoreCase("hex")) {
          val hex = if (s.startsWith("0x") || s.startsWith("0X")) s.substring(2) else s
          if (hex.length % 2 != 0) throw new IllegalArgumentException(
            "encoding/hex: odd length hex string")
          hex.grouped(2).map(b => Integer.parseInt(b, 16).toByte).toArray
        } else java.util.Base64.getDecoder.decode(s)
      // a NUMERIC time value always rides machbase's numeric-datetime
      // convention: the epoch unit from ns/us/ms/s timeformats, epoch-ns
      // otherwise — text layouts only reinterpret STRING values (the
      // reference's util.ParseTime layout branch is string-only and
      // errors on digit strings, pinned below)
      case (n: java.lang.Number, Some(TimestampType)) =>
        java.lang.Long.valueOf(epochToNs(n.longValue(), timeformat))
      case (s: String, Some(TimestampType)) if s.matches("[+-]?\\d+") &&
          Set("ns", "us", "ms", "s").contains(timeformat) =>
        java.lang.Long.valueOf(epochToNs(s.toLong, timeformat))
      case (s: String, Some(TimestampType)) =>
        // wall-clock text under a named/Go-layout timeformat in `tz`
        // (http_write.go:56-57 timeformat+tz reach the CSV decoder's
        // datetime Apply; csv_decode_test.go "Default", "2006/01/02 …")
        java.lang.Long.valueOf(
          graft.time.TimeFns.parseWallNs(s, timeformat, tz))
      case (s: String, Some(dt)) if dt != StringType && dt != BinaryType =>
        // CSV numerics arrive as text
        if (s.matches("[+-]?\\d+")) java.lang.Long.valueOf(s)
        else java.lang.Double.valueOf(s)
      case (other, _) => other
    }
  }

  private def epochToNs(v: Long, timeformat: String): Long = timeformat match {
    case "s" => v * 1000000000L
    case "ms" => v * 1000000L
    case "us" => v * 1000L
    case _ => v
  }

  /** minimal RFC-4180 split (quoted fields, "" escapes). */
  private[server] def csvSplit(line: String): Seq[String] =
    csvSplit(line, ',')

  private[server] def csvSplit(line: String, delim: Char): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur.append('"'); i += 1
        } else if (c == '"') inQ = false
        else cur.append(c)
      } else c match {
        case '"' => inQ = true
        case d if d == delim => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.toSeq
  }
}
