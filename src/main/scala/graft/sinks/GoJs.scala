package graft.sinks

import scala.collection.mutable

/** Go-parity value rendering shared by the CHART / GEOMAP spec emitters
  * (reference: mods/codec/internal/chart/chart.go json.Marshal calls,
  * mods/codec/internal/geomap/leafletobj.go MarshalJS:253-420).
  *
  * Three Go formats appear in the goldens:
  *  - `json.Marshal` — JSON with shortest float repr, map keys sorted;
  *  - `%v` on numbers — shortest decimal (same repr in-range);
  *  - `%q` on strings — double-quoted with backslash escapes.
  */
object GoJs {
  /** Shortest round-trip decimal, plain 'f' form — Go strconv shortest
    * for every magnitude the chart/geomap surfaces produce. */
  def goNum(d: Double): String = {
    if (d.isNaN || d.isInfinite) return d.toString
    val s = java.lang.Double.toString(d)
    if (s.contains("E") || s.contains("e"))
      new java.math.BigDecimal(s).stripTrailingZeros().toPlainString
    else if (s.endsWith(".0")) s.dropRight(2)
    else s
  }

  /** Go %q: double-quoted string literal. */
  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\t' => sb.append("\\t")
      case '\r' => sb.append("\\r")
      case c if c < ' ' => sb.append(f"\\x${c.toInt}%02x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** JSON string per Go json.Marshal (escapes <,>,& as \u00XX like Go's
    * default HTML-safe encoder). */
  def jsonQuote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\t' => sb.append("\\t")
      case '\r' => sb.append("\\r")
      case '<' => sb.append("\\u003c")
      case '>' => sb.append("\\u003e")
      case '&' => sb.append("\\u0026")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Go json.Marshal parity for the dynamic values the sinks carry
    * (numbers, strings, booleans, nested seqs, string-keyed maps —
    * maps marshal with sorted keys exactly like Go). */
  def jsonMarshal(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case d: Double => goNum(d)
    case f: Float => goNum(f.toDouble)
    case n: java.lang.Number => n.toString
    case s: String => jsonQuote(s)
    case m: collection.Map[_, _] =>
      m.asInstanceOf[collection.Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => jsonQuote(k) + ":" + jsonMarshal(x) }
        .mkString("{", ",", "}")
    case arr: Array[_] => arr.map(jsonMarshal).mkString("[", ",", "]")
    case seq: Iterable[_] => seq.map(jsonMarshal).mkString("[", ",", "]")
    case other => jsonQuote(other.toString)
  }

  /** geomap MarshalJS: like JSON but object keys are bare identifiers and
    * strings use %q (no HTML escaping); map keys sorted
    * (leafletobj.go:255-270). */
  def marshalJS(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case d: Double => goNum(d)
    case f: Float => goNum(f.toDouble)
    case n: java.lang.Number => n.toString
    case s: String => quote(s)
    case m: collection.Map[_, _] =>
      m.asInstanceOf[collection.Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => k + ":" + marshalJS(x) }
        .mkString("{", ",", "}")
    case arr: Array[_] => arr.map(marshalJS).mkString("[", ",", "]")
    case seq: Iterable[_] => seq.map(marshalJS).mkString("[", ",", "]")
    case other => quote(other.toString)
  }

  /** Random 12-char id like the reference's snowflake.Generate default
    * (base64-url alphabet; only non-test paths see these). */
  def newId(): String = {
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_"
    val r = java.util.concurrent.ThreadLocalRandom.current()
    (0 until 12).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
  }

  /** Convert a sink row value like chart.go convValueType: time becomes
    * epoch-ms float (µs precision), nested seqs convert element-wise.
    * Returns (converted, typeHint). */
  def convValue(v: Any): (Any, String) = v match {
    case t: java.time.Instant =>
      ((t.getEpochSecond * 1000000L + t.getNano / 1000).toDouble / 1000, "time")
    case ts: java.sql.Timestamp =>
      (convValue(ts.toInstant)._1, "time")
    case seq: Iterable[_] => (seq.map(convValue(_)._1), "")
    case arr: Array[_] => (arr.toSeq.map(convValue(_)._1), "")
    case other => (other, "")
  }
}

/** Test seam mirroring facility.VolatileFileWriter — the reference's
  * chart/geomap tests pin the generated .js asset through this
  * (chart_test.go:43-56). */
trait VolatileFileWriter {
  def volatileFilePrefix: String
  def volatileFileWrite(name: String, data: Array[Byte]): Unit
}
