package graft.time

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Epoch-nanosecond time kernel.
  *
  * The reference stores `datetime` at nanosecond precision and all its APIs
  * default to `timeformat=ns`; time-bucketing is integer arithmetic
  * `time - time % period` (reference: mods/tql/fm_monad.go:665,
  * mods/server/http_lake.go:1707-1716). Spark's TimestampType is
  * microseconds, so the engine keeps a LongType epoch-ns discipline and
  * converts only at the presentation edge. Every helper here is a pure
  * Column expression — fully codegen'd, no UDFs.
  */
object TimeFns {
  val NsPerUs: Long = 1000L
  val NsPerMs: Long = 1000L * 1000
  val NsPerSec: Long = 1000L * 1000 * 1000
  val NsPerMin: Long = 60L * NsPerSec
  val NsPerHour: Long = 3600L * NsPerSec
  val NsPerDay: Long = 86400L * NsPerSec

  /** Parse a Go-style duration literal ("1s", "500ms", "2h45m") to ns. */
  def parseDurationNs(s: String): Long = {
    val t = s.trim
    // Go time.ParseDuration accepts a leading sign ("-1s" — the
    // backward oscillator range, tql_test.go FAKE_oscillator_2)
    if (t.startsWith("-")) return -parseDurationNs(t.substring(1))
    val re = "([0-9]+(?:\\.[0-9]+)?)(ns|us|µs|ms|s|m|h|d)".r
    val matches = re.findAllMatchIn(t).toList
    require(matches.nonEmpty, s"unparseable duration: $s")
    matches.map { m =>
      val v = m.group(1).toDouble
      val unit = m.group(2) match {
        case "ns" => 1L
        case "us" | "µs" => NsPerUs
        case "ms" => NsPerMs
        case "s" => NsPerSec
        case "m" => NsPerMin
        case "h" => NsPerHour
        case "d" => NsPerDay
      }
      (v * unit).toLong
    }.sum
  }

  /** roundTime: floor an epoch-ns column to a period — the reference's
    * `time / period * period` integer formula. */
  def roundTimeNs(tsNs: Column, periodNs: Long): Column =
    (tsNs - pmod(tsNs, lit(periodNs))).cast("long")

  /** DATE_TRUNC('SEC'|'MIN'|'HOUR'|'DAY', t, n) equivalent on epoch-ns
    * (reference: mods/server/http_lake.go:1692-1716). */
  def dateTruncNs(tsNs: Column, unit: String, n: Int = 1): Column = {
    val per = unit.toUpperCase match {
      case "SEC" | "SECOND" => NsPerSec
      case "MIN" | "MINUTE" => NsPerMin
      case "HOUR" => NsPerHour
      case "DAY" => NsPerDay
      case u => throw new IllegalArgumentException(s"unit $u")
    }
    roundTimeNs(tsNs, per * n)
  }

  /** ANSI-style timeformat ("yyyy-mm-dd hh:nn:ss.ffffff") → Spark/Java
    * pattern (reference ansiTimeformat). */
  def translateAnsiTimeformat(fmt: String): String = {
    // mm (month) must translate before nn→mm introduces minute 'mm's
    val tokens = Seq(
      "yyyy" -> "yyyy", "ffffff" -> "SSSSSS", "fff" -> "SSS",
      "mm" -> "MM", "hh" -> "HH", "nn" -> "mm", "ss" -> "ss", "dd" -> "dd")
    tokens.foldLeft(fmt) { case (acc, (from, to)) => acc.replace(from, to) }
  }

  /** epoch-ns → TimestampType (µs truncation at the presentation edge). */
  def nsToTimestamp(tsNs: Column): Column = timestamp_micros((tsNs / 1000L).cast("long"))

  /** TimestampType → epoch-ns (lossless from µs). */
  def timestampToNs(ts: Column): Column = unix_micros(ts) * 1000L

  /** epoch-ns → epoch-µs, exact integer floor division. Goes through
    * decimal because a 2024-era epoch-ns (≈1.7e18) exceeds 2^53: any
    * double-division path silently corrupts the last microsecond digit. */
  def nsToUs(tsNs: Column): Column =
    floor(tsNs.cast("decimal(25,0)") / lit(1000)).cast("long")

  /** Translate the reference's SQL-style timeformat (sqlTimeformat,
    * "YYYY-MM-DD HH24:MI:SS") into a Spark datetime pattern.
    * Named formats from the reference's util timeformatter. */
  def translateTimeformat(fmt: String): String = fmt match {
    case "DEFAULT" => "yyyy-MM-dd HH:mm:ss.SSS"
    case "RFC3339" => "yyyy-MM-dd'T'HH:mm:ss'Z'"
    case "RFC3339NANO" => "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS'Z'"
    case other =>
      // SQL-style tokens, longest first so HH24 wins over HH.
      val tokens = Seq(
        "YYYY" -> "yyyy", "YY" -> "yy",
        "HH24" -> "HH", "HH12" -> "hh", "HH" -> "HH",
        "MI" -> "mm", "SSS" -> "SSS", "SS" -> "ss",
        "MM" -> "MM", "DD" -> "dd", "AM" -> "a", "PM" -> "a",
        "nnnnnnnnn" -> "SSSSSSSSS", "nnnnnn" -> "SSSSSS", "mmm" -> "SSS")
      tokens.foldLeft(other) { case (acc, (from, to)) => acc.replace(from, to) }
  }

  /** tz() name resolution (reference util/time_locations.go:9-42 with
    * its generated tzdb alias table): Local/UTC, then abbreviation
    * aliases (first listed zone wins — its tests pin KST→Asia/Seoul,
    * GMT→Africa/Abidjan, EEST→Africa/Cairo), then IANA region ids and
    * fixed offsets pass through. This carries the common-abbreviation
    * subset of the reference's table. */
  private val tzAliases = Map(
    "GMT" -> "Africa/Abidjan", "BST" -> "America/La_Paz",
    "CET" -> "Africa/Algiers", "CEST" -> "Africa/Ceuta",
    "WET" -> "Africa/Casablanca", "WEST" -> "Africa/Casablanca",
    "EET" -> "Africa/Cairo", "EEST" -> "Africa/Cairo",
    "MSK" -> "Europe/Kirov", "KST" -> "Asia/Seoul", "JST" -> "Asia/Tokyo",
    "CST" -> "America/Bahia_Banderas", "CDT" -> "America/Bahia_Banderas",
    "EST" -> "America/Atikokan", "EDT" -> "America/Detroit",
    "MST" -> "America/Boise", "MDT" -> "America/Boise",
    "PST" -> "America/Dawson", "PDT" -> "America/Ensenada",
    "AKST" -> "America/Anchorage", "AKDT" -> "America/Anchorage",
    "IST" -> "Asia/Calcutta", "HKT" -> "Asia/Hong_Kong",
    "SGT" -> "Asia/Singapore", "AEST" -> "Australia/ACT",
    "AEDT" -> "Australia/ACT", "ACDT" -> "Australia/Adelaide",
    "AWST" -> "Antarctica/Casey", "NZST" -> "Antarctica/McMurdo",
    "NZDT" -> "Antarctica/McMurdo", "EAT" -> "Africa/Addis_Ababa",
    "WAT" -> "Africa/Bangui", "CAT" -> "Africa/Blantyre",
    "SAST" -> "Africa/Johannesburg", "AST" -> "America/Anguilla",
    "ADT" -> "America/Barbados", "NST" -> "America/St_Johns",
    "NDT" -> "America/St_Johns", "PKT" -> "Asia/Karachi",
    "ICT" -> "Asia/Bangkok", "WIB" -> "Asia/Jakarta",
    "WITA" -> "Asia/Makassar", "WIT" -> "Asia/Jayapura")

  def resolveTz(name: String): String = name.toLowerCase match {
    case "local" => "UTC" // this engine pins the task clock to UTC
    case "utc" => "UTC"
    case _ => tzAliases.getOrElse(name, name)
  }

  /** Go reference-layout ("2006-01-02 15:04:05") → DateTimeFormatter
    * pattern; the reference's util.Timeformatter accepts both Go layouts
    * and named/SQL formats. Longest tokens first. */
  def translateGoTimeformat(layout: String): String = Seq(
    "2006" -> "yyyy", ".999999999" -> ".SSSSSSSSS", ".999999" -> ".SSSSSS",
    ".999" -> ".SSS", ".000000000" -> ".SSSSSSSSS", ".000000" -> ".SSSSSS",
    ".000" -> ".SSS", "January" -> "MMMM", "Jan" -> "MMM", "Monday" -> "EEEE",
    "Mon" -> "EEE", "15" -> "HH", "03" -> "hh", "04" -> "mm", "05" -> "ss",
    "01" -> "MM", "02" -> "dd", "PM" -> "a", "MST" -> "zzz",
    "Z07:00" -> "XXX", "-07:00" -> "xxx"
  ).foldLeft(layout) { case (acc, (from, to)) => acc.replace(from, to) }

  /** Format an epoch-ns column with a reference-style timeformat + tz. */
  def formatNs(tsNs: Column, fmt: String): Column = fmt match {
    case "ns" => tsNs
    case "us" => nsToUs(tsNs)
    case "ms" => floor(tsNs / 1000000L).cast("long")
    case "s" => floor(tsNs / 1000000000L).cast("long")
    case pattern => date_format(nsToTimestamp(tsNs), translateTimeformat(pattern))
  }
}
