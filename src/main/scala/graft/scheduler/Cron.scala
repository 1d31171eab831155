package graft.scheduler

import java.time.{Instant, ZoneId, ZonedDateTime}
import java.time.temporal.ChronoUnit

/** Cron-spec parsing and next-fire computation for the timer scheduler.
  *
  * The reference schedules timers with robfig/cron v3 specs
  * (mods/scheduler/management.go:349-356 builds the parser with
  * `Second | Minute | Hour | Dom | Month | Dow | Descriptor`), i.e. a
  * SIX-field spec `sec min hour dom month dow` plus the `@` descriptors.
  * This reimplements that publicly documented spec language from scratch:
  *
  *   - `*` any, `?` any (dom/dow), `a-b` ranges, `a/s` + `a-b/s` steps,
  *     comma lists; month names JAN..DEC, weekday names SUN..SAT.
  *   - dom/dow "or" rule: when BOTH fields are restricted a time matches
  *     if either matches; otherwise both must match.
  *   - `@yearly @annually @monthly @weekly @daily @midnight @hourly` and
  *     `@every <duration>`.
  *
  * Next-fire is evaluated against an explicit instant so tests and the
  * driver run under a pinned clock — no background threads are required
  * for the semantics to be exercised.
  */
object Cron {
  /** One parsed field: a 64-bit membership set plus a star flag (the
    * star flag participates in the dom/dow or-rule only). */
  final case class Field(bits: Long, star: Boolean) {
    def has(v: Int): Boolean = (bits & (1L << v)) != 0
  }

  sealed trait Schedule {
    /** Next activation strictly after `t` (None if none within ~5y). */
    def next(t: Instant, zone: ZoneId): Option[Instant]
  }

  /** `@every d` — constant delay, truncated to whole seconds (min 1s),
    * next = t + delay with sub-second part dropped. */
  final case class Every(delaySec: Long) extends Schedule {
    def next(t: Instant, zone: ZoneId): Option[Instant] =
      Some(t.truncatedTo(ChronoUnit.SECONDS).plusSeconds(delaySec))
  }

  final case class Spec(sec: Field, min: Field, hour: Field,
                        dom: Field, month: Field, dow: Field) extends Schedule {
    private def dayMatches(z: ZonedDateTime): Boolean = {
      val domOk = dom.has(z.getDayOfMonth)
      val dowOk = this.dow.has(z.getDayOfWeek.getValue % 7) // SUN=0
      if (dom.star || this.dow.star) domOk && dowOk else domOk || dowOk
    }

    def next(t: Instant, zone: ZoneId): Option[Instant] = {
      var z = t.atZone(zone).truncatedTo(ChronoUnit.SECONDS).plusSeconds(1)
      val yearLimit = z.getYear + 5
      while (z.getYear <= yearLimit) {
        if (!month.has(z.getMonthValue))
          z = z.withDayOfMonth(1).truncatedTo(ChronoUnit.DAYS).plusMonths(1)
        else if (!dayMatches(z))
          z = z.truncatedTo(ChronoUnit.DAYS).plusDays(1)
        else if (!hour.has(z.getHour))
          z = z.truncatedTo(ChronoUnit.HOURS).plusHours(1)
        else if (!min.has(z.getMinute))
          z = z.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
        else if (!sec.has(z.getSecond))
          z = z.plusSeconds(1)
        else
          return Some(z.toInstant)
      }
      None
    }
  }

  private val MonthNames = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")
  private val DowNames = Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")

  /** Parse a six-field spec or descriptor. Left = error message in the
    * reference parser's phrasing (management.parseSchedule then prefixes
    * "invalid schedule, "). */
  def parse(spec: String): Either[String, Schedule] = {
    val s = spec.trim
    if (s.isEmpty) return Left("empty spec string")
    if (s.startsWith("@")) return parseDescriptor(s)
    // 6 fields with seconds (the service parser); a classic 5-field spec
    // is accepted with the second pinned to 0 (robfig's standard parser,
    // which the reference registry tests schedule "*/5 * * * *" against)
    val raw = s.split("\\s+").toSeq
    val fields = if (raw.length == 5) "0" +: raw else raw
    if (fields.length != 6)
      return Left(s"expected exactly 6 fields, found ${raw.length}: [${raw.mkString(" ")}]")
    for {
      sec <- parseField(fields(0), 0, 59, Nil)
      min <- parseField(fields(1), 0, 59, Nil)
      hour <- parseField(fields(2), 0, 23, Nil)
      dom <- parseField(fields(3), 1, 31, Nil)
      month <- parseField(fields(4), 1, 12, MonthNames)
      dow <- parseField(fields(5), 0, 6, DowNames)
    } yield Spec(sec, min, hour, dom, month, dow)
  }

  private def parseDescriptor(s: String): Either[String, Schedule] = {
    val lower = s.toLowerCase
    def spec(txt: String) = parse(txt)
    lower match {
      case "@yearly" | "@annually" => spec("0 0 0 1 1 *")
      case "@monthly" => spec("0 0 0 1 * *")
      case "@weekly" => spec("0 0 0 * * 0")
      case "@daily" | "@midnight" => spec("0 0 0 * * *")
      case "@hourly" => spec("0 0 * * * *")
      case _ if lower.startsWith("@every ") =>
        val durTxt = s.substring("@every ".length).trim
        try {
          val ns = graft.time.TimeFns.parseDurationNs(durTxt)
          if (ns <= 0) Left(s"failed to parse duration $durTxt: non-positive")
          else Right(Every(math.max(1L, ns / 1000000000L)))
        } catch {
          case e: Exception => Left(s"failed to parse duration $durTxt: ${e.getMessage}")
        }
      case other => Left(s"unrecognized descriptor: $other")
    }
  }

  private def parseField(expr: String, lo: Int, hi: Int,
                         names: Seq[String]): Either[String, Field] = {
    var bits = 0L
    var star = false
    for (part <- expr.split(",")) {
      parseRange(part, lo, hi, names) match {
        case Left(e) => return Left(e)
        case Right((b, isStar)) => bits |= b; star ||= isStar
      }
    }
    Right(Field(bits, star))
  }

  /** One `a`, `a-b`, `*`, `?`, optionally `/step`. The star flag is set
    * only when the range covers everything with step 1 — stepped star
    * ranges count as restricted for the dom/dow or-rule. */
  private def parseRange(part: String, lo: Int, hi: Int,
                         names: Seq[String]): Either[String, (Long, Boolean)] = {
    val (rangeTxt, stepTxt) = part.indexOf('/') match {
      case -1 => (part, "")
      case i => (part.take(i), part.drop(i + 1))
    }
    def num(t: String): Either[String, Int] = {
      val up = t.toUpperCase
      val byName = names.indexOf(up)
      if (byName >= 0) Right(if (names == MonthNames) byName + 1 else byName)
      else try Right(t.toInt)
      catch { case _: NumberFormatException => Left(s"failed to parse int from $t") }
    }
    val bounds: Either[String, (Int, Int, Boolean)] =
      if (rangeTxt == "*" || rangeTxt == "?") Right((lo, hi, true))
      else rangeTxt.indexOf('-') match {
        case -1 => num(rangeTxt).map(v => (v, if (stepTxt.isEmpty) v else hi, false))
        case i =>
          for {
            a <- num(rangeTxt.take(i))
            b <- num(rangeTxt.drop(i + 1))
          } yield (a, b, false)
      }
    bounds.flatMap { case (a, b0, isStarTxt) =>
      val step: Either[String, Int] =
        if (stepTxt.isEmpty) Right(1)
        else num(stepTxt).flatMap(v =>
          if (v <= 0) Left(s"step of range should be a positive number: $part") else Right(v))
      step.flatMap { st =>
        val b = b0
        if (a < lo) Left(s"beginning of range ($a) below minimum ($lo): $part")
        else if (b > hi) Left(s"end of range ($b) above maximum ($hi): $part")
        else if (a > b) Left(s"beginning of range ($a) beyond end of range ($b): $part")
        else {
          var bits = 0L
          var v = a
          while (v <= b) { bits |= 1L << v; v += st }
          Right((bits, isStarTxt && st == 1))
        }
      }
    }
  }
}
