package graft.time

/** machbase layout time parser (reference: mods/util/ymd/ymd.go).
  * Layout tokens — YYYY, MM, MON, DD, HH24/HH, MI, SS, mmm, uuu, nnn,
  * AM (which also matches PM, adding twelve hours) — match greedily in
  * the reference's peek order; any other layout character is a literal.
  * Sub-day fields accumulate as nanoseconds-of-day and normalize through
  * the date, exactly like `time.Date(y, m, d, 0, 0, sec, nsec, loc)`.
  * Backs the lake write door's `date_format` request field
  * (http_lake.go:2264 `ymd.NewParser(stdReq.Dateformat)`); goldens in
  * mods/util/ymd/ymd_test.go.
  */
object Ymd {
  private[time] sealed trait M
  private final case class Text(s: String) extends M
  private final case class Digit(len: Int, multiplyNs: Long) extends M
  private case object Year extends M
  private case object MonthNum extends M
  private case object MonthName extends M
  private case object Day extends M
  private case object AmPm extends M

  private val months = Vector("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")

  private val tokens: Seq[(String, M)] = Seq(
    "YYYY" -> Year, "MM" -> MonthNum, "MON" -> MonthName, "DD" -> Day,
    "HH24" -> Digit(2, 3600000000000L), "HH" -> Digit(2, 3600000000000L),
    "MI" -> Digit(2, 60000000000L), "SS" -> Digit(2, 1000000000L),
    "mmm" -> Digit(3, 1000000L), "uuu" -> Digit(3, 1000L),
    "nnn" -> Digit(3, 1L), "AM" -> AmPm)

  private[time] def tokenize(layout: String): Seq[M] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[M]
    val lit = new StringBuilder
    var i = 0
    def flush(): Unit =
      if (lit.nonEmpty) { out += Text(lit.toString); lit.clear() }
    while (i < layout.length) {
      tokens.find { case (p, _) => layout.startsWith(p, i) } match {
        case Some((p, m)) => flush(); out += m; i += p.length
        case None => lit.append(layout.charAt(i)); i += 1
      }
    }
    flush()
    out.toSeq
  }

  /** input → epoch ns in `zone`; None when the input doesn't match the
    * layout (or leaves trailing text). */
  def parse(layout: String, input: String,
            zone: java.time.ZoneId = java.time.ZoneOffset.UTC): Option[Long] = {
    var s = input
    var tickNs = 0L
    var year = 0; var month = 0; var day = 0
    def takeDigits(n: Int): Option[Long] =
      if (s.length < n) None
      else {
        val part = s.substring(0, n)
        try { val v = part.toLong; s = s.substring(n); Some(v) }
        catch { case _: NumberFormatException => None }
      }
    for (m <- tokenize(layout)) m match {
      case Text(t) =>
        if (!s.startsWith(t)) return None
        s = s.substring(t.length)
      case Year => takeDigits(4) match {
        case Some(v) => year = v.toInt; case None => return None }
      case MonthNum => takeDigits(2) match {
        case Some(v) => month = v.toInt; case None => return None }
      case Day => takeDigits(2) match {
        case Some(v) => day = v.toInt; case None => return None }
      case MonthName =>
        if (s.length < 3) return None
        val ix = months.indexOf(s.substring(0, 3).toUpperCase)
        if (ix < 0) return None
        month = ix + 1; s = s.substring(3)
      case AmPm =>
        if (s.length < 2) return None
        s.substring(0, 2).toUpperCase match {
          case "AM" => s = s.substring(2)
          case "PM" => tickNs += 12L * 3600000000000L; s = s.substring(2)
          case _ => return None
        }
      case Digit(len, mul) => takeDigits(len) match {
        case Some(v) => tickNs += v * mul; case None => return None }
    }
    if (s.nonEmpty) return None
    try {
      val sec = tickNs / 1000000000L
      val nsec = tickNs % 1000000000L
      val base = java.time.LocalDateTime.of(year, month, day, 0, 0, 0)
        .atZone(zone).plusSeconds(sec).plusNanos(nsec)
      Some(base.toInstant.getEpochSecond * 1000000000L +
        base.toInstant.getNano)
    } catch { case _: Exception => None }
  }
}
