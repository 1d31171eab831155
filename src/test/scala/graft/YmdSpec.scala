package graft

import graft.time.Ymd

/** machbase layout parser goldens (mods/util/ymd/ymd_test.go TestParser)
  * — the same instants the reference pins, as epoch ns. */
class YmdSpec extends SparkSpec {

  // 2001-10-20T02:13:14.123456789Z
  private val tickUtc = {
    val i = java.time.Instant.parse("2001-10-20T02:13:14.123456789Z")
    i.getEpochSecond * 1000000000L + i.getNano
  }
  private val kst = java.time.ZoneId.of("Asia/Seoul")
  private val tickKst = tickUtc - 9L * 3600 * 1000000000L
  private val tickPmKst = tickKst + 12L * 3600 * 1000000000L

  test("layout battery (ymd_test.go:30-56)") {
    assert(Ymd.parse("YYYY/MM/DD HH24:MI:SS.mmmuuunnn",
      "2001/10/20 02:13:14.123456789").contains(tickUtc))
    assert(Ymd.parse("YYYY/MM/DD HH24:MI:SS.mmmuuunnn",
      "2001/10/20 02:13:14.123456789", kst).contains(tickKst))
    assert(Ymd.parse("YYYY/MM/DD HH24:MI:SS mmm.uuu.nnn",
      "2001/10/20 02:13:14 123.456.789").contains(tickUtc))
    assert(Ymd.parse("YYYY/MM/DD HH24:MI:SS mmm.uuu.nnn",
      "2001/10/20 02:13:14 123.456.789", kst).contains(tickKst))
    // MON month names match case-insensitively
    assert(Ymd.parse("YYYY/MON/DD HH24:MI:SS mmm.uuu.nnn",
      "2001/Oct/20 02:13:14 123.456.789", kst).contains(tickKst))
    // AM passes through, PM adds twelve hours
    assert(Ymd.parse("YYYY/MON/DD HH24:MI:SS mmm.uuu.nnn AM",
      "2001/Oct/20 02:13:14 123.456.789 AM", kst).contains(tickKst))
    assert(Ymd.parse("YYYY/MON/DD HH24:MI:SS mmm.uuu.nnn AM",
      "2001/Oct/20 02:13:14 123.456.789 PM", kst).contains(tickPmKst))
    // mismatched literals / trailing input fail
    assert(Ymd.parse("YYYY-MM-DD", "2001/10/20").isEmpty)
    assert(Ymd.parse("YYYY-MM-DD", "2001-10-20xx").isEmpty)
    assert(Ymd.parse("YYYY/MON/DD", "2001/Zzz/20").isEmpty)
  }

  test("lake write date_format honors custom layouts (http_lake.go:2264)") {
    import graft.server.LakeDoor
    // custom slash layout, previously only the default shape parsed
    val ns = graft.server.LakeDoor.parseYmdForTest(
      "2021/01/01 12:00:00", "YYYY/MM/DD HH24:MI:SS")
    val want = java.time.Instant.parse("2021-01-01T12:00:00Z")
    assert(ns.contains(want.getEpochSecond * 1000000000L), ns)
    // the default layout still accepts the fraction-less short form
    assert(LakeDoor.parseYmdForTest(
      "2023-11-02 00:02:00", "YYYY-MM-DD HH24:MI:SS mmm:uuu:nnn").nonEmpty)
    assert(LakeDoor.parseYmdForTest(
      "2023-11-02 00:02:00 000:000:000", "YYYY-MM-DD HH24:MI:SS mmm:uuu:nnn").nonEmpty)
  }
}
