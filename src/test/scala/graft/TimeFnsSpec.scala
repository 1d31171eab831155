package graft

import org.apache.spark.sql.functions._
import graft.time.TimeFns

class TimeFnsSpec extends SparkSpec {
  import spark.implicits._

  test("parseDurationNs handles compound Go-style literals") {
    assert(TimeFns.parseDurationNs("1s") == 1000000000L)
    assert(TimeFns.parseDurationNs("2h45m") == (2L * 3600 + 45 * 60) * 1000000000L)
    assert(TimeFns.parseDurationNs("500ms") == 500000000L)
    assert(TimeFns.parseDurationNs("1.5s") == 1500000000L)
    assert(TimeFns.parseDurationNs("1d") == 86400L * 1000000000L)
  }

  test("roundTimeNs floors to the period (reference time/period*period)") {
    val df = Seq(1704412867123456789L, 1704412800000000000L).toDF("ts")
    val got = df.select(TimeFns.roundTimeNs(col("ts"), TimeFns.NsPerMin)).as[Long].collect()
    assert(got(0) == 1704412860000000000L)
    assert(got(1) == 1704412800000000000L)
  }

  test("nsToUs is an exact floor division above 2^53") {
    // regression: double-division path corrupted the last µs digit
    val ns = 1704363359645136997L
    val got = Seq(ns).toDF("ts").select(TimeFns.nsToUs(col("ts"))).as[Long].head()
    assert(got == 1704363359645136L)
  }

  test("timeformat translation covers SQL-style tokens") {
    assert(TimeFns.translateTimeformat("YYYY-MM-DD HH24:MI:SS") == "yyyy-MM-dd HH:mm:ss")
    assert(TimeFns.translateTimeformat("DEFAULT") == "yyyy-MM-dd HH:mm:ss.SSS")
  }

  test("formatNs epoch modes and pattern mode") {
    val ns = 1704412800000000000L
    val df = Seq(ns).toDF("ts")
    assert(df.select(TimeFns.formatNs(col("ts"), "s")).as[Long].head() == 1704412800L)
    assert(df.select(TimeFns.formatNs(col("ts"), "ms")).as[Long].head() == 1704412800000L)
    val s = df.select(TimeFns.formatNs(col("ts"), "YYYY-MM-DD HH24:MI:SS")).as[String].head()
    assert(s == "2024-01-05 00:00:00")
  }

  test("goDurationString matches Go time.Duration.String()") {
    assert(TimeFns.goDurationString(0L) == "0s")
    assert(TimeFns.goDurationString(500L) == "500ns")
    assert(TimeFns.goDurationString(1500L) == "1.5µs")
    assert(TimeFns.goDurationString(123456789L) == "123.456789ms")
    assert(TimeFns.goDurationString(1500000000L) == "1.5s")
    assert(TimeFns.goDurationString(60000000000L) == "1m0s")
    assert(TimeFns.goDurationString(62500000000L) == "1m2.5s")
    assert(TimeFns.goDurationString(3784500000000L) == "1h3m4.5s")
    assert(TimeFns.goDurationString(-1500L) == "-1.5µs")
  }
}
