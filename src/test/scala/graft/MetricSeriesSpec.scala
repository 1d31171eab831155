package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.MetricSeries._

/** Reproduces the reference metric battery
  * (mods/util/metric/timeseries_test.go): bin rolling, gap nulls, ring
  * reset, products, JSON render, counter/gauge/meter/timer producers and
  * the moving-average sliding windows. */
class MetricSeriesSpec extends AnyFunSuite {

  private val S = 1000000000L
  private def t(h: Int, m: Int, s: Int, ms: Int = 0): Long =
    (java.time.LocalDateTime.of(2023, 10, 1, h, m, s, ms * 1000000)
      .toEpochSecond(java.time.ZoneOffset.UTC)) * S + ms.toLong * 1000000L

  test("meter series: rolls, gaps, ring reset, products (TestTimeseries)") {
    val products = scala.collection.mutable.ArrayBuffer.empty[Product]
    val ts = new TimeSeries(S, 3, new Meter, products += _)
    var now = t(12, 4, 4, 400)
    ts.add(now, 1.0)
    now += S; ts.add(now, 2.0)
    assert(ts.render ==
      """[{"ts":"2023-10-01 12:04:05","value":{"samples":1,"sum":1,"first":1,"last":1,"min":1,"max":1}},""" +
      """{"ts":"2023-10-01 12:04:06","value":{"samples":1,"sum":2,"first":2,"last":2,"min":2,"max":2}}]""",
      ts.render)
    now += S; ts.add(now, 3.0)
    now += S; ts.add(now, 4.0)
    val (times1, vals1) = ts.all()
    assert(times1 == Seq(t(12, 4, 6), t(12, 4, 7), t(12, 4, 8)))
    assert(vals1 == Seq(
      MeterValue(1, 2, 2, 2, 2, 2), MeterValue(1, 3, 3, 3, 3, 3),
      MeterValue(1, 4, 4, 4, 4, 4)))
    now += 100000000L; ts.add(now, 5.0)
    now += 200000000L; ts.add(now, 4.8)
    val (times2, vals2) = ts.all()
    assert(times2 == times1)
    assert(vals2.last == MeterValue(3, 13.8, 4, 4.8, 4, 5))
    now += 1700000000L; ts.add(now, 6.0)
    val (times3, vals3) = ts.all()
    assert(times3 == Seq(t(12, 4, 8), t(12, 4, 9), t(12, 4, 10)))
    assert(vals3 == Seq(MeterValue(3, 13.8, 4, 4.8, 4, 5), null,
      MeterValue(1, 6, 6, 6, 6, 6)))
    now += 5 * S; ts.add(now, 7.0)
    assert(ts.render ==
      """[{"ts":"2023-10-01 12:04:15","value":{"samples":1,"sum":7,"first":7,"last":7,"min":7,"max":7}}]""",
      ts.render)
    // products fired at each bin close
    assert(products.map(_.timeNs) ==
      Seq(t(12, 4, 5), t(12, 4, 6), t(12, 4, 7), t(12, 4, 8), t(12, 4, 10)))
    assert(products(3).value == MeterValue(3, 13.8, 4, 4.8, 4, 5))
  }

  test("counter series over sub-second adds (TestTimeSeriesSubSeconds)") {
    val ts = new TimeSeries(S, 10, new Counter)
    var now = t(12, 4, 5) - 100000000L
    def tick(): Long = { now += 100000000L; now }
    (1 to 100).foreach(i => ts.add(tick(), i.toDouble))
    val (times, values) = ts.lastN(0)
    assert(times == (6 to 15).map(s => t(12, 4, s)))
    assert(values == Seq(
      CounterValue(10, 55), CounterValue(10, 155), CounterValue(10, 255),
      CounterValue(10, 355), CounterValue(10, 455), CounterValue(10, 555),
      CounterValue(10, 655), CounterValue(10, 755), CounterValue(10, 855),
      CounterValue(10, 955)))
    assert(ts.interval == S && ts.max == 10)
    val (lt, lv) = ts.last()
    assert(lt == t(12, 4, 15) && lv == CounterValue(10, 955))
    assert(ts.lastN(20)._1.size == 10)
    val (at, av) = ts.after(t(12, 4, 13))
    assert(at == Seq(t(12, 4, 13), t(12, 4, 14), t(12, 4, 15)))
    assert(av == Seq(CounterValue(10, 755), CounterValue(10, 855), CounterValue(10, 955)))
  }

  test("counter moving averages over sliding bin windows (TestTimeSeriesCounterWithSlidingWindow)") {
    val ts = new TimeSeries(S, 10,
      new Counter().withDerivers(MovingAverage("ma3", 3), MovingAverage("ma5", 5)))
    var now = t(12, 4, 5) - 100000000L
    def tick(): Long = { now += 100000000L; now }
    (1 to 100).foreach(i => ts.add(tick(), i.toDouble))
    val (_, values) = ts.lastN(0)
    def d(v: MetricValue, k: String): MetricValue = v.derived(k)
    assert(values(0) == CounterValue(10, 55) &&
      d(values(0), "ma3") == CounterValue(10, 55) &&
      d(values(0), "ma5") == CounterValue(10, 55), values(0).derived)
    assert(d(values(1), "ma3") == CounterValue(20, 105))
    assert(d(values(2), "ma3") == CounterValue(30, 155))
    assert(d(values(3), "ma3") == CounterValue(30, 255))
    assert(d(values(3), "ma5") == CounterValue(40, 205))
    assert(d(values(4), "ma5") == CounterValue(50, 255))
    assert(d(values(9), "ma3") == CounterValue(30, 855))
    assert(d(values(9), "ma5") == CounterValue(50, 755))
  }

  test("meter moving averages: fields average, sum/samples accumulate (TestTimeSeriesMeterWithSlidingWindow timeseries_test.go:514-587)") {
    val ts = new TimeSeries(S, 10,
      new Meter().withDerivers(MovingAverage("ma3", 3), MovingAverage("ma5", 5)))
    var now = t(12, 4, 5) - 100000000L
    def tick(): Long = { now += 100000000L; now }
    (1 to 100).foreach(i => ts.add(tick(), i.toDouble))
    val (_, values) = ts.lastN(0)
    def d(v: MetricValue, k: String): MetricValue = v.derived(k)
    assert(values(0) == MeterValue(10, 55, 1, 10, 1, 10))
    assert(d(values(0), "ma3") == MeterValue(10, 55, 1, 10, 1, 10))
    // the deriver AVERAGES first/last/min/max but SUMS samples/sum —
    // values[3]: ma3 over bins 11-20/21-30/31-40 → min (11+21+31)/3
    assert(d(values(3), "ma3") == MeterValue(30, 765, 21, 30, 21, 30))
    assert(d(values(3), "ma5") == MeterValue(40, 820, 16, 25, 16, 25))
    assert(d(values(9), "ma3") == MeterValue(30, 2565, 81, 90, 81, 90))
    assert(d(values(9), "ma5") == MeterValue(50, 3775, 71, 80, 71, 80))
  }

  test("gauge keeps the last value per bin; timer aggregates ns durations (TestTimeSeriesGauge/Timer)") {
    val g = new TimeSeries(S, 10, new Gauge)
    var now = t(12, 4, 5) - 100000000L
    def tick(): Long = { now += 100000000L; now }
    (1 to 100).foreach(i => g.add(tick(), i.toDouble))
    val (_, gv) = g.lastN(0)
    assert(gv.head == GaugeValue(10, 55, 10))
    assert(gv.last == GaugeValue(10, 955, 100))

    val tm = new TimeSeries(S, 10, new Timer)
    now = t(12, 4, 5) - 100000000L
    (1 to 100).foreach(i => tm.add(tick(), (i.toLong * S).toDouble))
    val (_, tv) = tm.lastN(0)
    assert(tv.head == TimerValue(10, 55 * S, 1 * S, 10 * S))
    assert(tv.last == TimerValue(10, 955 * S, 91 * S, 100 * S))
  }

  test("histogram quantiles exact and merged (TestHistogram/50/Quantiles)") {
    val h = new Histogram(100)
    (1 to 100).foreach(i => h.add(i.toDouble))
    assert(h.quantile(0.50) == 50.0)
    assert(h.quantile(0.75) == 75.0)
    assert(h.quantile(0.90) == 90.0)
    assert(h.quantile(0.99) == 99.0)
    assert(h.quantile(0.999) == 100.0)
    assert(h.quantiles(0.75, 0.50, 0.90) == Seq(75.0, 50.0, 90.0))

    val h50 = new Histogram(50)
    (1 to 100).foreach(i => h50.add(i.toDouble))
    assert(h50.quantile(0.50) == 49.5)
    assert(h50.quantile(0.75) == 75.5)
    assert(h50.quantile(0.90) == 89.5)
    assert(h50.quantile(0.99) == 99.5)
    assert(h50.quantile(0.999) == 99.5)
  }

  test("histogram sketch bins merge deterministically (TestHistogramJSON)") {
    val h = new Histogram(10, 0.5, 0.7, 0.9)
    (1 to 100).foreach(i => h.add(i.toDouble))
    assert(h.binsJson ==
      """[{"value":4.500000,"count":8.000000},{"value":12.500000,"count":8.000000},""" +
      """{"value":22.000000,"count":11.000000},{"value":31.000000,"count":7.000000},""" +
      """{"value":40.000000,"count":11.000000},{"value":52.500000,"count":14.000000},""" +
      """{"value":64.500000,"count":10.000000},{"value":74.500000,"count":10.000000},""" +
      """{"value":86.000000,"count":13.000000},{"value":96.500000,"count":8.000000}]""",
      h.binsJson)
    val v = h.produce(false).asInstanceOf[HistogramValue]
    assert(v.samples == 100 && v.p == Seq(0.5, 0.7, 0.9), v)
  }

  test("odometer chains first/last across window resets (TestOdometerJSON)") {
    val om = new Odometer
    assert(om.produce(true).toJson == """{"first":0,"last":0,"samples":0}""")
    val om2 = new Odometer
    om2.add(2.0); om2.add(7.0); om2.add(10.0)
    val v1 = om2.produce(false).asInstanceOf[OdometerValue]
    assert(v1.diff == 8.0)
    assert(v1.toJson == """{"first":2,"last":10,"samples":3}""")
    om2.produce(true)
    om2.add(13.0)
    val v2 = om2.produce(false).asInstanceOf[OdometerValue]
    assert(v2.diff == 3.0)
    assert(v2.toJson == """{"first":10,"last":13,"samples":1}""")
  }

  test("multi-period fan-out: 1s/10s/60s bins agree (TestMultiTimeSeries timeseries_test.go:169-244)") {
    // the reference's MultiTimeSeries is a plain slice fanning Add() to
    // each series — reproduced with a Seq; pins the 10s/60s bin edges
    val ts1 = new TimeSeries(S, 10, new Meter)
    val ts10 = new TimeSeries(10 * S, 6, new Meter)
    val ts60 = new TimeSeries(60 * S, 5, new Meter)
    var now = t(12, 4, 5)
    for (i <- 1 to 10 * 5 * 60) {
      Seq(ts1, ts10, ts60).foreach(_.add(now, i.toDouble))
      now += 100000000L
    }
    val (t1, v1) = ts1.lastN(0)
    assert(t1 == ((12, 8, 56) :: (12, 8, 57) :: (12, 8, 58) :: (12, 8, 59) ::
      (12, 9, 0) :: (12, 9, 1) :: (12, 9, 2) :: (12, 9, 3) :: (12, 9, 4) ::
      (12, 9, 5) :: Nil).map { case (h, m, s) => t(h, m, s) })
    assert(v1.head == MeterValue(10, 29055, 2901, 2910, 2901, 2910))
    assert(v1.last == MeterValue(10, 29955, 2991, 3000, 2991, 3000))
    val (t10, v10) = ts10.all()
    assert(t10 == Seq(t(12, 8, 20), t(12, 8, 30), t(12, 8, 40),
      t(12, 8, 50), t(12, 9, 0), t(12, 9, 10)))
    assert(v10.head == MeterValue(100, 250050, 2451, 2550, 2451, 2550))
    assert(v10.last == MeterValue(50, 148775, 2951, 3000, 2951, 3000))
    val (t60, v60) = ts60.all()
    assert(t60 == Seq(t(12, 6, 0), t(12, 7, 0), t(12, 8, 0),
      t(12, 9, 0), t(12, 10, 0)))
    assert(v60.head == MeterValue(600, 510300, 551, 1150, 551, 1150))
    assert(v60(3) == MeterValue(600, 1590300, 2351, 2950, 2351, 2950))
    assert(v60.last == MeterValue(50, 148775, 2951, 3000, 2951, 3000))
  }

  test("statz reply is a JSON object keyed by measure (TestStatz shape)") {
    graft.server.Metrics.clear()
    graft.server.Metrics.send("sess:query", 1.0, t(12, 4, 5))
    graft.server.Metrics.send("sess:query", 2.0, t(12, 4, 5, 500))
    graft.server.Metrics.send("go:goroutine", 42.0, t(12, 4, 5))
    val json = graft.server.Metrics.statzJson()
    assert(json.startsWith("""{"go:goroutine":[""") && json.contains(""""sess:query":["""), json)
    assert(json.contains(""""value":2"""), json) // gauge keeps the bin's last
    graft.server.Metrics.clear()
  }
}
