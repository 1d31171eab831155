package graft.server

import scala.collection.mutable.ArrayBuffer

/** Server-metrics time series (reference mods/util/metric): tumbling
  * interval bins over a bounded ring, with Counter/Gauge/Meter/Timer
  * producers and moving-average derivers over sliding bin windows.
  * Backs FAKE(statz(...)) and the statz endpoints.
  *
  * Bin labels are the interval's END time (roundTime = t + i/2 rounded
  * half-away); closing a bin emits a Product to the listener; gaps fill
  * with null bins; a gap of maxCount-1 or more intervals resets the
  * ring (timeseries.go add()).
  */
object MetricSeries {
  // ---- values ----------------------------------------------------------
  sealed trait MetricValue {
    var derived: Map[String, MetricValue] = Map.empty
    protected def baseJson: String
    def toJson: String =
      if (derived.isEmpty) baseJson
      else {
        val d = derived.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":${v.toJson}""" }.mkString("{", ",", "}")
        baseJson.dropRight(1) + s""","derived":$d}"""
      }
  }
  final case class CounterValue(samples: Long, value: Double) extends MetricValue {
    protected def baseJson = s"""{"samples":$samples,"value":${num(value)}}"""
  }
  final case class GaugeValue(samples: Long, sum: Double, value: Double) extends MetricValue {
    protected def baseJson =
      s"""{"samples":$samples,"sum":${num(sum)},"value":${num(value)}}"""
  }
  final case class MeterValue(samples: Long, sum: Double, first: Double,
                              last: Double, min: Double, max: Double) extends MetricValue {
    protected def baseJson =
      s"""{"samples":$samples,"sum":${num(sum)},"first":${num(first)},""" +
        s""""last":${num(last)},"min":${num(min)},"max":${num(max)}}"""
  }
  /** durations marshal as ns integers, like Go time.Duration in JSON */
  final case class TimerValue(samples: Long, sumNs: Long, minNs: Long,
                              maxNs: Long) extends MetricValue {
    protected def baseJson =
      s"""{"samples":$samples,"sum":$sumNs,"min":$minNs,"max":$maxNs}"""
  }
  final case class OdometerValue(first: Double, last: Double,
                                 samples: Long) extends MetricValue {
    def diff: Double = if (samples == 0) 0 else last - first
    protected def baseJson =
      s"""{"first":${num(first)},"last":${num(last)},"samples":$samples}"""
  }
  final case class HistogramValue(samples: Long, p: Seq[Double],
                                  values: Seq[Double]) extends MetricValue {
    protected def baseJson =
      s"""{"samples":$samples,"p":${p.map(num).mkString("[", ",", "]")},""" +
        s""""values":${values.map(num).mkString("[", ",", "]")}}"""
  }

  private def num(d: Double): String = graft.sinks.Codecs.goFloat(d)

  // ---- producers -------------------------------------------------------
  sealed trait Producer {
    def add(v: Double): Unit
    def produce(reset: Boolean): MetricValue
    var derivers: Seq[Deriver] = Nil
    def withDerivers(ds: Deriver*): this.type = { derivers ++= ds; this }
  }
  final class Counter extends Producer {
    private var samples = 0L; private var value = 0.0
    def add(v: Double): Unit = { value += v; samples += 1 }
    def produce(reset: Boolean): MetricValue = {
      val r = CounterValue(samples, value)
      if (reset) { samples = 0; value = 0 }
      r
    }
  }
  final class Gauge extends Producer {
    private var samples = 0L; private var sum = 0.0; private var value = 0.0
    def add(v: Double): Unit = { value = v; sum += v; samples += 1 }
    def produce(reset: Boolean): MetricValue = {
      val r = GaugeValue(samples, sum, value)
      if (reset) { samples = 0; sum = 0; value = 0 }
      r
    }
  }
  final class Meter extends Producer {
    private var samples = 0L
    private var sum, first, last, mn, mx = 0.0
    def add(v: Double): Unit = {
      if (samples == 0) { first = v; mn = v; mx = v }
      if (v < mn) mn = v
      if (v > mx) mx = v
      sum += v; last = v; samples += 1
    }
    def produce(reset: Boolean): MetricValue = {
      val r = MeterValue(samples, sum, first, last, mn, mx)
      if (reset) { samples = 0; sum = 0; first = 0; last = 0; mn = 0; mx = 0 }
      r
    }
  }
  final class Timer extends Producer {
    private var samples = 0L
    private var sumNs, minNs, maxNs = 0L
    def add(v: Double): Unit = mark(v.toLong)
    def mark(ns: Long): Unit = {
      if (samples == 0) { minNs = ns; maxNs = ns }
      if (ns < minNs) minNs = ns
      if (ns > maxNs) maxNs = ns
      sumNs += ns; samples += 1
    }
    def produce(reset: Boolean): MetricValue = {
      val r = TimerValue(samples, sumNs, minNs, maxNs)
      if (reset) { samples = 0; sumNs = 0; minNs = 0; maxNs = 0 }
      r
    }
  }

  /** Monotonic-counter reading (odometer.go): keeps first/last readings
    * per window; reset carries `last` forward as the next window's
    * `first`, so Diff() chains across windows without gaps. */
  final class Odometer extends Producer {
    private var samples = 0L
    private var first, last = 0.0
    private var initialized = false
    def add(v: Double): Unit = {
      samples += 1
      if (!initialized) { first = v; initialized = true }
      last = v
    }
    def produce(reset: Boolean): MetricValue = {
      val r = OdometerValue(first, last, samples)
      if (reset) { first = last; samples = 0 }
      r
    }
  }

  /** Streaming quantile sketch (histogram.go): sorted value bins; when
    * over maxBins, merge the adjacent pair with the smallest value gap
    * into their count-weighted mean (the merge order is deterministic —
    * histogram_test.go TestHistogramJSON pins the exact bins). Quantile
    * lookup walks cumulative counts. Bounded state — the 100-TB shape is
    * the same sketch merged per-partition. */
  final class Histogram(maxBins0: Int, qs0: Double*) extends Producer {
    private val maxBins = if (maxBins0 <= 0) 100 else maxBins0
    val qs: Seq[Double] = if (qs0.nonEmpty) qs0.toSeq else Seq(0.5, 0.90, 0.99)
    private var bins = Vector.empty[(Double, Double)] // (value, count)
    private var samples = 0L

    def add(v: Double): Unit = {
      samples += 1
      val idx = bins.indexWhere(_._1 > v)
      bins = if (idx < 0) bins :+ (v, 1.0)
      else (bins.take(idx) :+ ((v, 1.0))) ++ bins.drop(idx)
      trim()
    }

    private def trim(): Unit = {
      while (bins.size > maxBins) {
        var d = 0.0
        var i = 0
        var j = 1
        while (j < bins.size) {
          val dv = bins(j)._1 - bins(j - 1)._1
          if (dv < d || j == 1) { d = dv; i = j }
          j += 1
        }
        val count = bins(i)._2 + bins(i - 1)._2
        val merged = ((bins(i)._1 * bins(i)._2 + bins(i - 1)._1 * bins(i - 1)._2) / count, count)
        bins = (bins.take(i - 1) :+ merged) ++ bins.drop(i + 1)
      }
    }

    def quantile(q: Double): Double = {
      var count = q * samples
      var i = 0
      while (i < bins.size) {
        count -= bins(i)._2
        if (count <= 0) return bins(i)._1
        i += 1
      }
      0.0
    }
    def quantiles(ps: Double*): Seq[Double] = ps.map(quantile)
    /** the marshalled sketch state (TestHistogramJSON) */
    def binsJson: String = bins.map { case (v, c) =>
      f"""{"value":$v%f,"count":$c%f}""" }.mkString("[", ",", "]")

    def produce(reset: Boolean): MetricValue = {
      val r = HistogramValue(samples, qs, quantiles(qs: _*))
      if (reset) { bins = Vector.empty; samples = 0 }
      r
    }
  }

  // ---- derivers --------------------------------------------------------
  trait Deriver {
    def id: String
    def windowSize: Int
    def derive(values: Seq[MetricValue]): MetricValue
  }

  /** Sliding-bin moving average (value_derivers.go): counters average
    * sample-weighted, gauges average per-bin last values, meters average
    * first/last/min/max across valid bins, timers average min/max. */
  final case class MovingAverage(id: String, windowSize: Int) extends Deriver {
    def derive(values: Seq[MetricValue]): MetricValue = {
      val valid = values.filter(_ != null)
      valid.lastOption match {
        case Some(_: CounterValue) =>
          var samples = 0L; var sum = 0.0
          valid.collect { case c: CounterValue if c.samples > 0 =>
            samples += c.samples; sum += c.value * c.samples }
          CounterValue(samples, if (samples > 0) sum / samples else 0)
        case Some(_: GaugeValue) =>
          var samples = 0L; var sum = 0.0; var lastSum = 0.0; var n = 0
          valid.collect { case g: GaugeValue if g.samples > 0 =>
            samples += g.samples; sum += g.sum; lastSum += g.value; n += 1 }
          GaugeValue(samples, sum, if (n > 0) lastSum / n else 0)
        case Some(_: MeterValue) =>
          var samples = 0L; var n = 0
          var sum, first, last, mn, mx = 0.0
          valid.collect { case m: MeterValue if m.samples > 0 =>
            n += 1; samples += m.samples; sum += m.sum
            first += m.first; last += m.last; mn += m.min; mx += m.max }
          if (n > 0) MeterValue(samples, sum, first / n, last / n, mn / n, mx / n)
          else MeterValue(samples, sum, 0, 0, 0, 0)
        case Some(_: TimerValue) =>
          var samples = 0L; var n = 0
          var sum, mn, mx = 0L
          valid.collect { case t: TimerValue if t.samples > 0 =>
            n += 1; samples += t.samples; sum += t.sumNs
            mn += t.minNs; mx += t.maxNs }
          if (n > 0) TimerValue(samples, sum, mn / n, mx / n)
          else TimerValue(samples, sum, 0, 0)
        case other => other.orNull
      }
    }
  }

  // ---- the series ------------------------------------------------------
  case class TimeBin(timeNs: Long, value: MetricValue, isNull: Boolean)
  case class Product(timeNs: Long, value: MetricValue)

  final class TimeSeries(intervalNs: Long, maxCount: Int, producer: Producer,
                         listener: Product => Unit = _ => (),
                         zone: java.time.ZoneId = java.time.ZoneOffset.UTC) {
    private val data = ArrayBuffer.empty[TimeBin]
    private var lastTimeNs: Option[Long] = None

    /** bin label = interval END: t + i/2 rounded half-away-from-zero
      * (timeseries.go roundTime). */
    private def roundTime(t: Long): Long = {
      val shifted = t + intervalNs / 2
      val rem = java.lang.Math.floorMod(shifted, intervalNs)
      val down = shifted - rem
      if (rem * 2 >= intervalNs) down + intervalNs else down
    }
    private def truncate(t: Long): Long = java.lang.Math.floorDiv(t, intervalNs) * intervalNs
    private def intervalBetween(prev: Long, later: Long): Long =
      (truncate(later) - truncate(prev)) / intervalNs

    def add(tNs: Long, v: Double): Unit = {
      val roll = lastTimeNs.map(intervalBetween(_, tNs)).getOrElse(0L)
      if (roll <= 0 || lastTimeNs.isEmpty) {
        lastTimeNs = Some(tNs)
        if (!v.isNaN) producer.add(v)
        return
      }
      val p = producer.produce(reset = true)
      val tb = TimeBin(roundTime(lastTimeNs.get), p, p == null)
      listener(Product(tb.timeNs, tb.value))
      data += tb
      lastTimeNs = Some(tNs)
      if (!v.isNaN) producer.add(v)
      var gaps = roll - 1
      runDerivers(tb.value, preliminary = false)
      if (gaps >= maxCount - 1) { data.clear(); return }
      if (data.size > maxCount - 1)
        data.remove(0, data.size - (maxCount - 1))
      val lastBin = data.last.timeNs
      var i = 0L
      while (i < gaps) {
        data += TimeBin(lastBin + (i + 1) * intervalNs, null, isNull = true)
        if (data.size > maxCount - 1) data.remove(0)
        i += 1
      }
    }

    private def runDerivers(current: MetricValue, preliminary: Boolean): Unit = {
      if (producer.derivers.isEmpty || current == null) return
      producer.derivers.foreach { d =>
        val vals0 =
          if (d.windowSize > 0) {
            val (_, vs) = lastNInternal(d.windowSize + 1)
            if (preliminary) vs.drop(1) else vs.dropRight(1)
          } else lastNInternal(1)._2
        current.derived += d.id -> d.derive(vals0)
      }
    }

    def interval: Long = intervalNs
    def max: Int = maxCount

    def all(): (Seq[Long], Seq[MetricValue]) = lastN(0)

    def lastN(n0: Int): (Seq[Long], Seq[MetricValue]) = {
      val r = lastNInternal(n0)
      if (r._2.nonEmpty) runDerivers(r._2.last, preliminary = true)
      r
    }

    private def lastNInternal(n0: Int): (Seq[Long], Seq[MetricValue]) = {
      val lt = lastTimeNs.map(roundTime).getOrElse(0L)
      val lv = producer.produce(reset = false)
      if (n0 == 1) return (Seq(lt), Seq(lv))
      val n = if (n0 <= 0 || n0 > maxCount) maxCount else n0
      val times = Array.tabulate(n)(i => lt - (n - i - 1) * intervalNs)
      val values = Array.fill[MetricValue](n)(null)
      var tmIdx = 0
      data.foreach { tb =>
        if (tmIdx < times.length - 1) {
          if (!(tb.timeNs < times(tmIdx))) {
            while (tmIdx < times.length - 1 && tb.timeNs > times(tmIdx)) tmIdx += 1
            if (tb.timeNs == times(tmIdx)) values(tmIdx) = tb.value
          }
        }
      }
      if (times.last == lt) values(values.length - 1) = lv
      (times.toSeq, values.toSeq)
    }

    def last(): (Long, MetricValue) = {
      val (ts, vs) = lastN(1)
      (ts.head, vs.head)
    }

    def after(tNs: Long): (Seq[Long], Seq[MetricValue]) = {
      val tick = tNs - intervalNs / 2
      val idx = data.indexWhere(_.timeNs >= tick)
      if (idx < 0) return (Nil, Nil)
      val sub = data.drop(idx)
      val lt = lastTimeNs.map(roundTime).getOrElse(0L)
      val lv = producer.produce(reset = false)
      (sub.map(_.timeNs).toSeq :+ lt, sub.map(_.value).toSeq :+ lv)
    }

    /** JSON render: closed bins plus the open bin, skipping nothing —
      * `[{"ts":"YYYY-MM-DD HH:MM:SS","value":{...}}, …]`. */
    def render: String = {
      def fmtTs(ns: Long): String =
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
          .withZone(zone)
          .format(java.time.Instant.ofEpochSecond(
            java.lang.Math.floorDiv(ns, 1000000000L),
            java.lang.Math.floorMod(ns, 1000000000L)))
      val closed = data.map { tb =>
        val v = if (tb.isNull || tb.value == null) "null" else tb.value.toJson
        s"""{"ts":"${fmtTs(tb.timeNs)}","value":$v}"""
      }
      val open = s"""{"ts":"${fmtTs(lastTimeNs.map(roundTime).getOrElse(0L))}",""" +
        s""""value":${producer.produce(reset = false).toJson}}"""
      (closed :+ open).mkString("[", ",", "]")
    }
  }
}
