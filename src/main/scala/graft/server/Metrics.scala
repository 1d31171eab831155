package graft.server

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** Minimal server-metrics collector backing `FAKE(statz(...))` (reference:
  * mods/util/metric collector + spi.SetCollector, exercised by
  * tql_test.go:1829-1888). Series are (epoch-ns, value) samples keyed by
  * measure name; statz renders one row per distinct sample time with one
  * column per requested key. */
object Metrics {
  private val series = TrieMap.empty[String, ArrayBuffer[(Long, Double)]]

  def send(name: String, value: Double, tsNs: Long): Unit =
    series.getOrElseUpdate(name, ArrayBuffer.empty).synchronized {
      series(name) += ((tsNs, value))
    }

  def timeseries(name: String): Seq[(Long, Double)] =
    series.get(name).map(_.toSeq.sortBy(_._1)).getOrElse(Seq.empty)

  def clear(): Unit = series.clear()

  /** `/debug/statz` shape: one entry per measure with its interval
    * series rolled through a MetricSeries gauge (http_test.go TestStatz
    * pins the JSON-object reply). */
  def statzJson(intervalNs: Long = 1000000000L): String = {
    val entries = series.keys.toSeq.sorted.map { name =>
      val ts = new MetricSeries.TimeSeries(intervalNs, 60, new MetricSeries.Gauge)
      timeseries(name).foreach { case (t, v) => ts.add(t, v) }
      s"""${graft.sinks.GoJs.quote(name)}:${ts.render}"""
    }
    entries.mkString("{", ",", "}")
  }

  /** statz output-table config (spi/metrics.go MetricsDestTable /
    * SetMetricsDestTable — stored trimmed; empty disables). */
  @volatile private var destTable: String = ""
  def metricsDestTable: String = destTable
  def setMetricsDestTable(t: String): Unit = destTable = t.trim

  /** Prometheus metric-name sanitizer (spi/metrics.go:599-622, goldens
    * spi/metrics_test.go TestPrometheusHelperFunctions): non-[a-zA-Z0-9_]
    * runes map to '_', a leading digit gets a neo_ prefix, surrounding
    * underscores trim, the machbase_ prefix strips, and an empty result
    * falls back to "neo_metric". */
  def sanitizePromMetricName(name: String): String = {
    if (name.isEmpty) return "neo_metric"
    val sb = new StringBuilder
    name.zipWithIndex.foreach { case (r, i) =>
      val valid = (r >= 'a' && r <= 'z') || (r >= 'A' && r <= 'Z') ||
        (r >= '0' && r <= '9') || r == '_'
      if (valid) {
        if (i == 0 && r >= '0' && r <= '9') sb.append("neo_")
        sb.append(r)
      } else sb.append('_')
    }
    val ret = sb.toString.dropWhile(_ == '_').reverse.dropWhile(_ == '_').reverse
    if (ret.isEmpty) "neo_metric" else ret.stripPrefix("machbase_")
  }

  /** *_total / *_count / *_bytes* read as counters (spi/metrics.go:623). */
  def inferPromMetricType(metricName: String): String = {
    val n = metricName.toLowerCase
    if (n.endsWith("_total") || n.endsWith("_count") || n.contains("_bytes"))
      "counter"
    else "gauge"
  }

  /** `/debug/metrics` Prometheus text exposition
    * (spi/metrics.go:524-584): HELP/TYPE per metric then
    * `name value tsMillis`; latest sample per measure. */
  def prometheusText(): String = {
    val sb = new StringBuilder
    val seen = scala.collection.mutable.Set.empty[String]
    series.keys.toSeq.sorted.foreach { name =>
      timeseries(name).lastOption.foreach { case (tsNs, v) =>
        val metric = sanitizePromMetricName(name)
        if (!seen.contains(metric)) {
          sb.append("# HELP ").append(metric)
            .append(" Metric exported from machbase statz\n")
          sb.append("# TYPE ").append(metric).append(' ')
            .append(inferPromMetricType(metric)).append('\n')
          seen += metric
        }
        sb.append(metric).append(' ').append(graft.sinks.GoJs.goNum(v))
          .append(' ').append(tsNs / 1000000L).append('\n')
      }
    }
    sb.toString
  }
}
