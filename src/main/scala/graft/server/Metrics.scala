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
}
