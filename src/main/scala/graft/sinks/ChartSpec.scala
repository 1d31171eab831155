package graft.sinks

import org.apache.spark.sql.DataFrame

/** Chart / Geomap spec-emitting sinks (reference: mods/codec/internal/
  * chart renders ECharts option JSON, mods/codec/internal/geomap renders
  * Leaflet layer specs — both emit JSON specs, not pixels; SURVEY §0
  * keeps them as spec emitters).
  *
  * Collected at the driver like every presentation sink; callers bound
  * row counts (the reference charts the same way).
  */
object ChartSpec {
  private def jsonNum(v: Any): String = v match {
    case null => "null"
    case d: Double => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float => f.toString
    case n: java.lang.Number => n.toString
    case other => "\"" + other.toString.replace("\"", "\\\"") + "\""
  }

  /** CHART_LINE / CHART_SCATTER / CHART_BAR: ECharts option JSON with the
    * first column as x axis and every other column as a series. */
  def chart(df: DataFrame, kind: String = "line", title: String = ""): String = {
    val cols = df.columns
    require(cols.length >= 2, "chart needs x + at least one series column")
    val rows = df.collect()
    val xs = rows.map(r => jsonNum(r.get(0))).mkString("[", ",", "]")
    val series = cols.tail.zipWithIndex.map { case (c, i) =>
      val data = rows.map(r => jsonNum(r.get(i + 1))).mkString("[", ",", "]")
      s"""{"name":"$c","type":"$kind","data":$data}"""
    }.mkString("[", ",", "]")
    s"""{"title":{"text":"$title"},"xAxis":{"type":"category","data":$xs},""" +
      s""""yAxis":{"type":"value"},"series":$series}"""
  }

  /** GEOMAP: Leaflet-style layer spec from (lat, lon[, label]) rows. */
  def geomap(df: DataFrame, latCol: String = "lat", lonCol: String = "lon",
             labelCol: Option[String] = None): String = {
    val li = df.schema.fieldIndex(latCol)
    val lo = df.schema.fieldIndex(lonCol)
    val lb = labelCol.map(df.schema.fieldIndex)
    val markers = df.collect().map { r =>
      val label = lb.map(i => s""","popup":"${r.get(i)}"""").getOrElse("")
      s"""{"type":"marker","coord":[${r.get(li)},${r.get(lo)}]$label}"""
    }.mkString("[", ",", "]")
    s"""{"layers":$markers}"""
  }
}
