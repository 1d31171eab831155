package graft.sinks

import scala.collection.mutable.ArrayBuffer

/** CHART_LINE / CHART_SCATTER / CHART_BAR / CHART_*3D compatibility sinks
  * (reference: mods/codec/internal/chart/chartcompat.go). Instead of a
  * user-supplied option these build the ECharts option from typed setters
  * (axes, title, toolbox, visualMap, markers) and series data assembled
  * as [x, y(, z)] pairs from the accumulated columns. */
class ChartCompat(typ0: String) extends Chart {
  isCompatibleMode = true

  private var globalOption = ""
  private var visualMap = ""
  private var title = ""
  private var subtitle = ""
  private var dataZoom = ""
  var xAxisIdx = 0; private var xAxisLabel = "x"; private var xAxisType = "value"
  var yAxisIdx = 1; private var yAxisLabel = "y"; private var yAxisType = "value"
  var zAxisIdx = -1; private var zAxisLabel = "z"; private var zAxisType = "value"
  private var toolboxSaveAsImage = ""
  private var toolboxDataZoom = ""
  private var toolboxDataView = ""
  private var legendData = Seq.empty[String]
  private val markAreaList = ArrayBuffer[String]()
  private val markLineList = ArrayBuffer[String]()
  private val gridWHD = Array[Double](100, 100, 0)
  private var autoRotate = 0.0
  private var opacity = 0.0
  private var lineWidth = 0.0

  val chartType: String = typ0 match {
    case "scatter" | "bar" => typ0
    case "line3D" | "scatter3D" | "bar3D" | "surface3D" =>
      plugins += "/web/echarts/echarts-gl.min.js"
      opacity = 1.0
      lineWidth = 1.0
      gridWHD(2) = 100
      zAxisIdx = 2
      typ0
    case _ => "line"
  }

  def setGlobalOptions(opt: String): Unit = {
    var o = opt
    if (o.startsWith("{")) o = o.stripPrefix("{").stripSuffix("}")
    globalOption = o
  }
  def setSeriesLabels(labels: String*): Unit = legendData = labels
  def setDataZoom(typ: String, min: Float, max: Float): Unit = {
    val t = if (typ != "inside" && typ != "slider") "slider" else typ
    dataZoom = s""""dataZoom":[{"type":${GoJs.quote(t)}, "start":${GoJs.goNum(min.toDouble)}, "end":${GoJs.goNum(max.toDouble)}}]"""
  }
  def setVisualMap(min: Double, max: Double): Unit =
    setVisualMapColor(min, max,
      "#313695", "#4575b4", "#74add1", "#abd9e9", "#e0f3f8", "#ffffbf",
      "#fee090", "#fdae61", "#f46d43", "#d73027", "#a50026")
  def setVisualMapColor(min: Double, max: Double, colors: String*): Unit = {
    val cls = colors.map(GoJs.quote).mkString(",")
    visualMap = s""""visualMap":[{"type":"continuous", "calculable":true, "min":${GoJs.goNum(min)}, "max":${GoJs.goNum(max)}, "inRange":{"color":[$cls]}}]"""
  }
  def setXAxis(idx: Int, label: String, typ: String = null): Unit = {
    xAxisIdx = idx; xAxisLabel = label; if (typ != null) xAxisType = typ
  }
  def setYAxis(idx: Int, label: String, typ: String = null): Unit = {
    yAxisIdx = idx; yAxisLabel = label; if (typ != null) yAxisType = typ
  }
  def setZAxis(idx: Int, label: String, typ: String = null): Unit = {
    zAxisIdx = idx; zAxisLabel = label; if (typ != null) zAxisType = typ
  }
  def setTitle(t: String): Unit = title = t
  def setSubtitle(t: String): Unit = subtitle = t
  def setGridSize(args: Double*): Unit =
    args.take(3).zipWithIndex.foreach { case (v, i) => gridWHD(i) = v }
  def setLineWidth(w: Double): Unit = lineWidth = w
  def setOpacity(o: Double): Unit = opacity = o
  def setAutoRotate(speed0: Double): Unit = {
    var speed = speed0
    if (speed < 0) speed = 180
    if (speed > 180) speed = 180
    autoRotate = speed
  }
  def setToolboxSaveAsImage(name0: String): Unit = {
    var typ = "png"; var name = name0
    if (name.endsWith(".jpeg")) { typ = "jpeg"; name = name.stripSuffix(".jpeg") }
    else if (name.endsWith(".svg")) { typ = "svg"; name = name.stripSuffix(".svg") }
    toolboxSaveAsImage = s""""saveAsImage":{"show":true, "type":${GoJs.quote(typ)}, "name":${GoJs.quote(name)}, "title":"save"}"""
  }
  def setToolboxDataZoom(): Unit =
    toolboxDataZoom = """"dataZoom":{"show":true, "title":{"zoom":"zoom", "back":"back"}}"""
  def setToolboxDataView(): Unit =
    toolboxDataView = """"dataView":{"show":true, "title":"view", "lang":["Data", "Close", "Refresh"]}"""
  def setMarkAreaNameCoord(from: Any, to: Any, label: String, color: String,
                           opacity: Double): Unit = {
    val f = GoJs.jsonMarshal(GoJs.convValue(from)._1)
    val t = GoJs.jsonMarshal(GoJs.convValue(to)._1)
    markAreaList += s"""[{"name":${GoJs.quote(label)}, "itemStyle":{"color":${GoJs.quote(color)}, "opacity":${GoJs.goNum(opacity)}}, "xAxis":$f}, {"xAxis":$t}]"""
  }
  def setMarkLineXAxisCoord(xAxis: Any, name: String): Unit = {
    val v = GoJs.jsonMarshal(GoJs.convValue(xAxis)._1)
    markLineList += s"""{"name":${GoJs.quote(name)}, "xAxis":$v, "label":{"formatter":${GoJs.quote(name)}}}"""
  }
  def setMarkLineYAxisCoord(yAxis: Any, name: String): Unit = {
    val v = GoJs.jsonMarshal(GoJs.convValue(yAxis)._1)
    markLineList += s"""{"name":${GoJs.quote(name)}, "yAxis":$v, "label":{"formatter":${GoJs.quote(name)}}}"""
  }

  override protected def buildOption(): Unit = chartType match {
    case "line3D" | "scatter3D" | "surface3D" | "bar3D" => close3D()
    case _ => close2D()
  }

  /** chartcompat.go Close2D:330-430. */
  private def close2D(): Unit = {
    if (typeHint.get(xAxisIdx).contains("time")) xAxisType = "time"
    val xAxis = s""""xAxis":{"name":${GoJs.quote(xAxisLabel)},"type":${GoJs.quote(xAxisType)}},"""
    val yAxis = s""""yAxis":{"name":${GoJs.quote(yAxisLabel)},"type":${GoJs.quote(yAxisType)}},"""

    val series = ArrayBuffer[String]()
    series += """"series":["""
    var seriesIdx = 0
    val legend = ArrayBuffer[String]()
    data.indices.foreach { i =>
      if (i != xAxisIdx) {
        var allMarkers = ""
        if (seriesIdx == 0) {
          val lines = ArrayBuffer[String]()
          if (markAreaList.nonEmpty)
            lines += Seq(""""markArea":{"data":[""",
              markAreaList.mkString(","), "]}").mkString("\n    ")
          if (markLineList.nonEmpty)
            lines += Seq(""""markLine":{"symbol":["none","none"], "data":[""",
              markLineList.mkString(","), "]}").mkString("\n    ")
          if (lines.nonEmpty) allMarkers = lines.mkString(",")
        }
        val comma = if (seriesIdx != 0) ",\n" else ""
        val seriesName =
          if (legendData.length > seriesIdx) GoJs.quote(legendData(seriesIdx))
          else GoJs.quote(s"column[$i]")
        legend += seriesName
        val dataStr = data(i).indices.map { n =>
          GoJs.jsonMarshal(Seq(data(xAxisIdx)(n), data(i)(n)))
        }.mkString(",")
        val seriesData = s""""type":${GoJs.quote(chartType)}, "name":$seriesName, "data":[$dataStr]"""
        if (allMarkers.nonEmpty)
          series += s"    $comma{\n    $seriesData,\n    $allMarkers\n    }"
        else
          series += s"    $comma{$seriesData}"
        seriesIdx += 1
      }
    }
    series += "]"

    val lines = ArrayBuffer[String]()
    if (title.nonEmpty) {
      if (subtitle.nonEmpty)
        lines += s""""title":{"text":${GoJs.quote(title)}, "subtext":${GoJs.quote(subtitle)}},"""
      else lines += s""""title":{"text":${GoJs.quote(title)}},"""
    }
    if (globalOption.nonEmpty) lines += globalOption + ","
    if (legend.nonEmpty)
      lines += s""""legend":{"show":true,"data":[${legend.mkString(",")}]},"""
    if (dataZoom.nonEmpty) lines += dataZoom + ","
    if (visualMap.nonEmpty) lines += visualMap + ","
    appendToolbox(lines)
    lines += """"tooltip":{"show":true, "trigger":"axis"},"""
    lines += xAxis
    lines += yAxis
    lines ++= series
    option = "{\n" + lines.mkString("\n") + "}"
  }

  /** chartcompat.go Close3D:285-329. */
  private def close3D(): Unit = {
    val grid3D = s""""grid3D":{"boxWidth":${GoJs.goNum(gridWHD(0))}, "boxHeight":${GoJs.goNum(gridWHD(1))}, "boxDepth":${GoJs.goNum(gridWHD(2))}, "viewControl":{"projection": "orthographic", "autoRotate":${autoRotate != 0},"speed":${GoJs.goNum(autoRotate)}}},"""
    val xAxis = s""""xAxis3D":{"name":${GoJs.quote(xAxisLabel)},"type":${GoJs.quote(xAxisType)},"show":true},"""
    val yAxis = s""""yAxis3D":{"name":${GoJs.quote(yAxisLabel)},"type":${GoJs.quote(yAxisType)},"show":true},"""
    val zAxis = s""""zAxis3D":{"name":${GoJs.quote(zAxisLabel)},"type":${GoJs.quote(zAxisType)},"show":true},"""

    val series = ArrayBuffer[String]()
    series += """"series":["""
    if (data.length > xAxisIdx && data.length > yAxisIdx && data.length > zAxisIdx) {
      data.indices.foreach { i =>
        if (i != xAxisIdx && i != yAxisIdx) {
          val dataStr = data(i).indices.map { n =>
            GoJs.jsonMarshal(Seq(data(xAxisIdx)(n), data(yAxisIdx)(n), data(i)(n)))
          }.mkString(",")
          val style =
            if (chartType == "line3D")
              s""""lineStyle":{"opacity":${GoJs.goNum(opacity)},"width":${GoJs.goNum(lineWidth)}}"""
            else s""""itemStyle":{"opacity":${GoJs.goNum(opacity)}}"""
          series += s"""{"type":${GoJs.quote(chartType)},"coordinateSystem":"cartesian3D","data":[$dataStr],"shading":"lambert",$style}"""
        }
      }
    }
    series += "]"

    val lines = ArrayBuffer[String]()
    lines += xAxis; lines += yAxis; lines += zAxis
    lines += grid3D
    if (title.nonEmpty) {
      if (subtitle.nonEmpty)
        lines += s""""title":{"text":${GoJs.quote(title)}, "subtext":${GoJs.quote(subtitle)}},"""
      else lines += s""""title":{"text":${GoJs.quote(title)}},"""
    }
    if (visualMap.nonEmpty) lines += visualMap + ","
    appendToolbox(lines)
    lines += """"tooltip":{"show":true, "trigger":"axis"},"""
    lines ++= series
    option = "{\n" + lines.mkString("\n") + "}"
  }

  private def appendToolbox(lines: ArrayBuffer[String]): Unit = {
    if (toolboxSaveAsImage.nonEmpty || toolboxDataZoom.nonEmpty || toolboxDataView.nonEmpty) {
      lines += """"toolbox":{ "feature":{"""
      val features = ArrayBuffer[String]()
      if (toolboxSaveAsImage.nonEmpty) features += "    " + toolboxSaveAsImage
      if (toolboxDataZoom.nonEmpty) features += "    " + toolboxDataZoom
      if (toolboxDataView.nonEmpty) features += "    " + toolboxDataView
      lines += features.mkString(",\n")
      lines += "}},"
    }
  }
}
