package graft.sinks

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** CHART sink: ECharts option envelope + volatile .js code asset
  * (reference: mods/codec/internal/chart/chart.go — data accumulation
  * :173-199, Close :249-313, templates rendertpls.go).
  *
  * The chart never draws; it emits (a) a JSON or HTML envelope naming the
  * js/css assets, and (b) a generated `<chartID>.js` file holding the
  * column data (`const _column_N=[…]`) and the user's option with
  * `column(N)` references resolved client-side. Data is collected at the
  * driver like every presentation sink — callers bound row counts.
  */
class Chart {
  var chartID: String = GoJs.newId()
  var width: String = "600px"
  var height: String = "600px"
  var theme: String = ""
  var pageTitle: String = ""
  var toJsonOutput: Boolean = false
  var dispatchAction: String = ""

  protected[sinks] var option: String = ""
  protected[sinks] val data = ArrayBuffer[ArrayBuffer[Any]]()
  protected[sinks] val typeHint = mutable.Map[Int, String]()
  protected[sinks] var isCompatibleMode = false
  protected[sinks] val plugins = ArrayBuffer[String]()

  val jsAssets = ArrayBuffer[String]()
  val cssAssets = ArrayBuffer[String]()
  val jsCodeAssets = ArrayBuffer[String]()
  private val jsCodesPre = ArrayBuffer[String]()
  private val jsCodesPost = ArrayBuffer[String]()

  var volatileFileWriter: Option[VolatileFileWriter] = None

  def contentType: String = if (toJsonOutput) "application/json" else "text/html"

  def setChartOption(opt: String): Unit = {
    val t = opt.trim
    option = if (t.startsWith("{")) t else "{" + t + "}"
  }

  def setChartJSCode(js: String): Unit =
    if (option.isEmpty) jsCodesPre += js else jsCodesPost += js

  def setDispatchAction(action: String): Unit = {
    val t = action.trim
    dispatchAction = if (t.startsWith("{")) t else "{" + t + "}"
  }

  def setPlugins(names: String*): Unit = plugins ++= names

  def setChartAssets(urls: String*): Unit = urls.foreach { url =>
    if (url.endsWith(".css")) cssAssets += url else jsAssets += url
  }

  /** Column-major accumulation with the reference's type coercion; a
    * single map-valued row replaces the whole option (chart.go:173-199). */
  def addRow(values: Seq[Any]): Unit = {
    values match {
      case Seq(m: collection.Map[_, _]) =>
        option = GoJs.jsonMarshal(m)
        return
      case _ =>
    }
    values.zipWithIndex.foreach { case (v, i) =>
      while (data.length < i + 1) data += ArrayBuffer[Any]()
      val (conv, hint) = GoJs.convValue(v)
      data(i) += conv
      if (hint.nonEmpty) typeHint(i) = hint
    }
  }

  protected def buildOption(): Unit = {}

  private val themeNames = Set("white", "dark", "essos", "chalk",
    "purple-passion", "romantic", "walden", "westeros", "wonderland",
    "vintage", "macarons", "infographic", "shine", "roma")
  private val pluginPaths = Map(
    "liquidfill" -> "/web/echarts/echarts-liquidfill.min.js",
    "wordcloud" -> "/web/echarts/echarts-wordcloud.min.js",
    "gl" -> "/web/echarts/echarts-gl.min.js")

  /** Render the envelope; mirrors chart.go Close():249-313. */
  def close(): String = {
    buildOption()
    if (theme.isEmpty) theme = "white"
    if (!isCompatibleMode) {
      val names = data.indices.map(i => s"_column_$i")
      data.indices.foreach { i =>
        jsCodesPre += s"const ${names(i)}=${GoJs.jsonMarshal(data(i))};"
      }
      jsCodesPre += s"const _columns=[${names.mkString(",")}];"
      jsCodesPre += "function column(idx) { return _columns[idx]; }"
    }
    if (jsAssets.isEmpty) jsAssets += "/web/echarts/echarts.min.js"
    if (themeNames(theme)) {
      if (theme != "white") jsAssets += s"/web/echarts/themes/$theme.js"
    } else if (theme.startsWith("http://") || theme.startsWith("https://")) {
      jsAssets += theme
    }
    plugins.foreach(p => jsAssets += pluginPaths.getOrElse(p, p))

    volatileFileWriter.foreach { w =>
      val path = s"${w.volatileFilePrefix.stripSuffix("/")}/$chartID.js"
      val codes = ArrayBuffer[String]()
      codes += s"let _chartID = '$chartID';"
      codes += s"""let _chart = echarts.init(document.getElementById(_chartID), "$theme");"""
      if (option.nonEmpty) {
        codes += s"let _chartOption = $option;"
        codes += "_chart.setOption(_chartOption);"
      }
      if (dispatchAction.isEmpty)
        codes += """_chart.dispatchAction({"areas": {}, "type": ""});"""
      else
        codes += s"_chart.dispatchAction($dispatchAction);"
      val all = jsCodesPre ++ codes ++ jsCodesPost
      val jscode = "(()=>{\n\"use strict\";\n" + all.mkString("\n") + "\n})();"
      w.volatileFileWrite(path, jscode.getBytes("UTF-8"))
      jsCodeAssets += path
    }
    if (toJsonOutput) renderJson() else renderHtml()
  }

  private def strArr(items: Seq[String]): String =
    items.map(GoJs.quote).mkString("[", ",", "]")

  /** ChartJsonTemplate (rendertpls.go:3-23); note the reference template
    * renders cssAssets with the JS asset list — kept for parity. */
  private def renderJson(): String = {
    val sb = new StringBuilder
    sb.append("{\n")
    sb.append(s"""    "chartID":"$chartID",\n""")
    if (jsAssets.nonEmpty) sb.append(s"""    "jsAssets": ${strArr(jsAssets.toSeq)},\n""")
    if (cssAssets.nonEmpty) sb.append(s"""    "cssAssets" : ${strArr(jsAssets.toSeq)},\n""")
    if (jsCodeAssets.nonEmpty) sb.append(s"""    "jsCodeAssets": ${strArr(jsCodeAssets.toSeq)},\n""")
    sb.append("    \"style\": {\n")
    sb.append(s"""        "width": "$width",\n""")
    sb.append(s"""        "height": "$height"\t\n""")
    sb.append("    },\n")
    sb.append(s"""    "theme": "$theme"\n""")
    sb.append("}\n")
    sb.toString
  }

  /** HeaderTemplate + BaseTemplate + ChartTemplate (rendertpls.go:25-63). */
  private def renderHtml(): String = {
    val lines = ArrayBuffer[String]()
    lines += "<!DOCTYPE html>"
    lines += "<html>"
    lines += "<head>"
    lines += "    <meta charset=\"utf-8\">"
    lines += s"    <title>$pageTitle</title>"
    jsAssets.foreach(a => lines += s"""    <script src="$a"></script>""")
    cssAssets.foreach(a => lines += s"""    <link href="$a" rel="stylesheet">""")
    lines += "    <style>"
    lines += "        .chart_container {margin-top:30px; display: flex;justify-content: center;align-items: center; height: 100%;}"
    lines += "        .chart_item {margin: auto;}"
    lines += "    </style>"
    lines += "</head>"
    lines += ""
    lines += "<body style=\"width:100vw; height:100vh\">"
    lines += "<div class=\"chart_container\">"
    lines += s"""    <div class="chart_item" id="$chartID" style="width:$width;height:$height;"></div>"""
    lines += "</div>"
    jsCodeAssets.foreach(a => lines += s"""<script src="$a"></script>""")
    lines += ""
    lines += "</body>"
    lines += "</html>"
    lines.mkString("\n") + "\n"
  }
}
