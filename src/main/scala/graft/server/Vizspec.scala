package graft.server

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** vizspec/v1 render + export doors (reference jsh/viz/viz.go
  * RPCVizspecRender:29-56, RPCVizspecExport:159-215, echarts.go
  * ToEChartsOption:14-83; registered by the server proper at
  * server.go:1145-1148 and pinned in http_rpc_test.go
  * vizspecRender/vizspecExport cases).
  *
  * This carries the timeseries subset the server tests exercise: a
  * `vizspec/v1` map with `data.x` + `data.series[{name,data}]`
  * normalizes through render, exports to an echarts line option, and
  * renders to a real SVG / PNG line chart (java2d — the reference uses
  * its own Go renderer; the images are draw-equivalent, not byte-equal).
  */
object Vizspec {
  private def obj(kv: (String, Any)*): LinkedHashMap[String, Any] =
    LinkedHashMap(kv: _*)

  private def asMap(v: Any): collection.Map[String, Any] = v match {
    case m: collection.Map[_, _] =>
      m.map { case (k, x) => k.toString -> (x: Any) }
    case _ => Map.empty[String, Any]
  }
  private def asSeq(v: Any): Seq[Any] = v match {
    case s: collection.Seq[_] => s.toSeq
    case _ => Seq.empty
  }

  /** vizspec.render: normalize (legacy `advn/v1` alias → `vizspec/v1`,
    * legacy top-level x/series lifted into `data`, preferred-renderer
    * hints folded into `meta.preferred`, default kind `timeseries`),
    * validate minimally, return the map. */
  def render(spec0: collection.Map[String, Any]): LinkedHashMap[String, Any] = {
    if (spec0 == null) throw new IllegalArgumentException("vizspec is required")
    val out = LinkedHashMap.empty[String, Any]
    spec0.foreach { case (k, v) => out.put(k, v) }
    val schema = out.get("schema").map(_.toString.trim.toLowerCase).getOrElse("")
    if (schema == "" || schema == "advn/v1" || schema == "vizspec/v1")
      out.put("schema", "vizspec/v1")
    if (out.get("kind").forall(_.toString.trim.isEmpty))
      out.put("kind", "timeseries")
    normalizeLegacyDataShape(out)
    normalizePreferredHints(out)
    parseTimeseries(out) // validation: throws on a shapeless spec
    out
  }

  /** viz.go:80-97 normalizeLegacyDataShape: a legacy advn payload
    * carrying top-level `x` + `series` (and no `data`) lifts them into
    * `data` so the modern shape validates. */
  private def normalizeLegacyDataShape(spec: LinkedHashMap[String, Any]): Unit =
    if (!spec.contains("data") && spec.contains("x") && spec.contains("series"))
      spec.put("data", obj("x" -> spec("x"), "series" -> spec("series")))

  /** viz.go:99-150 normalizePreferredHints: meta.preferred ++
    * clientHint.preferred ++ clientHint.renderer, normalized to the
    * known renderer names (echarts/svg/png/vizspec), deduped in order,
    * written back as meta.preferred when non-empty. */
  private def normalizePreferredHints(spec: LinkedHashMap[String, Any]): Unit = {
    val meta = LinkedHashMap.empty[String, Any]
    asMap(spec.getOrElse("meta", null)).foreach { case (k, v) => meta.put(k, v) }
    def norm(v: Any): String =
      Option(v).map(_.toString.trim.toLowerCase).getOrElse("") match {
        case s @ ("echarts" | "svg" | "png" | "vizspec") => s
        case _ => ""
      }
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    asSeq(meta.getOrElse("preferred", null)).map(norm).filter(_.nonEmpty)
      .foreach(seen.add)
    val hint = asMap(spec.getOrElse("clientHint", null))
    asSeq(hint.getOrElse("preferred", null)).map(norm).filter(_.nonEmpty)
      .foreach(seen.add)
    hint.get("renderer").map(norm).filter(_.nonEmpty).foreach(seen.add)
    if (seen.nonEmpty) {
      meta.put("preferred", ArrayBuffer[Any](seen.toSeq: _*))
      spec.put("meta", meta)
    }
  }

  private case class Series(name: String, data: Seq[Double])
  private case class Parsed(x: Seq[Any], series: Seq[Series])

  private def parseTimeseries(spec: collection.Map[String, Any]): Parsed = {
    val data = asMap(spec.getOrElse("data",
      throw new IllegalArgumentException("vizspec: data is required")))
    val x = asSeq(data.getOrElse("x", Seq.empty))
    val series = asSeq(data.getOrElse("series", Seq.empty)).map { s =>
      val m = asMap(s)
      Series(m.get("name").map(_.toString).getOrElse(""),
        asSeq(m.getOrElse("data", Seq.empty)).map {
          case n: Number => n.doubleValue()
          case other => other.toString.toDouble
        })
    }
    if (series.isEmpty)
      throw new IllegalArgumentException("advn: no supported series")
    Parsed(x, series)
  }

  /** vizspec.export: echarts option / svg text / png base64, each in the
    * `vizspec-export/v1` envelope. */
  def exportSpec(spec: collection.Map[String, Any],
                 format0: String): LinkedHashMap[String, Any] = {
    if (spec == null) throw new IllegalArgumentException("vizspec is required")
    val parsed = parseTimeseries(spec)
    val format = Option(format0).map(_.trim.toLowerCase).filter(_.nonEmpty)
      .getOrElse("svg")
    format match {
      case "echarts" =>
        obj("schema" -> "vizspec-export/v1", "format" -> "echarts",
          "mimeType" -> "application/json", "data" -> echartsOption(parsed))
      case "svg" =>
        obj("schema" -> "vizspec-export/v1", "format" -> "svg",
          "mimeType" -> "image/svg+xml", "data" -> toSvg(parsed))
      case "png" =>
        obj("schema" -> "vizspec-export/v1", "format" -> "png",
          "mimeType" -> "image/png",
          "data" -> java.util.Base64.getEncoder.encodeToString(toPng(parsed)))
      case other =>
        throw new IllegalArgumentException(s"unsupported format: $other")
    }
  }

  /** echarts.go ToEChartsOption subset: axis tooltip, category/value x
    * axis, one line series per input series, legend from names. */
  private def echartsOption(p: Parsed): LinkedHashMap[String, Any] = {
    val xType =
      if (p.x.forall(_.isInstanceOf[Number])) "value" else "category"
    val seriesList = p.series.map { s =>
      obj("name" -> s.name, "type" -> "line",
        "data" -> ArrayBuffer[Any](s.data.map(d =>
          if (d == math.rint(d) && math.abs(d) < 1e15) java.lang.Long.valueOf(d.toLong)
          else java.lang.Double.valueOf(d)): _*))
    }
    val option = obj(
      "tooltip" -> obj("trigger" -> "axis"),
      "xAxis" -> obj("type" -> xType, "data" -> ArrayBuffer[Any](p.x: _*)),
      "series" -> ArrayBuffer[Any](seriesList: _*),
      "yAxis" -> obj("type" -> "value"))
    val legend = p.series.map(_.name).filter(_.nonEmpty)
    if (legend.nonEmpty)
      option.put("legend", obj("data" -> ArrayBuffer[Any](legend: _*)))
    option
  }

  private val W = 800
  private val H = 400
  private val Pad = 40

  private def scaled(p: Parsed): Seq[Seq[(Double, Double)]] = {
    val all = p.series.flatMap(_.data)
    // a metric with no samples yet (statz of a fresh series) yields
    // all-empty data arrays: render an empty chart (axes only) instead
    // of surfacing empty.min as a raw internal error through the RPC
    if (all.isEmpty) return p.series.map(_ => Seq.empty)
    val (lo, hi0) = (all.min, all.max)
    val hi = if (hi0 == lo) lo + 1 else hi0
    val n = math.max(p.series.map(_.data.size).max, 2)
    p.series.map(_.data.zipWithIndex.map { case (v, i) =>
      (Pad + i.toDouble * (W - 2 * Pad) / (n - 1),
        H - Pad - (v - lo) / (hi - lo) * (H - 2 * Pad))
    })
  }

  private def toSvg(p: Parsed): String = {
    val sb = new StringBuilder
    sb.append(s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" viewBox="0 0 $W $H">""")
    sb.append(s"""<rect width="$W" height="$H" fill="white"/>""")
    // axes
    sb.append(s"""<line x1="$Pad" y1="${H - Pad}" x2="${W - Pad}" y2="${H - Pad}" stroke="black"/>""")
    sb.append(s"""<line x1="$Pad" y1="$Pad" x2="$Pad" y2="${H - Pad}" stroke="black"/>""")
    val colors = Seq("#5470c6", "#91cc75", "#fac858", "#ee6666", "#73c0de")
    scaled(p).zipWithIndex.foreach { case (pts, i) =>
      if (pts.nonEmpty) {
        val path = pts.map { case (x, y) => f"$x%.1f,$y%.1f" }.mkString(" ")
        sb.append(s"""<polyline fill="none" stroke="${colors(i % colors.length)}" stroke-width="2" points="$path"/>""")
      }
    }
    sb.append("</svg>")
    sb.toString
  }

  private def toPng(p: Parsed): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(W, H,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, W, H)
      g.setColor(java.awt.Color.BLACK)
      g.drawLine(Pad, H - Pad, W - Pad, H - Pad)
      g.drawLine(Pad, Pad, Pad, H - Pad)
      val colors = Seq(new java.awt.Color(0x54, 0x70, 0xc6),
        new java.awt.Color(0x91, 0xcc, 0x75), new java.awt.Color(0xfa, 0xc8, 0x58))
      g.setStroke(new java.awt.BasicStroke(2f))
      scaled(p).zipWithIndex.foreach { case (pts, i) =>
        g.setColor(colors(i % colors.length))
        pts.sliding(2).foreach {
          case Seq((x1, y1), (x2, y2)) =>
            g.drawLine(x1.toInt, y1.toInt, x2.toInt, y2.toInt)
          case _ =>
        }
      }
    } finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** server.info.statz (svrmetric.go statzViz:353-381): one vizspec per
    * requested metric name, charted from the engine's metric series. */
  def statz(names: Seq[String]): LinkedHashMap[String, Any] = {
    val items = names.map { name =>
      val metricName = name.split("#", 2)(0)
      val samples = Metrics.timeseries(metricName)
      val (times, values) = (samples.map(_._1), samples.map(_._2))
      val spec = obj(
        "schema" -> "vizspec/v1",
        "kind" -> "timeseries",
        "data" -> obj(
          "x" -> ArrayBuffer[Any](times.map(t =>
            java.lang.Long.valueOf(t / 1000000L)): _*), // epoch-ms ticks
          "series" -> ArrayBuffer[Any](obj(
            "name" -> metricName,
            "data" -> ArrayBuffer[Any](values.map(
              java.lang.Double.valueOf): _*)))))
      obj("name" -> name, "spec" -> spec)
    }
    obj("statz" -> ArrayBuffer[Any](items: _*))
  }
}
