package graft.sinks

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** GEOMAP sink: Leaflet layer specs as JSON envelope + volatile .js
  * assets, or a standalone HTML page (reference: mods/codec/internal/
  * geomap/geomap.go, leafletobj.go, rendertpls.go, and the map-options
  * snippet mods/util/geomapjs/snippets.go:5-40 — embedded verbatim as a
  * resource for wire parity).
  *
  * Rows carry layer maps ({"type":"marker","coordinates":[lat,lon],...})
  * or GeoJSON objects; the sink accumulates layers at the driver (bounded
  * presentation output) and emits the JS that recreates them client-side.
  */
class GeoMap {
  import GeoMap._

  var geomapID: String = GoJs.newId()
  var width = "600px"
  var height = "600px"
  var pageTitle = ""
  var toJsonOutput = false
  private var initialLatLon: Option[(Double, Double)] = None
  private var initialZoom = 0
  private var tileGrayscaleRaw = 0.0
  private var tileTemplate = ""
  private var tileOption = ""
  private var crs = "L.CRS.EPSG3857"
  private var bound: Option[Bound] = None

  val jsCodes = ArrayBuffer[String]()
  val jsAssets = ArrayBuffer[String]()
  val cssAssets = ArrayBuffer[String]()
  val jsCodeAssets = ArrayBuffer[String]()
  private val layers = ArrayBuffer[Layer]()
  private val icons = ArrayBuffer[mutable.LinkedHashMap[String, Any]]()

  var volatileFileWriter: Option[VolatileFileWriter] = None
  var logWarn: String => Unit = _ => ()

  def contentType: String = if (toJsonOutput) "application/json" else "text/html"

  def setInitialLocation(lat: Double, lon: Double, zoom: Int): Unit = {
    initialLatLon = Some((lat, lon)); initialZoom = zoom
  }
  def setTileTemplate(url: String): Unit = tileTemplate = url
  def setTileOption(opt: String): Unit = {
    val t = opt.trim
    tileOption = if (t.startsWith("{")) t else "{" + t + "}"
  }
  def setTileGrayscale(g: Double): Unit = tileGrayscaleRaw = g
  def tileGrayscale: Int = {
    val s = math.min(1.0, math.max(0.0, tileGrayscaleRaw))
    (100 * s).toInt
  }
  def setMapAssets(urls: String*): Unit = urls.foreach { url =>
    if (url.endsWith(".css")) cssAssets += url else jsAssets += url
  }
  def setIcon(name: String, opt0: String): Unit = {
    val opt = if (opt0.trim.startsWith("{")) opt0 else "{" + opt0 + "}"
    val parsed = try graft.script.Builtins.jsonParse(opt) catch {
      case e: Throwable => logWarn(s"GEOMAP icon option ${e.getMessage}"); return
    }
    val m = parsed match {
      case mm: collection.Map[_, _] => mm.asInstanceOf[collection.Map[String, Any]]
      case _ => logWarn("GEOMAP icon option not an object"); return
    }
    if (icons.exists(_.get("name").contains(name))) {
      logWarn(s"GEOMAP icon $name already exists."); return
    }
    // json field order of the reference Icon struct (leafletobj.go:14-23)
    val icn = mutable.LinkedHashMap[String, Any]("name" -> name,
      "iconUrl" -> m.getOrElse("iconUrl", ""))
    Seq("iconSize", "iconAnchor", "popupAnchor", "shadowUrl", "shadowSize",
      "shadowAnchor").foreach(k => m.get(k).foreach(v => icn(k) = v))
    icons += icn
  }

  private def extendBound(lat: Double, lon: Double): Unit =
    bound = Some(bound.fold(Bound(lat, lon, lat, lon))(_.extend(lat, lon)))

  /** Accept one row of layer objects (maps parsed from JSON). */
  def addRow(values: Seq[Any]): Unit = values.foreach {
    case null => ()
    case m: collection.Map[_, _] =>
      newLayer(m.asInstanceOf[collection.Map[String, Any]]) match {
        case Some(l) => layers += l
        case None => ()
      }
    case other => logWarn(s"GEOMAP unsupported value type: ${other.getClass.getName}")
  }

  /** leafletobj.go NewLayer:171-247. */
  private def newLayer(m: collection.Map[String, Any]): Option[Layer] = {
    m.get("type") match {
      case Some(t: String) => t match {
        case "marker" | "circleMarker" | "circle" | "polyline" | "polygon" =>
          // leaflet layers take [lat,lon] order
          val coord = m.get("coordinates") match {
            case Some(c) => convCoordinates(c, extendBound)
            case None => logWarn("marker value not found"); return None
          }
          val props = m.get("properties") match {
            case Some(p: collection.Map[_, _]) =>
              mutable.LinkedHashMap(p.asInstanceOf[collection.Map[String, Any]].toSeq: _*)
            case _ => null
          }
          Some(Layer(t, Left(coord), props))
        case "FeatureCollection" =>
          // geojson is [lon,lat] order
          m.get("features").foreach {
            case feats: Iterable[_] => feats.foreach {
              case f: collection.Map[_, _] =>
                geometryBound(f.asInstanceOf[collection.Map[String, Any]]
                  .get("geometry"))
              case _ => ()
            }
            case _ => ()
          }
          Some(Layer("geoJSON", Right(m), null))
        case "Feature" =>
          geometryBound(m.get("geometry"))
          val props = m.get("properties") match {
            case Some(p: collection.Map[_, _]) =>
              deepClone(p.asInstanceOf[collection.Map[String, Any]])
            case _ => null
          }
          Some(Layer("geoJSON", Right(m), props))
        case "Point" | "MultiPoint" | "LineString" | "MultiLineString" |
             "Polygon" | "MultiPolygon" | "GeometryCollection" =>
          geometryBound(Some(m))
          Some(Layer("geoJSON", Right(m), null))
        case other => logWarn(s"unknown layer type $other"); None
      }
      case _ => logWarn("unknown layer type"); None
    }
  }

  /** Extend the bound with a geometry's min/max corners ([lon,lat]). */
  private def geometryBound(geom: Option[Any]): Unit = geom match {
    case Some(g: collection.Map[_, _]) =>
      val gm = g.asInstanceOf[collection.Map[String, Any]]
      if (gm.get("type").contains("GeometryCollection"))
        gm.get("geometries").foreach {
          case gs: Iterable[_] => gs.foreach(x => geometryBound(Some(x)))
          case _ => ()
        }
      else {
        var minLat, minLon = Double.MaxValue
        var maxLat, maxLon = Double.MinValue
        def walk(v: Any): Unit = v match {
          case seq: Iterable[_] =>
            val vec = seq.toVector
            vec match {
              case Vector(a: Any, b: Any) if isNum(a) && isNum(b) =>
                val lon = num(a); val lat = num(b)
                minLat = math.min(minLat, lat); maxLat = math.max(maxLat, lat)
                minLon = math.min(minLon, lon); maxLon = math.max(maxLon, lon)
              case _ => vec.foreach(walk)
            }
          case _ => ()
        }
        gm.get("coordinates").foreach(walk)
        if (minLat != Double.MaxValue) {
          extendBound(minLat, minLon)
          extendBound(maxLat, maxLon)
        }
      }
    case _ => ()
  }

  private def isNum(a: Any): Boolean = a.isInstanceOf[java.lang.Number]
  private def num(a: Any): Double = a.asInstanceOf[java.lang.Number].doubleValue

  private def deepClone(m: collection.Map[String, Any]): mutable.LinkedHashMap[String, Any] = {
    def cloneV(v: Any): Any = v match {
      case mm: collection.Map[_, _] =>
        deepClone(mm.asInstanceOf[collection.Map[String, Any]])
      case seq: Iterable[_] => ArrayBuffer(seq.map(cloneV).toSeq: _*)
      case other => other
    }
    mutable.LinkedHashMap(m.toSeq.map { case (k, v) => k -> cloneV(v) }: _*)
  }

  /** leafletobj.go ConvCoordinates:50-168 — numbers to float64, [lat,lon]
    * pairs extend the bound. */
  private def convCoordinates(v: Any, extend: (Double, Double) => Unit): Any = v match {
    case seq: Iterable[_] =>
      val conv = seq.toVector.map(e => convCoordinates(e, extend))
      if (conv.length == 2) (conv(0), conv(1)) match {
        case (a: Double, b: Double) => extend(a, b)
        case _ => ()
      }
      conv
    case n: java.lang.Number => n.doubleValue
    case other => other
  }

  def close(): String = {
    val ill = initialLatLon.getOrElse {
      bound match {
        case Some(b) if !b.isEmpty => b.center
        case _ => (51.505, -0.09) // London
      }
    }
    val zoom = if (initialZoom == 0) 13 else initialZoom
    jsAssets.prepend("/web/geomap/leaflet.js")
    cssAssets.prepend("/web/geomap/leaflet.css")
    if (tileTemplate.isEmpty)
      tileTemplate = "https://tile.openstreetmap.org/{z}/{x}/{y}.png"
    else if (tileTemplate == "vworld")
      tileTemplate = "https://xdworld.vworld.kr/2d/Base/service/{z}/{x}/{y}.png"
    else if (tileTemplate == "kakao") {
      tileTemplate = "http://map{s}.daumcdn.net/map_2d_hd/2106wof/L{z}/{y}/{x}.png"
      tileOption = """{"tms": true, "subdomains": "01234", "zoomReverse":true, "zoomOffset": 1, "maxZoom":13, "minZoom":0 }"""
      crs = "__crs"
      jsAssets += "/web/geomap/proj4.js"
      jsAssets += "/web/geomap/proj4leaflet.js"
      jsCodes += kakaoCrsJS(crs)
    }

    jsCodes += "var map;"
    jsCodes += "if (opt && opt.map) {"
    jsCodes += "  map = opt.map;"
    jsCodes += "  opt.map.eachLayer(function (layer) {"
    jsCodes += "    if (!(layer instanceof L.TileLayer)) {"
    jsCodes += "      opt.map.removeLayer(layer);"
    jsCodes += "    }"
    jsCodes += "  });"
    jsCodes += "} else {"
    jsCodes += s"""  map = L.map("$geomapID", {crs: $crs, attributionControl:false});"""
    if (tileOption.nonEmpty)
      jsCodes += s"""  L.tileLayer("$tileTemplate", $tileOption).addTo(map);"""
    else
      jsCodes += s"""  L.tileLayer("$tileTemplate").addTo(map);"""
    jsCodes += "  opt.map = map;"
    jsCodes += "}"

    bound match {
      case Some(b) if !b.isEmpty && !b.isPoint =>
        jsCodes += s"opt.initBounds = ${b.str};"
        jsCodes += "map.fitBounds(opt.initBounds);"
      case _ =>
        jsCodes += s"opt.initPoint = {center:[${GoJs.goNum(ill._1)},${GoJs.goNum(ill._2)}], zoomLevel:$zoom};"
        jsCodes += "map.setView(opt.initPoint.center, opt.initPoint.zoomLevel);"
    }

    icons.foreach { icn =>
      val fields = icn.map { case (k, x) => GoJs.jsonQuote(k) + ":" + GoJs.jsonMarshal(x) }
      jsCodes += s"var ${icn("name")} = L.icon(${fields.mkString("{", ",", "}")});"
    }

    layers.zipWithIndex.foreach { case (layer, objIdx) =>
      var popupMap: mutable.LinkedHashMap[String, Any] = null
      var tooltipMap: mutable.LinkedHashMap[String, Any] = null
      if (layer.properties != null) {
        layer.properties.get("popup").foreach {
          case m: mutable.LinkedHashMap[_, _] =>
            popupMap = m.asInstanceOf[mutable.LinkedHashMap[String, Any]]
            layer.properties.remove("popup")
          case m: collection.Map[_, _] =>
            popupMap = mutable.LinkedHashMap(
              m.asInstanceOf[collection.Map[String, Any]].toSeq: _*)
            layer.properties.remove("popup")
          case _ => ()
        }
        layer.properties.get("tooltip").foreach {
          case m: collection.Map[_, _] =>
            tooltipMap = mutable.LinkedHashMap(
              m.asInstanceOf[collection.Map[String, Any]].toSeq: _*)
            layer.properties.remove("tooltip")
          case _ => ()
        }
      }
      jsCodes += s"var obj$objIdx = ${layer.leafletJS}.addTo(map);"
      def bindCode(kind: String, m: mutable.LinkedHashMap[String, Any]): Unit = {
        var openCode = ""
        var contentCode = ""
        m.get("content").foreach { c =>
          contentCode = String.valueOf(c); m.remove("content")
        }
        m.get("open").foreach {
          case b: Boolean =>
            if (b) openCode = s".open${kind.capitalize}()"
            m.remove("open")
          case _ => ()
        }
        val js = GoJs.marshalJS(m)
        jsCodes += s"var $kind$objIdx = obj$objIdx.bind${kind.capitalize}(${GoJs.quote(contentCode)}, $js)$openCode;"
      }
      if (popupMap != null) bindCode("popup", popupMap)
      if (tooltipMap != null) bindCode("tooltip", tooltipMap)
    }

    if (toJsonOutput) volatileFileWriter.foreach { w =>
      val prefix = w.volatileFilePrefix.stripSuffix("/")
      val optPath = s"$prefix/${geomapID}_opt.js"
      w.volatileFileWrite(optPath, jsCodesOption.getBytes("UTF-8"))
      jsCodeAssets += optPath
      val path = s"$prefix/$geomapID.js"
      w.volatileFileWrite(path, jsCodesJoined.getBytes("UTF-8"))
      jsCodeAssets += path
    }
    if (toJsonOutput) renderJson() else renderHtml()
  }

  /** geomapjs.MapOptionsVarScript(id, includeTooltip=false). */
  private def jsCodesOption: String = popupOnlyTemplate.replace("%s", geomapID)

  private def jsCodesJoined: String =
    (Seq("((opt)=>{") ++ jsCodes ++ Seq(s"})($geomapID);")).mkString("\n")

  private def strArr(items: Seq[String]): String =
    items.map(GoJs.quote).mkString("[", ",", "]")

  private def renderJson(): String = {
    val sb = new StringBuilder
    sb.append("\n{\n")
    sb.append(s"""    "geomapID":"$geomapID",\n""")
    sb.append("    \"style\": {\n")
    sb.append(s"""        "width": "$width",\n""")
    sb.append(s"""        "height": "$height",\n""")
    sb.append(s"""        "grayscale": $tileGrayscale\n""")
    sb.append("    },\n")
    sb.append(s"""    "jsAssets": ${strArr(jsAssets.toSeq)},\n""")
    sb.append(s"""    "cssAssets": ${strArr(cssAssets.toSeq)},\n""")
    sb.append(s"""\t"jsCodeAssets": ${strArr(jsCodeAssets.toSeq)}\n""")
    sb.append("}\n")
    sb.toString
  }

  /** rendertpls.go Header/Base/Html templates — byte-exact. */
  private def renderHtml(): String = {
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html>\n<html>\n")
    sb.append("<head>\n")
    sb.append("    <meta charset=\"UTF-8\">\n")
    sb.append(s"    <title>$pageTitle</title>\n")
    sb.append("<style>\n")
    sb.append("    .geomap_container { width:100%; height:100%; display: flex;justify-content: center;align-items: center;}\n")
    sb.append("    .geomap_item {margin: auto;}\n")
    sb.append(s"    .leaflet-tile-pane{ -webkit-filter: grayscale($tileGrayscale%); filter: grayscale($tileGrayscale%);}\n")
    sb.append("</style>\n")
    cssAssets.foreach(a => sb.append(s"""    <link href="$a" rel="stylesheet">\n"""))
    jsAssets.foreach(a => sb.append(s"""    <script src="$a"></script>\n"""))
    sb.append("</head>\n")
    sb.append("\n<body style=\"width:100vw; height:100vh\">\n")
    sb.append("<div class=\"geomap_container\">\n")
    sb.append(s"""    <div class="geomap_item" id="$geomapID" style="width:$width;height:$height;"></div>\n""")
    sb.append("</div>\n")
    jsCodeAssets.foreach(a =>
      sb.append(s"""<script src="$a" type="text/javascript" charset="UTF-8"></script>\n"""))
    sb.append("\n<script>\n")
    sb.append("    " + jsCodesOption)
    sb.append("\n    " + jsCodesJoined + "\n")
    sb.append("</script>\n</body>\n</html>\n")
    sb.toString
  }

  /** crsMarshalJS with nums.KakaoCRS = EPSG5181 (projection.go:70-80). */
  private def kakaoCrsJS(varName: String): String = {
    val res = Seq[Double](2048, 1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1, 0.5, 0.25)
      .map(GoJs.goNum).mkString(",")
    val proj = "+proj=tmerc +lat_0=38 +lon_0=127 +k=1 +x_0=200000 +y_0=500000 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m +no_defs"
    val b0 = -30000 - math.pow(2, 19) * 4
    val b1 = -30000 + math.pow(2, 19) * 5
    val b2 = -60000 + math.pow(2, 19) * 5
    s"""var $varName = new L.Proj.CRS('EPSG:5181', '$proj', {
\t\t\tresolutions: [$res],
\t\t\torigin: [-30000,-60000],
\t\t\tbounds: L.bounds([${b0.toLong},-60000],[${b1.toLong},${b2.toLong}])
\t\t});"""
  }
}

object GeoMap {
  private lazy val popupOnlyTemplate: String = {
    val in = getClass.getResourceAsStream("/graft/geomap_mapoptions_popuponly.tmpl")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  case class Bound(minLat: Double, minLon: Double, maxLat: Double, maxLon: Double) {
    def extend(lat: Double, lon: Double): Bound =
      if (contains(lat, lon)) this
      else Bound(math.min(minLat, lat), math.min(minLon, lon),
        math.max(maxLat, lat), math.max(maxLon, lon))
    def contains(lat: Double, lon: Double): Boolean =
      !(lon < minLon || maxLon < lon || lat < minLat || maxLat < lat)
    def isEmpty: Boolean = minLat > maxLat || minLon > maxLon
    def isPoint: Boolean = minLat == maxLat && minLon == maxLon
    def center: (Double, Double) = ((minLat + maxLat) / 2, (minLon + maxLon) / 2)
    def str: String =
      s"[[${GoJs.goNum(minLat)},${GoJs.goNum(minLon)}],[${GoJs.goNum(maxLat)},${GoJs.goNum(maxLon)}]]"
  }

  /** One leaflet layer: either converted [lat,lon] coordinates (left) or a
    * raw GeoJSON map (right). */
  case class Layer(typ: String, coords: Either[Any, collection.Map[String, Any]],
                   properties: mutable.LinkedHashMap[String, Any]) {
    def leafletJS: String = coords match {
      case Right(m) => s"L.geoJSON(${GoJs.marshalJS(m)},opt.geojson)"
      case Left(c) =>
        val props = if (properties == null) "{}" else GoJs.marshalJS(properties)
        s"L.$typ(${GoJs.marshalJS(c)},$props)"
    }
  }
}
