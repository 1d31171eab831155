package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{Chart, ChartCompat, GeoMap, GoJs, VolatileFileWriter}
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Reproduces the reference's chart/geomap codec tests against its own
  * golden files (read from the read-only checkout like GoldenSpec):
  * mods/codec/internal/chart/chart_test.go, chartcompat_test.go,
  * mods/codec/internal/geomap/geomap_test.go. */
class ChartGeomapGoldenSpec extends AnyFunSuite {
  private val chartDir = "/root/reference/mods/codec/internal/chart/test"
  private val geoDir = "/root/reference/mods/codec/internal/geomap/test"

  private def golden(dir: String, name: String): String =
    new String(Files.readAllBytes(Paths.get(dir, name)), "UTF-8")
      .replace("\r\n", "\n")

  private class FsMock extends VolatileFileWriter {
    var name = ""
    val buff = new StringBuilder
    def volatileFilePrefix: String = "/web/api/tql-assets/"
    def volatileFileWrite(n: String, data: Array[Byte]): Unit = {
      buff.append(new String(data, "UTF-8")); name = n
    }
  }

  /** require.JSONEq parity: parse both and compare with numbers unified
    * to Double (Go unmarshals every JSON number as float64). */
  private def canon(v: Any): Any = v match {
    case m: collection.Map[_, _] =>
      m.asInstanceOf[collection.Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => k -> canon(x) }
    case seq: Iterable[_] => seq.map(canon).toVector
    case n: java.lang.Number => n.doubleValue
    case other => other
  }
  private def assertJsonEq(expect: String, actual: String): Unit = {
    val e = canon(graft.script.Builtins.jsonParse(expect))
    val a = canon(graft.script.Builtins.jsonParse(actual))
    assert(e == a, s"JSON mismatch\nexpect: $expect\nactual: $actual")
  }

  /** chart_test.go StringsEq: same line count, lines equal after trim. */
  private def assertLinesEq(expect: String, actual: String): Unit = {
    val e = expect.trim.split("\n", -1).map(_.trim)
    val a = actual.trim.split("\n", -1).map(_.trim)
    val diff = e.zipAll(a, "<missing>", "<missing>").zipWithIndex
      .find { case ((x, y), _) => x != y }
    assert(e.length == a.length && diff.isEmpty,
      s"line mismatch at ${diff.map(_._2 + 1).getOrElse(-1)}:\n" +
        s"expect: ${diff.map(_._1._1).getOrElse("")}\nactual: ${diff.map(_._1._2).getOrElse("")}")
  }

  private def tick(sec: Int): java.time.Instant =
    java.time.Instant.ofEpochSecond(0, 1692670838086467000L).plusSeconds(sec)

  private def lineOrScatter(kind: String): Unit =
    for (output <- Seq("json", "html")) {
      val fsmock = new FsMock
      val c = new Chart
      c.volatileFileWriter = Some(fsmock)
      c.toJsonOutput = output == "json"
      c.chartID = "WejMYXCGcYNL"
      c.theme = "white"
      c.setChartOption(s"""{
			"xAxis": { "type": "time", "data": column(0 ) },
			"yAxis": { "type": "value"},
			"series": [
				{ "type": "$kind", "data": column( 1) }
			]
		}""")
      assert(c.contentType == (if (output == "json") "application/json" else "text/html"))
      c.addRow(Seq(tick(0), 0.0))
      c.addRow(Seq(tick(1), 1.0))
      c.addRow(Seq(tick(2), 2.0))
      val out = c.close()
      if (output == "json") assertJsonEq(golden(chartDir, s"test_$kind.json"), out)
      else assertLinesEq(golden(chartDir, s"test_$kind.html"), out)
      assertLinesEq(golden(chartDir, s"test_$kind.js"), fsmock.buff.toString)
      assert(fsmock.name == "/web/api/tql-assets/WejMYXCGcYNL.js")
    }

  test("TestLine (chart_test.go:58-112)") {
    val fs = new FsMock
    val c = new Chart
    c.volatileFileWriter = Some(fs)
    c.toJsonOutput = true
    c.chartID = "WejMYXCGcYNL"
    c.theme = "white"
    c.setChartOption("""{
			"xAxis": { "type": "time", "data": column(0 ) },
			"yAxis": { "type": "value"},
			"series": [
				{ "type": "line", "data": column( 1) }
			]
		}""")
    c.addRow(Seq(tick(0), 0.0)); c.addRow(Seq(tick(1), 1.0)); c.addRow(Seq(tick(2), 2.0))
    assertJsonEq(golden(chartDir, "test_line.json"), c.close())
    assertLinesEq(golden(chartDir, "test_line.js"), fs.buff.toString)

    val fs2 = new FsMock
    val h = new Chart
    h.volatileFileWriter = Some(fs2)
    h.toJsonOutput = false
    h.chartID = "WejMYXCGcYNL"
    h.theme = "white"
    h.setChartOption("""{
			"xAxis": { "type": "time", "data": column(0 ) },
			"yAxis": { "type": "value"},
			"series": [
				{ "type": "line", "data": column( 1) }
			]
		}""")
    h.addRow(Seq(tick(0), 0.0)); h.addRow(Seq(tick(1), 1.0)); h.addRow(Seq(tick(2), 2.0))
    assertLinesEq(golden(chartDir, "test_line.html"), h.close())
    assertLinesEq(golden(chartDir, "test_line.js"), fs2.buff.toString)
  }

  test("TestScatter (chart_test.go:114-168)") {
    for (output <- Seq("json", "html")) {
      val fs = new FsMock
      val c = new Chart
      c.volatileFileWriter = Some(fs)
      c.toJsonOutput = output == "json"
      c.chartID = "WejMYXCGcYNL"
      c.theme = "white"
      c.setChartOption("""{
			"xAxis": { "type": "time", "data": column(0) },
			"yAxis": { "type": "value"},
			"series": [
				{ "type": "scatter", "data": column(1) }
			]
		}""")
      c.addRow(Seq(tick(0), 0.0)); c.addRow(Seq(tick(1), 1.0)); c.addRow(Seq(tick(2), 2.0))
      val out = c.close()
      if (output == "json") assertJsonEq(golden(chartDir, "test_scatter.json"), out)
      else assertLinesEq(golden(chartDir, "test_scatter.html"), out)
      assertLinesEq(golden(chartDir, "test_scatter.js"), fs.buff.toString)
    }
  }

  test("TestTangentialPolarBar (chart_test.go:170-232)") {
    for (output <- Seq("json", "html")) {
      val c = new Chart
      c.toJsonOutput = output == "json"
      c.chartID = "WejMYXCGcYNL"
      c.theme = "dark"
      c.setChartOption("""{
			"polar": { "radius": ["30", "80%"] },
			"angleAxis": { "max": 4, "startAngle": 75 },
			"radiusAxis": {
				"type": "category",
				"data": column( 0 )
			},
			"tooltip": {},
			"series": [
				{
					"type":"bar",
					"data": column( 1),
					"coordinateSystem": "polar",
					"label": {
						"show": true,
						"position": "middle"
					}
				}
			]
		}""")
      c.addRow(Seq("a", 2.0)); c.addRow(Seq("b", 1.2))
      c.addRow(Seq("c", 2.4)); c.addRow(Seq("d", 3.6))
      val out = c.close()
      if (output == "json") assertJsonEq(golden(chartDir, "tangential_polar_bar.json"), out)
      else assertLinesEq(golden(chartDir, "tangential_polar_bar.html"), out)
    }
  }

  test("TestAnscombeQuartet + TestMarkLine + TestCandleStick envelopes (chart_test.go:234-423)") {
    val a = new Chart
    a.toJsonOutput = true; a.chartID = "WejMYXCGcYNL"; a.theme = "dark"
    a.setChartOption("""{"legend": {"show": false}}""")
    a.addRow(Seq(1701059601000000000L, 4.26, 3.1, 5.39, 12.5))
    assertJsonEq(golden(chartDir, "anscombe_quartet.json"), a.close())

    val m = new Chart
    m.toJsonOutput = true; m.chartID = "WejMYXCGcYNL"; m.theme = "dark"
    m.setChartOption("""{"xAxis": { "type": "time", "data": column(0) }}""")
    m.addRow(Seq(1701059601000000000L, 4.26))
    assertJsonEq(golden(chartDir, "mark_line.json"), m.close())

    val cs = new Chart
    cs.toJsonOutput = true; cs.chartID = "WejMYXCGcYNL"; cs.theme = "dark"
    cs.setChartOption("""{"legend":{"show": false}}""")
    cs.addRow(Seq(1508806800000000000L, Seq(20L, 34L, 10L, 38L)))
    cs.addRow(Seq(1508893200000000000L, Seq(40L, 35L, 30L, 50L)))
    assertJsonEq(golden(chartDir, "test_candlestick.json"), cs.close())
  }

  test("TestCompat line 2D (chartcompat_test.go:16-88)") {
    for (output <- Seq("json", "html")) {
      val fs = new FsMock
      val c = new ChartCompat("line")
      c.volatileFileWriter = Some(fs)
      c.toJsonOutput = output == "json"
      c.chartID = "WejMYXCGcYNL"
      c.theme = "westeros"
      c.setTitle("Title")
      c.setSubtitle("subtitle")
      c.setGlobalOptions("""{"animation":true, "color":["#80FFA5", "#00DDFF", "#37A2FF"]}""")
      c.width = "400px"; c.height = "300px"
      c.setDataZoom("slider", 0, 100)
      c.setToolboxSaveAsImage("test.png")
      c.setToolboxDataView()
      c.setToolboxDataZoom()
      c.setXAxis(0, "time", "time")
      c.setVisualMapColor(-2.0, 2.0,
        "#a50026", "#d73027", "#f46d43", "#fdae61", "#e0f3f8",
        "#abd9e9", "#74add1", "#4575b4", "#313695", "#313695",
        "#4575b4", "#74add1", "#abd9e9", "#e0f3f8", "#fdae61",
        "#f46d43", "#d73027", "#a50026")
      c.setMarkAreaNameCoord(tick(0).plusMillis(500), tick(1), "Area1", "#ff000033", 0.3)
      c.setMarkAreaNameCoord(tick(0).plusMillis(600), tick(0).plusMillis(1200), "Area2", "#ff000033", 0.3)
      c.setMarkLineXAxisCoord(tick(0).plusMillis(200), "line-X")
      c.setMarkLineYAxisCoord(0.5, "half")
      c.addRow(Seq(tick(0), -2.0)); c.addRow(Seq(tick(1), -1.0))
      c.addRow(Seq(tick(2), 0.0)); c.addRow(Seq(tick(3), 1.0))
      c.addRow(Seq(tick(4), 2.0))
      val out = c.close()
      if (output == "json") assertJsonEq(golden(chartDir, "compat_line.json"), out)
      else assertLinesEq(golden(chartDir, "compat_line.html"), out)
      assertLinesEq(golden(chartDir, "compat_line.js"), fs.buff.toString)
    }
  }

  private def compatSimple(kind: String, file: String): Unit = {
    val fs = new FsMock
    val c = new ChartCompat(kind)
    c.volatileFileWriter = Some(fs)
    c.toJsonOutput = true
    c.chartID = "MjYwMjY0NTY1OTY2MTUxNjg_"
    c.setXAxis(0, "time", "time")
    c.setYAxis(1, "demo")
    c.setDataZoom("slider", 0, 100)
    c.setSeriesLabels("test-data")
    c.addRow(Seq(tick(0), 0.0)); c.addRow(Seq(tick(1), 1.0)); c.addRow(Seq(tick(2), 2.0))
    assertJsonEq(golden(chartDir, s"$file.json"), c.close())
    assertLinesEq(golden(chartDir, s"$file.js"), fs.buff.toString)
  }

  test("TestScatterCompat (chartcompat_test.go:106-135)") { compatSimple("scatter", "compat_scatter") }
  test("TestBarCompat (chartcompat_test.go:136-185)") { compatSimple("bar", "compat_bar") }

  test("TestLine3DCompat (chartcompat_test.go:186-237)") {
    val fs = new FsMock
    val c = new ChartCompat("line3D")
    c.volatileFileWriter = Some(fs)
    c.chartID = "zmsXewYeZOqW"
    c.toJsonOutput = true
    c.setXAxis(0, "time", "time")
    c.setYAxis(1, "demo")
    c.setDataZoom("slider", 0, 100)
    c.setSeriesLabels("test-data")
    c.setTitle("Title")
    c.setSubtitle("subtitle")
    c.theme = "westerose"
    c.width = "600px"; c.height = "600px"
    c.addRow(Seq(tick(0), 0.0, 0.0)); c.addRow(Seq(tick(1), 1.0, 1.0))
    c.addRow(Seq(tick(2), 2.0, 2.0))
    assertJsonEq(golden(chartDir, "compat_line3d.json"), c.close())
    assertLinesEq(golden(chartDir, "compat_line3d.js"), fs.buff.toString)
  }

  // ---- geomap ----

  private val geomapTestLayers = Seq(
    """{
				"type": "marker",
				"coordinates": [37.497850, 127.027756],
				"properties": {
					"popup": {
						"content": "<b>Gangname</b><br/>Hello World?",
						"open": true
					}
				}
			}""",
    """{
				"type": "circleMarker",
				"coordinates": [37.503058, 127.018666],
				"properties": {
					"radius": 100,
					"popup": {
						"content": "<b>circle1</b>"
					}
				}
			}""")

  private val geojsonLayers = Seq(
    """{ "type": "FeatureCollection",
				"features": [
					{ "type": "Feature",
						"geometry": {"type": "Point", "coordinates": [102.0, 0.5]},
						"properties": {"prop0": "value0"}
					},
					{ "type": "Feature",
						"geometry": {
							"type": "LineString",
							"coordinates": [
								[102.0, 0.0], [103.0, 1.0], [104.0, 0.0], [105.0, 1.0]
							]
						},
						"properties": {
							"prop0": "value0",
							"prop1": 0.0
						}
					},
					{ "type": "Feature",
						"geometry": {
							"type": "Polygon",
							"coordinates": [
								[ [100.0, 0.0], [101.0, 0.0], [101.0, 1.0],
									[100.0, 1.0], [100.0, 0.0] ]
							]
						},
						"properties": {
							"prop0": "value0",
							"prop1": {"this": "that"}
						}
					}
				],
				"popup": {
					"content": "<b>GeoJSON</b>",
					"open": 0
				}
			}""",
    """{ "type": "Feature",
				"geometry": {
					"type": "Point",
					"coordinates": [125.6, 10.1]
				},
				"properties": {
					"name": "Dinagat Islands",
					"popup": {
						"content": "<b>Dinagat Islands</b>",
						"open": true
					}
				}
			}""",
    """{ "type": "Point",
				"coordinates": [135.7, 20.1]
			}""")

  private def runGeomap(inputs: Seq[String], jsonG: String, htmlG: String,
                        jsG: String): Unit = {
    for (output <- Seq("json", "html")) {
      val fs = new FsMock
      val gm = new GeoMap
      gm.volatileFileWriter = Some(fs)
      gm.geomapID = "WejMYXCGcYNL"
      gm.toJsonOutput = output == "json"
      gm.setInitialLocation(51.505, -0.09, 13)
      assert(gm.contentType == (if (output == "json") "application/json" else "text/html"))
      inputs.foreach { js =>
        gm.addRow(Seq(graft.script.Builtins.jsonParse(js)))
      }
      val out = gm.close()
      if (output == "json") {
        assertJsonEq(golden(geoDir, jsonG), out)
        assert(fs.name == "/web/api/tql-assets/WejMYXCGcYNL.js", fs.name)
        assert(golden(geoDir, jsG) == fs.buff.toString,
          s"js mismatch\n${fs.buff}")
      } else {
        assert(golden(geoDir, htmlG) == out, s"html mismatch\n$out")
        assert(fs.name == "")
        assert(fs.buff.isEmpty)
      }
    }
  }

  test("TestGeoMap markers (geomap_test.go:52-90)") {
    runGeomap(geomapTestLayers, "geomap_test.json", "geomap_test.html",
      "geomap_test.js")
  }

  test("TestGeoMap geojson (geomap_test.go:91-147)") {
    runGeomap(geojsonLayers, "geomap_test_geojson.json",
      "geomap_test_geojson.html", "geomap_test_geojson.js")
  }

  test("TestCoord (geomap_test.go:232-292)") {
    def conv(v: Any): String = {
      val gm = GoJs.marshalJS _
      gm(v match {
        case s: Seq[_] => s
        case other => other
      })
    }
    // ConvCoordinates normalizes ints to floats before marshal; marshalJS
    // prints the same text either way, so assert on the marshaled shapes.
    assert(conv(Seq(102.0, 0.5)) == "[102,0.5]")
    assert(conv(Seq(102L, 0.5)) == "[102,0.5]")
    assert(conv(Seq(Seq(102.0, 1.5), Seq(202.0, 2.5))) == "[[102,1.5],[202,2.5]]")
    assert(conv(Seq(
      Seq(Seq(102L, 1L), Seq(202.0, 2.5)),
      Seq(Seq(302.0, 3.5), Seq(402.0, 4.5)))) ==
      "[[[102,1],[202,2.5]],[[302,3.5],[402,4.5]]]")
  }

  test("geomap setter paths (geomap_test.go:294-317)") {
    val fs = new FsMock
    val gm = new GeoMap
    gm.volatileFileWriter = Some(fs)
    gm.geomapID = "map-1"
    gm.width = "320px"; gm.height = "240px"
    gm.setMapAssets("a.css", "b.js")
    gm.setInitialLocation(37.5, 127.0, 9)
    gm.setTileTemplate("vworld")
    gm.setTileOption("opacity:0.8")
    gm.toJsonOutput = true
    gm.setTileGrayscale(1.5)
    gm.setIcon("pin", """{"iconUrl":"/pin.png"}""")
    gm.setIcon("pin", """{"iconUrl":"/pin2.png"}""")
    assert(gm.tileGrayscale == 100)
    gm.addRow(Seq("unsupported"))
    val out = gm.close()
    assert(out.contains("map-1"))
    assert(fs.buff.toString.contains("xdworld.vworld.kr"))
  }
}
