package graft

import org.apache.spark.sql.functions._
import graft.similarity.{Ann, Ivf}
import graft.sinks.ChartSpec
import graft.operators.SeqOps

class IvfChartSpec extends SparkSpec {
  import spark.implicits._

  test("IVF: training is deterministic and probing finds good neighbors") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx1 = Ivf.train(emb, k = 8, iters = 3)
    val idx2 = Ivf.train(emb, k = 8, iters = 3)
    assert(idx1.centroids.map(_.toSeq).toSeq == idx2.centroids.map(_.toSeq).toSeq)

    val q = emb.filter($"vec_id" < 3)
    val brute = Ann.bruteForceTopK(q, emb, k = 5)
      .select("qid", "eid").as[(Long, Long)].collect().toSet
    val ivf = Ivf.topK(q, emb, idx1, k = 5, nprobe = 4)
      .select("qid", "eid").as[(Long, Long)].collect().toSet
    // nprobe=4 of 8 cells → expect meaningful recall vs exact top-5
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall=$recall")
    // every query returns k results
    assert(Ivf.topK(q, emb, idx1, 5, 4).groupBy("qid").count()
      .select("count").as[Long].collect().forall(_ == 5))
  }

  test("IVF: corpus smaller than k degrades to fewer centroids (no recursion)") {
    val tiny = spark.read.parquet(s"$sf/embeddings.parquet").limit(3)
    val idx = Ivf.train(tiny, k = 8, iters = 2)
    assert(idx.centroids.length >= 1 && idx.centroids.length <= 3)
  }

  test("TQL CHART() sink: JSON envelope + column-data js asset (http_query_test.go:1003-1011)") {
    val out = runTrim(
      """FAKE( linspace(0, 360, 5) )
        |MAPVALUE(1, sin((value(0)/180)*PI))
        |CHART( chartID('TesTCharTiD'), theme('dark'), size('500px', '400px'),
        |       chartOption('{"xAxis":{"data":column(0)},"series":[{"type":"line","data":column(1)}]}') )
        |""".stripMargin)
    assert(out.contains("\"chartID\":\"TesTCharTiD\""), out)
    assert(out.contains("\"jsAssets\""), out)
    assert(out.contains("\"jsCodeAssets\""), out)
    assert(out.contains("/web/echarts/themes/dark.js"), out)
    val js = graft.tql.ChartRender.lastAssets.files
      .get("/web/api/tql-assets/TesTCharTiD.js")
    assert(js.isDefined)
    assert(js.get.contains("const _column_0=[0,90,180,270,360];"), js.get)
    assert(js.get.contains("echarts.init(document.getElementById(_chartID), \"dark\")"), js.get)
  }

  test("TQL CHART_LINE compat sink builds option from columns") {
    val out = runTrim(
      """FAKE( linspace(0, 2, 3) )
        |MAPVALUE(1, value(0) * 10)
        |CHART_LINE( chartId('CompatId01'), xAxis(0, 'x'), yAxis(1, 'y'),
        |            seriesLabels('tens') )
        |""".stripMargin)
    assert(out.contains("\"chartID\":\"CompatId01\""), out)
    val js = graft.tql.ChartRender.lastAssets.files
      .get("/web/api/tql-assets/CompatId01.js").getOrElse("")
    assert(js.contains("\"series\":["), js)
    assert(js.contains("\"data\":[[0,0],[1,10],[2,20]]"), js)
    assert(js.contains("\"name\":\"tens\""), js)
  }

  test("TQL GEOMAP sink renders layer js from map rows") {
    val out = runTrim(
      """FAKE( linspace(0, 1, 2) )
        |MAPVALUE(0, '{"type":"marker","coordinates":[' + (37.5 + value(0)) + ',127.0]}')
        |GEOMAP( geomapID('GeoTesT01') )
        |""".stripMargin)
    assert(out.contains("\"geomapID\":\"GeoTesT01\""), out)
    val js = graft.tql.ChartRender.lastAssets.files
      .get("/web/api/tql-assets/GeoTesT01.js").getOrElse("")
    assert(js.contains("L.marker([37.5,127],{}).addTo(map)"), js)
    assert(js.contains("L.marker([38.5,127],{}).addTo(map)"), js)
    assert(js.contains("opt.initBounds = [[37.5,127],[38.5,127]];"), js)
  }

  test("chart spec emits ECharts option JSON") {
    val df = Seq((1, 10.0, 100.0), (2, 20.0, 200.0)).toDF("x", "a", "b")
    val spec = ChartSpec.chart(df, "line", "demo")
    assert(spec.contains(""""xAxis":{"type":"category","data":[1,2]}"""))
    assert(spec.contains(""""name":"a","type":"line","data":[10.0,20.0]"""))
    assert(spec.contains(""""name":"b""""))
  }

  test("geomap spec emits marker layers") {
    val df = Seq((37.5, 127.0, "seoul"), (35.7, 139.7, "tokyo"))
      .toDF("lat", "lon", "city")
    val spec = ChartSpec.geomap(df, "lat", "lon", Some("city"))
    assert(spec.contains(""""coord":[37.5,127.0]""") && spec.contains("seoul"))
  }

  test("filterChangedFirstLast emits run openers and closers") {
    val df = Seq(("a", 1L, "x"), ("a", 2L, "x"), ("a", 3L, "x"),
      ("a", 4L, "y"), ("a", 5L, "x")).toDF("k", "t", "v")
    val got = SeqOps.filterChangedFirstLast(df, $"v", Seq($"k"), $"t")
      .orderBy("t").select("t").as[Long].collect()
    // run x[1..3]: keep 1 (open) + 3 (close); single-record runs y[4] and
    // x[5] are opener AND closer → each emitted twice (reference pair return)
    assert(got.toSeq == Seq(1L, 3L, 4L, 4L, 5L, 5L))
  }
}
