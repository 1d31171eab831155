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
    // run x[1..3]: keep 1 (open) + 3 (close); y[4]: both; x[5]: both (single)
    assert(got.toSeq == Seq(1L, 3L, 4L, 5L))
  }
}
