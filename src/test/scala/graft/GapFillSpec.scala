package graft

import org.apache.spark.sql.functions._
import graft.operators.GapFill

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  // buckets of size 10 over [0, 60): data only in buckets 0, 30, 50
  private def df = Seq((1L, 10.0), (3L, 20.0), (31L, 40.0), (55L, 10.0))
    .toDF("t", "v")

  private def run(fill: GapFill.Fill) =
    GapFill.timewindow(spark, df, $"t", 0L, 60L, 10L,
      Seq("avg_v" -> avg($"v")), fill)
      .select("bucket_ns", "avg_v").as[(Long, Option[Double])].collect().toSeq

  test("missing buckets are synthesized (null fill)") {
    val got = run(GapFill.FillNull)
    assert(got.map(_._1) == Seq(0L, 10L, 20L, 30L, 40L, 50L))
    assert(got(0)._2.contains(15.0))
    assert(got(1)._2.isEmpty && got(2)._2.isEmpty && got(4)._2.isEmpty)
    assert(got(3)._2.contains(40.0) && got(5)._2.contains(10.0))
  }

  test("constant fill substitutes nullValue") {
    val got = run(GapFill.FillConst(-1d))
    assert(got.map(_._2.get) == Seq(15.0, -1.0, -1.0, 40.0, -1.0, 10.0))
  }

  test("piecewiseconstant steps right-continuously (gaps take the NEXT observation)") {
    val got = run(GapFill.FillPrevious)
    // knots at 0→15, 30→40, 50→10: gaps 10/20 take the NEXT knot (40),
    // gap 40 takes 10 — the reference's PiecewiseConstant predicts with
    // the right knot (timewindow battery 270→next); the tail holds last
    assert(got.map(_._2.get) == Seq(15.0, 40.0, 40.0, 40.0, 10.0, 10.0))
  }

  test("piecewiselinear interpolates and clamps at the edges") {
    val got = run(GapFill.FillLinear)
    // buckets 10,20 interpolate between 15@0 and 40@30; bucket 40 between 40@30 and 10@50
    assert(got.map(_._2.get) == Seq(15.0, 15.0 + 25.0 / 3, 15.0 + 50.0 / 3, 40.0, 25.0, 10.0))
  }

  test("bucket plan limit: a 10M-bucket request fails fast, before any job") {
    // timewindow(1-year span, 1s period) used to synthesize every bucket
    // through the driver fill paths; now it is refused up front with the
    // reference's lake-plan error shape (http_lake.go:293 "limit over.")
    val e = intercept[IllegalArgumentException] {
      GapFill.timewindow(spark, df, $"t", 0L, 10000000L, 1L,
        Seq("avg_v" -> avg($"v")), GapFill.FillLinear)
    }
    assert(e.getMessage.contains("limit over."))
    assert(e.getMessage.contains("buckets:10000000"))
    // causal variant goes through the same gate
    val e2 = intercept[IllegalArgumentException] {
      GapFill.timewindowCausal(spark, df, $"t", 0L, 10000000L, 1L,
        Seq(("a", avg($"v"), GapFill.CausalFill(None, None))))
    }
    assert(e2.getMessage.contains("limit over."))
    // the cap is a session conf, so an operator who really wants a huge
    // spine can raise it per-plan
    spark.conf.set("graft.timewindow.maxBuckets", "20000000")
    try {
      val wide = GapFill.timewindow(spark, df, $"t", 0L, 10000000L, 1000000L,
        Seq("c" -> count($"v")), GapFill.FillNull)
      assert(wide.count() == 10L)
    } finally spark.conf.unset("graft.timewindow.maxBuckets")
  }

  test("causal walk streams through one executor partition (no driver collect)") {
    val got = GapFill.timewindowCausal(spark, df, $"t", 0L, 60L, 10L,
      Seq(("v", avg($"v"), GapFill.CausalFill(Some("linearregression"), None)),
        ("k", avg($"v"), GapFill.CausalFill(None, Some(-7d)))))
    assert(got.rdd.getNumPartitions == 1)
    val rows = got.collect()
    assert(rows.length == 6)
    // first gap (bucket 10) has only ONE knot (15@0) → predictor needs 2,
    // falls back to null; nullValue column serves -7
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == -7d)
    // bucket 40 extrapolates the OLS line over knots (0,15),(30,40)
    val expect40 = {
      val xs = Array(0d, 30d); val ys = Array(15d, 40d)
      graft.operators.Akima.evalLinReg(xs, ys, 40d)
    }
    assert(math.abs(rows(4).getDouble(1) - expect40) < 1e-9)
  }

  test("records outside [from, until) are dropped") {
    val wide = Seq((-5L, 100.0), (65L, 100.0), (5L, 1.0)).toDF("t", "v")
    val got = GapFill.timewindow(spark, wide, $"t", 0L, 60L, 10L,
      Seq("c" -> count($"v")), GapFill.FillConst(0))
      .select(col("c").cast("long")).as[Long].collect() // FillConst widens counts to double
    assert(got.sum == 1L)
  }
}
