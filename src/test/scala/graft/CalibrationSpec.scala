package graft

import org.apache.spark.sql.functions._
import graft.text.Calibration

/** Per-domain Platt scaling (Platt 1999): deterministic GD fit of
  * sigmoid(A_d·s + B_d) per domain. Oracle parity of the gate row is
  * checked by q_quality_calibrated; this spec pins the calibration
  * behavior and the bit-reproducibility across partitionings. */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  // domain "hi" is over-confident-low (scores near 0.4 but mostly
  // positive), domain "lo" the reverse — calibration must pull the two
  // domains' probabilities apart given identical raw scores
  private def scored(n: Int) = {
    val rows = (0 until n).map { i =>
      val d = if (i % 2 == 0) "hi" else "lo"
      val s = 0.3 + 0.4 * ((i / 2) % 5) / 5.0
      val y = if (d == "hi") (if (i % 10 != 2) 1.0 else 0.0)
              else (if (i % 10 != 3) 0.0 else 1.0)
      (i.toLong, d, s, y)
    }
    rows.toDF("doc_id", "source", "score", "y")
  }

  test("pulls per-domain probabilities toward the domain base rate") {
    val cal = Calibration.plattCalibrate(scored(200), "doc_id", "source",
      "score", "y")
    assert(cal.count() == 200)
    // identical raw score 0.5 must calibrate HIGHER in the mostly-
    // positive domain than in the mostly-negative one
    val mean = cal.groupBy("source").agg(avg("cal_score").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(mean("hi") > mean("lo"),
      s"hi=${mean("hi")} should exceed lo=${mean("lo")}")
    // calibrated outputs are probabilities
    val mm = cal.agg(min("cal_score"), max("cal_score")).head()
    assert(mm.getDouble(0) >= 0d && mm.getDouble(1) <= 1d)
    // schema contract of the gate row
    assert(cal.columns.toSeq ==
      Seq("doc_id", "source", "score", "cal_score", "label"))
  }

  test("ECE: calibration reduces the per-domain reliability gap") {
    val cal = Calibration.plattCalibrate(scored(400), "doc_id", "source",
      "score", "y")
    val before = Calibration.ece(cal, "source", "score", "label")
      .withColumnRenamed("ece", "ece_raw").drop("n_docs")
    val after = Calibration.ece(cal, "source", "cal_score", "label")
      .withColumnRenamed("ece", "ece_cal")
    val rows = after.join(before, "source")
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_docs"), r.getAs[Double]("ece_raw"),
        r.getAs[Double]("ece_cal"))).toSeq
    assert(rows.map(_._1).sorted == Seq("hi", "lo"))
    rows.foreach { case (src, n, raw, calE) =>
      assert(n == 200)
      assert(calE >= 0 && raw >= 0)
      // the synthetic domains are deliberately mis-calibrated (raw
      // scores near 0.5 for ~90/10 label splits): Platt must shrink ECE
      assert(calE < raw, s"$src: ece_cal=$calE !< ece_raw=$raw")
    }
  }

  test("isotonic: PAV pools a textbook violator sequence") {
    // scores .1/.2/.3/.4 with labels 1,0,0,1 → isotonic solution
    // [1/3, 1/3, 1/3, 1] (the first three pool)
    val df = Seq(
      (1L, "d", 0.1, 1.0), (2L, "d", 0.2, 0.0),
      (3L, "d", 0.3, 0.0), (4L, "d", 0.4, 1.0)
    ).toDF("doc_id", "source", "score", "y")
    val out = Calibration.isotonicCalibrate(df, "doc_id", "source",
        "score", "y")
      .orderBy("doc_id").collect().map(_.getAs[Double]("iso_score")).toSeq
    assert(out == Seq(0.333333, 0.333333, 0.333333, 1.0))
  }

  test("isotonic: fit is monotone within each domain and reproducible") {
    val docs = scored(300)
    val out = Calibration.isotonicCalibrate(docs, "doc_id", "source",
      "score", "y")
    // non-decreasing in score within every domain
    out.select("source", "score", "iso_score").distinct()
      .collect().groupBy(_.getString(0)).foreach { case (_, rows) =>
        val fit = rows.map(r => (r.getDouble(1), r.getDouble(2)))
          .sortBy(_._1).map(_._2)
        assert(fit.zip(fit.tail).forall { case (a, b) => a <= b }, fit.toSeq)
      }
    // repartition invariance (exact integer pooling decisions)
    val a = Calibration.isotonicCalibrate(docs.repartition(1), "doc_id",
      "source", "score", "y").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val b = Calibration.isotonicCalibrate(docs.repartition(7), "doc_id",
      "source", "score", "y").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(a == b)
  }

  test("fit is bit-reproducible across partitionings") {
    val docs = scored(120)
    def run(parts: Int) =
      Calibration.plattCalibrate(docs.repartition(parts), "doc_id",
        "source", "score", "y")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(run(1) == run(7))
  }
}
