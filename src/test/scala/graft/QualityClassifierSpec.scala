package graft

import org.apache.spark.sql.functions._
import graft.text.QualityClassifier

/** fastText-style hashed-n-gram logistic classifier (arXiv:1607.01759):
  * deterministic GD training, broadcast scoring. The oracle parity of
  * the gate rows is checked by q_quality_classifier / q_quality_sample;
  * this spec pins the learning behavior and the bit-reproducibility
  * across partitionings (the property LBFGS would NOT give). */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = {
    // positive docs speak "good clean prose text", negatives "spam junk
    // noise garbage" — linearly separable through any hash width
    val rows = (0 until n).map { i =>
      if (i % 2 == 0)
        (i.toLong, "good clean prose text flows well " + s"filler$i", 1L)
      else
        (i.toLong, "spam junk noise garbage click buy " + s"filler$i", 0L)
    }
    rows.toDF("doc_id", "text", "y")
  }

  test("learns a separable quality signal (pred matches label)") {
    val docs = corpus(80)
    val w = QualityClassifier.train(docs, "doc_id", "text", col("y") === 1L)
    // width+1 coefficients incl. the bias row b = -1
    assert(w.count() == 33)
    assert(w.filter(col("b") === -1L).count() == 1)
    val scored = QualityClassifier.score(docs, "doc_id", "text", w)
      .join(docs.select(col("doc_id"), col("y")), "doc_id")
    val acc = scored.filter(col("pred") === col("y")).count().toDouble / 80d
    assert(acc >= 0.95, s"accuracy $acc")
    // scores are probabilities
    val mm = scored.agg(min("score"), max("score")).head()
    assert(mm.getDouble(0) >= 0d && mm.getDouble(1) <= 1d)
  }

  test("trainWithStreamTwin: fused twin is bit-identical to scoreStream") {
    val docs = corpus(70)
    val (w, twin) = QualityClassifier.trainWithStreamTwin(docs, "doc_id",
      "text", col("y") === 1L)
    val direct = QualityClassifier.scoreStream(docs, "doc_id", "text", w)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val fused = twin.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(fused == direct)
    // and the fused weights equal the standalone trainer's
    val w2 = QualityClassifier.train(docs, "doc_id", "text", col("y") === 1L)
      .orderBy("b").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(w.orderBy("b").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == w2)
  }

  test("scoreStreamCalibrated batch twin == scoreStream + Platt composition") {
    import graft.text.Calibration
    val docs = corpus(90).withColumn("src",
      concat(lit("s"), (col("doc_id") % 3).cast("string")))
    val w = QualityClassifier.train(docs, "doc_id", "text", col("y") === 1L)
    val twin = QualityClassifier.scoreStream(docs, "doc_id", "text", w)
      .join(docs.select(col("doc_id"), col("src"),
        col("y").cast("double").as("yy")), "doc_id")
    val fit = Calibration.plattFit(twin, "src", "score", "yy")
    val direct = QualityClassifier
      .scoreStreamCalibrated(docs, "doc_id", "src", "text", w, fit)
      .select("doc_id", "score", "cal_score").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    // plattCalibrate re-fits on the same (score, label) relation with the
    // same iters/lr → identical parameters → identical calibrated scores
    val composed = Calibration.plattCalibrate(twin, "doc_id", "src",
        "score", "yy")
      .select("doc_id", "score", "cal_score").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(direct == composed)
  }

  test("training is bit-reproducible across partitionings") {
    val docs = corpus(60)
    val w1 = QualityClassifier.train(docs.repartition(1), "doc_id", "text",
      col("y") === 1L).orderBy("b").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val w7 = QualityClassifier.train(docs.repartition(7), "doc_id", "text",
      col("y") === 1L).orderBy("b").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(w1.toSeq == w7.toSeq)
  }
}
