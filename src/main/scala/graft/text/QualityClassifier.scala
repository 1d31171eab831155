package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style quality/language classifier over hashed n-gram
  * features (Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification", arXiv:1607.01759 — public method, no reference
  * analogue): a linear model over a hashed bag of word uni+bigrams,
  * trained by logistic regression, then scored distributively — the
  * standard companion to DSIR for quality-based pretraining-data
  * selection (GPT-3/CCNet-style quality filtering).
  *
  * Training is FULL-BATCH gradient descent with a fixed iteration count
  * and learning rate, every intermediate pinned to 9 dp and every
  * cross-partition sum accumulated in DECIMAL(38,9) — the DSIR
  * discipline — so the trained weights, and therefore the scores, are
  * bit-reproducible across engines (the DuckDB oracle unrolls the same
  * iterations as CTEs). LBFGS would converge faster but is not
  * deterministic across partitionings; at B+1 ≤ 33 coefficients the GD
  * path is the right trade.
  *
  * Scale shape: ONE tokenize+explode pass builds the (doc, bucket, x)
  * feature relation (persisted across iterations); each GD step is a
  * broadcast join with the ≤33-row weight table plus two partial-agg
  * shuffles (doc-keyed z, bucket-keyed gradient); the gradient collect
  * is ≤33 rows (the kmeans k×d-sums license). Nothing corpus-quadratic;
  * weights broadcast for the final scoring pass.
  */
object QualityClassifier {
  private def r9(c: Column): Column = floor(c * 1e9 + 0.5) / 1e9
  private def fr6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
  private def round9(x: Double): Double = math.floor(x * 1e9 + 0.5d) / 1e9

  /** the one tokenize→explode→bucket chain both the feature builder and
    * the streaming scorer ride — change it in one place only, or the
    * batch and stream oracles desynchronize. */
  private def gramBuckets(docs: DataFrame, idCol: String, textCol: String,
                          width: Int, carry: Seq[String] = Nil): DataFrame = {
    val keep = (idCol +: carry).map(col)
    docs
      .select(keep :+ Curation.words(col(textCol)).as("__ws"): _*)
      .select(keep :+ explode(Dsir.gramsOf(col("__ws"))).as("__g"): _*)
      .select(keep :+ Dsir.bucket(col("__g"), width).as("b"): _*)
  }

  /** (doc_id, b, c) bucket counts — the ONE tokenize both the
    * normalized feature relation and the gram-mean twin scorer ride. */
  private def bucketCounts(docs: DataFrame, idCol: String, textCol: String,
                           width: Int): DataFrame =
    gramBuckets(docs, idCol, textCol, width)
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("c"))

  /** (doc_id, b, x) normalized hashed-gram features + a bias row b=-1,
    * x pinned to 9 dp. The per-doc gram total is a doc-keyed window sum
    * over the (doc, bucket) counts (≤width rows per partition key —
    * never a global window), and the bias rows come straight from the
    * doc-id projection. */
  private def featuresFromCounts(cnts: DataFrame, docs: DataFrame,
                                 idCol: String): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    // every doc has ≥1 gram under this tokenizer, so the bias set from
    // the source projection equals the tokenized doc set
    cnts.select(col(idCol), col("b"),
        r9(col("c").cast("double") / sum("c").over(byDoc)).as("x"))
      .union(docs.select(col(idCol), lit(-1L).as("b"), lit(1.0d).as("x")))
  }

  private def features(docs: DataFrame, idCol: String, textCol: String,
                       width: Int): DataFrame =
    featuresFromCounts(bucketCounts(docs, idCol, textCol, width), docs, idCol)

  /** GD loop over a (persisted) feature relation; ≤33-value driver
    * state, one broadcast join + two partial-agg shuffles per step. */
  private def trainOnFeats(feats: DataFrame, labels: DataFrame,
                           idCol: String, width: Int, iters: Int,
                           lr: Double): Map[Long, Double] = {
    val spark = feats.sparkSession
    import spark.implicits._
    val nDocs = labels.count().toDouble
    var w: Map[Long, Double] =
      ((-1L) +: (0L until width.toLong)).map(_ -> 0.0d).toMap
    for (_ <- 1 to iters) {
      val wDf = w.toSeq.toDF("b", "wt")
      // z = Σ_b round9(w_b·x_b), DECIMAL-exact across partitions; the
      // 9-dp pin before sigmoid feeds exp the SAME double both engines
      val z = feats.join(broadcast(wDf), "b")
        .groupBy(col(idCol))
        .agg(sum(r9(col("wt") * col("x")).cast("decimal(38,9)")).as("__z"))
        .select(col(idCol),
          r9(lit(1.0d) / (lit(1.0d) + exp(-r9(col("__z").cast("double")))))
            .as("p"))
      val err = z.join(labels, idCol)
        .select(col(idCol), (col("p") - col("y")).as("err"))
      // gradient g_b = Σ_docs round9(err·x_b) / N, 9-dp pinned; ≤33 rows
      val grad = feats.join(err, idCol)
        .groupBy(col("b"))
        .agg(sum(r9(col("err") * col("x")).cast("decimal(38,9)")).as("__g"))
        .collect()
        .map(r => r.getLong(0) ->
          round9(r.getDecimal(1).doubleValue() / nDocs)).toMap
      w = w.map { case (b, wb) =>
        b -> round9(wb - lr * grad.getOrElse(b, 0.0d))
      }
    }
    w
  }

  /** Train logistic-regression weights for `labelPred` (y=1) over the
    * hashed features; returns the (b, w) table including the bias row
    * b=-1, every weight 9-dp pinned. */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labelPred: Column, width: Int = 32, iters: Int = 3,
            lr: Double = 5.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = features(docs, idCol, textCol, width).persist()
    val labels = docs.select(col(idCol),
      when(labelPred, 1.0d).otherwise(0.0d).as("y")).persist()
    try trainOnFeats(feats, labels, idCol, width, iters, lr).toSeq.toDF("b", "w")
    finally { feats.unpersist(); labels.unpersist() }
  }

  /** Train + score in ONE corpus tokenize: the scoring pass reads the
    * feature relation the trainer already persisted and the one-row-
    * per-doc result materializes before unpersist (the Dsir
    * weightedScores pattern). `materialize = false` returns the lazy
    * inner plan instead — the audit hook, since an eager localCheckpoint
    * truncates the lineage the plan assertions inspect. */
  def trainAndScore(docs: DataFrame, idCol: String, textCol: String,
                    labelPred: Column, width: Int = 32, iters: Int = 3,
                    lr: Double = 5.0, materialize: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    if (!materialize) {
      val feats = features(docs, idCol, textCol, width)
      val labels = docs.select(col(idCol),
        when(labelPred, 1.0d).otherwise(0.0d).as("y"))
      val w = trainOnFeats(feats, labels, idCol, width, iters, lr)
      return scoreFeats(feats, idCol, w.toSeq.toDF("b", "w"))
    }
    val feats = features(docs, idCol, textCol, width).persist()
    val labels = docs.select(col(idCol),
      when(labelPred, 1.0d).otherwise(0.0d).as("y")).persist()
    try {
      val w = trainOnFeats(feats, labels, idCol, width, iters, lr)
      scoreFeats(feats, idCol, w.toSeq.toDF("b", "w"))
        .localCheckpoint(eager = true)
    } finally { feats.unpersist(); labels.unpersist() }
  }

  private def scoreFeats(feats: DataFrame, idCol: String,
                         weights: DataFrame): DataFrame =
    feats
      .join(broadcast(weights), "b")
      .groupBy(col(idCol))
      .agg(sum(r9(col("w") * col("x")).cast("decimal(38,9)")).as("__z"))
      .select(col(idCol),
        r9(lit(1.0d) / (lit(1.0d) + exp(-r9(col("__z").cast("double")))))
          .as("__p"))
      .select(col(idCol), fr6(col("__p")).as("score"),
        when(col("__p") >= 0.5d, 1L).otherwise(0L).as("pred"))

  /** Distributed scoring: (idCol, score, pred) — score = round6 sigmoid
    * of the broadcast linear model, pred = score ≥ 0.5 as 0/1. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: DataFrame, width: Int = 32): DataFrame =
    scoreFeats(features(docs, idCol, textCol, width), idCol, weights)

  /** Streaming-safe gram-level scoring: z = r9(bias + Σ_g w[b(g)] / n)
    * — fastText's actual architecture (the MEAN of token weights,
    * arXiv:1607.01759 §2) rather than the bucket-count dot product.
    * One streaming aggregation per doc (sum + count after a broadcast
    * weight join), so it runs under Structured Streaming where the
    * (doc, bucket) pre-aggregation + window form cannot. Exact across
    * engines: the per-doc sum of 9-dp weights accumulates in
    * DECIMAL(38,9), n is an exact count, and the division + sigmoid
    * pin to 9 dp before exp. */
  def scoreStream(docs: DataFrame, idCol: String, textCol: String,
                  weights: DataFrame, width: Int = 32): DataFrame = {
    // the bias is ONE value of the ≤33-row coefficient table — lift it
    // to a literal so no join follows the streaming aggregation
    // (stream plans disallow joins after aggregations)
    val bias = lit(weights.filter(col("b") === -1L).head().getDouble(1))
    gramBuckets(docs, idCol, textCol, width)
      .join(broadcast(weights.filter(col("b") >= 0L)), "b")
      .groupBy(col(idCol))
      .agg(sum(col("w").cast("decimal(38,9)")).as("__s"),
        count(lit(1)).as("n_grams"))
      .select(col(idCol), col("n_grams"),
        r9(lit(1.0d) / (lit(1.0d) +
          exp(-r9(bias + col("__s").cast("double") / col("n_grams")))))
          .as("__p"))
      .select(col(idCol), col("n_grams"), fr6(col("__p")).as("score"),
        when(col("__p") >= 0.5d, 1L).otherwise(0L).as("pred"))
  }

  /** Gram-mean scoring from the bucket-count relation — the EXACT batch
    * twin of [[scoreStream]] in zero extra tokenizes: the DECIMAL(38,9)
    * sum of c_b·w_b equals the per-gram sum of w (w is 9-dp, c integer,
    * so each product is exact in scale-9 decimal and decimal addition
    * is order-free). */
  private def scoreMeanFromCounts(cnts: DataFrame, idCol: String,
                                  weights: DataFrame): DataFrame = {
    val bias = lit(weights.filter(col("b") === -1L).head().getDouble(1))
    cnts
      .join(broadcast(weights.filter(col("b") >= 0L)), "b")
      .groupBy(col(idCol))
      // w as decimal(19,9) × c as decimal(10,0) → decimal(30,9): exact
      // (precision ≤ 38 — a (38,9) operand would overflow the result
      // precision and Spark would silently REDUCE the scale)
      .agg(sum(col("w").cast("decimal(19,9)") * col("c").cast("decimal(10,0)"))
          .cast("decimal(38,9)").as("__s"),
        sum("c").as("n_grams"))
      .select(col(idCol), col("n_grams"),
        r9(lit(1.0d) / (lit(1.0d) +
          exp(-r9(bias + col("__s").cast("double") / col("n_grams")))))
          .as("__p"))
      .select(col(idCol), col("n_grams"), fr6(col("__p")).as("score"),
        when(col("__p") >= 0.5d, 1L).otherwise(0L).as("pred"))
  }

  /** Train + the gram-mean batch twin of [[scoreStream]] in ONE corpus
    * tokenize (the DSIR-fusion discipline): returns (weights, twin)
    * where twin is bit-identical to `scoreStream(docs, …, weights)` —
    * the calibrator-fitting input for [[scoreStreamCalibrated]] without
    * a second pass over the corpus. Both results are materialized
    * before the shared count relation unpersists. */
  def trainWithStreamTwin(docs: DataFrame, idCol: String, textCol: String,
                          labelPred: Column, width: Int = 32,
                          iters: Int = 3,
                          lr: Double = 5.0): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cnts = bucketCounts(docs, idCol, textCol, width).persist()
    val feats = featuresFromCounts(cnts, docs, idCol).persist()
    val labels = docs.select(col(idCol),
      when(labelPred, 1.0d).otherwise(0.0d).as("y")).persist()
    try {
      val w = trainOnFeats(feats, labels, idCol, width, iters, lr)
        .toSeq.toDF("b", "w")
      val twin = scoreMeanFromCounts(cnts, idCol, w)
        .localCheckpoint(eager = true)
      (w, twin)
    } finally { cnts.unpersist(); feats.unpersist(); labels.unpersist() }
  }

  /** Streaming scoring WITH per-domain Platt calibration applied in the
    * same plan — the production ingest-filter shape: the classifier
    * coefficients AND the (domain, cal_a, cal_b) fit table (from
    * [[Calibration.plattFit]] on the batch twin's scores) broadcast
    * into the gram stream, and the calibrated probability is emitted
    * per document.
    *
    * Streaming plans disallow joins AFTER an aggregation, so the
    * parameter join happens at gram level (a ≤|domains|-row broadcast)
    * and (cal_a, cal_b) ride the groupBy keys — constant per domain, so
    * state size is unchanged. Pins are the scoreStream + plattCalibrate
    * composition exactly: score = round6 of the 9-dp gram-mean sigmoid,
    * cal_score = round6 sigmoid(a·score + b), pred on the calibrated
    * 9-dp probability.
    *
    * Documents whose domain is absent from `fit` are DROPPED by the
    * inner parameter join — fit on a domain superset, or union a
    * default (domain, 0, 0) row (identity calibration ≈ sigmoid(0·s+0)
    * is NOT identity, so prefer refitting) before going live. */
  def scoreStreamCalibrated(docs: DataFrame, idCol: String,
                            domainCol: String, textCol: String,
                            weights: DataFrame, fit: DataFrame,
                            width: Int = 32): DataFrame = {
    val bias = lit(weights.filter(col("b") === -1L).head().getDouble(1))
    val p9 = r9(lit(1.0d) / (lit(1.0d) +
      exp(-r9(bias + col("__s").cast("double") / col("n_grams")))))
    val score6 = fr6(p9)
    val cal9 = r9(lit(1.0d) / (lit(1.0d) +
      exp(-r9(col("cal_a") * score6 + col("cal_b")))))
    gramBuckets(docs, idCol, textCol, width, carry = Seq(domainCol))
      .join(broadcast(weights.filter(col("b") >= 0L)), "b")
      .join(broadcast(fit), domainCol)
      .groupBy(col(idCol), col(domainCol), col("cal_a"), col("cal_b"))
      .agg(sum(col("w").cast("decimal(38,9)")).as("__s"),
        count(lit(1)).as("n_grams"))
      .select(col(idCol), col(domainCol), col("n_grams"),
        score6.as("score"), fr6(cal9).as("cal_score"),
        when(cal9 >= 0.5d, 1L).otherwise(0L).as("pred"))
  }
}
