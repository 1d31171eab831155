package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-stream distribution operators (reference: mods/tql/fm_stat.go
  * HISTOGRAM 36-292, BOXPLOT 294-577).
  *
  * Scale design: HISTOGRAM is a single hash agg on the bin id (map-side
  * combined, output cardinality = bin count, tiny); empty bins come from a
  * `spark.range` spine join. BOXPLOT uses SQL `percentile` (exact; swap
  * `percentile_approx` at 100 TB) — one shuffle per category.
  */
object StatOps {
  /** Fixed-step histogram over [min, max): bins of width `step`, all bins
    * emitted (zero-count synthesized). Output (low, high, cnt). */
  def histogram(spark: SparkSession, df: DataFrame, v: Column,
                minV: Double, maxV: Double, step: Double): DataFrame = {
    val nBins = math.ceil((maxV - minV) / step).toLong
    val binned = df
      .filter(v >= minV && v < maxV)
      .select(floor((v - minV) / step).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    spark.range(nBins).withColumnRenamed("id", "bin")
      .join(binned, Seq("bin"), "left")
      .select(
        (col("bin") * step + minV).as("low"),
        ((col("bin") + 1) * step + minV).as("high"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("low")
  }

  /** Histogram with per-category counts pivoted to columns (reference
    * `category()` option). `categories` must be explicit — at scale a
    * dynamic pivot would need a driver-side distinct first. */
  def histogramByCategory(spark: SparkSession, df: DataFrame, v: Column, cat: Column,
                          minV: Double, maxV: Double, step: Double,
                          categories: Seq[String]): DataFrame = {
    val nBins = math.ceil((maxV - minV) / step).toLong
    val binned = df
      .filter(v >= minV && v < maxV)
      .select(floor((v - minV) / step).cast("long").as("bin"), cat.as("cat"))
      .groupBy("bin").pivot("cat", categories).agg(count(lit(1)))
    val filled = categories.foldLeft(
      spark.range(nBins).withColumnRenamed("id", "bin").join(binned, Seq("bin"), "left")) {
      (d, c) => d.withColumn(c, coalesce(col(c), lit(0L)))
    }
    filled.select(
      (col("bin") * step + minV).as("low") +: categories.map(col): _*)
      .orderBy("low")
  }

  /** Streaming merge-closest-bins histogram for `bins(n)` without a
    * predeclared range (reference HISTOGRAM "unpredicted bins" →
    * mods/nums/histogram.go:27-92): insert each value as its own bin in
    * sorted position, then while over capacity merge the two adjacent
    * bins with the smallest gap into their weighted mean. Sequential by
    * construction (a bounded n-bin sketch, like the reference's single
    * event loop); the caller feeds record-ordered values. */
  final class StreamingHistogram(maxBins: Int) {
    private var values = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    def add(v: Double): Unit = {
      val at = values.indexWhere(_._1 > v)
      if (at < 0) values += ((v, 1L)) else values.insert(at, (v, 1L))
      val cap = if (maxBins <= 0) 100 else maxBins
      while (values.length > cap) {
        // find the closest adjacent pair (first pair wins ties — the
        // reference initializes with j==1 and uses strict <)
        var d = 0d; var i = 0
        var j = 1
        while (j < values.length) {
          val dv = values(j)._1 - values(j - 1)._1
          if (dv < d || j == 1) { d = dv; i = j }
          j += 1
        }
        val count = values(i)._2 + values(i - 1)._2
        val merged = ((values(i)._1 * values(i)._2 +
          values(i - 1)._1 * values(i - 1)._2) / count, count)
        values.remove(i - 1)
        values(i - 1) = merged
      }
    }
    def bins: Seq[(Double, Long)] = values.toSeq
  }

  // ---- full BOXPLOT statement kernel (fm_stat.go:294-533) --------------

  /** gonum stat.Quantile over a SORTED array: Empirical = smallest v_i
    * with (i+1)/n >= p; LinInterp = piecewise-linear CDF(v_i)=(i+1)/n. */
  def quantileSorted(sorted: Array[Double], p: Double, linInterp: Boolean): Double =
    if (!linInterp) sorted(math.max(math.ceil(p * sorted.length), 1).toInt - 1)
    else {
      val pos = math.max(p * sorted.length - 1.0, 0.0)
      val k = pos.toInt
      val f = pos - k
      val lo = sorted(k)
      val hi = sorted(math.min(k + 1, sorted.length - 1))
      lo + (hi - lo) * f
    }

  final case class BoxStats(min: Double, lower: Double, q1: Double, q2: Double,
                            q3: Double, upper: Double, max: Double, iqr: Double,
                            outliers: Seq[Double])

  /** One category's box: quartiles with per-quartile interpolation flags
    * (boxplotInterp), 1.5·IQR whiskers, outliers outside the bounds. */
  def boxStats(values: Array[Double], interpQ1: Boolean, interpQ2: Boolean,
               interpQ3: Boolean): BoxStats = {
    val sorted = values.sorted
    val q1 = quantileSorted(sorted, 0.25, interpQ1)
    val q2 = quantileSorted(sorted, 0.5, interpQ2)
    val q3 = quantileSorted(sorted, 0.75, interpQ3)
    val iqr = q3 - q1
    val lower = q1 - 1.5 * iqr
    val upper = q3 + 1.5 * iqr
    BoxStats(sorted.head, lower, q1, q2, q3, upper, sorted.last, iqr,
      sorted.filter(v => v < lower || v > upper).toSeq)
  }

  /** Category display order: explicit `order()` names first (in that
    * order), the rest ascending (fm_stat.go sortCategoryNames). */
  def sortCategoryNames(names: Seq[String], orders: Seq[String]): Seq[String] = {
    val (listed, rest) = names.partition(orders.contains)
    listed.sortBy(orders.indexOf) ++ rest.sorted
  }

  /** Quartiles + IQR whiskers per category (reference BOXPLOT):
    * (category, q1, median, q3, iqr, lower_whisker, upper_whisker,
    * n_outliers). Whiskers are the extreme observed values inside
    * [q1-1.5·iqr, q3+1.5·iqr]. */
  def boxplot(df: DataFrame, v: Column, cat: Column): DataFrame = {
    val q = df.groupBy(cat.as("category")).agg(
      percentile(v, lit(0.25)).as("q1"),
      percentile(v, lit(0.5)).as("median"),
      percentile(v, lit(0.75)).as("q3"))
      .withColumn("iqr", col("q3") - col("q1"))
    val joined = df.select(cat.as("category"), v.as("__v")).join(q, Seq("category"))
    joined.groupBy("category")
      .agg(
        first("q1").as("q1"), first("median").as("median"),
        first("q3").as("q3"), first("iqr").as("iqr"),
        min(when(col("__v") >= col("q1") - col("iqr") * 1.5, col("__v"))).as("lower_whisker"),
        max(when(col("__v") <= col("q3") + col("iqr") * 1.5, col("__v"))).as("upper_whisker"),
        sum(when(col("__v") < col("q1") - col("iqr") * 1.5, 1L)
          .when(col("__v") > col("q3") + col("iqr") * 1.5, 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy("category")
  }
}
