package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.time.TimeFns

/** GROUP(timewindow(from, until, period), …) — tumbling time buckets with
  * synthesized empty buckets and gap filling (reference:
  * mods/tql/fm_monad.go:580-697 `gr.fill`, predictors 1074-1156).
  *
  * Scale design: the bucket spine is `spark.range` (distributed, no
  * driver materialization); aggregation is a hash agg on the bucket key;
  * the spine join is a join on a long key that AQE will broadcast when the
  * spine is small. Interpolation fills use window functions over bucket
  * order (one extra sort on an already-aggregated, small-cardinality
  * frame — never over raw rows).
  */
object GapFill {
  sealed trait Fill
  /** Empty buckets keep null aggregate values. */
  case object FillNull extends Fill
  /** nullValue(alt): constant substitution (reference fm_monad.go:723). */
  case class FillConst(v: Double) extends Fill
  /** predict("piecewiseconstant"): last observed value carried forward. */
  case object FillPrevious extends Fill
  /** predict("piecewiselinear"): linear interpolation between the
    * surrounding observed buckets; clamps to endpoints outside the
    * observed domain (gonum interp.PiecewiseLinear semantics). */
  case object FillLinear extends Fill
  /** predict("akimaspline"): Akima sub-spline through the observed
    * buckets (gonum interp.AkimaSpline semantics); clamps outside the
    * domain. Needs ≥3 knots, else falls back to linear. */
  case object FillAkima extends Fill
  /** predict("fritschbutland"): monotone cubic Hermite. */
  case object FillFritschButland extends Fill
  /** predict("linearregression"): OLS fit over observed buckets,
    * evaluated at every bucket (gaps AND edges extrapolate). */
  case object FillLinReg extends Fill

  /** Aggregate `aggs` per `period`-sized bucket of `tsNs` over [from,until),
    * emitting every bucket in the range (missing ones synthesized).
    * Output: `bucket_ns` + one column per (alias → agg builder). */
  def timewindow(
      spark: SparkSession,
      df: DataFrame,
      tsNs: Column,
      fromNs: Long,
      untilNs: Long,
      periodNs: Long,
      aggs: Seq[(String, Column)],
      fill: Fill = FillNull): DataFrame = {
    require(untilNs > fromNs && periodNs > 0)
    val nBuckets = (untilNs - fromNs + periodNs - 1) / periodNs
    // Records outside [from, until) are dropped (reference fm_monad.go:426).
    val bucketed = df
      .filter(tsNs >= fromNs && tsNs < untilNs)
      .withColumn("bucket_ns", TimeFns.roundTimeNs(tsNs - fromNs, periodNs) + fromNs)
      .groupBy(col("bucket_ns"))
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
    val spine = spark.range(nBuckets)
      .select((col("id") * periodNs + fromNs).as("bucket_ns"))
    val joined = spine.join(bucketed, Seq("bucket_ns"), "left")
    fill match {
      case FillNull => joined.orderBy("bucket_ns")
      case FillConst(v) =>
        aggs.foldLeft(joined) { case (d, (n, _)) =>
          d.withColumn(n, coalesce(col(n), lit(v)))
        }.orderBy("bucket_ns")
      case _ =>
        // Every predictor interpolates over the OBSERVED knots — which
        // are bounded by the bucket count (a query parameter), not the
        // data size. So fit once on the driver and evaluate the scalar
        // kernel per spine row: no global window (the old design moved
        // the whole spine through one partition AND duplicated the knot
        // list per row), and the fill stays fully distributed.
        val kernel: (Array[Double], Array[Double], Double) => Double = fill match {
          case FillPrevious => Akima.evalLocf
          case FillLinear => Akima.evalLinear
          case FillFritschButland => Akima.evalFritschButland
          case FillLinReg => Akima.evalLinReg
          case _ => Akima.eval
        }
        // one knot-collect job for all agg columns
        val obs = joined
          .filter(aggs.map(a => col(a._1).isNotNull).reduce(_ || _))
          .select(col("bucket_ns") +: aggs.map(a => col(a._1).cast("double")): _*)
          .collect().sortBy(_.getLong(0))
        aggs.zipWithIndex.foldLeft(joined) { case (d, ((n, _), i)) =>
          val knots = obs.filter(!_.isNullAt(i + 1))
          if (knots.isEmpty) d // nothing observed: keep nulls
          else {
            val xs = knots.map(_.getLong(0).toDouble)
            val ys = knots.map(_.getDouble(i + 1))
            val f = udf((x: Long) => kernel(xs, ys, x.toDouble))
            // only synthesized buckets are filled; observed values stay
            d.withColumn(n, when(col(n).isNotNull, col(n)).otherwise(f(col("bucket_ns"))))
          }
        }.orderBy("bucket_ns")
    }
  }
}
