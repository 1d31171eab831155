package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
      case FillPrevious =>
        val wPrev = Window.orderBy("bucket_ns")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wNext = Window.orderBy("bucket_ns")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        aggs.foldLeft(joined) { case (d, (n, _)) =>
          // LOCF; leading gap backfills from the first observation
          // (gonum PiecewiseConstant predicts the first knot before it).
          d.withColumn(n, coalesce(
            last(col(n), ignoreNulls = true).over(wPrev),
            first(col(n), ignoreNulls = true).over(wNext)))
        }.orderBy("bucket_ns")
      case FillAkima | FillFritschButland | FillLinReg =>
        // knots (observed buckets) are bounded by the bucket count, so a
        // window-collected knot list per row is presentation-scale safe;
        // the spline itself is a deterministic scalar kernel.
        val ord = Window.orderBy("bucket_ns")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val kernel: (Column, Column) => Column = fill match {
          case FillFritschButland => Akima.fritschButlandUdf
          case FillLinReg => Akima.linRegUdf
          case _ => Akima.evalUdf
        }
        aggs.foldLeft(joined) { case (d, (n, _)) =>
          val knots = collect_list(when(col(n).isNotNull,
            struct(col("bucket_ns").as("x"), col(n).cast("double").as("y")))).over(ord)
          // only synthesized buckets are filled; observed values stay
          d.withColumn(n,
            when(col(n).isNotNull, col(n))
              .otherwise(kernel(col("bucket_ns"), knots)))
        }.orderBy("bucket_ns")
      case FillLinear =>
        val ord = Window.orderBy("bucket_ns")
        val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        aggs.foldLeft(joined) { case (d, (n, _)) =>
          val pv = last(col(n), ignoreNulls = true).over(wPrev)
          val pt = last(when(col(n).isNotNull, col("bucket_ns")), ignoreNulls = true).over(wPrev)
          val nv = first(col(n), ignoreNulls = true).over(wNext)
          val nt = first(when(col(n).isNotNull, col("bucket_ns")), ignoreNulls = true).over(wNext)
          val interp = pv + (nv - pv) * (col("bucket_ns") - pt) / (nt - pt)
          d.withColumn(n,
            when(col(n).isNotNull, col(n))
              .when(pv.isNull, nv)           // leading gap → clamp to first
              .when(nv.isNull, pv)           // trailing gap → clamp to last
              .otherwise(interp))
        }.orderBy("bucket_ns")
    }
  }
}
