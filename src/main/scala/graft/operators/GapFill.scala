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

  /** One aggregator's fill policy in the CAUSAL timewindow (GROUP's
    * per-aggregator nullValue()/predict() options). */
  final case class CausalFill(predict: Option[String], nullValue: Option[Double])

  /** GROUP(by(time, timewindow(…)), aggs…) semantics — the CAUSAL
    * variant (fm_monad GroupFillerPredict): fills are computed as
    * windows close, fitted ONLY on already-emitted windows (latest 100
    * knots). Because a gap always trails every knot seen so far, the
    * predictors reduce to forward extrapolation: linearregression
    * extrapolates the centered OLS line; the spline/step predictors
    * clamp to the last observed value. A predictor needs >= 2 knots,
    * else the per-agg nullValue (or NULL) is served. This differs from
    * the standalone TIMEWINDOW, whose fillers run at EOF over the whole
    * series.
    *
    * The aggregation itself is distributed (same bucketed hash agg +
    * spine); the walk is inherently sequential (the reference keeps only
    * the latest 100 knots), so it STREAMS through one executor task over
    * the sorted spine — a single-partition mapPartitions, not a driver
    * collect — and the per-agg state is the bounded 100-knot deque. A
    * 31M-bucket request holds ~31M × 8 bytes per sort spill page on one
    * executor, never the driver (and `maxBuckets` rejects it first). */
  def timewindowCausal(
      spark: SparkSession,
      df: DataFrame,
      tsNs: Column,
      fromNs: Long,
      untilNs: Long,
      periodNs: Long,
      aggs: Seq[(String, Column, CausalFill)],
      timeName: String = "bucket_ns"): DataFrame = {
    // unique internal names — aliases may repeat in the user's output
    // (TestGroupByTimeWindow has two PREDICT columns); real names are
    // restored on the result schema below
    val joined = timewindow(spark, df, tsNs, fromNs, untilNs, periodNs,
      // float64 buffers like the reference filler — counts widen too
      aggs.zipWithIndex.map { case ((_, c, _), i) => s"__a$i" -> c.cast("double") },
      FillNull)
    val n = aggs.size
    val fills: Array[CausalFill] = aggs.map(_._3).toArray
    val walked = joined.repartition(1).sortWithinPartitions("bucket_ns")
      .rdd.mapPartitions { it =>
        // per-agg knot buffers (latest 100, like the reference's filler)
        val xs = Array.fill(n)(scala.collection.mutable.ArrayDeque.empty[Double])
        val ys = Array.fill(n)(scala.collection.mutable.ArrayDeque.empty[Double])
        it.map { r =>
          val t = r.getLong(0)
          val cells: Seq[Any] = (0 until n).map { i =>
            val fill = fills(i)
            val v = if (r.isNullAt(i + 1)) null else r.get(i + 1)
            v match {
              case null =>
                fill.predict match {
                  case Some(kind) if xs(i).size >= 2 =>
                    if (kind == "linearregression")
                      Double.box(Akima.evalLinReg(xs(i).toArray, ys(i).toArray, t.toDouble))
                    else Double.box(ys(i).last) // forward clamp (spline/step)
                  case _ => fill.nullValue.map(Double.box).orNull
                }
              case d: java.lang.Double =>
                xs(i).append(t.toDouble); ys(i).append(d.doubleValue())
                if (xs(i).size > 100) { xs(i).removeHead(); ys(i).removeHead() }
                d
              case other => other
            }
          }
          // windows surface as timestamps so sink timeformat() modes apply
          val ts = new java.sql.Timestamp(Math.floorDiv(t, 1000000L))
          ts.setNanos(Math.floorMod(t, 1000000000L).toInt)
          org.apache.spark.sql.Row.fromSeq(ts +: cells)
        }
      }
    // the (possibly repeating) user aliases go straight on the schema —
    // duplicate names are legal in a result frame, just not resolvable
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(timeName,
        org.apache.spark.sql.types.TimestampType) +:
        aggs.zipWithIndex.map { case ((name, _, _), i) =>
          joined.schema(i + 1).copy(name = name)
        })
    spark.createDataFrame(walked, schema)
  }

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
    // Plan limit, mirroring the reference's lake plan caps (the lake door
    // refuses requests beyond the plan's maxQuery rows with "limit over.
    // (parameter:N, Available:M)" — mods/server/http_lake.go:144-186,293).
    // Without it, timewindow(1-year span, period=1s) asks for 31.5M
    // synthesized buckets; the interpolating fillers additionally fit over
    // the observed knots, which this same bound keeps query-sized.
    val maxBuckets =
      spark.conf.get("graft.timewindow.maxBuckets", "4000000").toLong
    if (nBuckets > maxBuckets)
      throw new IllegalArgumentException(
        s"timewindow limit over. (buckets:$nBuckets, Available:$maxBuckets)")
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
        // single pass for ALL agg columns: one UDF evaluates every fitted
        // kernel per spine row (array column), one projection patches the
        // synthesized buckets — not a withColumn chain per aggregator
        val fitIdx = aggs.indices.filter(i => obs.exists(!_.isNullAt(i + 1)))
        val fits: Array[(Array[Double], Array[Double])] = fitIdx.map { i =>
          val knots = obs.filter(!_.isNullAt(i + 1))
          (knots.map(_.getLong(0).toDouble), knots.map(_.getDouble(i + 1)))
        }.toArray
        if (fitIdx.isEmpty) joined.orderBy("bucket_ns") // nothing observed anywhere
        else {
          val f = udf((x: Long) =>
            fits.map { case (xs, ys) => kernel(xs, ys, x.toDouble) })
          val pos = fitIdx.zipWithIndex.toMap
          joined.withColumn("__fill", f(col("bucket_ns")))
            .select(col("bucket_ns") +: aggs.zipWithIndex.map { case ((n, _), i) =>
              pos.get(i) match {
                // only synthesized buckets are filled; observed values stay
                case Some(j) => when(col(n).isNotNull, col(n))
                  .otherwise(element_at(col("__fill"), j + 1)).as(n)
                case None => col(n) // nothing observed: keep nulls
              }
            }: _*)
            .orderBy("bucket_ns")
        }
    }
  }
}
