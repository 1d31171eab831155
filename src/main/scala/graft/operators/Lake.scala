package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.time.TimeFns

/** The Lake API query shapes (reference: mods/server/http_lake.go —
  * calc_mode 1692-1705, DATE_TRUNC bucketing 1707-1716, last/current
  * 842-1149, pivot 1262+, raw/stat modes 301-538) as DataFrame templates.
  *
  * Scale design: last-per-tag is a single hash agg with `max_by` (no
  * window sort over raw data); bucketed calc is hash agg on
  * (tag, bucket); pivot takes explicit category values so the plan stays
  * one pass.
  */
object Lake {
  /** calc_mode ∈ MIN|MAX|AVG|SUM|SUMSQ|COUNT over DATE_TRUNC buckets. */
  def calc(df: DataFrame, tag: Column, tsNs: Column, value: Column,
           mode: String, unit: String, n: Int = 1): DataFrame = {
    val agg: Column = mode.toUpperCase match {
      case "MIN" => min(value)
      case "MAX" => max(value)
      case "AVG" => avg(value)
      case "SUM" => sum(value)
      case "SUMSQ" => sum(value * value)
      case "COUNT" => count(value)
      case m => throw new IllegalArgumentException(s"calc_mode $m")
    }
    df.groupBy(tag.as("name"), TimeFns.dateTruncNs(tsNs, unit, n).as("time_ns"))
      .agg(agg.as("value"))
      .orderBy("name", "time_ns")
  }

  /** Rollup row shape (name, bucket, min, max, sum, sumsq, cnt) — the
    * engine-maintained pre-aggregate we answer AVG/MIN/MAX/SUM/SUMSQ/COUNT
    * from without rescanning raw data (reference V$ROLLUP,
    * spi/show.go:1209-1222). Maintained incrementally by streaming at
    * scale; here a batch builder. */
  def rollup(df: DataFrame, tag: Column, tsNs: Column, value: Column,
             unit: String, n: Int = 1): DataFrame =
    df.groupBy(tag.as("name"), TimeFns.dateTruncNs(tsNs, unit, n).as("time_ns"))
      .agg(min(value).as("min_value"), max(value).as("max_value"),
        sum(value).as("sum_value"), sum(value * value).as("sumsq_value"),
        count(value).as("cnt"))

  /** Coarsen a finer rollup to a coarser period by merging partials —
    * the reference maintains its tier ladder hierarchically (SEC rolls
    * from raw, MIN from SEC, HOUR from MIN; SHOW ROLLUPGAP
    * spi/show.go:1209-1222 exposes exactly that chain), so the coarse
    * tiers never rescan raw data. Exact for min/max/cnt and for sums of
    * values whose partial sums are representable; `periodNs` must be a
    * multiple of the finer rollup's period. */
  def rollupCoarsen(fine: DataFrame, periodNs: Long): DataFrame =
    fine.groupBy(col("name"),
      (col("time_ns") - pmod(col("time_ns"), lit(periodNs))).as("time_ns"))
      .agg(min("min_value").as("min_value"), max("max_value").as("max_value"),
        sum("sum_value").as("sum_value"), sum("sumsq_value").as("sumsq_value"),
        sum("cnt").as("cnt"))

  /** Last (most recent) row per tag — the stat-table RECENT_ROW_TIME /
    * "current value" endpoint. `max_by` keeps it a hash agg. */
  def lastPerTag(df: DataFrame, tag: Column, tsNs: Column, value: Column): DataFrame =
    df.groupBy(tag.as("name"))
      .agg(max(tsNs).as("last_time_ns"), max_by(value, tsNs).as("last_value"))
      .orderBy("name")

  /** Per-tag stats — the V$T_STAT virtual table (reference
    * spi/show.go:1353-1366). */
  def tagStat(df: DataFrame, tag: Column, tsNs: Column, value: Column): DataFrame =
    df.groupBy(tag.as("name")).agg(
      count(lit(1)).as("row_count"),
      min(tsNs).as("min_time"), max(tsNs).as("max_time"),
      min(value).as("min_value"), min_by(tsNs, value).as("min_value_time"),
      max(value).as("max_value"), max_by(tsNs, value).as("max_value_time"),
      max(tsNs).as("recent_row_time"))
      .orderBy("name")

  /** Pivot tags to columns per time bucket (reference GetPivotData).
    * Explicit tag list keeps this single-pass at scale. */
  def pivot(df: DataFrame, tag: Column, tsNs: Column, value: Column,
            unit: String, n: Int, tags: Seq[String]): DataFrame =
    df.withColumn("time_ns", TimeFns.dateTruncNs(tsNs, unit, n))
      .groupBy("time_ns")
      .pivot(tag.cast("string"), tags)
      .agg(avg(value))
      .orderBy("time_ns")

  /** SQL_SELECT between() bound resolution (reference fm_dbsrc.go:835-944):
    * bounds are absolute ns, `now±dur`, or `last±dur` where `last` is the
    * tag's max time (resolved via V$T_STAT there; here a broadcast 1-row
    * aggregate — no driver round-trip, stays one Catalyst plan). */
  sealed trait TimeBound
  case class AbsNs(ns: Long) extends TimeBound
  case class NowRel(offsetNs: Long) extends TimeBound
  case class LastRel(offsetNs: Long) extends TimeBound

  object TimeBound {
    /** Parse "now", "now-1h", "last", "last-30s", or a ns literal. */
    def parse(s: String): TimeBound = {
      val t = s.trim
      if (t.startsWith("now")) NowRel(rel(t.drop(3)))
      else if (t.startsWith("last")) LastRel(rel(t.drop(4)))
      else AbsNs(t.toLong)
    }
    private def rel(r: String): Long = r.trim match {
      case "" => 0L
      case x if x.startsWith("-") => -graft.time.TimeFns.parseDurationNs(x.drop(1))
      case x if x.startsWith("+") => graft.time.TimeFns.parseDurationNs(x.drop(1))
      case x => throw new IllegalArgumentException(s"bad relative time: $r")
    }
  }

  /** Filter a (tag-filtered) frame to [fromB, toB] resolving now/last.
    * `nowNs` is injected for determinism (the reference reads the clock). */
  def betweenFilter(df: DataFrame, timeCol: String,
                    fromB: TimeBound, toB: TimeBound, nowNs: Long): DataFrame = {
    val needsLast = Seq(fromB, toB).exists(_.isInstanceOf[LastRel])
    val base =
      if (!needsLast) df
      else df.crossJoin(org.apache.spark.sql.functions.broadcast(
        df.agg(max(col(timeCol)).as("__last_ts"))))
    def bound(b: TimeBound): Column = b match {
      case AbsNs(ns) => lit(ns)
      case NowRel(off) => lit(nowNs + off)
      case LastRel(off) => col("__last_ts") + off
    }
    base.filter(col(timeCol) >= bound(fromB) && col(timeCol) <= bound(toB))
      .drop("__last_ts")
  }

  /** As-of join: for each left row, the most recent right row with
    * right.time ≤ left.time on the same key. Implemented as a tagged
    * union + one (key, time) sort with last-value carry-forward — a
    * single shuffle, no per-row range probing; the same plan a
    * sort-merge as-of join would produce.
    *
    * SKEW: the carry-forward window partitions by `key` only, so one
    * pathologically hot key (a tag carrying a large share of all rows)
    * serializes into a single task — the standard as-of plan's known
    * limit. For skewed inputs use [[asofJoinSliced]], which adds a
    * time-slice dimension to the partition key (hot keys spread over
    * slices) at the cost of a second, tiny shuffle for the
    * slice-boundary handoff. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTimeNs: String, rightTimeNs: String,
               rightVals: Seq[String]): DataFrame = {
    val l = left.withColumn("__t", col(leftTimeNs)).withColumn("__side", lit(1))
    val lAligned = rightVals.foldLeft(l)((d, c) => d.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
    val r = right.select(
      Seq(col(key), col(rightTimeNs).as("__t"), lit(0).as("__side")) ++
        rightVals.map(c => col(c).as(s"__r_$c")): _*)
    val rAligned = left.columns.filterNot(c => c == key)
      .foldLeft(r)((d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAligned.unionByName(rAligned.select(lAligned.columns.map(col).toSeq: _*))
    // Right rows sort before left rows at equal times (side 0 < 1) so an
    // exactly-simultaneous right row is visible to the left row.
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++ rightVals.map(c => col(s"__r_$c").as(s"right_$c")): _*)
  }

  /** Skew-guarded as-of join: identical semantics to [[asofJoin]], but
    * the carry-forward window partitions by (key, time-slice) so a hot
    * key's rows spread over `ceil(span/sliceNs)` tasks instead of one.
    * The value carried INTO each slice (the last right row from any
    * earlier slice) is resolved on a compact per-(key, slice) frame —
    * one row per key-slice, so its key-only window is tiny even for the
    * hottest key — and injected as a synthetic sort-first row. Two extra
    * small shuffles; results are bit-identical to [[asofJoin]]. */
  def asofJoinSliced(left: DataFrame, right: DataFrame, key: String,
                     leftTimeNs: String, rightTimeNs: String,
                     rightVals: Seq[String], sliceNs: Long): DataFrame = {
    require(sliceNs > 0, s"sliceNs must be positive, got $sliceNs")
    // slice identity = slice START (t - t mod s): pure long arithmetic —
    // a double floor-div would lose ns precision at 2^63 scale.
    def sliceOf(t: Column): Column = t - pmod(t, lit(sliceNs))
    val l = left.withColumn("__t", col(leftTimeNs)).withColumn("__side", lit(1))
      .withColumn("__slice", sliceOf(col("__t")))
    val lAligned = rightVals.foldLeft(l)((d, c) =>
      d.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
    val r = right.select(
      Seq(col(key), col(rightTimeNs).as("__t"), lit(0).as("__side")) ++
        rightVals.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn("__slice", sliceOf(col("__t")))
    // slice-boundary handoff, on a frame of ONE row per (key, slice):
    // the latest right row of each slice, then a running carry over
    // strictly-earlier slices (struct max orders by __t first).
    val rAggSlice = r.groupBy(col(key), col("__slice"))
      .agg(max(struct((col("__t") +: rightVals.map(c => col(s"__r_$c"))): _*)).as("__last"))
    val lSlices = l.select(col(key), col("__slice")).distinct()
    val wPrev = Window.partitionBy(col(key)).orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val synth = lSlices.join(rAggSlice, Seq(key, "__slice"), "full_outer")
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wPrev))
      .filter(col("__carry").isNotNull)
      .select(
        Seq(col(key), col("__slice").as("__t"), lit(-1).as("__side"), col("__slice")) ++
          rightVals.map(c => col("__carry").getField(s"__r_$c").as(s"__r_$c")): _*)
    // align non-key left columns as nulls on the right/synthetic sides
    def alignLeft(d: DataFrame): DataFrame =
      left.columns.filterNot(_ == key)
        .foldLeft(d)((acc, c) => acc.withColumn(c, lit(null).cast(left.schema(c).dataType)))
        .select(lAligned.columns.map(col).toSeq: _*)
    // synthetic carry-in (__side -1, __t = slice start) sorts before any
    // real row of its slice; a real right row in-slice overrides it via
    // the same last()-carry-forward the unsliced kernel uses.
    val unioned = lAligned.unionByName(alignLeft(r)).unionByName(alignLeft(synth))
    val w = Window.partitionBy(col(key), col("__slice"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++ rightVals.map(c => col(s"__r_$c").as(s"right_$c")): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * right.time ≥ left.time on the same key — "next event after", the
    * funnel/conversion lookup. Implemented by negating the time axis and
    * reusing the backward carry-forward kernel: identical single-shuffle
    * plan, simultaneous rows still visible. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTimeNs: String, rightTimeNs: String,
                      rightVals: Seq[String]): DataFrame = {
    val l = left.withColumn("__negt", -col(leftTimeNs))
    val r = right.withColumn("__negt_r", -col(rightTimeNs))
      .drop(rightTimeNs)
    asofJoin(l, r, key, "__negt", "__negt_r", rightVals)
      .drop("__negt")
  }

  /** As-of join with a max-age tolerance: a matched right row older than
    * `tolerance` (same unit as the time columns) is discarded — the lake
    * door's "nearest within duration" semantics, where a stale last
    * value must not serve as current. Same single-shuffle carry-forward
    * plan; the age test is a post-projection, so tolerance adds zero
    * extra shuffles. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        leftTimeNs: String, rightTimeNs: String,
                        rightVals: Seq[String], tolerance: Long): DataFrame = {
    val r = right.withColumn("__rt", col(rightTimeNs))
    val joined = asofJoin(left, r, key, leftTimeNs, rightTimeNs, rightVals :+ "__rt")
    val fresh = col("right___rt").isNotNull &&
      (col(leftTimeNs) - col("right___rt")) <= tolerance
    rightVals.foldLeft(joined) { (d, c) =>
      d.withColumn(s"right_$c", when(fresh, col(s"right_$c")))
    }.drop("right___rt")
  }
}
