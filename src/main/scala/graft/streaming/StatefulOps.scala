package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming forms of the stateful sequential operators (§2.3) — the
  * reference's pipeline IS a stream, so FILTER_CHANGED / MAP_LOWPASS
  * carry their scalar state per tag across records
  * (mods/tql/fm_monad.go:121-238 filterChanged, 2081-2107 lowpass).
  * The batch kernels (operators/SeqOps) cover bounded frames; these run
  * the same recurrences on an unbounded stream via
  * `flatMapGroupsWithState`, one state cell per tag.
  *
  * Scale design: state is O(1) per tag (a last-value / EMA register,
  * not a buffer), partitioned by the group key — 10M tags is 10M tiny
  * state rows spread over the cluster's state store. Records within a
  * micro-batch are processed in event-time order; cross-batch order is
  * arrival order (the same contract as the reference's live pipeline,
  * which sees records as they arrive).
  */
object StatefulOps {
  /** One tag-stream record: the (name, time, value) tag-table shape. */
  case class TagRow(name: String, ts: java.sql.Timestamp, value: Double)

  private def asTagRows(stream: DataFrame, nameCol: String, tsCol: String,
                        valueCol: String): Dataset[TagRow] = {
    implicit val enc = Encoders.product[TagRow]
    stream.select(col(nameCol).cast("string").as("name"),
      col(tsCol).cast("timestamp").as("ts"),
      col(valueCol).cast("double").as("value")).as[TagRow]
  }

  /** Streaming FILTER_CHANGED: per tag, emit a record only when its
    * value differs from the last EMITTED value — including across
    * micro-batch boundaries (the suppressed-duplicate state survives
    * the batch edge, which a per-batch `lag()` window cannot do). */
  def filterChangedStream(stream: DataFrame, nameCol: String = "name",
                          tsCol: String = "time", valueCol: String = "value"): DataFrame = {
    implicit val encS = Encoders.scalaDouble
    implicit val encO = Encoders.product[TagRow]
    asTagRows(stream, nameCol, tsCol, valueCol)
      .groupByKey(_.name)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[TagRow], state: GroupState[Double]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var last = state.getOption
          val out = Seq.newBuilder[TagRow]
          sorted.foreach { r =>
            if (!last.contains(r.value)) { out += r; last = Some(r.value) }
          }
          last.foreach(state.update)
          out.result().iterator
      }
      .toDF(nameCol, tsCol, valueCol)
  }

  /** Nullable-value record for operators whose first emission is null. */
  case class TagRowN(name: String, ts: java.sql.Timestamp, value: Option[Double])
  /** Bounded trailing-window buffer (MAP_MOVAVG state, O(window)). */
  case class MovBuf(values: Seq[Double])
  /** 1-D Kalman register (estimate + covariance), O(1) per tag. */
  case class KalState(x: Double, p: Double)

  /** Streaming MAP_DIFF / MAP_ABSDIFF / MAP_NONEGDIFF: first difference
    * vs the previous record of the same tag — the previous value is the
    * whole state, and the first record of a tag emits null
    * (fm_monad.go:1806-1906 semantics, across batch edges). */
  def diffStream(stream: DataFrame, abs: Boolean = false, nonNeg: Boolean = false,
                 nameCol: String = "name", tsCol: String = "time",
                 valueCol: String = "value"): DataFrame = {
    implicit val encS = Encoders.scalaDouble
    implicit val encO = Encoders.product[TagRowN]
    asTagRows(stream, nameCol, tsCol, valueCol)
      .groupByKey(_.name)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[TagRow], state: GroupState[Double]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var prev = state.getOption
          val out = sorted.map { r =>
            val d = prev.map { p =>
              val raw = r.value - p
              if (abs) math.abs(raw)
              else if (nonNeg) math.max(0d, raw)
              else raw
            }
            prev = Some(r.value)
            TagRowN(r.name, r.ts, d)
          }
          prev.foreach(state.update)
          out.iterator
      }
      .toDF(nameCol, tsCol, valueCol)
  }

  /** Streaming MAP_MOVAVG: trailing mean over the last `window` records
    * per tag; warm-up emits null unless `noWait` (fm_monad.go:2023-2073).
    * State is the bounded window buffer — O(window) per tag. */
  def movavgStream(stream: DataFrame, window: Int, noWait: Boolean = false,
                   nameCol: String = "name", tsCol: String = "time",
                   valueCol: String = "value"): DataFrame = {
    require(window > 1, s"MAP_MOVAVG window should be > 1, got $window")
    implicit val encS = Encoders.product[MovBuf]
    implicit val encO = Encoders.product[TagRowN]
    asTagRows(stream, nameCol, tsCol, valueCol)
      .groupByKey(_.name)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[TagRow], state: GroupState[MovBuf]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var buf = state.getOption.map(_.values.toVector).getOrElse(Vector.empty)
          val out = sorted.map { r =>
            buf = (buf :+ r.value).takeRight(window)
            val v =
              if (buf.size >= window || noWait) Some(buf.sum / buf.size)
              else None
            TagRowN(r.name, r.ts, v)
          }
          state.update(MovBuf(buf))
          out.iterator
      }
      .toDF(nameCol, tsCol, valueCol)
  }

  /** Streaming MAP_KALMAN, SimpleModel semantics (fm_monad.go:1908-1991):
    * the (estimate, covariance) pair is the per-tag state. */
  def kalmanStream(stream: DataFrame, initVar: Double, procVar: Double,
                   obsVar: Double, nameCol: String = "name",
                   tsCol: String = "time", valueCol: String = "value"): DataFrame = {
    implicit val encS = Encoders.product[KalState]
    implicit val encO = Encoders.product[TagRow]
    asTagRows(stream, nameCol, tsCol, valueCol)
      .groupByKey(_.name)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[TagRow], state: GroupState[KalState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption
          val out = sorted.map { r =>
            val next = st match {
              case None => KalState(r.value, initVar)
              case Some(KalState(x0, p0)) =>
                val p1 = p0 + procVar
                val k = p1 / (p1 + obsVar)
                KalState(x0 + k * (r.value - x0), p1 * (1d - k))
            }
            st = Some(next)
            TagRow(r.name, r.ts, next.x)
          }
          st.foreach(state.update)
          out.iterator
      }
      .toDF(nameCol, tsCol, valueCol)
  }

  /** Streaming MAP_LOWPASS: per tag, the exponential smoothing
    * recurrence y ← (1-α)y + αx, seeded by the first observation —
    * the EMA register is the only state and it carries across batches. */
  def lowpassStream(stream: DataFrame, alpha: Double, nameCol: String = "name",
                    tsCol: String = "time", valueCol: String = "value"): DataFrame = {
    if (alpha <= 0 || alpha >= 1) throw new IllegalArgumentException(
      "MAP_LOWPASS() should have 0 < alpha < 1 ") // fm_monad_test.go:59
    implicit val encS = Encoders.scalaDouble
    implicit val encO = Encoders.product[TagRow]
    asTagRows(stream, nameCol, tsCol, valueCol)
      .groupByKey(_.name)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[TagRow], state: GroupState[Double]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var y = state.getOption
          val out = sorted.map { r =>
            val v = y match {
              case None => r.value
              case Some(prev) => (1 - alpha) * prev + alpha * r.value
            }
            y = Some(v)
            TagRow(r.name, r.ts, v)
          }
          y.foreach(state.update)
          out.iterator
      }
      .toDF(nameCol, tsCol, valueCol)
  }
}
