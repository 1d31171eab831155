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
