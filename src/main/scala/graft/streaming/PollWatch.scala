package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.server.TagTables
import graft.sinks.GoJs

/** The `/db/watch/:table` poll contract (reference spi/watch.go +
  * http_query.go handleWatchQuery): each `execute()` is one poll tick.
  *
  *  - **Tag table**: per requested tag, detect the RECENT_ROW_TIME
  *    advancing and emit that tag's newest row once per change.
  *  - **Log table**: the first poll only records the high-water
  *    `_ARRIVAL_TIME`; later polls emit rows that arrived since, capped
  *    at max-rows — beyond it the reference emits the "too many changes"
  *    error and resets the mark.
  *
  * The reference fans per-tag polls across goroutines (Parallelism);
  * here a tick walks tags in order — deterministic, and a deployment
  * drives ticks from its own scheduler. Events render as server-sent
  * events: `data: {json}` frames with Go's sorted-key map marshalling,
  * `error: …` frames, `: keep-alive` comments.
  */
object PollWatch {
  sealed trait Event
  /** One changed row: (column -> value) in table-column order. */
  case class Data(values: Seq[(String, Any)]) extends Event
  case class Err(message: String) extends Event

  final class Watcher(spark: SparkSession, table: String,
                      tags: Seq[String] = Nil, maxRowNum0: Int = 100) {
    if (TagTables.descriptorFor(table).isEmpty)
      throw new IllegalArgumentException(s"table '$table' does not exist")
    private val typ = TagTables.typeOf(table)
    private val isTag = typ == "Tag"
    if (!isTag && typ != "Log")
      throw new IllegalArgumentException("not supported table type")
    if (isTag && tags.isEmpty)
      throw new IllegalArgumentException(
        s"table '$table' is TAG table, no tag specified")
    // log-table cap clamps exactly like spi/watch.go init
    private val maxRowNum =
      if (isTag) maxRowNum0
      else if (maxRowNum0 <= 0) 20
      else math.min(maxRowNum0, 100)

    private val tagLast = mutable.Map.empty[String, Long]
    private var logArrivalNs: Option[Long] = None

    TagTables.ensure(spark, table)

    private def cols = spark.table(table.toLowerCase).columns
    private def nameCol = cols.find(_.equalsIgnoreCase("NAME")).getOrElse("name")
    private def timeCol = cols.find(_.equalsIgnoreCase("TIME")).getOrElse("time")

    /** One poll tick → events in deterministic order. */
    def execute(): Seq[Event] = if (isTag) executeTags() else executeLog()

    private def executeTags(): Seq[Event] = tags.flatMap { tag =>
      val t = spark.table(table.toLowerCase)
      val recentRow = t.filter(col(nameCol) === tag)
        .agg(max(col(timeCol)).as("t")).collect().headOption
      val recent: Option[Long] = recentRow.flatMap(r =>
        if (r.isNullAt(0)) None else Some(anyTimeNs(r.get(0))))
      recent match {
        case None => Nil // no such tag yet
        case Some(rt) if tagLast.get(tag).exists(rt <= _) => Nil // no change
        case Some(rt) =>
          tagLast(tag) = rt
          val row = t.filter(col(nameCol) === tag &&
              col(timeCol) === typedTimeLit(t, rt))
            .limit(1).collect().headOption
          row.map(r => Data(cols.toSeq.zip(r.toSeq))).toSeq
      }
    }

    private def executeLog(): Seq[Event] = {
      val view = TagTables.arrivalViewName(table)
      val t = spark.table(view)
      logArrivalNs match {
        case None =>
          val m = t.agg(max(col("_ARRIVAL_TIME"))).collect().head
          if (!m.isNullAt(0)) logArrivalNs = Some(anyTimeNs(m.get(0)))
          Nil
        case Some(last) =>
          val fresh = t.filter(col("_ARRIVAL_TIME") >
              expr(s"timestamp_micros(${last / 1000L}L)"))
            .orderBy(col("_ARRIVAL_TIME"))
            .limit(maxRowNum + 1).collect()
          if (fresh.length > maxRowNum) {
            // reference: report, drop the rest, restart the high-water
            logArrivalNs = None
            val kept = fresh.take(maxRowNum)
            kept.map(r => Data(t.columns.toSeq.drop(1).zip(r.toSeq.drop(1)))).toSeq :+
              Err("too many changes, omit the rest")
          } else {
            if (fresh.nonEmpty)
              logArrivalNs = Some(anyTimeNs(fresh.last.get(0)))
            fresh.map(r => Data(t.columns.toSeq.drop(1).zip(r.toSeq.drop(1)))).toSeq
          }
      }
    }
  }

  private def anyTimeNs(v: Any): Long = v match {
    case l: Long => l
    case t: java.sql.Timestamp =>
      t.toInstant.getEpochSecond * 1000000000L + t.toInstant.getNano
    case i: java.time.Instant => i.getEpochSecond * 1000000000L + i.getNano
    case other => other.toString.toLong
  }

  /** Literal of the time column's own type (pushdown-safe compare). */
  private def typedTimeLit(t: org.apache.spark.sql.DataFrame, ns: Long) = {
    import org.apache.spark.sql.types._
    t.schema.fields.find(f => f.name.equalsIgnoreCase("TIME")).map(_.dataType) match {
      case Some(LongType) | None => lit(ns)
      case _ => lit(new java.sql.Timestamp(ns / 1000000L)).cast("timestamp")
    }
  }

  /** SSE frames: `data: {sorted-key json}\n\n`, `error: msg\n\n`
    * (http_query.go:169-196); Go json.Marshal sorts map keys. */
  def sse(events: Seq[Event]): String = events.map {
    case Data(values) =>
      val obj = values.sortBy(_._1).map { case (k, v) =>
        GoJs.quote(k) + ":" + jsonVal(v)
      }.mkString("{", ",", "}")
      s"data: $obj\n\n"
    case Err(m) => s"error: $m\n\n"
  }.mkString

  /** `: keep-alive` comment frame. */
  def keepAlive: String = ": keep-alive\n\n"

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case s: String => GoJs.quote(s)
    case b: Boolean => b.toString
    case t: java.sql.Timestamp => anyTimeNs(t).toString
    case d: Double => graft.sinks.Codecs.goFloat(d)
    case f: Float => graft.sinks.Codecs.goFloat(f.toDouble)
    case b: Array[Byte] => GoJs.quote("0x" + b.map(x => f"$x%02x").mkString)
    case other => other.toString
  }
}
