package graft.streaming

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-table batched append workers (reference spi/append_worker.go;
  * bodies pinned by spi/append_worker_test.go:125-260): the write
  * doors' high-throughput path buffers rows per table and flushes by
  * max-rows or max-delay, with a CASE-INSENSITIVE worker registry —
  * get reuses a live worker whatever the name's case, and stop/flush
  * match case-insensitively, removing the worker from the registry.
  *
  * The buffered rows land through `TagTables.insertAll` (the same
  * columnar buffer the doors use); on a deployed cluster this is the
  * driver-side intake edge in front of the partitioned parquet append
  * (`Watch.appendWriter`) — presentation-sized buffering, never a data
  * path for bulk loads.
  */
object AppendWorkers {

  /** One table's buffered appender. Not thread-hot: the doors call it
    * from their handler threads; synchronization is coarse like the
    * reference's channel funnel. */
  final class Worker private[AppendWorkers] (
      spark: SparkSession, val table: String,
      maxRows: Int, maxDelayMs: Long) {
    private val tableColumns: Seq[String] =
      graft.server.TagTables.columnsOf(table)
    private val isLog: Boolean = graft.server.TagTables.isLogTable(table)
    /** data columns — the appendable arity excludes the hidden
      * _ARRIVAL_TIME a log table auto-stamps (AppendLogTime sets it). */
    private val dataColumns: Seq[String] =
      tableColumns.filterNot(_ == "_ARRIVAL_TIME")
    private val buf = mutable.ArrayBuffer.empty[Seq[Any]]
    private var lastFlush = System.nanoTime()
    @volatile private[AppendWorkers] var closed = false

    /** Positional append in table column order; arity is checked like
      * the reference ("value count N, table 'x' requires M columns to
      * append" — append_worker_test.go:191-199). */
    def append(values: Any*): Unit = appendSeq(values)

    private[AppendWorkers] def appendSeq(values: Seq[Any]): Unit = synchronized {
      // a stopped worker must reject, not silently buffer into a
      // registry-unreachable instance (the Go worker's channel is
      // closed at this point and a send would panic)
      if (closed)
        throw new IllegalStateException(
          s"append worker for '$table' is closed")
      if (values.size != dataColumns.size)
        throw new IllegalArgumentException(
          s"value count ${values.size}, table '$table' requires " +
          s"${dataColumns.size} columns to append")
      buf += values
      maybeFlush()
    }

    /** A view that accepts values in the CALLER's column order and
      * remaps them into table order (WithInputColumns; an empty list is
      * the identity view). */
    def withInputColumns(cols: String*): ColumnsView =
      new ColumnsView(this, cols)

    /** Log-table append with an explicit arrival time — rejected for
      * every other table class ("x is not a log table, use Append()
      * instead" — append_worker_test.go:202-212). */
    def appendLogTime(arrivalNs: Long, values: Any*): Unit = {
      if (!isLog)
        throw new IllegalArgumentException(
          s"$table is not a log table, use Append() instead")
      synchronized {
        if (values.size != dataColumns.size)
          throw new IllegalArgumentException(
            s"value count ${values.size}, table '$table' requires " +
            s"${dataColumns.size} columns to append")
        buf += (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          arrivalNs / 1000000000L, arrivalNs % 1000000000L)) +: values)
        maybeFlush()
      }
    }

    private def maybeFlush(): Unit = {
      val overdue = (System.nanoTime() - lastFlush) / 1000000L >= maxDelayMs
      if (buf.size >= maxRows || (overdue && buf.nonEmpty)) flushNow()
    }

    /** ticker hook: flush a quiet worker whose delay budget lapsed. */
    private[AppendWorkers] def flushIfOverdue(): Unit = synchronized {
      if (!closed && buf.nonEmpty &&
        (System.nanoTime() - lastFlush) / 1000000L >= maxDelayMs) flushNow()
    }

    private[AppendWorkers] def flushNow(): Unit = synchronized {
      if (buf.nonEmpty) {
        // AppendLogTime rows carry the leading arrival timestamp and ride
        // the full column list; plain appends ride the data columns
        val (withArrival, plain) = buf.partition(r =>
          isLog && r.size == tableColumns.size)
        if (plain.nonEmpty)
          graft.server.TagTables.insertAll(spark, table, dataColumns, plain.iterator)
        if (withArrival.nonEmpty)
          graft.server.TagTables.insertAll(spark, table, tableColumns, withArrival.iterator)
        buf.clear()
      }
      lastFlush = System.nanoTime()
    }

    private[AppendWorkers] def close(): Unit = { flushNow(); closed = true }
    /** force the buffered rows into the table now. */
    def flush(): Unit = flushNow()
    def isClosed: Boolean = closed
    def pendingRows: Int = synchronized(buf.size)
    def columns: Seq[String] = dataColumns
  }

  /** The WithInputColumns view: values arrive labeled by `cols` and are
    * remapped to the worker's table order before buffering. The Go form
    * PANICS on an arity mismatch or an unknown input column name
    * (append_worker.go:335-339 indexes vals[i] / newVals[-1]); here
    * both reject with a clear error instead — strictly-safer guards,
    * same happy path. */
  final class ColumnsView private[AppendWorkers] (w: Worker, cols: Seq[String]) {
    private val unknown = cols.map(_.toUpperCase)
      .filterNot(c => w.columns.exists(_.equalsIgnoreCase(c)))
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown input column(s) ${unknown.mkString(", ")} for table '${w.table}'")

    def append(values: Any*): Unit =
      if (cols.isEmpty) w.appendSeq(values)
      else {
        if (values.size != cols.size)
          throw new IllegalArgumentException(
            s"value count ${values.size}, ${cols.size} input columns " +
            s"declared for table '${w.table}'")
        val byName = cols.map(_.toUpperCase).zip(values).toMap
        w.appendSeq(w.columns.map(c => byName.getOrElse(c.toUpperCase, null)))
      }
  }

  private val registry = mutable.Map.empty[String, Worker]

  // the reference worker runs a ticker goroutine for the max-delay
  // flush (append_worker.go run loop); one shared daemon scheduler
  // plays that role here — overdue buffered workers flush WITHOUT
  // leaving the registry
  private lazy val ticker: java.util.concurrent.ScheduledExecutorService = {
    val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "append-worker-ticker"); t.setDaemon(true); t
      })
    ex.scheduleWithFixedDelay(() => {
      val live = registry.synchronized(registry.values.toSeq)
      live.foreach { w =>
        try w.flushIfOverdue() catch { case _: Exception => () }
      }
    }, 100L, 100L, java.util.concurrent.TimeUnit.MILLISECONDS)
    ex
  }

  /** Get-or-create, CASE-INSENSITIVE: `get("SENSOR")` returns the live
    * worker registered as `sensor` (append_worker_test.go:176-189) —
    * like the reference's GetAppendWorker, batching parameters only
    * apply on creation; a reused worker keeps its original gates. */
  def get(spark: SparkSession, table: String,
          maxRows: Int = 1000, maxDelayMs: Long = 250L): Worker =
    registry.synchronized {
      ticker // arm the delay flusher once
      registry.getOrElseUpdate(table.toLowerCase,
        new Worker(spark, table.toLowerCase, maxRows, maxDelayMs))
    }

  /** Stop one worker by name, case-insensitive; flushes, closes, and
    * removes it (StopAppendWorker, append_worker_test.go:125-147). */
  def stop(table: String): Boolean = registry.synchronized {
    registry.remove(table.toLowerCase) match {
      case Some(w) => w.close(); true
      case None => false
    }
  }

  /** Flush-and-remove matching workers; no names = all
    * (FlushAppendWorkers, append_worker_test.go:149-174). */
  def flush(names: String*): Unit = registry.synchronized {
    val keys =
      if (names.isEmpty) registry.keys.toSeq
      else names.map(_.toLowerCase).filter(registry.contains)
    keys.foreach { k => registry.remove(k).foreach(_.close()) }
  }

  /** registered worker count (for specs). */
  def size: Int = registry.synchronized(registry.size)
}
