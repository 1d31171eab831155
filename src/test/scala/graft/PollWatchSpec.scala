package graft

import graft.server.{QueryDoor, TagTables}
import graft.streaming.PollWatch

/** Reproduces the reference watcher's poll contract (spi/watch.go,
  * served as SSE by http_query.go handleWatchQuery). */
class PollWatchSpec extends SparkSpec {

  private val t0 = 1705291859000000000L

  test("tag watch emits once per RECENT_ROW_TIME advance (spi/watch.go executeTag)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table watch_tag (NAME varchar(100) primary key, TIME datetime basetime, VALUE double summarized)")
    try {
      TagTables.insert(spark, "watch_tag", Seq("NAME", "TIME", "VALUE"),
        Seq("temp", Long.box(t0), Double.box(1.5)))
      val w = new PollWatch.Watcher(spark, "watch_tag", Seq("temp", "ghost"))
      // first poll: the seed row is a change; unknown tag is silent
      val e1 = w.execute()
      assert(e1.size == 1, e1)
      val PollWatch.Data(vals) = e1.head: @unchecked
      assert(vals.exists { case (k, v) => k.equalsIgnoreCase("VALUE") && v == 1.5 }, vals)
      // no change → nothing
      assert(w.execute().isEmpty)
      // newer row → exactly one event with the newest value
      TagTables.insert(spark, "watch_tag", Seq("NAME", "TIME", "VALUE"),
        Seq("temp", Long.box(t0 + 1000000000L), Double.box(2.5)))
      val e2 = w.execute()
      assert(e2.size == 1, e2)
      val PollWatch.Data(vals2) = e2.head: @unchecked
      assert(vals2.exists { case (k, v) => k.equalsIgnoreCase("VALUE") && v == 2.5 }, vals2)
      // an OLDER (late) row does not re-fire
      TagTables.insert(spark, "watch_tag", Seq("NAME", "TIME", "VALUE"),
        Seq("temp", Long.box(t0 - 1000000000L), Double.box(0.5)))
      assert(w.execute().isEmpty)
    } finally {
      QueryDoor.execute(spark, "drop table watch_tag")
      TagTables.resetDynamicForTest(spark)
    }
  }

  test("watcher init errors use the reference reasons") {
    TagTables.resetDynamicForTest(spark)
    val missing = intercept[IllegalArgumentException](
      new PollWatch.Watcher(spark, "no_such_watch_table"))
    assert(missing.getMessage == "table 'no_such_watch_table' does not exist")
    QueryDoor.execute(spark,
      "create tag table watch_err (NAME varchar(100) primary key, TIME datetime basetime, VALUE double summarized)")
    try {
      val noTags = intercept[IllegalArgumentException](
        new PollWatch.Watcher(spark, "watch_err"))
      assert(noTags.getMessage == "table 'watch_err' is TAG table, no tag specified")
    } finally {
      QueryDoor.execute(spark, "drop table watch_err")
      TagTables.resetDynamicForTest(spark)
    }
  }

  test("log watch tails arrivals; max-rows overflow emits the reference error and resets") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create log table watch_log (sev integer, msg varchar(100))")
    try {
      var clock = t0
      TagTables.arrivalClock = () => { clock += 1000000L; clock }
      def add(n: Int, base: Int = 0): Unit = (1 to n).foreach { i =>
        TagTables.insert(spark, "watch_log", Seq("sev", "msg"),
          Seq(Int.box(base + i), s"m${base + i}"))
      }
      add(2)
      val w = new PollWatch.Watcher(spark, "watch_log", maxRowNum0 = 3)
      // first poll records the high-water mark, emits nothing
      assert(w.execute().isEmpty)
      // two fresh rows arrive → two events in arrival order
      add(2, base = 10)
      val e = w.execute()
      assert(e.size == 2, e)
      assert(e.collect { case PollWatch.Data(v) =>
        v.collectFirst { case (k, x) if k.equalsIgnoreCase("sev") => x }
      } == Seq(Some(11), Some(12)), e)
      // burst beyond max-rows → capped rows + the error, mark reset
      add(5, base = 20)
      val burst = w.execute()
      assert(burst.size == 4, burst)
      assert(burst.last == PollWatch.Err("too many changes, omit the rest"), burst)
      // after the reset, the next poll only re-records the mark
      assert(w.execute().isEmpty)
    } finally {
      TagTables.arrivalClock = () => System.currentTimeMillis() * 1000000L
      QueryDoor.execute(spark, "drop table watch_log")
      TagTables.resetDynamicForTest(spark)
    }
  }

  test("SSE frames: data with sorted keys, error, keep-alive (http_query.go:169-196)") {
    val frames = PollWatch.sse(Seq(
      PollWatch.Data(Seq("VALUE" -> 1.5, "NAME" -> "temp", "TIME" -> t0)),
      PollWatch.Err("boom")))
    assert(frames ==
      s"""data: {"NAME":"temp","TIME":$t0,"VALUE":1.5}\n\nerror: boom\n\n""", frames)
    assert(PollWatch.keepAlive == ": keep-alive\n\n")
  }
}
