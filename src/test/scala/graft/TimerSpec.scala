package graft

import java.time.Instant

import graft.scheduler.{Cron, Timers}
import graft.scheduler.Timers._

/** Timer scheduler parity with mods/scheduler/registry_timer_test.go and
  * sched_timer.go, plus cron-spec semantics and a pinned-clock run that
  * drives a real TQL task into a tag table. */
class TimerSpec extends SparkSpec {

  private def newService(loader: TqlLoader = okLoader): Service =
    new Service(() => spark, loader)

  private val okLoader: TqlLoader = (_: String) =>
    Right("FAKE(linspace(0, 1, 2))\nDISCARD()\n")
  private def failLoader(msg: String): TqlLoader = (_: String) => Left(msg)

  // ---- BaseEntry (registry_timer_test.go:65-80) ------------------------

  test("BaseEntry state, error and default Start/Stop") {
    val ent = new BaseEntry("entry", State.Starting, true)
    assert(ent.name == "entry")
    assert(ent.autoStart)
    assert(ent.status == State.Starting)
    assert(ent.start() == Left("Start() is not implemented"))
    assert(ent.stop() == Left("Stop() is not implemented"))
    ent.setError(Some("failed"))
    assert(ent.error.contains("failed"))
    ent.setStateError(State.Failed, Some("failed"))
    assert(ent.statusError == (State.Failed, Some("failed")))
  }

  // ---- registry (registry_timer_test.go:82-141) ------------------------

  test("registry: uppercase keying, case-insensitive get, unregister stops") {
    val svc = newService()
    assert(svc.register(ScheduleDef("mixed_case", "timer", autoStart = false,
      task = "timer.tql", schedule = "*/5 * * * *")).isRight)
    val ent = svc.getEntry("MIXED_case").get
    assert(svc.getEntry("mixed_case").contains(ent))
    ent.start()
    assert(ent.status == State.Running)
    svc.unregister("mixed_CASE")
    assert(ent.status == State.Stop) // Unregister stops the entry
    assert(svc.getEntry("mixed_case").isEmpty)
  }

  test("register timer and subscriber; unknown type is an error") {
    val svc = newService()
    assert(svc.register(ScheduleDef("timer_one", "timer", autoStart = false,
      task = "timer.tql", schedule = "*/5 * * * *")).isRight)
    assert(svc.getEntry("TIMER_ONE").isDefined)
    assert(svc.register(ScheduleDef("subscriber_one", "subscriber",
      autoStart = false, task = "db/append/table",
      bridge = "missing", topic = "topic/a")).isRight)
    assert(svc.getEntry("subscriber_one").isDefined)
    assert(svc.register(ScheduleDef("bad", "bad", autoStart = false, task = ""))
      == Left("undefined schedule type"))
  }

  test("register-time load failure flips the entry to FAILED") {
    val svc = newService(failLoader("load failed"))
    assert(svc.register(ScheduleDef("timer_fail", "timer", autoStart = false,
      task = "missing.tql", schedule = "*/5 * * * *")) == Left("load failed"))
    assert(svc.getEntry("timer_fail").get.status == State.Failed)
  }

  // ---- TimerEntry (registry_timer_test.go:143-173) ----------------------

  test("TimerEntry validation and start/stop states") {
    val svc = newService()
    val missingSchedule = new TimerEntry(svc, "missing_schedule", "task.tql", "", false)
    assert(missingSchedule.start() == Left("invalid configure - missing Schedule"))
    assert(missingSchedule.status == State.Failed)

    val missingTask = new TimerEntry(svc, "missing_task", "", "*/5 * * * *", false)
    assert(missingTask.start() == Left("invalid configure - missing Task"))
    assert(missingTask.status == State.Failed)

    val valid = new TimerEntry(svc, "valid", "task.tql", "*/5 * * * *", false)
    assert(valid.start().isRight)
    assert(valid.status == State.Running)
    assert(valid.stop().isRight)
    assert(valid.status == State.Stop)
  }

  test("doTask load failure fails then stops the entry") {
    val svc = newService(failLoader("load failed"))
    val ent = new TimerEntry(svc, "task_fail", "task.tql", "*/5 * * * *", false)
    assert(ent.start().isRight)
    assert(ent.status == State.Running)
    ent.doTask()
    assert(ent.status == State.Stop)
    assert(ent.error.contains("load failed"))
  }

  // ---- subscriber entries (registry_timer_test.go:175-241) --------------

  test("subscriber start fails on undefined bridge / empty topic") {
    graft.server.Bridge.resetForTest()
    val svc = newService()
    svc.register(ScheduleDef("sub", "subscriber", autoStart = false,
      task = "db/append/table", bridge = "missing", topic = "topic/a"))
    val ent = svc.getEntry("sub").get
    assert(ent.start() == Left("undefined bridge name 'missing'"))
    assert(ent.status == State.Failed)
    assert(ent.error.isDefined)

    graft.server.Bridge("mqtt_sub") // define the bridge
    svc.register(ScheduleDef("empty_topic", "subscriber", autoStart = false,
      task = "db/append/table", bridge = "mqtt_sub", topic = ""))
    val et = svc.getEntry("empty_topic").get
    assert(et.start().swap.exists(_.startsWith("empty topic is not allowed")))
    assert(et.status == State.Failed)
    assert(et.stop().isRight)
    assert(et.status == State.Stop)
  }

  // ---- management ops (management.go + http_facility_test.go) -----------

  test("addSchedule validations use the reference reasons") {
    val svc = newService()
    assert(svc.addSchedule("x" * 41, "timer", autoStart = false,
      schedule = "0 30 * * * *", task = "t.tql").reason
      == "name is too long, should be shorter than 40 characters")
    assert(svc.addSchedule("t1", "bogus", autoStart = false,
      schedule = "", task = "").reason == "schedule type 'bogus' is undefined")
    assert(svc.addSchedule("t1", "timer", autoStart = false,
      schedule = "", task = "t.tql").reason
      == "schedule of timer type should be specified with timer spec")
    assert(svc.addSchedule("t1", "timer", autoStart = false,
      schedule = "0 30 * * * *", task = "").reason
      == "destination task (tql path) is not specified")
    // the http test's invalid spec: "* * a b c d "
    val bad = svc.addSchedule("t1", "timer", autoStart = false,
      schedule = "* * a b c d ", task = "t.tql")
    assert(!bad.success && bad.reason.startsWith("invalid schedule, "), bad.reason)
    assert(svc.addSchedule("sub1", "subscriber", autoStart = false,
      schedule = "", task = "t.tql", bridge = "", topic = "").reason
      == "schedule of subscriber type should be specified with bridge and topic")
  }

  test("timer lifecycle through management: add, state, update, delete") {
    val svc = newService()
    val add = svc.addSchedule("timer_web", "timer", autoStart = false,
      schedule = "0 30 * * * *", task = "report.tql")
    assert(add.success, add.reason)
    // names are stored uppercase (the http test GETs ToUpper(name))
    assert(svc.getSchedule("timer_web").exists(_.name == "TIMER_WEB"))
    assert(svc.getSchedule("timer_web").exists(_.state == "STOP"))

    assert(svc.startSchedule("timer_web").success)
    assert(svc.getSchedule("timer_web").exists(_.state == "RUNNING"))
    assert(!svc.startSchedule("nope").success)
    assert(svc.startSchedule("nope").reason == "schedule 'nope' is not found")

    assert(svc.stopSchedule("timer_web").success)
    assert(svc.getSchedule("timer_web").exists(_.state == "STOP"))

    val upd = svc.updateSchedule("timer_web", autoStart = true,
      schedule = "0 0 1 * * *", task = "report2.tql")
    assert(upd.success, upd.reason)
    val row = svc.getSchedule("timer_web").get
    assert(row.schedule == "0 0 1 * * *" && row.task == "report2.tql" && row.autoStart)
    // autoStart=true on an initial (re)register starts the entry
    assert(!svc.updateSchedule("ghost", autoStart = false,
      schedule = "0 0 1 * * *", task = "x").success)

    assert(svc.delSchedule("timer_web").success)
    assert(svc.getSchedule("timer_web").isEmpty)
    assert(svc.getEntry("timer_web").isEmpty)
  }

  // ---- cron spec semantics ----------------------------------------------

  private def next(spec: String, after: String): String = {
    val s = Cron.parse(spec).fold(e => fail(e), identity)
    s.next(Instant.parse(after), java.time.ZoneId.of("UTC"))
      .map(_.toString).getOrElse("none")
  }

  test("cron next-fire: fields, steps, names, dom/dow or-rule") {
    assert(next("0 30 * * * *", "2026-08-12T10:05:00Z") == "2026-08-12T10:30:00Z")
    assert(next("*/15 * * * * *", "2026-08-12T10:05:07Z") == "2026-08-12T10:05:15Z")
    assert(next("0 */5 * * * *", "2026-08-12T10:02:00Z") == "2026-08-12T10:05:00Z")
    // 5-field specs pin the second to 0
    assert(next("*/5 * * * *", "2026-08-12T10:02:30Z") == "2026-08-12T10:05:00Z")
    assert(next("0 0 0 1 1 *", "2026-08-12T00:00:00Z") == "2027-01-01T00:00:00Z")
    assert(next("0 0 12 * JAN MON", "2026-01-01T00:00:00Z") == "2026-01-05T12:00:00Z")
    // dom/dow both restricted: OR (standard cron rule) — Aug 1 2026 is a
    // Saturday; "day 15 or any Friday" fires Friday Aug 7 first
    assert(next("0 0 0 15 8 FRI", "2026-08-01T00:00:00Z") == "2026-08-07T00:00:00Z")
    // only dom restricted: dow is star, so dom alone decides
    assert(next("0 0 0 15 8 *", "2026-08-01T00:00:00Z") == "2026-08-15T00:00:00Z")
    assert(next("@daily", "2026-08-12T10:05:00Z") == "2026-08-13T00:00:00Z")
    assert(next("@hourly", "2026-08-12T10:05:00Z") == "2026-08-12T11:00:00Z")
    assert(next("@every 90s", "2026-08-12T10:05:07.4Z") == "2026-08-12T10:06:37Z")
  }

  test("cron parse errors in the reference phrasing") {
    assert(Cron.parse("* * a b c d").swap.exists(_.startsWith("failed to parse int from a")))
    assert(Cron.parse("* * * *").swap.exists(_.contains("expected exactly 6 fields, found 4")))
    assert(Cron.parse("61 * * * * *").swap.exists(_.contains("above maximum")))
    assert(Cron.parse("5-1 * * * * *").swap.exists(_.contains("beyond end of range")))
    assert(Cron.parse("@fortnightly").swap.exists(_.startsWith("unrecognized descriptor")))
    assert(Cron.parse("@every bogus").swap.exists(_.startsWith("failed to parse duration")))
  }

  // ---- pinned-clock execution -------------------------------------------

  test("timer fires on schedule under the pinned clock and runs its TQL") {
    graft.server.TagTables.dropAll(spark)
    val script =
      """FAKE(linspace(0, 1, 2))
        |MAPVALUE(0, value(0), 'value')
        |PUSHVALUE(0, 'tick', 'name')
        |PUSHVALUE(1, 1692686707380411000, 'time')
        |INSERT('name', 'time', 'value', table('tag_simple'))
        |""".stripMargin
    val svc = newService((_: String) => Right(script))
    svc.crons.now = Instant.parse("2026-08-12T00:00:00Z")
    assert(svc.addSchedule("tick", "timer", autoStart = true,
      schedule = "0 */10 * * * *", task = "tick.tql").success)
    assert(svc.getSchedule("tick").exists(_.state == "RUNNING"))

    // 35 minutes pass: fires at :10, :20, :30 → 3 runs × 2 rows
    val fired = svc.crons.advanceTo(Instant.parse("2026-08-12T00:35:00Z"))
    assert(fired == 3, s"fired=$fired")
    graft.server.TagTables.ensure(spark, "tag_simple")
    val n = spark.table("tag_simple").where("name = 'tick'").count()
    assert(n == 6, s"rows=$n")

    // a failing task flips to FAILED and stops: no more activations
    val badSvc = newService((_: String) => Right("SQL(\"select * from no_such\")\nDISCARD()\n"))
    badSvc.crons.now = Instant.parse("2026-08-12T00:00:00Z")
    badSvc.addSchedule("boom", "timer", autoStart = true,
      schedule = "0 */10 * * * *", task = "boom.tql")
    badSvc.crons.advanceTo(Instant.parse("2026-08-12T01:00:00Z"))
    assert(badSvc.getEntry("boom").get.status == State.Stop)
    assert(badSvc.getEntry("boom").get.error.isDefined)
    assert(badSvc.crons.size == 0) // descheduled after the failure
    graft.server.TagTables.dropAll(spark)
  }

  // ---- SHOW TIMERS -------------------------------------------------------

  test("SHOW TIMERS lists timer schedules with live state") {
    Timers.resetForTest()
    val svc = newService()
    Timers.setDefaultService(svc)
    svc.addSchedule("morning", "timer", autoStart = false,
      schedule = "0 0 8 * * *", task = "morning.tql")
    svc.addSchedule("sub_x", "subscriber", autoStart = false,
      schedule = "", task = "db/append/t", bridge = "b", topic = "t")
    val df = graft.server.QueryDoor.execute(spark, "show timers")
    assert(df.columns.toSeq == Seq("NAME", "SPEC", "TQL", "AUTOSTART", "STATE"))
    val rows = df.collect()
    assert(rows.length == 1) // subscribers are filtered out
    val r = rows.head
    assert(r.getString(0) == "MORNING" && r.getString(1) == "0 0 8 * * *" &&
      r.getString(2) == "morning.tql" && !r.getBoolean(3) && r.getString(4) == "STOP")
    Timers.resetForTest()
  }
}
