package graft.scheduler

import java.time.{Instant, ZoneId}
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Timer scheduler: cron-driven TQL tasks with the reference's entry
  * life-cycle and management wire shapes.
  *
  * Reference behavior reimplemented (not copied):
  *   - entry states and transitions — mods/scheduler/registry.go:11-37
  *     (UNKNOWN/FAILED/STOP/STOPPING/STARTING/RUNNING) and the
  *     BaseEntry state/error accessors (registry.go:48-111);
  *   - TimerEntry validation + task run — sched_timer.go:39-108
  *     ("invalid configure - missing Schedule"/"missing Task"; a failed
  *     load/compile/run sets FAILED then stops the entry);
  *   - registry semantics — registry.go:116-206 (uppercase keying,
  *     re-register of a RUNNING timer restarts it, load-check flips the
  *     entry to FAILED, Unregister stops);
  *   - management ops + JSON shapes — management.go:12-356 and the
  *     /web/api/timers handlers (http_facility.go:19-320).
  *
  * Spark-first: there is no goroutine pool — fire times are evaluated
  * against an injectable clock (`Crons.advanceTo`), so specs and the
  * driver run deterministic schedules, and each fired task executes a
  * compiled TQL pipeline on the shared SparkSession. A deployment wires
  * `advanceTo` to a real ticker (or a Structured Streaming
  * `Trigger.ProcessingTime` loop); the scheduling semantics are
  * identical because they only depend on the instant passed in.
  */
object Timers {
  sealed abstract class State(val label: String) { override def toString: String = label }
  object State {
    case object Unknown extends State("UNKNOWN")
    case object Failed extends State("FAILED")
    case object Stop extends State("STOP")
    case object Stopping extends State("STOPPING")
    case object Starting extends State("STARTING")
    case object Running extends State("RUNNING")
  }
  import State._

  /** Loads a task path to TQL text (reference tql.Loader). */
  trait TqlLoader { def load(path: String): Either[String, String] }

  /** Task scripts resolved under a root directory. */
  final class DirLoader(root: java.nio.file.Path) extends TqlLoader {
    def load(path: String): Either[String, String] = {
      val f = root.resolve(path.stripPrefix("/"))
      if (!java.nio.file.Files.isRegularFile(f)) Left(s"not found '$path'")
      else Right(new String(java.nio.file.Files.readAllBytes(f), "UTF-8"))
    }
  }

  /** model.ScheduleDefinition equivalent (scheduledef.go). */
  final case class ScheduleDef(name: String, typ: String, autoStart: Boolean,
                               task: String, schedule: String = "",
                               bridge: String = "", topic: String = "",
                               qos: Int = 0, queueName: String = "")

  trait Entry {
    def name: String
    def start(): Either[String, Unit]
    def stop(): Either[String, Unit]
    def status: State
    def autoStart: Boolean
    def error: Option[String]
  }

  /** State/error holder with the reference's default unimplemented
    * Start/Stop (registry.go:64-70). */
  class BaseEntry(val name: String, initState: State,
                  val autoStart: Boolean) extends Entry {
    @volatile private var st: State = initState
    @volatile private var err: Option[String] = None
    def status: State = st
    def error: Option[String] = err
    private[graft] def setState(s: State): Unit = st = s
    private[graft] def setError(e: Option[String]): Unit = err = e
    private[graft] def setStateError(s: State, e: Option[String]): Unit = { st = s; err = e }
    private[graft] def statusError: (State, Option[String]) = (st, err)
    def start(): Either[String, Unit] = Left("Start() is not implemented")
    def stop(): Either[String, Unit] = Left("Stop() is not implemented")
  }

  /** Deterministic cron dispatcher: jobs fire when `advanceTo` crosses
    * their next activation, in activation order. */
  final class Crons(val zone: ZoneId = ZoneId.of("UTC")) {
    private case class Job(id: Long, sched: Cron.Schedule, fn: () => Unit, var nextAt: Option[Instant])
    private val jobs = mutable.LinkedHashMap.empty[Long, Job]
    private var seq = 0L
    @volatile var now: Instant = Instant.EPOCH

    def add(spec: String, fn: () => Unit): Either[String, Long] =
      Cron.parse(spec).map { sched =>
        seq += 1
        jobs(seq) = Job(seq, sched, fn, sched.next(now, zone))
        seq
      }
    def remove(id: Long): Unit = jobs.remove(id)
    def size: Int = jobs.size

    /** Fire everything due in (now, t], in time order; pin clock to t. */
    def advanceTo(t: Instant): Int = {
      var fired = 0
      var continue = true
      while (continue) {
        val due = jobs.values.filter(j => j.nextAt.exists(!_.isAfter(t)))
        if (due.isEmpty) continue = false
        else {
          val j = due.minBy(_.nextAt.get)
          now = j.nextAt.get
          j.nextAt = j.sched.next(now, zone)
          j.fn()
          fired += 1
        }
      }
      now = t
      fired
    }
  }

  /** sched_timer.go TimerEntry: validate on start, run the TQL task on
    * each activation, fail-and-stop on load/compile/run errors. */
  final class TimerEntry(svc: Service, name: String, val taskTql: String,
                         val schedule: String, autoStart: Boolean)
    extends BaseEntry(name, Stop, autoStart) {
    private var entryId: Option[Long] = None

    override def start(): Either[String, Unit] = {
      setStateError(Starting, None)
      if (schedule.isEmpty) {
        val e = "invalid configure - missing Schedule"
        setStateError(Failed, Some(e)); return Left(e)
      }
      if (taskTql.isEmpty) {
        val e = "invalid configure - missing Task"
        setStateError(Failed, Some(e)); return Left(e)
      }
      svc.crons.add(schedule, () => doTask()) match {
        case Left(e) => setStateError(Failed, Some(e)); Left(e)
        case Right(id) => entryId = Some(id); setState(Running); Right(())
      }
    }

    override def stop(): Either[String, Unit] = {
      val prev = status
      setState(Stopping)
      try {
        entryId.foreach(svc.crons.remove)
        entryId = None
        setState(Stop)
        Right(())
      } finally if (status != Stop) setState(prev)
    }

    /** One activation (sched_timer.go:75-108). */
    private[graft] def doTask(): Unit = {
      svc.loader.load(taskTql) match {
        case Left(e) => setStateError(Failed, Some(e)); stop()
        case Right(script) =>
          try {
            svc.runTask(script)
            setError(None)
          } catch {
            case e: Exception =>
              setStateError(Failed, Some(Option(e.getMessage).getOrElse(e.toString)))
              stop()
          }
      }
    }
  }

  /** Registry + store + management facade. One per SparkSession in
    * practice; specs construct their own for isolation. */
  final class Service(spark: () => SparkSession, val loader: TqlLoader,
                      val crons: Crons = new Crons()) {
    private val registry = mutable.LinkedHashMap.empty[String, Entry]
    private val store = mutable.LinkedHashMap.empty[String, ScheduleDef]

    /** Executes one timer task; output is discarded like the reference's
      * io.Discard JSON writer (sched_timer.go:95). */
    private[scheduler] def runTask(script: String): Unit = {
      val s = spark()
      graft.tql.Compiler.run(s, script)
      ()
    }

    // ---- registry (registry.go:116-206) --------------------------------
    def register(d: ScheduleDef): Either[String, Unit] = {
      val key = d.name.toUpperCase
      var initRegister = false
      var wasRunning = false
      d.typ.toLowerCase match {
        case "timer" =>
          registry.get(key) match {
            case Some(prev) if prev.status == Running =>
              prev.stop() match {
                case Left(e) => return Left(e)
                case _ => wasRunning = true
              }
            case Some(_) =>
            case None => initRegister = true
          }
          val ent = new TimerEntry(this, d.name, d.task, d.schedule, d.autoStart)
          registry(key) = ent
          // register-time load check (registry.go:152-159)
          loader.load(d.task) match {
            case Left(e) => ent.setState(Failed); return Left(e)
            case _ =>
          }
          if (initRegister) {
            if (ent.autoStart) ent.start()
            Right(())
          } else {
            if (wasRunning) ent.start()
            Right(())
          }
        case "subscriber" =>
          registry(key) = new SubscriberEntry(this, d)
          Right(())
        case _ => Left("undefined schedule type")
      }
    }

    def unregister(name: String): Unit =
      registry.remove(name.toUpperCase).foreach(_.stop())
    def unregisterAll(): Unit = registry.keys.toSeq.foreach(unregister)
    def getEntry(name: String): Option[Entry] = registry.get(name.toUpperCase)

    // ---- management ops (management.go) --------------------------------
    final case class Result(success: Boolean, reason: String)
    private def ok = Result(success = true, "success")

    def addSchedule(name: String, typ: String, autoStart: Boolean,
                    schedule: String, task: String,
                    bridge: String = "", topic: String = "",
                    qos: Int = 0): Result = {
      if (name.length > 40)
        return Result(success = false, "name is too long, should be shorter than 40 characters")
      typ.toLowerCase match {
        case "timer" =>
          if (schedule.isEmpty)
            return Result(success = false, "schedule of timer type should be specified with timer spec")
          if (task.isEmpty)
            return Result(success = false, "destination task (tql path) is not specified")
          Cron.parse(schedule) match {
            case Left(e) => return Result(success = false, s"invalid schedule, $e")
            case _ =>
          }
        case "subscriber" =>
          if (bridge.isEmpty || topic.isEmpty)
            return Result(success = false, "schedule of subscriber type should be specified with bridge and topic")
          if (task.isEmpty)
            return Result(success = false, "destination task (tql path) is not specified")
        case other =>
          return Result(success = false, s"schedule type '$other' is undefined")
      }
      val d = ScheduleDef(name.toUpperCase, typ.toLowerCase, autoStart, task,
        schedule, bridge, topic, qos)
      store(d.name) = d
      register(d) match {
        case Left(e) => Result(success = false, e)
        case _ => ok
      }
    }

    def delSchedule(name: String): Result = {
      // removing an unknown schedule fails like the reference's
      // os.Remove of the missing definition file (model.go:142-146)
      if (store.remove(name.toUpperCase).isEmpty)
        return Result(success = false,
          s"remove ${name.toUpperCase}.json: no such file or directory")
      unregister(name)
      ok
    }

    def updateSchedule(name: String, autoStart: Boolean, schedule: String,
                       task: String): Result = {
      if (getEntry(name).isEmpty)
        return Result(success = false, s"schedule '$name' is not found")
      Cron.parse(schedule) match {
        case Left(e) => return Result(success = false, s"invalid schedule, $e")
        case _ =>
      }
      val d = ScheduleDef(name.toUpperCase, "timer", autoStart, task, schedule)
      store(d.name) = d
      register(d) match {
        case Left(e) => Result(success = false, e)
        case _ => ok
      }
    }

    def startSchedule(name: String): Result = getEntry(name) match {
      case None => Result(success = false, s"schedule '$name' is not found")
      case Some(ent) => ent.start() match {
        case Left(e) => Result(success = false, s"schedule '$name' fail to start; $e")
        case _ => ok
      }
    }

    def stopSchedule(name: String): Result = getEntry(name) match {
      case None => Result(success = false, s"schedule '$name' is not found")
      case Some(ent) => ent.stop() match {
        case Left(e) => Result(success = false, s"schedule '$name' fail to stop; $e")
        case _ => ok
      }
    }

    /** Schedule wire rows (management.go:19-29): state comes from the
      * live entry, "STATE, err" form when the entry carries an error. */
    def listSchedules(): Seq[ScheduleRow] = store.values.toSeq.map { d =>
      val state = getEntry(d.name) match {
        case None => Unknown.label
        case Some(ent) => ent.error match {
          case Some(e) => s"${ent.status}, $e"
          case None => ent.status.label
        }
      }
      ScheduleRow(d.name, d.typ.toUpperCase, d.autoStart, state, d.task,
        d.schedule, d.bridge, d.topic, d.qos)
    }

    def getSchedule(name: String): Option[ScheduleRow] =
      listSchedules().find(_.name.equalsIgnoreCase(name))

    /** SHOW TIMERS result set: the shell's timer listing columns. */
    def showTimers(sparkSession: SparkSession): DataFrame = {
      val rows = listSchedules().filter(_.typ == "TIMER").map { s =>
        Row(s.name, s.schedule, s.task, s.autoStart, s.state)
      }
      val schema = StructType(Seq(
        StructField("NAME", StringType),
        StructField("SPEC", StringType),
        StructField("TQL", StringType),
        StructField("AUTOSTART", BooleanType),
        StructField("STATE", StringType)))
      sparkSession.createDataFrame(new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    }

    /** SHOW SUBSCRIBERS result set (console listing of the SUBSCRIBER
      * schedules served by /web/api/subscribers). */
    def showSubscribers(sparkSession: SparkSession): DataFrame = {
      val rows = listSchedules().filter(_.typ == "SUBSCRIBER").sortBy(_.name).map { s =>
        Row(s.name, s.bridge, s.topic, s.task, s.autoStart, s.state)
      }
      val schema = StructType(Seq(
        StructField("NAME", StringType),
        StructField("BRIDGE", StringType),
        StructField("TOPIC", StringType),
        StructField("TQL", StringType),
        StructField("AUTOSTART", BooleanType),
        StructField("STATE", StringType)))
      sparkSession.createDataFrame(new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    }
  }

  final case class ScheduleRow(name: String, typ: String, autoStart: Boolean,
                               state: String, task: String, schedule: String,
                               bridge: String, topic: String, qos: Int = 0)

  /** Subscriber entries need a broker bridge; the container has none, so
    * start() resolves the bridge by name and fails with the reference's
    * message when undefined (sched_subs.go via registry_timer_test.go).
    * The per-message task dispatch shape is exercised through
    * [[graft.streaming.Subscribers]] over a file queue. */
  final class SubscriberEntry(svc: Service, d: ScheduleDef)
    extends BaseEntry(d.name, Stop, d.autoStart) {
    val taskTql: String = d.task
    override def start(): Either[String, Unit] = {
      setState(Starting)
      if (!graft.server.Bridge.exists(d.bridge)) {
        val e = s"undefined bridge name '${d.bridge}'"
        setStateError(Failed, Some(e)); return Left(e)
      }
      if (d.topic.isEmpty) {
        val e = s"empty topic is not allowed, subscribe to bridge '${d.bridge}'"
        setStateError(Failed, Some(e)); return Left(e)
      }
      setState(Running)
      Right(())
    }
    override def stop(): Either[String, Unit] = { setState(Stop); Right(()) }
  }

  /** Default shared service wired lazily by the server front doors. */
  @volatile private var default: Option[Service] = None
  def defaultService(spark: SparkSession): Service = {
    default.getOrElse {
      val svc = new Service(() => spark,
        new DirLoader(java.nio.file.Paths.get(graft.tql.Compiler.templateRoot)))
      default = Some(svc)
      svc
    }
  }
  def setDefaultService(svc: Service): Unit = default = Some(svc)
  def resetForTest(): Unit = { default.foreach(_.unregisterAll()); default = None }
}
