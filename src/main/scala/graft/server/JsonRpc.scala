package graft.server

import scala.collection.mutable
import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

import org.apache.spark.sql.SparkSession

import graft.script.Builtins

/** JSON-RPC 2.0 controller behind `POST /web/api/rpc` and the console
  * WebSocket (reference mods/server/http_rpc.go:71-127 handleHttpRpc,
  * jsh/service/rpc.go:553-565 CallJsonRpc, method registrations
  * server.go:1144-1198).
  *
  * Error contract (http_rpc.go:110-121): unknown method → -32601 with the
  * wire message "Method not found"; handler failures surface as -32000
  * (the internal -32603 is remapped); malformed request JSON → -32700
  * "Parse error"; the HTTP status is always 200 per the JSON-RPC spec.
  *
  * Handlers return JSON-able values (the Builtins.jsonParse value model:
  * LinkedHashMap / ArrayBuffer / Long / Double / String / Boolean / null).
  */
object JsonRpc {

  final class RpcException(val code: Int, message: String)
    extends RuntimeException(message)

  type Handler = (SparkSession, Seq[Any]) => Any

  private def obj(kv: (String, Any)*): LinkedHashMap[String, Any] =
    LinkedHashMap(kv: _*)
  private def arr(items: Seq[Any]): ArrayBuffer[Any] =
    ArrayBuffer(items: _*)

  private def str(params: Seq[Any], i: Int): String =
    params.lift(i) match {
      case Some(s: String) => s
      case Some(null) | None => ""
      case Some(other) => String.valueOf(other)
    }
  private def bool(params: Seq[Any], i: Int): Boolean =
    params.lift(i).contains(java.lang.Boolean.TRUE)
  private def objParam(params: Seq[Any], i: Int): collection.Map[String, Any] =
    params.lift(i) match {
      case Some(m: collection.Map[_, _]) => m.asInstanceOf[collection.Map[String, Any]]
      case _ => throw new RpcException(-32602, "Invalid params")
    }
  private def mapStr(m: collection.Map[String, Any], k: String): String =
    m.get(k) match {
      case Some(s: String) => s
      case Some(null) | None => ""
      case Some(other) => String.valueOf(other)
    }
  private def fail(reason: String): Nothing =
    throw new RpcException(-32603, reason)

  // ---- bridge.query cursor registry (server.go:1638-1740) ---------------
  private val cursors =
    new java.util.concurrent.ConcurrentHashMap[String, Iterator[Seq[Any]]]()
  private val cursorSeq = new java.util.concurrent.atomic.AtomicLong()

  // ---- session pool model (server.go:2181-2236 SessionLimit defaults) ----
  private val sessionLimit = new java.util.concurrent.atomic.AtomicReference(
    (40, 10, "5m0s", "1h0m0s"))
  private val httpDebug = new java.util.concurrent.atomic.AtomicReference(
    (false, -1L))

  /** The registered method table. Each entry mirrors one
    * RegisterJsonRpcHandler line (server.go:1144-1198); handlers that the
    * reference backs with jsh/auth/UI subsystems (shell.*, sshkey.*,
    * key.*, lsp.*) are deliberately absent and reply -32601. */
  private lazy val builtin: Map[String, Handler] = Map(
    // ---- vizspec doors (server.go:1145-1148, jsh/viz/viz.go) -----------
    "vizspec.render" -> ((_, p) => Vizspec.render(objParam(p, 0))),
    "vizspec.export" -> ((_, p) =>
      Vizspec.exportSpec(objParam(p, 0), if (p.size > 1) str(p, 1) else "")),
    "server.info.statz" -> ((_, p) => {
      val names = p.headOption.map {
        case s: collection.Seq[_] => s.map(_.toString).toSeq
        case one => Seq(one.toString)
      }.getOrElse(Seq.empty)
      Vizspec.statz(names)
    }),
    "markdown.render" -> ((_, p) =>
      Markdown.render(str(p, 0), bool(p, 1), str(p, 2))),

    "server.info.get" -> ((_, _) => {
      val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
      val mem = Runtime.getRuntime
      obj(
        "version" -> obj(
          "Engine" -> "graft-spark",
          "Major" -> 8L, "Minor" -> 0L, "Patch" -> 0L,
          "GitSHA" -> "", "BuildTimestamp" -> "", "BuildCompiler" -> "scala"),
        "runtime" -> obj(
          "OS" -> System.getProperty("os.name").toLowerCase.split("\\s+")(0),
          "Arch" -> System.getProperty("os.arch"),
          "Pid" -> rt.getPid,
          "UptimeInSecond" -> rt.getUptime / 1000L,
          "Processes" -> Runtime.getRuntime.availableProcessors().toLong,
          "Goroutines" -> Thread.activeCount().toLong,
          "Mem" -> obj(
            "sys" -> mem.totalMemory(),
            "heap_alloc" -> (mem.totalMemory() - mem.freeMemory()),
            "heap_sys" -> mem.maxMemory())))
    }),

    "sql.split" -> ((_, p) =>
      Builtins.jsonParse(Splitters.splitSqlStatements(str(p, 0))
        .map(_.toJson).mkString("[", ",", "]"))),
    "http.split" -> ((_, p) =>
      Builtins.jsonParse(Splitters.splitHttpStatements(str(p, 0))
        .map(_.toJson).mkString("[", ",", "]"))),

    // ---- bridge management (server.go:1451-1740) -----------------------
    "bridge.list" -> ((_, _) => arr(Bridge.list.map { case (n, t, pth) =>
      obj("name" -> n, "type" -> t, "path" -> pth)
    })),
    "bridge.get" -> ((_, p) => {
      val name = str(p, 0)
      Bridge.list.find(_._1.equalsIgnoreCase(name)) match {
        case None => fail(s"open ${name.toLowerCase}.json: no such file or directory")
        case Some((n, t, pth)) => obj("name" -> n, "type" -> t, "path" -> pth)
      }
    }),
    "bridge.add" -> ((_, p) => {
      val r = Bridge.addBridge(str(p, 0), str(p, 1), str(p, 2))
      if (!r.success) fail(r.reason)
      null
    }),
    "bridge.delete" -> ((spark, p) => {
      val name = str(p, 0)
      // a bridge with subscribers refuses to go (server.go:1512-1531)
      val subs = graft.scheduler.Timers.defaultService(spark).listSchedules()
        .filter(s => s.bridge.equalsIgnoreCase(name)).map(_.name)
      if (subs.length == 1) fail(s"""bridge "$name" has a subscriber, ${subs.head}""")
      if (subs.length > 1) fail(s"""bridge "$name" has subscribers, ${subs.mkString(",")}""")
      val r = Bridge.delBridge(name)
      if (!r.success) fail(r.reason)
      null
    }),
    "bridge.test" -> ((_, p) => {
      val r = Bridge.testBridge(str(p, 0))
      if (!r.success) fail(r.reason)
      java.lang.Boolean.TRUE
    }),
    "bridge.stats" -> ((_, p) => {
      val name = str(p, 0)
      // only broker bridges carry runtime stats; sql bridges refuse
      // (reference bridge service StatsBridge for non-broker types)
      Bridge.typeOf(name) match {
        case None => fail(s"bridge '$name' is not found")
        case Some(t) if t != "mqtt" && t != "nats" =>
          fail(s"bridge '$name' ($t) does not support stats")
        case Some(_) =>
          obj("InMsgs" -> 0L, "InBytes" -> 0L, "OutMsgs" -> 0L,
            "OutBytes" -> 0L, "Inserted" -> 0L, "Appended" -> 0L)
      }
    }),
    "bridge.exec" -> ((spark, p) => {
      val r =
        try Bridge(str(p, 0)).exec(spark, str(p, 1), Nil)
        catch { case e: Exception => fail(Option(e.getMessage).getOrElse(e.toString)) }
      obj("Reason" -> "success", "LastInsertedId" -> 0L,
        "RowsAffected" -> r.rowsAffected)
    }),
    "bridge.query" -> ((spark, p) => {
      val df =
        try Bridge(str(p, 0)).query(spark, str(p, 1), Nil)
        catch { case e: Exception => fail(Option(e.getMessage).getOrElse(e.toString)) }
      val handle = s"h${cursorSeq.incrementAndGet()}"
      val schema = df.schema
      // partition-at-a-time pull, not a full driver materialization —
      // console cursors may sit over arbitrarily large bridge queries
      cursors.put(handle,
        scala.jdk.CollectionConverters.IteratorHasAsScala(df.toLocalIterator())
          .asScala.map(_.toSeq))
      obj("Handle" -> handle, "Columns" -> arr(schema.fields.toSeq.map { f =>
        obj("Name" -> f.name,
          "Type" -> (if (f.metadata.contains("machtype"))
            f.metadata.getString("machtype") else f.dataType.simpleString),
          "Size" -> 0L, "Length" -> 0L)
      }))
    }),
    "bridge.result.fetch" -> ((_, p) => {
      val it = cursors.get(str(p, 0))
      if (it == null) fail(s"invalid handle '${str(p, 0)}'")
      if (it.hasNext) obj("HasNoRows" -> false, "Values" -> arr(it.next()))
      else obj("HasNoRows" -> true)
    }),
    "bridge.result.close" -> ((_, p) => {
      if (cursors.remove(str(p, 0)) == null) fail(s"invalid handle '${str(p, 0)}'")
      obj("Reason" -> "success")
    }),

    // ---- session pool management (server.go:2062-2236) -----------------
    "session.list" -> ((spark, _) => {
      Catalog.ensureDefaultSession()
      arr(Catalog.sessionRows.map { s =>
        obj("id" -> s.id, "userName" -> s.userName, "userId" -> s.userId,
          "loginTime" -> s.loginTimeMs, "type" -> s.clientType,
          "userIp" -> s.userIp)
      })
    }),
    "session.kill" -> ((_, p) => {
      val id = p.headOption match {
        case Some(l: java.lang.Long) => l.toLong
        case Some(s: String) => s.toLongOption.getOrElse(-1L)
        case _ => -1L
      }
      if (!Catalog.killSession(id)) fail(s"session '$id' not found")
      null
    }),
    "session.stat" -> ((_, _) => {
      val lim = sessionLimit.get()
      obj("maxOpenConnections" -> lim._1.toLong,
        "openConnections" -> Catalog.sessionRows.length.toLong,
        "inUse" -> 1L, "idle" -> (Catalog.sessionRows.length - 1L).max(0L),
        "waitCount" -> 0L, "waitAvgDuration" -> "0s",
        "maxIdleClosed" -> 0L, "maxIdleTimeClosed" -> 0L,
        "maxLifetimeClosed" -> 0L)
    }),
    "session.limit.get" -> ((_, _) => {
      val (mo, mi, it, lt) = sessionLimit.get()
      obj("maxOpenConn" -> mo.toLong, "maxIdleConn" -> mi.toLong,
        "connMaxIdleTime" -> it, "connMaxLifetime" -> lt)
    }),
    "session.limit.set" -> ((_, p) => {
      val m = objParam(p, 0)
      val (mo, mi, it, lt) = sessionLimit.get()
      def num(k: String, dflt: Int): Int = m.get(k) match {
        case Some(l: java.lang.Long) => l.toInt
        case Some(d: java.lang.Double) => d.toInt
        case _ => dflt
      }
      def dur(k: String, dflt: String): String = m.get(k) match {
        case Some(s: String) => s
        case _ => dflt
      }
      sessionLimit.set((num("maxOpenConn", mo), num("maxIdleConn", mi),
        dur("connMaxIdleTime", it), dur("connMaxLifetime", lt)))
      null
    }),
    "http.debug.set" -> ((_, p) => {
      val m = objParam(p, 0)
      if (m.contains("enable") || m.contains("logLatency")) {
        val enable = m.get("enable") match {
          case Some(b: java.lang.Boolean) => b.booleanValue()
          case _ => fail("enable should be boolean")
        }
        val latency = m.get("logLatency") match {
          case Some(s: String) => s
          case _ => fail("logLatency should be duration")
        }
        val ns =
          try graft.time.TimeFns.parseDurationNs(latency)
          catch { case _: Exception => -1L }
        httpDebug.set((enable, ns))
      }
      val (en, ns) = httpDebug.get()
      obj("enable" -> en,
        "logLatency" -> graft.time.TimeFns.goDurationString(ns))
    }),

    // ---- schedule management (server.go:1902-2060) ---------------------
    "schedule.list" -> ((spark, _) =>
      arr(graft.scheduler.Timers.defaultService(spark).listSchedules().map { s =>
        val fields = mutable.LinkedHashMap[String, Any](
          "name" -> s.name, "type" -> s.typ)
        if (s.autoStart) fields += "autoStart" -> true
        fields += "state" -> s.state
        if (s.task.nonEmpty) fields += "task" -> s.task
        if (s.schedule.nonEmpty) fields += "schedule" -> s.schedule
        if (s.bridge.nonEmpty) fields += "bridge" -> s.bridge
        if (s.topic.nonEmpty) fields += "topic" -> s.topic
        if (s.qos != 0) fields += "QoS" -> s.qos.toLong
        fields
      })),
    "schedule.timer.add" -> ((spark, p) => {
      val req = objParam(p, 0)
      val r = graft.scheduler.Timers.defaultService(spark).addSchedule(
        mapStr(req, "name"), "timer",
        req.get("autoStart").contains(java.lang.Boolean.TRUE),
        schedule = mapStr(req, "spec"), task = mapStr(req, "command"))
      if (!r.success) fail(r.reason)
      null
    }),
    "schedule.subscriber.add" -> ((spark, p) => {
      val req = objParam(p, 0)
      val mqtt = req.get("mqtt").collect { case m: collection.Map[_, _] =>
        m.asInstanceOf[collection.Map[String, Any]] }
      val nats = req.get("nats").collect { case m: collection.Map[_, _] =>
        m.asInstanceOf[collection.Map[String, Any]] }
      val topic = mqtt.map(mapStr(_, "topic"))
        .orElse(nats.map(mapStr(_, "subject"))).getOrElse("")
      val qos = mqtt.flatMap(_.get("qos")).collect { case l: java.lang.Long => l.toInt }
        .getOrElse(0)
      val r = graft.scheduler.Timers.defaultService(spark).addSchedule(
        mapStr(req, "name"), "subscriber",
        req.get("autoStart").contains(java.lang.Boolean.TRUE),
        schedule = "", task = mapStr(req, "command"),
        bridge = mapStr(req, "bridge"), topic = topic, qos = qos)
      if (!r.success) fail(r.reason)
      null
    }),
    "schedule.delete" -> ((spark, p) => {
      val r = graft.scheduler.Timers.defaultService(spark).delSchedule(str(p, 0))
      if (!r.success) fail(r.reason)
      null
    }),
    "schedule.start" -> ((spark, p) => {
      val r = graft.scheduler.Timers.defaultService(spark).startSchedule(str(p, 0))
      if (!r.success) fail(r.reason)
      null
    }),
    "schedule.stop" -> ((spark, p) => {
      val r = graft.scheduler.Timers.defaultService(spark).stopSchedule(str(p, 0))
      if (!r.success) fail(r.reason)
      null
    }))

  // ---- dispatch ---------------------------------------------------------

  /** CallJsonRpc: unknown method → -32601 "method X not found" (mapped to
    * the wire "Method not found" at the door); handler exceptions carry
    * their message with code -32603 (→ -32000 on the wire). */
  def call(spark: SparkSession, method: String, params: Seq[Any]): Either[RpcException, Any] =
    builtin.get(method) match {
      case None => Left(new RpcException(-32601, s"method $method not found"))
      case Some(h) =>
        try Right(h(spark, params))
        catch {
          case e: RpcException => Left(e)
          case e: Exception =>
            Left(new RpcException(-32603, Option(e.getMessage).getOrElse(e.toString)))
        }
    }

  /** One JSON-RPC response object (shared by the HTTP door and the
    * console WebSocket — http_rpc.go:90-126, http_ws.go:196-225). */
  def responseJson(spark: SparkSession, method: String, params: Seq[Any], id: Any): String = {
    val idJson = jsonValue(id)
    call(spark, method, params) match {
      case Right(result) =>
        s"""{"jsonrpc":"2.0","id":$idJson,"result":${jsonValue(result)}}"""
      case Left(err) =>
        val code = if (err.code == -32603) -32000 else err.code
        val message = if (err.code == -32601) "Method not found" else err.getMessage
        s"""{"jsonrpc":"2.0","id":$idJson,"error":{"code":$code,"message":${graft.sinks.GoJs.quote(message)}}}"""
    }
  }

  /** `POST /web/api/rpc` — always replies HTTP 200. */
  def handleHttpRpc(spark: SparkSession, body: String): WebApi.HttpReply = {
    val parsed =
      try Builtins.jsonParse(body) match {
        case m: collection.Map[_, _] => m.asInstanceOf[collection.Map[String, Any]]
        case _ => null
      } catch { case _: Exception => null }
    if (parsed == null)
      return WebApi.HttpReply(200, "application/json",
        """{"jsonrpc":"2.0","id":null,"error":{"code":-32700,"message":"Parse error"}}""")
    val method = mapStr(parsed, "method")
    val params = parsed.get("params") match {
      case Some(a: ArrayBuffer[_]) => a.toSeq
      case _ => Nil
    }
    val id = parsed.get("id").orNull
    WebApi.HttpReply(200, "application/json",
      responseJson(spark, method, params, id))
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => graft.sinks.GoJs.quote(s)
    case other => Builtins.jsonStringify(other) match {
      case s: String => s
      case _ => "null"
    }
  }
}
