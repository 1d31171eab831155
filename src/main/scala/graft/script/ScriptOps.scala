package graft.script

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import Interp._

/** SCRIPT("js") execution against record streams.
  *
  * Two modes, deliberately distinct (reference: mods/tql/fm_script.go —
  * one goja VM per SCRIPT node, records visit it in arrival order):
  *
  *  - [[ScriptNode]] + [[ScriptOps.runPipe]]: the TQL-parity sequential
  *    mode. A SCRIPT block may carry state across records (the js-fft
  *    pattern: accumulate in init, emit in finalize), which serializes the
  *    stream by definition — the reference has the exact same property
  *    (single event-loop goroutine). Records stream through
  *    `toLocalIterator` so only one upstream partition is resident at a
  *    time; output becomes a LocalRelation, which is fine because TQL
  *    results are presentation-sized.
  *
  *  - [[ScriptOps.mapScript]]: the 100-TB path. The script runs once per
  *    PARTITION (init → per-record main → finalize/deinit per partition)
  *    with a declared output schema, via `mapPartitions` — fully
  *    distributed, no driver involvement, no cross-partition state. Use
  *    when the per-record logic is stateless or partition-local.
  */
final class ScriptNode(
    initCode: String, mainCode: String, deinitCode: String,
    clockNs: Long,
    params: Map[String, Seq[String]],
    payload: Option[String],
    isSource: Boolean,
    logSink: (String, String) => Unit,
    /** `$.db([{bridge:'x'}]).exec(sql, binds…)` — driver-side (TQL) mode
      * only; the Option[String] is the bridge name */
    dbExec: Option[(Option[String], String, Seq[Any]) => Any] = None,
    /** `$.db([{bridge}]).query(sql, binds…)`: (column names, row values) */
    dbQuery: Option[(Option[String], String, Seq[Any]) => (Seq[String], Seq[Seq[Any]])] = None) {

  private val host = new Interp.Host {
    def nowNs: Long = clockNs
    override def log(level: String, parts: Seq[Any]): Unit =
      logSink(level, parts.map(display).mkString(" "))
  }
  private val interp = new Interpreter(host)
  private val dollar = newObj()

  /** yielded records: (key, values, inflight-var snapshot) */
  val out = ArrayBuffer.empty[(Any, ArrayBuffer[Any], Map[String, Any])]
  private var yieldCount = 0L
  private var currentKey: Any = JsUndefined
  private var sawRecord = false
  private var inited = false
  private var finished = false
  val inflightVars: mutable.LinkedHashMap[String, Any] = mutable.LinkedHashMap.empty

  private lazy val mainProg = Js.parseProgram(mainCode)

  private def yieldRec(key: Any, values: Seq[Any]): Unit = {
    out += ((key, ArrayBuffer[Any](values.map(exportNum): _*),
      if (inflightVars.isEmpty) Map.empty else inflightVars.toMap))
    yieldCount += 1
  }

  private def installDollar(): Unit = {
    dollar("params") = {
      val p = newObj()
      params.foreach { case (k, vs) =>
        p(k) = if (vs.lengthCompare(1) == 0) vs.head
               else ArrayBuffer[Any](vs: _*)
      }
      p
    }
    if (isSource) payload.foreach(pl => dollar("payload") = pl)
    dollar("yield") = Native("yield", -1, (_, args) => {
      // inflight key while mapping; yield ordinal when SCRIPT is the source
      // (fm_script.go:379-388)
      val k = if (sawRecord) currentKey else java.lang.Long.valueOf(yieldCount)
      yieldRec(k, args)
      JsUndefined
    })
    dollar("yieldKey") = Native("yieldKey", -1, (_, args) => {
      if (args.isEmpty) throwErr("TypeError", "yieldKey requires a key")
      yieldRec(exportNum(args.head), args.tail)
      JsUndefined
    })
    dollar("yieldArray") = Native("yieldArray", 1, (_, args) => {
      val arr = args.headOption match {
        case Some(a: ArrayBuffer[_]) => a.toSeq.asInstanceOf[Seq[Any]]
        case other => throwErr("TypeError",
          s"yieldArray requires an array, got ${display(other.getOrElse(JsUndefined))}")
      }
      val k = if (sawRecord) currentKey else java.lang.Long.valueOf(yieldCount)
      yieldRec(k, arr)
      JsUndefined
    })
    dollar("inflight") = Native("inflight", 0, (_, _) => {
      val o = newObj()
      o("set") = Native("set", 2, (_, args) => {
        inflightVars(display(args.head)) = exportNum(args(1))
        JsUndefined
      })
      o("get") = Native("get", 1, (_, args) =>
        inflightVars.getOrElse(display(args.head), JsUndefined))
      o
    })
    dollar("db") = Native("db", -1, (_, dbArgs) => dbExec match {
      case None => throwErr("Error", "$.db() is not available in this context")
      case Some(exec) =>
        // `$.db({bridge: 'sqlite'})` routes to the named bridge
        // (tql_test.go:2520-2570)
        val bridgeOpt = dbArgs.headOption.collect {
          case o: Interp.JsObj => o.get("bridge").map(display)
        }.flatten
        val o = newObj()
        o("exec") = Native("exec", -1, (_, args) =>
          exec(bridgeOpt, display(args.head), args.tail))
        // db.query(sql, binds…).yield() / .forEach(cb) / .columns()
        // (fm_script.go's db bridge; its upstream tests are t.Skip'd, so
        // semantics follow the documented surface)
        o("query") = Native("query", -1, (_, args) => dbQuery match {
          case None => throwErr("Error", "$.db().query() is not available here")
          case Some(q) =>
            val (cols, rows) = q(bridgeOpt, display(args.head), args.tail)
            val res = newObj()
            res("columns") = Native("columns", 0, (_, _) =>
              ArrayBuffer[Any](cols: _*))
            res("yield") = Native("yield", 0, (_, _) => {
              rows.foreach(r => yieldRec(java.lang.Long.valueOf(yieldCount), r))
              JsUndefined
            })
            res("forEach") = Native("forEach", 1, (_, fargs) => {
              val cb = fargs.head.asInstanceOf[Callable]
              rows.foreach(r =>
                interp.callFunction(cb, JsUndefined,
                  List(ArrayBuffer[Any](r: _*))))
              JsUndefined
            })
            res
        })
        o
    })
    // $.request(url, {method, headers, body}).do(rsp => rsp.text/json/csv/
    // blob(cb)) — fm_script.go jsFuncRequest:412-582. Loopback-only here
    // (zero-egress build); request errors surface as Error values on
    // rsp.error()/body readers, like the reference's GoError returns.
    dollar("request") = Native("request", -1, (_, rargs) => {
      if (rargs.isEmpty) throwErr("TypeError", "$.request requires a url")
      val url = display(rargs.head)
      var method = "GET"
      var body = ""
      val headers = mutable.LinkedHashMap[String, String]()
      rargs.lift(1).foreach {
        case o: Interp.JsObj =>
          o.get("method").foreach(m => method = display(m).toUpperCase)
          o.get("body").foreach(b => body = display(b))
          o.get("headers").foreach {
            case h: Interp.JsObj => h.foreach { case (k, v) => headers(k) = display(v) }
            case _ => ()
          }
        case _ => ()
      }
      if (!Seq("GET", "POST", "PUT", "DELETE").contains(method))
        throwErr("Error", s"""HTTPError unsupported method "$method"""")
      val req = newObj()
      req("do") = Native("do", 1, (_, dargs) => {
        val cb = dargs.head.asInstanceOf[Callable]
        var err: String = null
        var status = 0
        var statusText = ""
        var respBody = ""
        val respHeaders = newObj()
        try {
          val (c, st, hdrs, b) =
            graft.server.HttpLoop.simpleRequest(method, url, body, headers.toSeq)
          status = c; statusText = st; respBody = b
          hdrs.foreach { case (k, v) => respHeaders(k) = v }
        } catch { case e: Exception =>
          err = Option(e.getMessage).getOrElse(e.toString)
        }
        val rsp = newObj()
        rsp("url") = url
        rsp("ok") = java.lang.Boolean.valueOf(err == null && status >= 200 && status < 300)
        if (err == null) {
          rsp("status") = java.lang.Long.valueOf(status.toLong)
          rsp("statusText") = statusText
          rsp("headers") = respHeaders
        }
        rsp("error") = Native("error", 0, (_, _) =>
          if (err == null) JsUndefined else Interp.errObj("Error", s"HTTPError $err"))
        def bodyFn(typ: String): Any = Native(typ, 1, (_, bargs) => {
          val bcb = bargs.head.asInstanceOf[Callable]
          if (err != null) Interp.errObj("Error", s"HTTPError $err")
          else typ match {
            case "text" | "blob" =>
              interp.callFunction(bcb, JsUndefined, List(respBody))
              JsUndefined
            case "json" =>
              (try Right(Builtins.jsonParse(respBody)) catch {
                case e: Exception => Left(s"HTTPError ${e.getMessage}")
              }) match {
                case Right(parsed) =>
                  interp.callFunction(bcb, JsUndefined, List(parsed))
                  JsUndefined
                case Left(msg) => Interp.errObj("Error", msg)
              }
            case "csv" =>
              respBody.split("\r?\n").iterator.filter(_.nonEmpty).foreach { line =>
                interp.callFunction(bcb, JsUndefined,
                  List(ArrayBuffer[Any](csvFields(line): _*)))
              }
              JsUndefined
          }
        })
        rsp("text") = bodyFn("text")
        rsp("blob") = bodyFn("blob")
        rsp("json") = bodyFn("json")
        rsp("csv") = bodyFn("csv")
        interp.callFunction(cb, JsUndefined, List(rsp))
        JsUndefined
      })
      req
    })
    interp.global.declare("$", dollar)
  }

  /** Minimal RFC-4180 field split with leading-space trim, matching the
    * reference's csv.Reader settings (TrimLeadingSpace, variable widths). */
  private def csvFields(line: String): Seq[Any] = {
    val out = ArrayBuffer.empty[Any]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQ = false
        } else cur.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.toString.stripLeading(); cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString.stripLeading()
    out.toSeq
  }

  private def ensureInit(): Unit = if (!inited) {
    inited = true
    installDollar()
    if (initCode.trim.nonEmpty) interp.run(initCode)
  }

  /** Run the main block for one inflight record. */
  def feed(key: Any, values: Seq[Any], vars: Map[String, Any]): Unit = {
    ensureInit()
    sawRecord = true
    currentKey = exportNum(key)
    vars.foreach { case (k, v) => inflightVars(k) = v }
    dollar("key") = currentKey
    dollar("values") = ArrayBuffer[Any](values: _*)
    interp.exec(mainProg, interp.global)
  }

  /** Source-mode single pass (no inflight records). */
  def runOnce(): Unit = {
    ensureInit()
    dollar("key") = JsUndefined
    dollar("values") = ArrayBuffer.empty[Any]
    interp.exec(mainProg, interp.global)
  }

  /** arm the runaway-script interrupt (absolute System.nanoTime). */
  def setDeadline(nanoTime: Long): Unit = interp.deadlineNanoTime = nanoTime

  /** EOF: the deinit block if present, ELSE the user's finalize() —
    * mutually exclusive, exactly like fm_script.go:220-236. */
  def finish(): Unit = if (!finished) {
    finished = true
    ensureInit()
    interp.interruptLabel = "finalize"
    if (deinitCode.trim.nonEmpty) interp.run(deinitCode)
    else interp.global.lookup("finalize") match {
      case Some(c: Callable) => interp.callFunction(c, JsUndefined, Nil)
      case _ =>
    }
  }

  /** `$.result = {columns:[…], types:[…]}` declared by the script. */
  def resultColumns: Option[(Seq[String], Seq[String])] =
    dollar.get("result") match {
      case Some(m: mutable.LinkedHashMap[_, _]) =>
        val mm = m.asInstanceOf[JsObj]
        val cols = mm.get("columns") match {
          case Some(a: ArrayBuffer[_]) => a.map(display).toSeq
          case _ => Seq.empty
        }
        val types = mm.get("types") match {
          case Some(a: ArrayBuffer[_]) => a.map(display).toSeq
          case _ => cols.map(_ => "any")
        }
        if (cols.nonEmpty) Some((cols, types)) else None
      case _ => None
    }
}

object ScriptOps {

  /** Reference type name for a yielded JS value (goja export → api column
    * type mapping, the names the JSON envelope prints). */
  def jsTypeName(v: Any): String = v match {
    case _: java.lang.Long => "int64"
    case _: java.lang.Double => "double"
    case _: String => "string"
    case _: java.lang.Boolean => "bool"
    case _: JsDate => "datetime"
    case _ => "any"
  }

  case class ScriptResult(
      rows: Seq[(Any, Seq[Any], Map[String, Any])],
      /** envelope columns/types with reference semantics (may disagree
        * with row arity — the reference's JSON sink prints them as-is) */
      envelope: Option[(Seq[String], Seq[String])],
      logs: Seq[(String, String)])

  /** Sequential (TQL-parity) execution over an ordered record stream. */
  def run(records: Iterator[(Any, Seq[Any], Map[String, Any])],
          isSource: Boolean,
          initCode: String, mainCode: String, deinitCode: String,
          nowNs: Long,
          params: Map[String, Seq[String]],
          payload: Option[String],
          dbExec: Option[(Option[String], String, Seq[Any]) => Any] = None,
          dbQuery: Option[(Option[String], String, Seq[Any]) => (Seq[String], Seq[Seq[Any]])] = None,
          deadlineNanoTime: Long = Long.MaxValue): ScriptResult = {
    val logs = ArrayBuffer.empty[(String, String)]
    val node = new ScriptNode(initCode, mainCode, deinitCode, nowNs, params,
      payload, isSource, (lvl, msg) => logs += ((lvl, msg)), dbExec, dbQuery)
    node.setDeadline(deadlineNanoTime)
    // interrupt semantics (tql_test.go:2182-2256): a deadline hit during
    // init/main discards the payload entirely; during finalize the rows
    // yielded so far survive. Both log the interrupt as an ERROR.
    try {
      if (isSource) node.runOnce()
      else records.foreach { case (k, vs, vars) => node.feed(k, vs, vars) }
    } catch {
      case e: Interp.ScriptInterrupt =>
        logs += (("ERROR", e.msg))
        node.out.clear()
        return ScriptResult(Seq.empty, node.resultColumns, logs.toSeq)
    }
    try node.finish()
    catch {
      case e: Interp.ScriptInterrupt =>
        logs += (("ERROR", s"SCRIPT finalize, ${e.msg}"))
    }
    val env = node.resultColumns.orElse {
      if (isSource)
        node.out.headOption.map { case (_, vs, _) =>
          (vs.indices.map(i => s"column$i"), vs.map(jsTypeName).toSeq)
        }
      else None
    }
    ScriptResult(node.out.toSeq.map { case (k, vs, m) => (k, vs.toSeq, m) },
      env, logs.toSeq)
  }

  /** Spark value → JS value at the script boundary. */
  def toJs(v: Any): Any = v match {
    case null => null
    case l: java.lang.Long => l
    case d: java.lang.Double => d
    case i: java.lang.Integer => java.lang.Long.valueOf(i.toLong)
    case s: java.lang.Short => java.lang.Long.valueOf(s.toLong)
    case b: java.lang.Byte => java.lang.Long.valueOf(b.toLong)
    case f: java.lang.Float => java.lang.Double.valueOf(f.toDouble)
    case b: java.lang.Boolean => b
    case s: String => s
    case t: java.sql.Timestamp =>
      JsDate(t.getTime.toDouble + (t.getNanos % 1000000) / 1e6)
    case d: java.sql.Date => JsDate(d.getTime.toDouble)
    case d: java.math.BigDecimal => java.lang.Double.valueOf(d.doubleValue())
    case a: Seq[_] => ArrayBuffer[Any](a.map(toJs): _*)
    case a: Array[_] => ArrayBuffer[Any](a.toSeq.map(toJs): _*)
    case m: Map[_, _] =>
      val o = newObj()
      m.foreach { case (k, vv) => o(String.valueOf(k)) = toJs(vv) }
      o
    case other => String.valueOf(other)
  }

  /** Infer the Spark type of one output column across all yielded rows.
    * Mixed int/double → double; structured values → JSON string; any other
    * mix → string. */
  def inferType(values: Seq[Any]): DataType = {
    var sawLong, sawDouble, sawString, sawBool, sawStruct = false
    var sawDate, sawBinary, sawOther = false
    values.foreach {
      case null | JsUndefined =>
      case _: java.lang.Long => sawLong = true
      case _: java.lang.Double => sawDouble = true
      case _: String => sawString = true
      case _: java.lang.Boolean => sawBool = true
      case _: JsDate => sawDate = true
      case _: Array[Byte] => sawBinary = true
      case _: ArrayBuffer[_] | _: mutable.LinkedHashMap[_, _] => sawStruct = true
      case _ => sawOther = true
    }
    val kinds = Seq(sawLong || sawDouble, sawString, sawBool, sawDate,
      sawBinary, sawStruct || sawOther).count(identity)
    if (kinds != 1) StringType
    else if (sawStruct || sawOther) StringType
    else if (sawDate) TimestampType
    else if (sawBinary) BinaryType
    else if (sawString) StringType
    else if (sawBool) BooleanType
    else if (sawDouble) DoubleType
    else LongType
  }

  /** JS value → Spark value under a target type. Structured values
    * serialize as canonical sorted-key JSON (Go json.Marshal parity for
    * the envelope's "any" columns). */
  def fromJs(v: Any, dt: DataType): Any = v match {
    case null | JsUndefined => null
    case _ => dt match {
      case LongType => v match {
        case l: java.lang.Long => l
        case other => java.lang.Long.valueOf(toNum(other).toLong)
      }
      case DoubleType => java.lang.Double.valueOf(toNum(v))
      case BooleanType => java.lang.Boolean.valueOf(truthy(v))
      case StringType => v match {
        case _: ArrayBuffer[_] | _: mutable.LinkedHashMap[_, _] =>
          Builtins.jsonStringifySorted(v)
        case other => display(other)
      }
      case TimestampType => v match {
        case d: JsDate =>
          // keep sub-ms precision (Spark stores µs)
          val totalNs = math.rint(d.ms * 1e6).toLong
          val ts = new java.sql.Timestamp(Math.floorDiv(totalNs, 1000000L))
          ts.setNanos(Math.floorMod(totalNs, 1000000000L).toInt)
          ts
        case other => new java.sql.Timestamp(toNum(other).toLong)
      }
      case BinaryType => v match {
        case b: Array[Byte] => b
        case a: ArrayBuffer[_] => a.map(x => toNum(x).toByte).toArray
        case other => display(other).getBytes("UTF-8")
      }
      case _ => display(v)
    }
  }

  /** Distributed mode: run the script once per partition with a declared
    * output schema. `$.yield` arity must match the schema. */
  def mapScript(df: DataFrame, schema: StructType,
                initCode: String, mainCode: String, deinitCode: String,
                nowNs: Long,
                params: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    val inputCols = df.columns.toSeq
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val fieldTypes = schema.fields.map(_.dataType)
    df.mapPartitions { it =>
      val node = new ScriptNode(initCode, mainCode, deinitCode, nowNs, params,
        None, isSource = false,
        (lvl, msg) => Console.err.println(s"[$lvl] $msg"))
      // lazy interleave: pull input rows only when the yield buffer is
      // drained, so a 1:1 (or filtering) script holds O(1) rows
      new Iterator[Row] {
        private var emitted = 0
        private var idx = 0L
        private var eof = false
        private def pump(): Unit = {
          // free already-emitted records whenever the buffer is drained —
          // BEFORE feeding, so a 1:1 script holds O(1) rows, not the
          // whole partition's output
          if (emitted > 0 && emitted == node.out.size) {
            node.out.clear()
            emitted = 0
          }
          while (emitted >= node.out.size && !eof) {
            if (it.hasNext) {
              val row = it.next()
              idx += 1
              node.feed(java.lang.Long.valueOf(idx),
                inputCols.indices.map(i => toJs(row.get(i))), Map.empty)
            } else {
              node.finish()
              eof = true
            }
          }
        }
        def hasNext: Boolean = { pump(); emitted < node.out.size }
        def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val (_, vs, _) = node.out(emitted)
          emitted += 1
          Row.fromSeq(fieldTypes.indices.map { i =>
            fromJs(if (i < vs.size) vs(i) else null, fieldTypes(i))
          })
        }
      }
    }(enc)
  }
}
