package graft.tql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Fake

/** TQL → DataFrame compiler (reference: mods/tql — task compile
  * task.go:202-312, execution model §3.2 of SURVEY.md).
  *
  * The reference runs one goroutine per statement with per-record
  * channels; here each statement is a DataFrame transformation, so the
  * whole script becomes ONE Catalyst plan — predicate pushdown, column
  * pruning and limit pushdown happen across statement boundaries for
  * free, which the reference cannot do (its optimizer note: SURVEY §4).
  *
  * Record model (reference task_record.go): key + value tuple. The key is
  * the hidden `_key` column; `value(i)` addresses the i-th value column.
  * Sinks emit the value columns.
  */
object Compiler {
  case class Pipe(df: DataFrame, keyCol: String, values: Seq[String],
                  /** JSON-envelope column metadata override (SCRIPT nodes:
                    * `$.result` or reference input-node semantics) */
                  envelope: Option[(Seq[String], Seq[String])] = None,
                  /** Display name of the key column when demoted into the
                    * values by PUSHKEY — the reference names the implicit
                    * rownum key "ROWNUM" and any PUSHKEY/MAPKEY-made key
                    * "key" (fm_monad.go:1578,1602 MakeColumnOf("key",…)) */
                  keyName: String = "ROWNUM")

  case class Sink(format: String, options: graft.sinks.Codecs.Options,
                  /** SQL sink statement: (sql text, per-record bind exprs)
                    * — fm_dbsrc.go's SQL('insert …', value(0), …) */
                  sqlExec: Option[(String, List[Expr])] = None,
                  /** INSERT(cols…, table(t)[, tag(n)]) / APPEND(table(t))
                    * statement sinks (fm_dbsink.go:38-253) */
                  tableIns: Option[TableInsert] = None,
                  /** CHART/GEOMAP spec sinks — sink options kept as raw
                    * AST calls, applied at render time */
                  chartArgs: Option[List[Expr]] = None,
                  /** `bridge('name')` routing for SQL/INSERT sinks */
                  bridge: Option[String] = None,
                  /** `cache(key, ttl[, preemptiveRatio])` — serve the
                    * rendered sink text from the result cache
                    * (mods/tql/tqlcache.go) */
                  cacheSpec: Option[(String, Long, Double)] = None)

  case class TableInsert(append: Boolean, table: String, tag: Option[String],
                         columns: Seq[String])

  case class Compiled(pipe: Pipe, sink: Sink) {
    /** The sink-facing DataFrame (values only, like the reference). */
    def output: DataFrame =
      // already in output shape → no re-select; duplicate user aliases
      // (two 'PREDICT' columns, TestGroupByTimeWindow) are legal in a
      // result frame but not name-resolvable
      if (pipe.values == pipe.df.columns.toSeq) pipe.df
      else pipe.df.select(pipe.values.map(Compiler.vcol): _*)
  }

  /** Column ref tolerant of names with dots/spaces (user-given aliases). */
  private[tql] def vcol(name: String): Column = col(s"`$name`")

  /** serving root for sink `file()` templates (the reference resolves
    * them against its tql filesystem root). */
  @volatile var templateRoot: String = "."

  /** task deadline (System.nanoTime) for runaway-SCRIPT interruption —
    * the reference runs each task under a context with timeout. */
  private[tql] val currentDeadline = new ThreadLocal[java.lang.Long] {
    override def initialValue(): java.lang.Long = java.lang.Long.MAX_VALUE
  }

  /** run with a task timeout (the CtxTimeout seam tql_test.go:2191). */
  def runWithTimeout(spark: SparkSession, script: String,
                     timeoutMs: Long): String = {
    currentDeadline.set(System.nanoTime() + timeoutMs * 1000000L)
    try run(spark, script)
    finally currentDeadline.set(java.lang.Long.MAX_VALUE)
  }

  private val currentParams = new ThreadLocal[Map[String, Seq[String]]] {
    override def initialValue(): Map[String, Seq[String]] = Map.empty
  }
  private[tql] def paramFirst(k: String): Option[String] =
    currentParams.get.get(k).flatMap(_.headOption)
  private val currentNowNs = new ThreadLocal[java.lang.Long] {
    override def initialValue(): java.lang.Long = 0L
  }

  /** Namespace for `cache(key, …)`: the reference keys its result cache by
    * `sourcePath:sourceHash:key` (mods/tql/tqlcache.go:142) so two scripts
    * sharing a user key never serve each other's bytes and an edited
    * script can't serve stale output. Scripts here are compiled from text
    * (no file path), so the namespace is the source hash alone. */
  private val currentScriptHash = new ThreadLocal[String] {
    override def initialValue(): String = ""
  }
  private def scriptHash(script: String): String = {
    // hash the full UTF-8 byte array — char count under-reads multi-byte
    // scripts and could collide two same-length, same-prefix sources
    val bytes = script.getBytes("UTF-8")
    java.lang.Long.toHexString(
      org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42).toLong & 0xffffffffL) + f"${bytes.length}%x"
  }

  /** Row-order key for sequential semantics (TAKE/DROP/rownum keys).
    * The reference keys SQL-source records by arrival rownum. Derived
    * scale-safely (per-partition offsets, no single-partition window) —
    * see [[graft.operators.RowOps.zipRownum]]. */
  private def withRownum(df: DataFrame, order: Seq[Column] = Nil): DataFrame =
    graft.operators.RowOps.zipRownum(df, "_key", order)

  def compile(spark: SparkSession, script: String): Compiled =
    compile(spark, script, System.currentTimeMillis() * 1000000L, Map.empty)

  def compile(spark: SparkSession, script: String, nowNs: Long): Compiled =
    compile(spark, script, nowNs, Map.empty)

  /** `nowNs` pins the clock that `between('now-…', …)` resolves against —
    * injected for determinism (the reference reads the wall clock);
    * `params` binds `param('key')` references (the reference's request
    * query-string params, fm_context.go:22-186). */
  def compile(spark: SparkSession, script: String, nowNs: Long,
              params: Map[String, String]): Compiled =
    compileMulti(spark, script, nowNs, params.map { case (k, v) => k -> Seq(v) })

  /** Multi-valued request params (`p1=1&p1=2`), like the reference's
    * url.Values — `$.params.p1` in SCRIPT sees the full list. */
  def compileMulti(spark: SparkSession, script: String, nowNs: Long,
                   params: Map[String, Seq[String]]): Compiled = {
    val stmts = Parser.parseScript(script)
    require(stmts.nonEmpty, "empty script")
    // SRC → MAP* → SINK applicability errors with the reference's kinds
    // and positions (script_validate.go; task_test.go TestSrcError).
    // Statements the introspection walker can't re-parse (tagged
    // heredoc bodies) skip shape validation — the runtime compiler
    // still enforces it operationally below.
    try {
      ScriptStructure.validate(ScriptStructure.parse(script)).foreach(e => throw e)
    } catch { case _: ScriptStructure.ParseError => }
    val src = stmts.head
    val sinkStmt = stmts.last
    require(stmts.size >= 2, "script needs at least a source and a sink")
    val maps = stmts.slice(1, stmts.size - 1)
    // The rownum key forces a global ordering window (a single-partition
    // exchange). Only pay for it when a downstream statement actually
    // consumes record order or the key.
    val needKey = maps.exists(st => statementNeedsKey(st.call)) ||
      Set("rownum").exists(o => sinkStmt.text.contains("rownum("))
    // save/restore: WHEN(do(…)) sub-routines re-enter compileMulti with
    // their own params — the outer pipeline's context must survive
    val prevParams = currentParams.get
    val prevNow = currentNowNs.get
    val prevHash = currentScriptHash.get
    val prevLogLevel = TqlLog.levelIndex
    currentParams.set(params)
    currentNowNs.set(nowNs)
    currentScriptHash.set(scriptHash(script))
    // #pragma log-level=<lvl> and the //+ comment form gate the task
    // log (task_test.go TestPragma / tql_pragma_test.go TestPragma2)
    "(?im)^\\s*(?:#pragma|//\\+)\\s+.*?log-level\\s*=\\s*(\\w+)".r
      .findFirstMatchIn(script)
      .foreach(m => TqlLog.setLevel(m.group(1)))
    try {
      val pipe0 = compileSource(spark, src, needKey, nowNs)
      val piped = maps.foldLeft(pipe0)((p, st) => compileMap(p, st))
      // sink compile diagnostics carry the statement position, like the
      // reference's CompileString → ScriptError{Kind:"sink_compile_error"}
      // wrap (task_test.go TestCompileErrorIsScriptErrorForSink)
      val sink = try compileSink(sinkStmt) catch {
        case e: ScriptStructure.ScriptError => throw e
        case e: IllegalArgumentException =>
          throw decorateSinkError(script, e)
      }
      Compiled(piped, sink)
    } finally {
      currentParams.set(prevParams); currentNowNs.set(prevNow)
      currentScriptHash.set(prevHash)
      // restore, don't reset: WHEN sub-routines must not clobber the
      // outer script's pragma
      TqlLog.setLevelIndex(prevLogLevel)
    }
  }

  /** Position-decorate a sink compile diagnostic from the introspection
    * parse (best-effort: heredoc-bearing scripts fall back to the bare
    * message, like internal encoder construction in the reference). */
  private def decorateSinkError(script: String,
                                e: IllegalArgumentException): IllegalArgumentException =
    try {
      ScriptStructure.parse(script).statements.filter(_.isCode).lastOption match {
        case Some(ps) => ScriptStructure.ScriptError("sink_compile_error",
          e.getMessage, ps.line, ps.span.start.column, ps.text)
        case None => e
      }
    } catch { case _: Exception => e }

  private[tql] def isHttpUrl(path: String): Boolean =
    path.startsWith("http://") || path.startsWith("https://")

  /** file() content: local filesystem path, or an http(s) GET — the
    * reference serves both through its server-side filesystem. */
  private[tql] def contentBytes(path: String): Array[Byte] =
    if (isHttpUrl(path)) {
      // same egress policy as every other HTTP edge in this build:
      // loopback only (HttpLoop.executeRaw); a deployment relaxes the
      // check, not the fetch path
      val host = java.net.URI.create(path).getHost
      val addr = try java.net.InetAddress.getByName(host) catch {
        case _: java.net.UnknownHostException => null
      }
      require(addr != null && addr.isLoopbackAddress,
        s"egress disabled: '$host' is not a loopback address (this build only talks to in-process doubles)")
      val client = java.net.http.HttpClient.newHttpClient()
      val req = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(path)).GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      require(resp.statusCode() / 100 == 2,
        s"file($path) fetch failed: HTTP ${resp.statusCode()}")
      resp.body()
    } else java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))

  /** One CSV line split with RFC-4180 quoting (encoding/csv semantics:
    * `"escaped, string"` is one cell, doubled quotes escape). */
  private[tql] def splitCsvLine(l: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inQ = false
    var quoted = false
    while (i < l.length) {
      val c = l.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < l.length && l.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQ = false
        } else cur.append(c)
      } else c match {
        case '"' if cur.isEmpty && !quoted => inQ = true; quoted = true
        case ',' => out += cur.toString; cur.clear(); quoted = false
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.result()
  }

  /** Substitute top-level '?' placeholders (outside quoted literals). */
  private[tql] def bindPlaceholders(sql: String, lits: Seq[String]): String = {
    val out = new StringBuilder
    var inStr = false
    var li = 0
    var i = 0
    while (i < sql.length) {
      val c = sql(i)
      if (inStr) {
        out.append(c)
        if (c == '\'') inStr = false
      } else c match {
        case '\'' => inStr = true; out.append(c)
        case '?' if li < lits.length => out.append(lits(li)); li += 1
        case _ => out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** Auto-register the machbase fixture tables when a query names them —
    * the reference's test DB ships tag_data/tag_simple pre-created. */
  private def ensureTagTables(spark: SparkSession, sql: String): Unit =
    "(?i)\\b(tag_data|tag_simple)\\b".r.findAllIn(sql).toSet[String]
      .foreach(t => graft.server.TagTables.ensure(spark, t))

  private def statementNeedsKey(e: Expr): Boolean = e match {
    // HISTOGRAM(v, bins(n)) is the streaming sketch — record order matters
    case Expr.Call("HISTOGRAM", args)
      if args.exists { case Expr.Call("bins", List(_: Expr.Num)) => true; case _ => false } => true
    case Expr.Call(n, args) =>
      // TAKE/DROP are deliberately NOT here: they consume arrival ORDER,
      // not the key VALUE, so when they are the only order consumers the
      // pipeline compiles to plain ordered offset/limit and skips the
      // zipRownum pass entirely (the keyless branches in compileMap).
      Set("PUSHKEY", "POPKEY", "MAPKEY", "GROUPBYKEY", "FFT",
        "key", "first", "last", "TRANSPOSE", "SCRIPT", "TIMEWINDOW",
        "MAP_DIFF", "MAP_ABSDIFF", "MAP_NONEGDIFF", "MAP_AVG", "MAP_MOVAVG",
        "MAP_LOWPASS", "MAP_KALMAN", "MAP_DISTANCE",
        "FILTER_CHANGED")(n) || args.exists(statementNeedsKey)
    case Expr.Bin(_, l, r) => statementNeedsKey(l) || statementNeedsKey(r)
    case Expr.Unary(_, x) => statementNeedsKey(x)
    case Expr.Ternary(c, t, f) => Seq(c, t, f).exists(statementNeedsKey)
    case Expr.In(v, set) => (v :: set).exists(statementNeedsKey)
    case Expr.Index(a, i) => statementNeedsKey(a) || statementNeedsKey(i)
    case _ => false
  }

  /** Shared TQL result cache (tqlcache.go — one cache per server). */
  private[graft] val resultCache = new graft.sinks.ResultCache()

  /** Render a compiled pipeline, applying any SCRIPT envelope override. */
  def renderCompiled(c: Compiled): String = {
    if (c.sink.format == "SQLEXEC") return runSqlSink(c)
    if (c.sink.format == "TABLEINS") return runTableSink(c)
    if (c.sink.chartArgs.isDefined) return ChartRender.run(c)
    val o = c.pipe.envelope match {
      case Some((cols, types)) =>
        c.sink.options.copy(colsOverride = Some(cols), typesOverride = Some(types))
      case None => c.sink.options
    }
    def compute() = graft.sinks.Codecs.render(c.output, c.sink.format, o)
    c.sink.cacheSpec match {
      case Some((key, ttlNs, ratio)) =>
        // cache(key, ttl): a hit skips the pipeline execution entirely —
        // the cached sink text is the contract (tqlcache_test.go pins a
        // random()-bearing script returning the identical bytes)
        resultCache.getOrCompute(key, ttlNs, ratio)(compute())
      case None => compute()
    }
  }

  /** INSERT/APPEND statement sinks (fm_dbsink.go): per-record insert into
    * the named tag table; APPEND takes the table's full column order. */
  private def runTableSink(c: Compiled): String = {
    val spec = c.sink.tableIns.get
    val spark = c.pipe.df.sparkSession
    c.sink.bridge.foreach { bridgeName =>
      // INSERT(bridge('x'), cols…, table(t)): one INSERT statement per
      // record. The reference's bridge path overwrites rowsAffected per
      // statement instead of summing (fm_dbsink.go:137-142), so the DML
      // message reports only the LAST statement — mimicked verbatim
      // (tql_test.go:2291-2301 expects "1 row inserted." after 2 rows).
      val db = graft.server.Bridge(bridgeName)
      import scala.jdk.CollectionConverters._
      var last = 0L
      c.output.toLocalIterator().asScala.foreach { row =>
        val sqlText = s"INSERT INTO ${spec.table}(${spec.columns.mkString(",")}) " +
          s"VALUES(${spec.columns.zipWithIndex.map { case (_, i) => db.parameterMarker(i) }.mkString(",")})"
        last = db.exec(spark, sqlText, row.toSeq).rowsAffected
      }
      val unit = if (last <= 1) "row" else "rows"
      return s"""{"data":{"message":"$last $unit inserted."},"success":true,"reason":"success"}"""
    }
    graft.server.TagTables.ensure(spark, spec.table)
    val columns =
      if (spec.append) graft.server.TagTables.columnsOf(spec.table)
      else (if (spec.tag.isDefined) Seq("NAME") else Nil) ++ spec.columns
    import scala.jdk.CollectionConverters._
    val n = graft.server.TagTables.insertAll(spark, spec.table, columns,
      c.output.toLocalIterator().asScala.map(row =>
        spec.tag.map(t => (t: Any)).toSeq ++ row.toSeq))
    val msg =
      if (spec.append) s"append $n rows (success $n, fail 0)"
      else if (n == 1) "a row inserted." else s"$n rows inserted."
    s"""{"data":{"message":"$msg"},"success":true,"reason":"success"}"""
  }

  private val InsertRe =
    "(?is)^\\s*insert\\s+into\\s+([A-Za-z0-9_]+)\\s*\\(([^)]*)\\)\\s*values\\s*\\((.*)\\)\\s*$".r

  /** a constant bind expression (param()/literals — no row context). */
  private def constBindValue(e: Expr): Any = e match {
    case Expr.Str(v) => v
    case Expr.Num(v) => if (v == math.rint(v)) Long.box(v.toLong) else Double.box(v)
    case Expr.Bool(b) => Boolean.box(b)
    case Expr.Call("param", List(Expr.Str(n))) =>
      currentParams.get.get(n).flatMap(_.headOption).orNull
    case other => throw new IllegalArgumentException(s"unsupported SQL bind: $other")
  }

  /** Execute an SQL sink statement per record (insert with ? binds), or
    * once (exec/DDL), and render the DML message envelope. */
  private def runSqlSink(c: Compiled): String = {
    val (sql, bindExprs) = c.sink.sqlExec.get
    val spark = c.pipe.df.sparkSession
    def envelope(msg: String): String =
      s"""{"data":{"message":"$msg"},"success":true,"reason":"success"}"""
    c.sink.bridge.foreach { bridgeName =>
      // bridged SQL sink: execute per record with value(i) binds bound
      // from the row; counts accumulate into one DML message
      val db = graft.server.Bridge(bridgeName)
      import scala.jdk.CollectionConverters._
      var total = 0L
      var verb = "inserted"
      c.output.toLocalIterator().asScala.foreach { row =>
        val binds = bindExprs.map {
          case Expr.Call("value", List(Expr.Num(i))) => row.get(i.toInt)
          case Expr.Call("value", Nil) => row.get(0)
          case other => constBindValue(other)
        }
        val res = db.exec(spark, sql, binds)
        total += res.rowsAffected
        verb = res.verb
      }
      val msg =
        if (verb == "created") "Created successfully."
        else if (total == 1) s"a row $verb."
        else s"$total rows $verb."
      return envelope(msg)
    }
    sql.trim.toLowerCase match {
      case s if s.startsWith("insert") =>
        val (table, columns, valuesBody) = sql match {
          case InsertRe(t, cols, vals) =>
            (t, cols.split(",").map(_.trim).toSeq, vals)
          case _ => throw new IllegalArgumentException(s"unsupported insert: $sql")
        }
        // the VALUES list mixes `?` binds with SQL literals — machbase's
        // `now` keyword included (fm_dbsrc_test.go:539-548:
        // `values(?,now,?)`); binds fill the ?s left-to-right
        val tokens = graft.server.QueryDoor.splitValues(valuesBody)
        val nowNs = currentNowNs.get()
        def bindValue(e: Expr, row: org.apache.spark.sql.Row): Any = e match {
          case Expr.Call("value", List(Expr.Num(i))) => row.get(i.toInt)
          case Expr.Call("value", Nil) => row.get(0)
          case Expr.Str(v) => v
          case Expr.Num(v) => if (v == math.rint(v)) Long.box(v.toLong) else Double.box(v)
          case Expr.Bool(b) => Boolean.box(b)
          case other => throw new IllegalArgumentException(s"unsupported bind: $other")
        }
        import scala.jdk.CollectionConverters._
        val valueRows = c.output.toLocalIterator().asScala.map { row =>
          var bi = 0
          tokens.map {
            case "?" =>
              val v = bindValue(bindExprs(bi), row); bi += 1; v
            case t if t.equalsIgnoreCase("now") => Long.box(nowNs)
            case t => graft.server.QueryDoor.literalValue(t)
          }: Seq[Any]
        }
        val n = graft.server.TagTables.insertAll(spark, table, columns, valueRows)
        envelope(if (n == 1) "a row inserted." else s"$n rows inserted.")
      case s if s.startsWith("exec") =>
        c.output.count() // drive the pipeline once, like the reference
        envelope("executed.")
      case _ =>
        // surface the door's DDL classification ("Created successfully."
        // etc. — spi/machsvr/mach_rows.go definedMessage)
        val res = graft.server.QueryDoor.execute(spark, sql)
        val msg =
          if (res.columns.sameElements(Array("MESSAGE")))
            res.collect().headOption.map(_.getString(0)).getOrElse("executed.")
          else "executed."
        envelope(msg)
    }
  }

  /** Compile + render through the sink codec (the `/db/tql` behavior). */
  def run(spark: SparkSession, script: String): String =
    renderCompiled(compile(spark, script))

  // ---------------- sources ----------------
  private def compileSource(spark: SparkSession, st: Statement, needKey: Boolean,
                            nowNs: Long): Pipe = {
    import Expr._
    def keyed(df: org.apache.spark.sql.DataFrame): Pipe = {
      val d = if (needKey) withRownum(df) else df
      Pipe(d, "_key", df.columns.toSeq)
    }
    st.call match {
      case Call("SCRIPT", args) => compileScriptSource(spark, args)
      case Call("SQL", Call("bridge", List(Str(bridgeName))) :: Str(sql) :: binds) =>
        // bridged database source (tql_test.go:2258-2572): SELECT yields
        // rows, anything else executes and yields the result message
        val db = graft.server.Bridge(bridgeName)
        val bindVals = binds.map(constBindValue)
        if (sql.trim.toLowerCase.startsWith("select"))
          keyed(db.query(spark, sql, bindVals))
        else {
          val res = db.exec(spark, sql, bindVals)
          import spark.implicits._
          keyed(Seq(res.message).toDF("MESSAGE"))
        }
      case Call("SQL", List(Str(sql))) =>
        ensureTagTables(spark, sql)
        // route through the query door so SHOW/DESC/EXPLAIN get the
        // machbase catalog shapes (SELECT passes straight to spark.sql)
        keyed(graft.server.QueryDoor.execute(spark, sql))
      case Call("SQL", Str(sql) :: binds) if binds.nonEmpty =>
        // '?' placeholder binding with constant args (fm_dbsrc.go SQL
        // src); placeholders inside quoted literals don't count
        val lits = binds.map {
          case Str(v) => "'" + v.replace("'", "''") + "'"
          case Num(v) => if (v == math.rint(v)) v.toLong.toString else v.toString
          case Bool(v) => v.toString
          case other => throw new IllegalArgumentException(s"unsupported SQL bind: $other")
        }
        val bound = bindPlaceholders(sql, lits)
        ensureTagTables(spark, bound)
        keyed(spark.sql(bound))
      case Call("SQL_SELECT", args) =>
        compileSqlSelect(spark, args, needKey, nowNs)
      case Call("QUERY", args) =>
        // v1 generator: QUERY(valueCols..., from(table, tag[, timeCol]),
        // between(...)) — emits (timeCol, cols...) with the time column
        // surfaced as a datetime (reference fm_dbsrc.go:56-92)
        compileQueryV1(spark, args, needKey, nowNs)
      case Call("FAKE", List(Num(_))) =>
        // FAKE(123) (tql_test.go FAKE_invalid_generator_type)
        throw new IllegalArgumentException("f(FAKE) arg(0) should be fakeSource, but float64")
      case Call("FAKE", List(gen: Call)) =>
        compileFake(spark, gen, needKey)
      case Call("CSV", Call("file", List(Str(path))) :: rest)
          if !isHttpUrl(path) =>
        // http(s) file() URLs fall through to the literal branch below,
        // which fetches the content (task_test.go TestHttpFile)
        val header = rest.exists { case Call("header", _) => true; case _ => false }
        val charset = rest.collectFirst { case Call("charset", List(Str(c))) => c }
        val fields = rest.collect {
          case Call("field", List(Num(i), Call(tpe, targs), Str(nm))) => (i.toInt, tpe, targs, nm)
          case Call("col", List(Num(i), Call(tpe, targs), Str(nm))) => (i.toInt, tpe, targs, nm)
        }
        val reader0 = spark.read.option("header", header.toString)
        val reader = charset.fold(reader0)(c => reader0.option("encoding", c))
        // read as strings, then cast per declared field() — the same
        // type set and undeclared-columns-stay-strings rule as the
        // payload/literal branch (previously the file branch knew only
        // 4 of the 6 field types)
        val raw = reader.csv(path)
        if (fields.isEmpty)
          keyed(raw.toDF(raw.columns.indices.map(i => s"column$i"): _*))
        else {
          val byIdx = fields.map(f => f._1 -> f).toMap
          val cols = raw.columns.indices.map { i =>
            byIdx.get(i) match {
              case Some((_, tpe, targs, nm)) =>
                csvFieldCast(col(raw.columns(i)), tpe, targs).as(nm)
              case None => col(raw.columns(i)).as(s"column$i")
            }
          }
          keyed(raw.select(cols: _*))
        }
      case Call("CSV", first :: rest) if constStringOpt(first).isDefined =>
        // CSV("a,b\nc,d") / CSV(payload(), field(...)) — literal or
        // request-payload rows; empty lines skipped (reference CSV_CSV)
        val text = constStringOpt(first).get
        val headerOpt = rest.exists {
          case Call("header", Nil) | Call("heading", Nil) => true
          case Call("header", List(Bool(b))) => b
          case Call("heading", List(Bool(b))) => b
          case _ => false
        }
        val allLines = text.split("\n", -1).toIndexedSeq.filter(_.nonEmpty)
        require(allLines.nonEmpty, "CSV literal is empty")
        val (headerNames, lines) =
          if (headerOpt) (Some(splitCsvLine(allLines.head).toSeq), allLines.tail)
          else (None, allLines)
        require(lines.nonEmpty, "CSV literal has no data rows")
        val nCols = lines.map(splitCsvLine(_).length).max
        val names = headerNames.map(_.padTo(nCols, "")).getOrElse(
          (0 until nCols).map(i => s"column$i"))
        val schema0 = org.apache.spark.sql.types.StructType(
          names.map(n => org.apache.spark.sql.types.StructField(n,
            org.apache.spark.sql.types.StringType)))
        val rowsC = lines.map { l =>
          val cells = splitCsvLine(l).toSeq.padTo(nCols, "")
          org.apache.spark.sql.Row.fromSeq(cells)
        }
        val df0 = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rowsC).asJava), schema0)
        val fields = rest.collect {
          case Call("field", List(Num(i), Call(tpe, targs), Str(nm))) => (i.toInt, tpe, targs, nm)
          case Call("col", List(Num(i), Call(tpe, targs), Str(nm))) => (i.toInt, tpe, targs, nm)
        }
        if (fields.isEmpty) keyed(df0)
        else {
          def castTo(c: Column, t: String, targs: List[Expr]): Column =
            csvFieldCast(c, t, targs)
          // undeclared columns stay in place as strings (TestGroupWhere
          // declares fields 0 and 2, references value(1) untyped)
          val byIdx = fields.map(f => f._1 -> f).toMap
          val cols = df0.columns.indices.map { i =>
            byIdx.get(i) match {
              case Some((_, t, targs, nm)) => castTo(col(s"column$i"), t, targs).as(nm)
              case None => col(s"column$i")
            }
          }
          val df = df0.select(cols: _*)
          keyed(df)
        }

      case Call("HTTP", args) =>
        // HTTP(dsl) source (fm_encoder.go:169-183 fmHttp): execute the
        // request DSL, yield ONE record whose value is the raw response
        // text (status line + headers + body). Loopback-only here (zero
        // egress) — the DSL/raw-request plumbing is the real surface.
        val content = args.headOption match {
          case Some(Str(s)) => s
          case Some(Call("__block", List(Str(s)))) => s
          case _ => throw new IllegalArgumentException("HTTP(request-dsl)")
        }
        val result = graft.server.HttpLoop.executeDsl(content)
        import spark.implicits._
        keyed(spark.createDataset(Seq(result)).toDF("HTTP"))

      case Call("STRING", args) =>
        // STRING(payload() ?? `literal`, separator('\n'), trimspace(true))
        // — one record per separated chunk (reference fm_bytes.go:26-236).
        val sep = args.collectFirst { case Call("separator" | "sep", List(Str(x))) => x }.getOrElse("\n")
        val trimsp = args.exists {
          case Call("trimspace", Nil) => true
          case Call("trimspace", List(Bool(b))) => b
          case _ => false
        }
        val text = args.headOption.flatMap(constStringOpt).getOrElse(
          throw new IllegalArgumentException("STRING needs a payload, literal or file()"))
        val chunks = text.split(java.util.regex.Pattern.quote(sep), -1).toIndexedSeq
          .map(c => if (trimsp) c.trim else c)
        import spark.implicits._
        keyed(spark.createDataset(chunks).toDF("STRING")) // label fm_bytes.go:176

      case Call("BYTES", args) =>
        // BYTES(payload()|'literal'|file(), separator()) — like STRING but
        // binary chunks, label "BYTES" (fm_bytes.go:37-57,174)
        val sep = args.collectFirst { case Call("separator" | "sep", List(Str(x))) => x }
        val text = args.headOption.flatMap(constStringOpt).getOrElse(
          throw new IllegalArgumentException("BYTES needs a payload, literal or file()"))
        val chunks = sep match {
          case Some(s) => text.split(java.util.regex.Pattern.quote(s), -1).toIndexedSeq
          case None => IndexedSeq(text) // no separator: ONE binary record
        }
        import spark.implicits._
        keyed(spark.createDataset(chunks).toDF("BYTES")
          .select(col("BYTES").cast("binary").as("BYTES")))

      case Call("ARGS", Nil) =>
        // ARGS() — one record carrying the task's argument values, bound
        // from the multi-valued request param "args" (the reference's
        // argValues, fm_context.go:113-140)
        val vals = currentParams.get.getOrElse("args", Seq.empty)
        import spark.implicits._
        // no argValues → still ONE record (an empty values list): the
        // generator always emits exactly one record (fm_context.go:113,
        // genRawData; task_test.go TestArgs builds rows onto it)
        if (vals.isEmpty) keyed(spark.range(1).select())
        else {
          val df = spark.createDataFrame(
            java.util.List.of(org.apache.spark.sql.Row.fromSeq(vals)),
            org.apache.spark.sql.types.StructType(vals.indices.map(i =>
              org.apache.spark.sql.types.StructField(s"column$i",
                org.apache.spark.sql.types.StringType))))
          keyed(df)
        }

      case other => throw new IllegalArgumentException(s"unsupported source: ${st.text}")
    }
  }

  /** SQL_SELECT('time','value', from('table','tag'), between(a, b)) —
    * the tag-table SQL generator (reference fm_dbsrc.go:93-227). */
  private def compileSqlSelect(spark: SparkSession, args: List[Expr], needKey: Boolean,
                               nowNs: Long): Pipe = {
    import Expr._
    import graft.operators.Lake
    val cols = args.collect { case Str(c) => c }
    var table = ""
    var tag = ""
    var baseTime = "time"
    var baseName = "name"
    var between: Option[(Lake.TimeBound, Lake.TimeBound)] = None
    var periodNs: Option[Long] = None
    var limitN: Option[Int] = None
    var offsetN = 0
    args.foreach {
      case Call("from", Str(t) :: Str(tg) :: rest) =>
        table = t; tag = tg
        rest match {
          case Str(bt) :: more =>
            baseTime = bt
            more.headOption.foreach { case Str(bn) => baseName = bn; case _ => }
          case _ =>
        }
      case Call("between", List(a, b)) =>
        between = Some((evalTimeBound(a), evalTimeBound(b)))
      case Call("between", List(a, b, p)) =>
        // between(a, b, period): the generator emits a time-bucket
        // GROUP BY — `round(time/period)*period` (fm_dbsrc.go:180-227),
        // column strings become aggregate expressions over the bucket
        between = Some((evalTimeBound(a), evalTimeBound(b)))
        periodNs = Some(p match {
          case Str(d) => graft.time.TimeFns.parseDurationNs(d)
          case Num(n) => n.toLong
          case other => throw new IllegalArgumentException(s"bad period: $other")
        })
      case Call("limit", List(Num(n))) => limitN = Some(n.toInt)
      case Call("limit", List(Num(o), Num(n))) =>
        offsetN = o.toInt; limitN = Some(n.toInt)
      case _ =>
    }
    require(table.nonEmpty, "SQL_SELECT requires from(table, tag)")
    dumpArg(args) match {
      case Some(escape) =>
        return sqlDumpPipe(spark, needKey, escape, refSqlText(
          version = 1, cols, table, tag, baseTime, baseName,
          between, periodNs, offsetN, limitN))
      case None =>
    }
    var df = spark.table(table).filter(col("name") === tag)
    between.foreach { case (a, b) =>
      df = Lake.betweenFilter(df, "time", a, b, nowNs)
    }
    df = periodNs match {
      case Some(p) =>
        // machbase round() is arithmetic (half-up) on the division
        val half = p / 2
        val timeNs = df.schema("time").dataType match {
          case org.apache.spark.sql.types.LongType => col("time")
          case _ => col("time").cast("decimal(38,9)")
            .*(lit(1000000000L)).cast("long")
        }
        val bucket = (floor((timeNs + half).cast("double") / p.toDouble)
          .cast("long") * p).as("time")
        val aggCols = cols.filterNot(_ == "time").map { c =>
          if (c.contains("(")) expr(c)
          else first(col(c)).as(c) // non-aggregated column: any member
        }
        require(aggCols.nonEmpty, "SQL_SELECT(period) needs a value column")
        df.groupBy(bucket).agg(aggCols.head, aggCols.tail: _*)
      case None => df.select(cols.map(c => expr(c)): _*)
    }
    val outCols = df.columns.toSeq
    // keyed + unlimited: the range sort inside zipRownum IS the time
    // ordering, so don't pay a second global sort on top of it
    val out =
      if (needKey && limitN.isEmpty && outCols.contains("time"))
        withRownum(df, Seq(col("time")))
      else {
        var ordered = df.orderBy("time")
        limitN.foreach(n => ordered = ordered.offset(offsetN).limit(n))
        if (needKey) withRownum(ordered) else ordered
      }
    Pipe(out, "_key", outCols)
  }

  private def compileQueryV1(spark: SparkSession, args: List[Expr], needKey: Boolean,
                             nowNs: Long): Pipe = {
    import Expr._
    import graft.operators.Lake
    val cols = args.collect { case Str(c) => c }
    var table = ""; var tag = ""; var timeCol = "time"; var baseName = "name"
    var between: Option[(Lake.TimeBound, Lake.TimeBound)] = None
    var periodNs: Option[Long] = None
    var limitN: Option[Int] = None
    var offsetN = 0
    args.foreach {
      case Call("from", fargs) => fargs match {
        case Str(t) :: Str(tg) :: rest =>
          table = t; tag = tg
          rest match {
            case Str(tc) :: more =>
              timeCol = tc
              more.headOption.foreach { case Str(bn) => baseName = bn; case _ => }
            case _ =>
          }
        case _ =>
      }
      case Call("between", List(a, b)) =>
        between = Some((evalTimeBound(a), evalTimeBound(b)))
      case Call("between", List(a, b, prd)) =>
        between = Some((evalTimeBound(a), evalTimeBound(b)))
        periodNs = Some(prd match {
          case Str(d) => graft.time.TimeFns.parseDurationNs(d)
          case Num(n) => n.toLong
          case other => throw new IllegalArgumentException(s"bad period: $other")
        })
      case Call("limit", List(Num(n))) => limitN = Some(n.toInt)
      case Call("limit", List(Num(o), Num(n))) =>
        offsetN = o.toInt; limitN = Some(n.toInt)
      case _ =>
    }
    require(table.nonEmpty, "QUERY requires from(table, tag)")
    dumpArg(args) match {
      case Some(escape) =>
        return sqlDumpPipe(spark, needKey, escape, refSqlText(
          version = 2, cols, table, tag, timeCol, baseName,
          between, periodNs, offsetN, limitN))
      case None =>
    }
    var df = spark.table(table).filter(col(baseName) === tag)
    between.foreach { case (a, b) => df = Lake.betweenFilter(df, timeCol, a, b, nowNs) }
    df = periodNs match {
      case Some(prd) =>
        // the generator's `round(time/period)*period` bucket — machbase
        // round() is arithmetic half-up (fm_dbsrc.go:188-227); column
        // strings are aggregate expressions over the bucket
        val half = prd / 2
        val timeNs = df.schema(timeCol).dataType match {
          case org.apache.spark.sql.types.LongType => col(timeCol)
          case _ => col(timeCol).cast("decimal(38,9)")
            .*(lit(1000000000L)).cast("long")
        }
        val bucket = floor((timeNs + half).cast("double") / prd.toDouble)
          .cast("long") * prd
        val aggCols = cols.map { c =>
          if (c.contains("(")) expr(c).as(c) else first(vcol(c)).as(c)
        }
        require(aggCols.nonEmpty, "QUERY(period) needs a value column")
        df.groupBy(bucket.as("__bucket_ns")).agg(aggCols.head, aggCols.tail: _*)
          .select(timestamp_micros(floor(col("__bucket_ns").cast("decimal(25,0)") / lit(1000))
            .cast("long")).as(timeCol) +: cols.map(vcol): _*)
      case None =>
        // time column surfaces as a datetime value (µs timestamp)
        df.select(
          timestamp_micros(floor(col(timeCol).cast("decimal(25,0)") / lit(1000)).cast("long")).as(timeCol) +:
            cols.map(vcol): _*)
    }
    var ordered = if (needKey) df else df.orderBy(timeCol)
    limitN.foreach { n =>
      ordered = (if (needKey) ordered.orderBy(timeCol) else ordered).offset(offsetN).limit(n)
    }
    val out = if (needKey) {
      if (limitN.isEmpty) withRownum(ordered, Seq(col(timeCol))) else withRownum(ordered)
    } else ordered
    Pipe(out, "_key", timeCol +: cols)
  }

  /** between() bound: ns literal (constant arithmetic folds — the
    * reference evaluates `123456789000-2.34*1000000000` in its expression
    * layer), time(ns), or 'now±dur' / 'last±dur'. */
  private def evalTimeBound(e: Expr): graft.operators.Lake.TimeBound = e match {
    case Expr.Num(v) => graft.operators.Lake.AbsNs(v.toLong)
    case Expr.Call("time", List(Expr.Num(v))) => graft.operators.Lake.AbsNs(v.toLong)
    case Expr.Str(s) => graft.operators.Lake.TimeBound.parse(s)
    case other => constNumOpt(other).map(v => graft.operators.Lake.AbsNs(v.toLong))
      .getOrElse(throw new IllegalArgumentException(s"unsupported time bound $other"))
  }

  /** dump(true[, escape]) detection: Some(escape) when the SQL text
    * should be emitted instead of executed (fm_dbsrc.go:816-833). */
  private def dumpArg(args: List[Expr]): Option[Boolean] = args.collectFirst {
    case Expr.Call("dump", dargs) => dargs match {
      case Expr.Bool(flag) :: rest =>
        if (!flag) None
        else Some(rest.headOption.collect { case Expr.Bool(b) => b }.getOrElse(false))
      case _ => None
    }
  }.flatten

  /** The reference generator's SQL text, byte-for-byte (fm_dbsrc.go
    * toSql/toSqlGroup:147-227; goldens in task_test.go TestQuerySql /
    * TestSqlSelect). version 1 = SQL_SELECT (columns as given), else
    * QUERY (baseTime prepended). Defaults: between('last-1s','last'),
    * limit(0, 1000000). */
  private def refSqlText(version: Int, cols: Seq[String], table: String, tag: String,
                         baseTime: String, baseName: String,
                         between: Option[(graft.operators.Lake.TimeBound, graft.operators.Lake.TimeBound)],
                         periodNs: Option[Long], offset: Int, limitN: Option[Int]): String = {
    import graft.operators.Lake
    val tU = table.toUpperCase
    def durStr(off: Long) = if (off == 0) "" else if (off < 0) off.toString else s"+$off"
    def part(bd: Lake.TimeBound): String = bd match {
      case Lake.LastRel(off) =>
        s"(SELECT MAX_TIME${durStr(off)} FROM V$$${tU}_STAT WHERE name = '$tag')"
      case Lake.NowRel(0L) => "now"
      case Lake.NowRel(off) => s"(now${durStr(off)})"
      case Lake.AbsNs(ns) => ns.toString
    }
    val (a, b) = between.getOrElse((Lake.LastRel(-1000000000L), Lake.LastRel(0L)))
    val where = s"$baseName = '$tag' AND $baseTime BETWEEN ${part(a)} AND ${part(b)}"
    val lim = s"LIMIT $offset, ${limitN.getOrElse(1000000)}"
    val colsOr = if (cols.nonEmpty) cols else Seq("value")
    periodNs match {
      case None =>
        val sel = if (version == 1) colsOr.mkString(", ")
                  else (baseTime +: colsOr).mkString(", ")
        s"SELECT $sel FROM $tU WHERE $where $lim"
      case Some(prd) =>
        val bucket = s"from_timestamp(round(to_timestamp($baseTime)/$prd)*$prd) $baseTime"
        val sel =
          if (version == 1) colsOr.map(c => if (c == baseTime) bucket else c).mkString(", ")
          else (bucket +: colsOr).mkString(", ")
        s"SELECT $sel FROM $tU WHERE $where GROUP BY $baseTime ORDER BY $baseTime $lim"
    }
  }

  /** A one-record SQLDUMP pipe carrying the generated SQL. */
  private def sqlDumpPipe(spark: SparkSession, needKey: Boolean, escape: Boolean,
                          sqlText: String): Pipe = {
    val text = if (escape) goQueryEscape(sqlText) else sqlText
    import spark.implicits._
    val df = Seq(text).toDF("SQLDUMP")
    Pipe(if (needKey) withRownum(df) else df, "_key", Seq("SQLDUMP"))
  }

  /** Go url.QueryEscape over a constant (escape=true dumps). */
  private[tql] def goQueryEscape(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
      .replace("*", "%2A").replace("%7E", "~")

  /** 'now[±dur]' literal → epoch ns off the injected clock, with the
    * reference's error wrapping (util/types.go:250-271 ToTime inside
    * fm_time.go's "invalid time expression" wrapper). */
  private def nowRelativeNs(strVal: String): Long = {
    val now = currentNowNs.get.longValue()
    val remain0 = strVal.substring(3).trim
    if (remain0.isEmpty) return now
    val (sig, remain) =
      if (remain0.startsWith("+")) (1L, remain0.substring(1).trim)
      else if (remain0.startsWith("-")) (-1L, remain0.substring(1).trim)
      else throw new IllegalArgumentException(
        s"invalid time expression: incompatible conv '$strVal' (string) to time.Time")
    val dur =
      try graft.time.TimeFns.parseDurationNs(remain)
      catch {
        case e: IllegalArgumentException => throw new IllegalArgumentException(
          s"invalid time expression: incompatible conv '$strVal', ${e.getMessage}")
      }
    now + sig * dur
  }

  /** Fold a compile-time epoch-ns expression (exact long arithmetic so
    * ns literals like 1685714509*1000000000 don't round through double). */
  private def evalConstNs(e: Expr): Long = e match {
    case Expr.Num(v) => v.toLong
    case Expr.Call("time", List(Expr.Str("now"))) => currentNowNs.get.longValue()
    case Expr.Call("time", List(Expr.Str(s))) if s.trim.startsWith("now") =>
      // time('now-1s') / time('now + 2h') — clock-relative literal
      nowRelativeNs(s.trim)
    case Expr.Call("time", List(x)) => evalConstNs(x)
    case Expr.Str(s) if s.trim == "now" || s.trim.startsWith("now-") ||
      s.trim.startsWith("now+") || s.trim.startsWith("now ") =>
      // bare 'now'/'now±dur' string where a time is expected
      // (oscillator range('now', …) — fm_fake.go)
      evalConstNs(Expr.Call("time", List(e)))
    case Expr.Call("timeAdd", List(x, Expr.Str(dur))) =>
      evalConstNs(x) + graft.time.TimeFns.parseDurationNs(dur)
    case Expr.Bin("*", a, b) => evalConstNs(a) * evalConstNs(b)
    case Expr.Bin("+", a, b) => evalConstNs(a) + evalConstNs(b)
    case Expr.Bin("-", a, b) => evalConstNs(a) - evalConstNs(b)
    case other => throw new IllegalArgumentException(s"not a constant time: $other")
  }

  /** Fold a compile-time string expression (literals + strTrimSpace +
    * strSprintf with constant args, Go verb subset). */
  /** CSV field() type cast, shared by the file and payload/literal
    * branches. datetimeType(unit): epoch numbers become real timestamps
    * (sink timeformat() modes then apply; TestTimeWindowMs); ns keeps
    * the raw long — the TQL ns convention, and a timestamp would
    * truncate sub-µs digits. */
  private def csvFieldCast(c: Column, t: String, targs: List[Expr]): Column = t match {
    case "doubleType" => c.cast("double")
    case "floatType" => c.cast("float")
    case "stringType" => c
    case "boolType" => c.cast("boolean")
    case "datetimeType" | "timeType" =>
      targs.collectFirst { case Expr.Str(u) => u }.getOrElse("ns") match {
        case "s" => timestamp_seconds(c.cast("long"))
        case "ms" => timestamp_millis(c.cast("long"))
        case "us" => timestamp_micros(c.cast("long"))
        case _ => c.cast("long")
      }
    case other => throw new IllegalArgumentException(s"unknown field type $other")
  }

  /** range(time, duration[, period]) validation with the reference's
    * arg-indexed diagnostics (fm_time.go fmTimeRange:23-51; TestRangeTime
    * pins each message). Returns (startNs, durationNs, periodNs). */
  private def rangeArgs(rargs: List[Expr]): (Long, Long, Long) = {
    def goType(e: Expr): String = e match {
      case Expr.Bool(_) => "bool"
      case Expr.Num(_) => "float64"
      case Expr.Str(_) => "string"
      case _ => "string"
    }
    def durOf(e: Expr, idx: Int, what: String): Long = e match {
      case Expr.Str(d) =>
        try graft.time.TimeFns.parseDurationNs(d)
        catch { case _: Exception => throw new IllegalArgumentException(
          s"f(range) arg($idx) should be $what, but ${goType(e)}") }
      case Expr.Num(n) => n.toLong
      case other => throw new IllegalArgumentException(
        s"f(range) arg($idx) should be $what, but ${goType(other)}")
    }
    require(rargs.size >= 2, "f(range) invalid number of args")
    val start = rargs.head match {
      case b @ Expr.Bool(_) => throw new IllegalArgumentException(
        s"f(range) arg(0) should be time, but ${goType(b)}")
      case e => evalConstNs(e)
    }
    val dur = durOf(rargs(1), 1, "duration")
    val per = if (rargs.size > 2) durOf(rargs(2), 2, "period") else 0L
    if (rargs.size > 2 && math.abs(dur) <= math.abs(per))
      throw new IllegalArgumentException(
        "f(range) arg(2) period should be smaller than duration")
    (start, dur, per)
  }

  private def constString(e: Expr): String = constStringOpt(e).getOrElse(
    throw new IllegalArgumentException(s"expected string literal, got $e"))

  private def constStringOpt(e: Expr): Option[String] = e match {
    case Expr.Str(v) => Some(v)
    case Expr.Call("payload", _) => paramFirst("payload")
    case Expr.Call("file", List(Expr.Str(path))) =>
      // file('path') content source for STRING/BYTES (fm_bytes.go
      // FilePath) — http(s) URLs fetch over the wire like the
      // reference's ssfs HttpFileSystem (task_test.go TestHttpFile)
      Some(new String(contentBytes(path), "UTF-8"))
    case Expr.Bin("??", l, r) => constStringOpt(l).orElse(constStringOpt(r))
    case Expr.Call("param", List(Expr.Str(n))) => paramFirst(n)
    case Expr.Bin("+", l, r) => // constant concatenation ('a' + 'b')
      for (a <- constStringOpt(l); b <- constStringOpt(r)) yield a + b
    case Expr.Call("strTrimSpace", List(x)) => constStringOpt(x).map(_.trim)
    case Expr.Call("strSprintf", Expr.Str(fmt) :: args) =>
      val vals = args.map {
        case Expr.Num(v) => v: Any
        case Expr.Str(v) => v: Any
        case Expr.Bool(b) => b: Any
        case _ => return None
      }
      Some(goSprintf(fmt, vals))
    case _ => None
  }

  /** Minimal Go-style Sprintf: %.f %q %s %d %g %f with width ignored. */
  private def goSprintf(fmt: String, args: Seq[Any]): String = {
    val out = new StringBuilder
    var ai = 0
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        var j = i + 1
        while (j < fmt.length && !"dfgqsv%".contains(fmt.charAt(j))) j += 1
        val spec = fmt.substring(i, j + 1)
        fmt.charAt(j) match {
          case '%' => out.append('%')
          case 'q' => out.append('"').append(String.valueOf(args(ai))).append('"'); ai += 1
          case 's' | 'v' => out.append(String.valueOf(args(ai))); ai += 1
          case 'd' => out.append(args(ai) match {
              case d: Double => d.toLong.toString
              case o => o.toString
            }); ai += 1
          case 'f' | 'g' =>
            val d = args(ai) match { case x: Double => x; case o => o.toString.toDouble }
            ai += 1
            val prec = "\\.([0-9]*)".r.findFirstMatchIn(spec).map(_.group(1))
            prec match {
              case Some("") => out.append(d.toLong.toString) // %.f
              case Some(p) => out.append(s"%.${p}f".format(d))
              case None => out.append(if (d == d.toLong) d.toLong.toString else d.toString)
            }
        }
        i = j + 1
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Parse '[[..],[..]]' JSON rows into literal cells (numbers/strings). */
  private def parseJsonRows(text: String): Seq[Seq[Any]] = {
    // reuse the TQL expression parser: JSON arrays are valid [..] literals
    Parser.parseExpression(text.replace("[", "[").replace("]", "]")) match {
      case Expr.Call("__arr", rows) if rows.forall(_.isInstanceOf[Expr.Call]) &&
          rows.collect { case Expr.Call("__arr", _) => 1 }.size == rows.size =>
        rows.map { case Expr.Call("__arr", cells) => cells.map(cellValue) }
      case Expr.Call("__arr", cells) => Seq(cells.map(cellValue))
      case other => throw new IllegalArgumentException(s"bad json rows: $text")
    }
  }

  private def cellValue(e: Expr): Any = e match {
    case Expr.Num(v) => v
    case Expr.Str(v) => v
    case Expr.Bool(b) => b
    case Expr.Null => null
    case other => throw new IllegalArgumentException(s"bad json cell $other")
  }

  private def buildLiteralDf(spark: SparkSession, parsed: Seq[Seq[Any]],
                             needKey: Boolean): Pipe = {
    require(parsed.nonEmpty, "json() needs rows")
    val nCols = parsed.head.size
    val names = (0 until nCols).map(i => s"column$i")
    val schema = org.apache.spark.sql.types.StructType(
      (0 until nCols).map { i =>
        val t = parsed.head(i) match {
          case _: java.lang.Double | _: Double => org.apache.spark.sql.types.DoubleType
          case _: java.lang.Boolean | _: Boolean => org.apache.spark.sql.types.BooleanType
          case _ => org.apache.spark.sql.types.StringType
        }
        org.apache.spark.sql.types.StructField(names(i), t)
      })
    val rowsJ = parsed.map(cs => org.apache.spark.sql.Row.fromSeq(cs))
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rowsJ).asJava), schema)
    Pipe(if (needKey) withRownum(df) else df, "_key", names)
  }

  /** Compile-time numeric folding for generator args —
    * FAKE(linspace(parseFloat(param("begin")), …)) (tqlcache_test.go). */
  private def constNumOpt(e: Expr): Option[Double] = e match {
    case Expr.Num(v) => Some(v)
    case Expr.Unary("-", x) => constNumOpt(x).map(v => -v)
    case Expr.Bin(op, l, r) =>
      for {
        a <- constNumOpt(l); b <- constNumOpt(r)
        v <- op match {
          case "+" => Some(a + b); case "-" => Some(a - b)
          case "*" => Some(a * b); case "/" => Some(a / b)
          case _ => None
        }
      } yield v
    case Expr.Call("parseFloat", List(x)) =>
      constStringOpt(x).flatMap(s => scala.util.Try(s.trim.toDouble).toOption)
    case Expr.Call("param", List(Expr.Str(n))) =>
      paramFirst(n).flatMap(s => scala.util.Try(s.trim.toDouble).toOption)
    case _ => None
  }

  private def compileFake(spark: SparkSession, gen0: Expr.Call, needKey: Boolean): Pipe = {
    import Expr._
    def keyed(df: org.apache.spark.sql.DataFrame, values: Seq[String]): Pipe =
      Pipe(if (needKey) withRownum(df) else df, "_key", values)
    // fold non-literal numeric args (param()/parseFloat) to literals
    val gen = Call(gen0.name, gen0.args.map(a =>
      if (a.isInstanceOf[Num]) a else constNumOpt(a).map(Num).getOrElse(a)))
    gen match {
      case Call("linspace", List(Num(a), Num(b), Num(n))) =>
        keyed(Fake.linspace(spark, a, b, n.toInt), Seq("x"))
      case Call("arrange", List(Num(a), Num(b), Num(s))) =>
        keyed(Fake.arrange(spark, a, b, s), Seq("x"))
      case Call("meshgrid", List(Call("linspace", List(Num(xa), Num(xb), Num(xn))),
                                 Call("linspace", List(Num(ya), Num(yb), Num(yn))))) =>
        keyed(Fake.meshgrid(spark, xa, xb, xn.toInt, ya, yb, yn.toInt), Seq("x", "y"))
      case Call("oscillator", args) =>
        // argument diagnostics mirror fm_fake.go fmOscillator
        // (tql_test.go FAKE_oscillator_* error battery)
        args.collectFirst { case Num(_) => () }.foreach { _ =>
          throw new IllegalArgumentException("f(oscillator) invalid arg type 'float64'")
        }
        val freqs = args.collect { case Call("freq", List(Num(hz), Num(amp))) => Fake.Freq(hz, amp) }
        val ranges = args.collect {
          case Call("range", rargs) => rangeArgs(rargs)
        }
        if (ranges.length > 1)
          throw new IllegalArgumentException("f(oscillator) duplicated time range")
        val rng = ranges.headOption.getOrElse(
          throw new IllegalArgumentException("f(oscillator) no time range is defined"))
        require(freqs.nonEmpty, "oscillator needs freq(hz, amp)")
        keyed(Fake.oscillator(spark, freqs, rng._1, rng._2, rng._3), Seq("time", "value"))
      case Call("sphere", List(Num(la), Num(lo))) =>
        keyed(Fake.sphere(spark, la.toInt, lo.toInt), Seq("x", "y", "z"))
      case Call("args", Nil) =>
        // FAKE(args()): sub-routine args as one record (task_test.go:1605)
        val vals = currentParams.get.getOrElse("args", Seq.empty)
        if (vals.isEmpty)
          keyed(spark.range(0).select(col("id").cast("string").as("column0")),
            Seq("column0"))
        else
          keyed(spark.createDataFrame(
            java.util.List.of(org.apache.spark.sql.Row.fromSeq(vals)),
            org.apache.spark.sql.types.StructType(vals.indices.map(i =>
              org.apache.spark.sql.types.StructField(s"column$i",
                org.apache.spark.sql.types.StringType)))),
            vals.indices.map(i => s"column$i"))
      case Call("linspace50", List(Num(a), Num(b))) =>
        // linspace with the reference's default sample count (fm_fake.go:328)
        keyed(Fake.linspace(spark, a, b, 50), Seq("x"))
      case Call("statz", Num(_) :: keyEs) =>
        // FAKE(statz(interval, 'key'…)): server-metrics timeseries — one
        // row per sample time, one column per key (tql_test.go:1865-1881)
        val keys = keyEs.collect { case Str(k) => k }
        require(keys.nonEmpty, "statz needs at least one metric key")
        val perKey = keys.map(k => k -> graft.server.Metrics.timeseries(k).toMap)
        val times = perKey.flatMap(_._2.keys).distinct.sorted
        val schema = org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("time",
            org.apache.spark.sql.types.TimestampType) +:
          keys.map(k => org.apache.spark.sql.types.StructField(k,
            org.apache.spark.sql.types.DoubleType)))
        val data: java.util.List[org.apache.spark.sql.Row] =
          scala.jdk.CollectionConverters.SeqHasAsJava(times.map { t =>
            val ts = new java.sql.Timestamp(Math.floorDiv(t, 1000000L))
            ts.setNanos(Math.floorMod(t, 1000000000L).toInt)
            org.apache.spark.sql.Row.fromSeq(
              (ts: Any) +: perKey.map { case (_, m) =>
                m.get(t).map(Double.box).orNull
              })
          }).asJava
        keyed(spark.createDataFrame(data, schema), "time" +: keys)

      case Call("once", List(Num(n))) =>
        // FAKE(once(v)): a single record carrying v (fm_fake.go doOnce) —
        // drives one execution of a statement sink (SQL_FLUSH case)
        keyed(spark.range(1).select(
          (if (n == math.rint(n)) lit(n.toLong) else lit(n)).as("x")), Seq("x"))
      case Call("json", List(textE)) if constStringOpt(textE).isDefined =>
        // FAKE(json('[1, "a"]')) — single-row (or rows of arrays) JSON text
        val text = constStringOpt(textE).get.trim
        val rowsText = if (text.startsWith("[[")) text else s"[$text]"
        val parsed = parseJsonRows(rowsText)
        buildLiteralDf(spark, parsed, needKey)

      case Call("json", List(Call("__obj", rows))) =>
        // FAKE(json({ [..],[..] })) — literal rows (reference fm_fake.go:175)
        val parsed: Seq[Seq[Any]] = rows.map {
          case Call("__arr", cells) => cells.map(cellValue)
          case other => throw new IllegalArgumentException(s"bad json row $other")
        }
        buildLiteralDf(spark, parsed, needKey)
      case Call("csv", List(arg)) =>
        // FAKE(csv(`literal`)) — rows as-is, all strings, no header logic
        val text = constString(arg)
        val lines = text.split("\n").toIndexedSeq.map(_.trim).filter(_.nonEmpty)
        require(lines.nonEmpty, "csv() literal is empty")
        val nCols = lines.head.split(",", -1).length
        val names = (0 until nCols).map(i => s"column$i")
        val schema = org.apache.spark.sql.types.StructType(
          names.map(n => org.apache.spark.sql.types.StructField(n,
            org.apache.spark.sql.types.StringType)))
        val rowsC = lines.map(l => org.apache.spark.sql.Row.fromSeq(
          l.split(",", -1).toSeq.map(_.trim: Any)))
        val df = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rowsC).asJava), schema)
        keyed(df, names)
      case other => throw new IllegalArgumentException(s"unsupported FAKE generator: $other")
    }
  }

  // ---------------- maps ----------------
  private def compileMap(p: Pipe, st: Statement): Pipe = {
    import Expr._
    st.call match {
      case Call("SCRIPT", args) => compileScriptMap(p, args)

      case Call("WHEN", List(cond, action)) =>
        runWhen(p, cond, action)
        p // WHEN is a pass-through with side effects (fm_monad.go:2171)

      case Call("FILTER", List(cond)) =>
        p.copy(df = p.df.filter(toColumn(cond, p)))

      case Call("TAKE", args) =>
        val (off, n) = args match {
          case List(Num(n)) => (0, n.toInt)
          case List(Num(o), Num(n)) => (o.toInt, n.toInt)
          case _ => throw new IllegalArgumentException("TAKE(n) or TAKE(offset, n)")
        }
        // fm_monad.go:50 — an explicit two-arg limit must be positive
        if (args.size == 2 && n <= 0) throw new IllegalArgumentException(
          "f(TAKE) arg(1) limit should be larger than 0")
        // Keyless pipeline (TAKE/DROP were the only order consumers):
        // per-partition prefix-take + deterministic concat — early-
        // terminates upstream like the reference's circuit-break and is
        // arrival-order-deterministic even when a sink projection sits
        // above (where a bare offset/limit would plan a GlobalLimit under
        // a fetch-order-randomized single-partition shuffle).
        if (p.df.columns.contains(p.keyCol))
          p.copy(df = p.df.orderBy(col(p.keyCol)).offset(off).limit(n))
        else
          p.copy(df = graft.operators.RowOps.takeArrival(p.df, off, n))

      case Call("DROP", args) =>
        val (off, n) = args match {
          case List(Num(n)) => (0, n.toInt)
          case List(Num(o), Num(n)) => (o.toInt, n.toInt)
          case _ => throw new IllegalArgumentException("DROP(n) or DROP(offset, n)")
        }
        if (args.size == 2 && n <= 0) throw new IllegalArgumentException(
          "f(DROP) arg(1) limit should be larger than 0")
        if (p.df.columns.contains(p.keyCol))
          p.copy(df = graft.operators.RowOps.drop(p.df, Seq(col(p.keyCol)), off, n))
        else
          // keyless drop needs a rownum, but not a sort: zipRownum over
          // the natural order (codegen partition-offset path when the
          // plan is shuffle-free) — a bare `offset(n)` would funnel the
          // full remainder through one shuffle partition AND lose
          // arrival-order determinism on a cluster
          p.copy(df = graft.operators.RowOps.drop(p.df, Nil, off, n))

      case Call("MAPVALUE", Num(idx) :: expr :: rest) if idx < 0 =>
        // MAPVALUE(-1, expr) prepends — equiv. PUSHVALUE(0, expr)
        // (reference fm_monad.go:1612+ negative-index growth)
        val name = pushValueName(p, rest)
        val df = p.df.withColumn(name, pushValueExpr(expr, rest, p))
        p.copy(df = df, values = name +: p.values)

      case Call("MAPVALUE", Num(idx) :: expr :: rest) =>
        val name = rest.collectFirst { case Str(s) => s }
          .getOrElse(if (idx.toInt < p.values.size) p.values(idx.toInt)
                     else pushValueName(p, rest))
        val c0 = toColumn(expr, p)
        // nullValue(alt) substitutes a null RESULT; where(pred) keeps the
        // ORIGINAL value on replace (fm_monad.go:1745-1804 wherePredicate
        // only assigns when true) but nulls on growth (push path)
        val cNv = rest.collectFirst { case Call("nullValue", List(nv)) =>
          coalesce(c0, toColumn(nv, p)) }.getOrElse(c0)
        val c =
          if (idx.toInt < p.values.size)
            rest.collectFirst { case Call("where", List(pred)) =>
              when(toColumn(pred, p), cNv).otherwise(p.df(p.values(idx.toInt))) }.getOrElse(cNv)
          else
            rest.collectFirst { case Call("where", List(pred)) =>
              when(toColumn(pred, p), cNv) }.getOrElse(cNv)
        val i = idx.toInt
        if (i < p.values.size) {
          // replace in place (possibly renaming)
          val old = p.values(i)
          val oldType = p.df.schema(old).dataType
          var df = p.df.withColumn(s"__new_$i", c).drop(old)
            .withColumnRenamed(s"__new_$i", name)
          // a dict() value keeps the column's DECLARED type in the wire
          // envelope (the reference's column metadata is static while
          // values are dynamic — TestDict pins types:["double"])
          if (df.schema(name).dataType.isInstanceOf[org.apache.spark.sql.types.MapType] &&
            !oldType.isInstanceOf[org.apache.spark.sql.types.MapType]) {
            val meta = new org.apache.spark.sql.types.MetadataBuilder()
              .putString("machtype", graft.sinks.Codecs.typeName(oldType)).build()
            df = df.withColumn(name, df(name).as(name, meta))
          }
          p.copy(df = df, values = p.values.updated(i, name))
        } else {
          // grow the tuple (reference allows appending at next index)
          p.copy(df = p.df.withColumn(name, c), values = p.values :+ name)
        }

      case Call("PUSHVALUE", Num(idx) :: expr :: rest) =>
        val name = pushValueName(p, rest)
        val df = p.df.withColumn(name, pushValueExpr(expr, rest, p))
        val i = math.max(0, math.min(idx.toInt, p.values.size))
        p.copy(df = df, values = (p.values.take(i) :+ name) ++ p.values.drop(i))

      case Call("POPVALUE", idxs) =>
        val drop = idxs.collect { case Num(i) => i.toInt }.toSet
        val keep = p.values.zipWithIndex.filterNot { case (_, i) => drop(i) }.map(_._1)
        p.copy(df = p.df.drop(p.values.zipWithIndex.filter { case (_, i) => drop(i) }.map(_._1): _*),
          values = keep)

      case Call("SET", List(Str(name), expr)) =>
        // record variable, referenced later as $name
        p.copy(df = p.df.withColumn(s"$$$name", toColumn(expr, p)))

      case Call("SET", List(Ident(name), expr)) =>
        // call form `SET(name, expr)` (fm_script_test.go:423-435)
        p.copy(df = p.df.withColumn(s"$$$name", toColumn(expr, p)))

      case Call("MAPKEY", List(expr)) =>
        // replace the key without demoting the old one (fm_monad.go:1515+)
        val df = p.df.withColumn("__newkey", toColumn(expr, p))
          .drop(p.keyCol).withColumnRenamed("__newkey", "_key")
        p.copy(df = df, keyCol = "_key", keyName = "key")

      case Call("MAPKEY", args) =>
        // a bad arg count is a PER-RECORD error in the reference — the
        // task logs it and drops each record, so the sink still replies
        // success with the source columns and zero rows
        // (http_test.go TestTQL_SyntaxErrors mapkey_wrong_argument)
        TqlLog.log("ERROR",
          s"f(MAPKEY) invalid number of args; expect:1, actual:${args.size}")
        p.copy(df = p.df.limit(0))

      case Call("PUSHKEY", List(expr)) =>
        // demote current key into values (the rownum key surfaces as
        // "ROWNUM", a previously-pushed key as "key" — fm_monad.go:1578
        // result-column naming), new key from expr. Chained PUSHKEYs need
        // distinct demoted names (TestMath pushes twice before popping
        // both back).
        val base = if (p.keyCol == "_key") p.keyName else p.keyCol
        val demoted =
          if (!p.values.contains(base)) base
          else {
            var i = 1
            while (p.values.contains(s"${base}_$i")) i += 1
            s"${base}_$i"
          }
        val df = p.df.withColumn("__newkey", toColumn(expr, p))
          .withColumnRenamed(p.keyCol, demoted)
          .withColumnRenamed("__newkey", "_key")
        p.copy(df = df, keyCol = "_key", values = demoted +: p.values,
          keyName = "key")

      case Call("POPKEY", args) =>
        // pop value[nth] back into the key — removed BY INDEX, since
        // chained pushes can briefly hold same-named value columns
        val nth = args.collectFirst { case Num(n) => n.toInt }.getOrElse(0)
        val newKey = p.values(nth)
        val df = p.df.drop(p.keyCol)
        p.copy(df = df, keyCol = newKey,
          values = p.values.patch(nth, Nil, 1), keyName = newKey)

      case Call("FLATTEN", Nil) =>
        // explode every array-typed value column (reference explodes the
        // tuple); relational operators (FFT) already emit flat rows, so a
        // FLATTEN over a frame with no array columns is the identity
        val arrayCols = p.values.filter(v =>
          p.df.schema(v).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        arrayCols match {
          case Seq() => p
          case Seq(one) =>
            p.copy(df = p.df.withColumn(one, explode(col(one))))
          case _ => throw new IllegalArgumentException("FLATTEN expects one array value column")
        }

      case Call("GROUP", args) =>
        compileGroup(p, args)

      // ---- sequential MAP_* statements: record-order semantics over the
      // rownum key, mirroring the reference's single-stream state
      // (fm_monad.go MAP_DIFF 1806+, MAP_AVG 1993+, MAP_MOVAVG 2023+,
      // MAP_LOWPASS 2081+). Whole-stream = one logical series.
      case Call("MAP_DIFF", Num(idx) :: v :: rest) =>
        val (c, isTs) = diffInput(v, p)
        seqMapValue(p, idx.toInt, rest,
          if (isTs) graft.operators.SeqOps.mapDiffTimeNs(c, Seq(lit(1)), col(p.keyCol))
          else graft.operators.SeqOps.mapDiff(c, Seq(lit(1)), col(p.keyCol)))
      case Call("MAP_ABSDIFF", Num(idx) :: v :: rest) =>
        val (c, isTs) = diffInput(v, p)
        seqMapValue(p, idx.toInt, rest,
          if (isTs) graft.operators.SeqOps.mapDiffTimeNs(c, Seq(lit(1)), col(p.keyCol), abs = true)
          else graft.operators.SeqOps.mapAbsDiff(c, Seq(lit(1)), col(p.keyCol)))
      case Call("MAP_NONEGDIFF", Num(idx) :: v :: rest) =>
        val (c, isTs) = diffInput(v, p)
        seqMapValue(p, idx.toInt, rest,
          if (isTs) graft.operators.SeqOps.mapDiffTimeNs(c, Seq(lit(1)), col(p.keyCol), nonNeg = true)
          else graft.operators.SeqOps.mapNonNegDiff(c, Seq(lit(1)), col(p.keyCol)))
      case Call("MAP_AVG", Num(idx) :: v :: rest) =>
        seqMapValue(p, idx.toInt, rest,
          graft.operators.SeqOps.mapAvg(toColumn(v, p).cast("double"), Seq(lit(1)), col(p.keyCol)))
      case Call("MAP_LOWPASS", Num(idx) :: v :: Num(alpha) :: rest) =>
        // recursive y=(1-a)y+ax over record order via the per-series scan
        require(alpha > 0 && alpha < 1,
          "MAP_LOWPASS() should have 0 < alpha < 1 ") // fm_monad_test.go:59
        val tmp = p.df.withColumn("__lp_in", toColumn(v, p).cast("double"))
          .withColumn("__series", lit(1))
        val scanned = graft.operators.SeqOps.lowpass(
          tmp, "__series", p.keyCol, "__lp_in", alpha, "__lp_out")
          .drop("__lp_in", "__series")
        scanResult(p, idx.toInt, rest, scanned, "__lp_out")

      case Call("MAP_KALMAN", Num(idx) :: v :: rest) =>
        // 1-D Kalman over record order; model('simple', iv, pv, ov)
        // defaults 2.0/0.01/2.0 (fm_monad.go:1908-1991, 1936-1944)
        val vars = rest.collectFirst {
          case Call("model", margs) => margs.collect { case Num(x) => x }
        }.getOrElse(Nil)
        val tmp = p.df.withColumn("__kf_in", toColumn(v, p).cast("double"))
          .withColumn("__series", lit(1))
        val scanned = graft.operators.SeqOps.kalman(
          tmp, "__series", p.keyCol, "__kf_in",
          vars.lift(0).getOrElse(2.0), vars.lift(1).getOrElse(0.01),
          vars.lift(2).getOrElse(2.0), "__kf_out")
          .drop("__kf_in", "__series")
        scanResult(p, idx.toInt, rest, scanned, "__kf_out")

      case Call("MAP_DISTANCE", Num(idx) :: pt :: rest) =>
        // per-leg haversine meters from the previous VALID point; 0 for
        // the first record and for (0,0)/non-latlon coords, which also
        // don't advance the previous point (fm_monad.go:2109-2143)
        val legs = pt match {
          case Call("latlon", List(la, lo)) =>
            graft.operators.SeqOps.legDistance(
              toColumn(la, p).cast("double"), toColumn(lo, p).cast("double"),
              Seq(lit(1)), col(p.keyCol))
          case _ => lit(0d)
        }
        seqMapValue(p, idx.toInt, rest, legs)

      case Call("THROTTLE", _) =>
        // real-time pacing (fm_monad.go fmThrottle) — a no-op on a batch
        // frame; the streaming edge paces via Subscribers.paced
        p

      case Call("MAP_MOVAVG", Num(idx) :: v :: Num(win) :: rest) =>
        val noWait = rest.exists { case Call("noWait", _) => true; case _ => false }
        seqMapValue(p, idx.toInt, rest,
          graft.operators.SeqOps.movAvg(toColumn(v, p).cast("double"), Seq(lit(1)), col(p.keyCol),
            win.toInt, noWait))

      case Call("FILTER_CHANGED", v :: rest) =>
        val retain = rest.collectFirst {
          case Call("retain", List(timeE, Str(dur))) =>
            (nsLongOf(timeE, p), graft.time.TimeFns.parseDurationNs(dur))
        }
        val useFirstLast = rest.collectFirst {
          case Call("useFirstWithLast", List(Bool(b))) => b
          case Call("useFirstWithLast", Nil) => false
        }
        retain match {
          case Some((rtime, durNs)) =>
            // retain(time, dur): the stabilization-record rule; the
            // useFirstWithLast option swaps in the run opener + EOF tail
            p.copy(df = graft.operators.SeqOps.filterChangedRetain(
              p.df, toColumn(v, p), Seq(lit(1)), col(p.keyCol), rtime, durNs,
              useFirst = useFirstLast.isDefined,
              withLast = useFirstLast.getOrElse(false)))
          case None if useFirstLast.contains(true) =>
            // useFirstWithLast(false) is identical to plain FILTER_CHANGED
            // (fm_monad.go withLast branch; tql_test.go pins both spellings)
            p.copy(df = graft.operators.SeqOps.filterChangedFirstLast(
              p.df, toColumn(v, p), Seq(lit(1)), col(p.keyCol)))
          case None =>
            p.copy(df = graft.operators.SeqOps.filterChanged(
              p.df, toColumn(v, p), Seq(lit(1)), col(p.keyCol)))
        }

      case Call("GROUPBYKEY", _) =>
        // records are already key-addressable; downstream whole-key
        // operators (FFT) consume the keyed frame directly
        p

      case Call("FFT", args) =>
        val minHz = args.collectFirst { case Call("minHz", List(Num(v))) => v }.getOrElse(0d)
        val maxHz = args.collectFirst { case Call("maxHz", List(Num(v))) => v }.getOrElse(Double.MaxValue)
        // samples must be (time, value) tuples: wider errors with the
        // reference diagnostic, narrower drops every record
        // (tql_test.go FFT_not_enough_samples_0 / _16)
        if (p.values.size > 2) throw new IllegalArgumentException(
          s"f(FFT) sample should be a tuple of (time, value), but len=${p.values.size}")
        if (p.values.size < 2) {
          val df = p.df.filter(lit(false))
            .select(col(p.keyCol).as("key"), lit(0d).as("hz"), lit(0d).as("amp"))
          Pipe(df, "key", Seq("hz", "amp"))
        } else {
          val df = graft.operators.FftOp.perKey(
            p.df, p.keyCol, p.values(0), p.values(1), minHz, maxHz)
          Pipe(df, "key", Seq("hz", "amp"))
        }

      case Call("TRANSPOSE", args) =>
        // TRANSPOSE(fixed(i…)) keeps listed columns fixed and unpivots the
        // rest; TRANSPOSE(i…) unpivots the listed columns. header(true)
        // consumes the FIRST RECORD as column labels and adds a "header"
        // column carrying the melted labels (reference
        // fm_monad.go:2415-2594; golden transpose_hdr/transpose_nohdr).
        val withHeader = args.exists {
          case Call("header", Nil) => true
          case Call("header", List(Bool(b))) => b
          case _ => false
        }
        val fixedIdx = args.collect { case Call("fixed", idxs) =>
          idxs.collect { case Num(i) => i.toInt } }.flatten.toSet
        val bareIdx = args.collect { case Num(i) => i.toInt }.toSet
        val fixedCols =
          if (fixedIdx.nonEmpty) p.values.zipWithIndex.filter { case (_, i) => fixedIdx(i) }.map(_._1)
          else if (bareIdx.nonEmpty) p.values.zipWithIndex.filterNot { case (_, i) => bareIdx(i) }.map(_._1)
          else Seq.empty // no selection → melt every value column
        val meltCols = p.values.filterNot(fixedCols.contains)
        if (!withHeader) {
          val df0 = graft.operators.RowOps.transpose(
            p.df.select(p.values.map(vcol): _*), fixedCols).drop("name")
          // positional renames column0..columnK, reference style
          val outNames = (0 until fixedCols.size + 1).map(i => s"column$i")
          val df = df0.select(df0.columns.zip(outNames).map {
            case (c, n) => vcol(c).as(n) }: _*)
          p.copy(df = df, values = outNames)
        } else {
          // consume the first record (by key order) as labels
          val headRow = p.df.orderBy(col(p.keyCol)).limit(1)
            .select(p.values.map(vcol): _*).collect()(0)
          val label = p.values.zipWithIndex.map { case (c, i) =>
            c -> String.valueOf(headRow.get(i)) }.toMap
          val rest = p.df.join(headRow match { case _ =>
            p.df.orderBy(col(p.keyCol)).limit(1).select(col(p.keyCol))
          }, Seq(p.keyCol), "left_anti")
          val df0 = graft.operators.RowOps.transpose(
            rest.select(p.values.map(vcol): _*), fixedCols)
          // melted labels via the header row
          val nameMapped = meltCols.foldLeft(df0.withColumn("header", col("name"))) {
            (d, c) => d.withColumn("header",
              when(col("header") === c, label(c)).otherwise(col("header")))
          }.drop("name")
          val valueName = s"column${fixedCols.size + 1}"
          val outFixed = fixedCols.map(c => vcol(c).as(label(c)))
          val df = nameMapped.select(
            outFixed ++ Seq(col("header"), col("value").as(valueName)): _*)
          p.copy(df = df, values = fixedCols.map(label) ++ Seq("header", valueName))
        }

      case Call("TIMEWINDOW", fromE :: untilE :: periodE :: colSpecs) =>
        // standalone TIMEWINDOW (fm_time.go:426-533, deprecated alias of
        // GROUP(timewindow)): ABSOLUTE period-aligned windows
        // w = floor(ts/period)·period kept when from <= w < until;
        // positional column specs name the record's columns, 'time'
        // marks the time column, others are aggregators (optional
        // ':predictor' suffix selects the gap filler).
        import graft.operators.GapFill
        val fromNs = evalConstNs(fromE)
        val untilNs = evalConstNs(untilE)
        val periodNs = periodE match {
          case Call("period", List(Str(d))) => graft.time.TimeFns.parseDurationNs(d)
          case Call("period", List(n)) => evalConstNs(n)
          case Str(d) => graft.time.TimeFns.parseDurationNs(d)
          case n => evalConstNs(n)
        }
        if (untilNs - fromNs <= periodNs) throw new IllegalArgumentException(
          "f(TIMEWINDOW) arg(0) from ~ until should be larger than period")
        val specs = colSpecs.collect { case Str(s) => s }
        val timeIdx = specs.indexWhere(_.equalsIgnoreCase("time"))
        require(timeIdx >= 0, "TIMEWINDOW requires a 'time' column spec")
        val firstW = Math.floorDiv(fromNs + periodNs - 1, periodNs) * periodNs
        val lastWExcl = (Math.floorDiv(untilNs - 1, periodNs) + 1) * periodNs
        var fill: GapFill.Fill = colSpecs.collectFirst {
          case Call("nullValue", List(Num(v))) => GapFill.FillConst(v)
        }.getOrElse(GapFill.FillNull)
        val aggs = specs.zipWithIndex.filterNot(_._2 == timeIdx).map { case (spec, i) =>
          val (fn, predict) = spec.indexOf(':') match {
            case -1 => (spec, "")
            case at => (spec.take(at), spec.drop(at + 1))
          }
          predict.toLowerCase match {
            case "" =>
            case "piecewiseconstant" => fill = GapFill.FillPrevious
            case "piecewiselinear" => fill = GapFill.FillLinear
            case "akimaspline" => fill = GapFill.FillAkima
            case "fritschbutland" => fill = GapFill.FillFritschButland
            case "linearregression" => fill = GapFill.FillLinReg
            case k => throw new IllegalArgumentException(s"unknown predictor($k)")
          }
          p.values(i) -> buildAgg(fn, col(p.values(i)), p)
        }
        require(aggs.nonEmpty, "TIMEWINDOW needs at least one aggregator column")
        val timeName = p.values(timeIdx)
        // time can arrive as epoch-ns long or as a timestamp (CSV
        // datetimeType sources) — normalize to ns for the bucketing
        val tsNs = p.df.schema(timeName).dataType match {
          case _: org.apache.spark.sql.types.TimestampType =>
            unix_micros(col(timeName)) * 1000L
          case _ => col(timeName).cast("long")
        }
        val out = GapFill.timewindow(p.df.sparkSession, p.df,
            tsNs, firstW, lastWExcl, periodNs, aggs, fill)
          // buckets surface as timestamps so the sink's timeformat()
          // modes apply (ms golden renders epoch-ms)
          .withColumn("bucket_ns", timestamp_micros(expr("bucket_ns div 1000")))
          .withColumnRenamed("bucket_ns", timeName)
        val ordered = p.values.indices.map(i => p.values(i))
        Pipe(out.select(ordered.map(col): _*), timeName, ordered)

      case Call("BOXPLOT", bpArgs) =>
        compileBoxplot(p, bpArgs)

      case Call("HISTOGRAM", v :: rest) =>
        rest.collectFirst {
          case Call("bins", List(Num(a), Num(b), Num(s0))) => (a, b, s0)
        } match {
          case Some((minV, maxV, step)) =>
            val df = graft.operators.StatOps.histogram(
              p.df.sparkSession, p.df, toColumn(v, p), minV, maxV, step)
            Pipe(df, "low", Seq("low", "high", "count"))
          case None =>
            // bins(n): unpredicted bins — the reference's streaming
            // merge-closest sketch, fed in record order (bounded state)
            val maxBins = rest.collectFirst {
              case Call("bins", List(Num(n))) => n.toInt
            }.getOrElse(throw new IllegalArgumentException(
              "HISTOGRAM needs bins(min,max,step) or bins(n)"))
            val spark = p.df.sparkSession
            import spark.implicits._
            val hist = new graft.operators.StatOps.StreamingHistogram(maxBins)
            val vals = p.df.orderBy(col(p.keyCol))
              .select(toColumn(v, p).cast("double"))
            import scala.jdk.CollectionConverters._
            vals.toLocalIterator().asScala.foreach(r => hist.add(r.getDouble(0)))
            Pipe(hist.bins.toDF("value", "count"), "value", Seq("value", "count"))
        }

      case other => throw new IllegalArgumentException(s"unsupported map: ${st.text}")
    }
  }

  /** Go strings.Replace semantics: first n occurrences (n<0 = all). */
  private lazy val replaceNUdf = udf { (s: String, from: String, to: String, n: Int) =>
    if (s == null) null
    else if (n < 0) s.replace(from, to)
    else {
      val sb = new StringBuilder
      var i = 0; var done = 0
      while (i < s.length) {
        if (done < n && s.startsWith(from, i) && from.nonEmpty) {
          sb.append(to); i += from.length; done += 1
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
  }

  /** MAP_* helper for per-series-scan results: the scan appended
    * `outCol`; land it in value slot `idx` under the declared name. */
  private def scanResult(p: Pipe, idx: Int, rest: List[Expr],
                         scanned: DataFrame, outCol: String): Pipe = {
    val name = rest.collectFirst { case Expr.Str(nm) => nm }
      .getOrElse(if (idx < p.values.size) p.values(idx) else s"value_$idx")
    if (idx < p.values.size) {
      val old = p.values(idx)
      p.copy(df = scanned.drop(old).withColumnRenamed(outCol, name),
        values = p.values.updated(idx, name))
    } else {
      p.copy(df = scanned.withColumnRenamed(outCol, name), values = p.values :+ name)
    }
  }

  /** MAP_* helper: write a sequential result into value slot `idx`. */
  private def seqMapValue(p: Pipe, idx: Int, rest: List[Expr], c: Column): Pipe = {
    val name = rest.collectFirst { case Expr.Str(s) => s }
      .getOrElse(if (idx < p.values.size) p.values(idx) else s"value_$idx")
    if (idx < p.values.size) {
      val old = p.values(idx)
      val df = p.df.withColumn(s"__seq_$idx", c).drop(old)
        .withColumnRenamed(s"__seq_$idx", name)
      p.copy(df = df, values = p.values.updated(idx, name))
    } else {
      p.copy(df = p.df.withColumn(name, c), values = p.values :+ name)
    }
  }

  private val aggNames = Set("count", "sum", "min", "max", "avg", "mean", "first", "last",
    "stddev", "variance", "stderr", "entropy", "median", "medianInterpolated",
    "quantile", "quantileInterpolated", "rss", "rms", "list", "mode",
    "cdf", "moment", "lrs", "correlation", "covariance")

  /** aggregator trailing args that are options, not value expressions
    * (newAggregate's switch — fm_monad.go:911-930). */
  private def isAggOption(e: Expr): Boolean = e match {
    case Expr.Str(_) => true
    case Expr.Call("where" | "weight" | "nullValue" | "predict", _) => true
    case _ => false
  }

  /** gonum stat.Quantile Empirical: smallest v_i with (i+1)/n >= p. */
  private def quantileEmpirical(c: Column, p: Double): Column = {
    val sorted = array_sort(collect_list(c))
    element_at(sorted, greatest(ceil(lit(p) * size(sorted)), lit(1L)).cast("int"))
  }

  /** gonum stat.Quantile LinInterp: CDF(v_i)=(i+1)/n piecewise-linear. */
  private def quantileLinInterp(c: Column, q: Double): Column = {
    val sorted = array_sort(collect_list(c))
    val n = size(sorted)
    val pos = greatest(lit(q) * n - 1.0d, lit(0d))
    val k = floor(pos).cast("int")
    val f = pos - k
    val lo = element_at(sorted, k + 1)
    val hi = element_at(sorted, least(k + 2, n))
    lo + (hi - lo) * f
  }

  /** Aggregator builder shared by GROUP and GROUP(timewindow). Numeric
    * aggregators coerce to double like the reference's float64 buffers
    * (fm_monad.go:784-809); first/last follow record order (key). */
  private def buildAgg(fn: String, raw: Column, p: Pipe): Column = {
    val c = raw.cast("double")
    fn match {
      // the reference aggregators buffer float64 — counts render "4.00"
      // under precision(2) (TestGroup)
      case "count" => count(raw).cast("double")
      case "sum" => sum(c)
      case "min" => min(c)
      case "max" => max(c)
      case "avg" | "mean" => avg(c)
      // ordering masked where the value is null so where()-filtered and
      // null records don't win the first/last slot (TestGroupWhere)
      case "first" => min_by(raw, when(raw.isNotNull, col(p.keyCol)))
      case "last" => max_by(raw, when(raw.isNotNull, col(p.keyCol)))
      case "stddev" => stddev_samp(c)
      case "variance" => var_samp(c)
      case "stderr" => stddev_samp(c) / sqrt(count(c))
      case "entropy" => graft.functions.StatFns.entropy(c)
      case "median" => quantileEmpirical(c, 0.5)
      case "medianInterpolated" | "median-interpolated" => quantileLinInterp(c, 0.5)
      case "rss" => sqrt(sum(c * c))
      case "rms" => sqrt(avg(c * c))
      case "list" => collect_list(raw)
      case other => throw new IllegalArgumentException(
        s"aggregator $other needs its argument list here (use GROUP)")
    }
  }

  /** BOXPLOT(value, category(), order(), boxplotInterp(q1,q2,q3),
    * boxplotOutput('standard'|'dict'|'chart')) — fm_stat.go:294-533.
    * Per-category quartiles with gonum Empirical/LinInterp selection,
    * 1.5·IQR whiskers, outliers; three output wire shapes. The grouping
    * and value collection run in Spark (one shuffle); the box math runs
    * on the driver over per-category arrays — output cardinality is the
    * category count. At 100 TB swap the exact quantiles for
    * percentile_approx per category; the wire shapes are unchanged.
    * Deviation: the standard format's OUTLIER row carries NULL cells
    * (Spark columns are typed double; the reference smuggles []any
    * through them and its CSV prints "[]interface {}") — outliers
    * travel properly in the dict/chart formats. */
  private def compileBoxplot(p: Pipe, args: List[Expr]): Pipe = {
    import Expr._
    import org.apache.spark.sql.types._
    import graft.operators.StatOps
    val spark = p.df.sparkSession
    val valueE = args.collectFirst {
      case e if !e.isInstanceOf[Call] => e
      case c @ Call(n, _) if !Set("category", "order", "boxplotInterp", "boxplotOutput")(n) => c
    }.getOrElse(throw new IllegalArgumentException("BOXPLOT needs a value expression"))
    val catE = args.collectFirst { case Call("category", List(e)) => e }
    val orders = args.collectFirst { case Call("order", os) =>
      os.collect { case Str(s) => s }
    }.getOrElse(Nil)
    val (iq1, iq2, iq3) = args.collectFirst {
      case Call("boxplotInterp", List(Bool(a), Bool(b), Bool(c))) => (a, b, c)
    }.getOrElse((false, false, false))
    val format = args.collectFirst {
      case Call("boxplotOutput", List(Str(f))) => f.toLowerCase
    }.getOrElse("standard")

    val catCol = catE.map(e => toColumn(e, p).cast("string")).getOrElse(lit(""))
    // Distributed two-phase plan: (1) per-category quartile agg — the
    // sort happens inside an executor-side aggregate, one shuffle, and
    // only #categories × 8 scalars reach the driver; (2) outliers are
    // re-filtered against the (broadcast-sized) bounds so the only
    // collected list is the outliers themselves, not the raw values.
    val vCol = toColumn(valueE, p).cast("double")
    val base = p.df.select(catCol.as("__cat"), vCol.as("__v"))
    def q(pq: Double, interp: Boolean) =
      if (interp) quantileLinInterp(col("__v"), pq) else quantileEmpirical(col("__v"), pq)
    val agg = base.groupBy("__cat").agg(
      min("__v").as("mn"), max("__v").as("mx"),
      q(0.25, iq1).as("q1"), q(0.5, iq2).as("q2"), q(0.75, iq3).as("q3"))
    val bounds = agg.withColumn("iqr", col("q3") - col("q1"))
      .withColumn("lo", col("q1") - lit(1.5) * col("iqr"))
      .withColumn("hi", col("q3") + lit(1.5) * col("iqr"))
    val outs = base.join(broadcast(bounds.select("__cat", "lo", "hi")), Seq("__cat"))
      .filter(col("__v") < col("lo") || col("__v") > col("hi"))
      .groupBy("__cat").agg(sort_array(collect_list(col("__v"))).as("outliers"))
    val rowsByCat = bounds.join(outs, Seq("__cat"), "left").collect().map { r =>
      r.getString(0) -> StatOps.BoxStats(
        r.getDouble(1), r.getAs[Double]("lo"), r.getAs[Double]("q1"),
        r.getAs[Double]("q2"), r.getAs[Double]("q3"), r.getAs[Double]("hi"),
        r.getDouble(2), r.getAs[Double]("iqr"),
        Option(r.getAs[scala.collection.Seq[Double]]("outliers"))
          .map(_.toSeq).getOrElse(Seq.empty))
    }.toMap
    val catNames = StatOps.sortCategoryNames(rowsByCat.keys.toSeq, orders)
    val stats = catNames.map(rowsByCat)
    def colName(c: String, i: Int) = if (c.isEmpty) s"boxplot_$i" else c

    format match {
      case "dict" =>
        def n(d: Double) = graft.sinks.Codecs.goFloat(d)
        val cells: Seq[Any] = stats.map { s =>
          s"""{"iqr":${n(s.iqr)},"lower":${n(s.lower)},"max":${n(s.max)},""" +
            s""""min":${n(s.min)},"outlier":[${s.outliers.map(n).mkString(",")}],""" +
            s""""q1":${n(s.q1)},"q2":${n(s.q2)},"q3":${n(s.q3)},"upper":${n(s.upper)}}"""
        }
        val schema = StructType(catNames.zipWithIndex.map { case (c, i) =>
          StructField(colName(c, i), StringType, nullable = true,
            new MetadataBuilder().putString("machtype", "dict").build())
        })
        val df = spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(
            Seq(org.apache.spark.sql.Row.fromSeq(cells))).asJava), schema)
        Pipe(df, schema.fieldNames.head, schema.fieldNames.toSeq)
      case "chart" =>
        val schema = StructType(Seq(
          StructField("CATEGORY", StringType),
          StructField("BOXPLOT", ArrayType(DoubleType)),
          StructField("OUTLIER", ArrayType(StructType(Seq(
            StructField("category", StringType), StructField("value", DoubleType)))))))
        val rows = catNames.zip(stats).map { case (c, s) =>
          org.apache.spark.sql.Row(c,
            Seq(s.lower, s.q1, s.q2, s.q3, s.upper),
            s.outliers.map(o => org.apache.spark.sql.Row(c, o)))
        }
        val df = spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
        Pipe(df, "CATEGORY", Seq("CATEGORY", "BOXPLOT", "OUTLIER"))
      case _ =>
        val schema = StructType(StructField("CATEGORY", StringType) +:
          catNames.zipWithIndex.map { case (c, i) =>
            StructField(colName(c, i), DoubleType)
          })
        def row(label: String, f: StatOps.BoxStats => Any) =
          org.apache.spark.sql.Row.fromSeq(label +: stats.map(f))
        val rows = Seq(
          row("MIN", _.min), row("LOWER", _.lower), row("Q1", _.q1),
          row("Q2", _.q2), row("Q3", _.q3), row("UPPER", _.upper),
          row("MAX", _.max), row("IQR", _.iqr),
          org.apache.spark.sql.Row.fromSeq("OUTLIER" +: stats.map(_ => null)))
        val df = spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
        Pipe(df, "CATEGORY", schema.fieldNames.toSeq)
    }
  }

  /** buildAgg plus the option-bearing forms: quantile(v, p[, weight()])
    * and weight()-carrying mean/avg/variance/stddev/stderr (reference
    * weighted aggregators, fm_monad.go; TestGroup weighted battery). */
  private def buildAggFull(fn: String, c0: Column, rest: List[Expr], p: Pipe): Column = {
    import graft.functions.StatFns
    val c = c0.cast("double")
    val weightE = rest.collectFirst {
      case Expr.Call("weight", List(we)) => toColumn(we, p).cast("double")
    }
    val pq = rest.collectFirst { case Expr.Num(v) => v }
    (fn, weightE) match {
      // cdf(v, q): empirical CDF at q (fm_monad.go:935-940, 1324-1329)
      case ("cdf", None) =>
        StatFns.cdf(c, pq.getOrElse(
          throw new IllegalArgumentException("cdf(v, q)")))
      case ("cdf", Some(w)) =>
        StatFns.weightedCdf(c, w, pq.getOrElse(
          throw new IllegalArgumentException("cdf(v, q)")))
      // moment(v, k): k-th central moment (fm_monad.go:970-975, gonum)
      case ("moment", None) =>
        graft.functions.MomentAgg.moment(c, pq.map(_.toInt).getOrElse(
          throw new IllegalArgumentException("moment(v, k)")))
      case ("moment", Some(w)) =>
        graft.functions.MomentAgg.weightedMoment(c, w, pq.map(_.toInt).getOrElse(
          throw new IllegalArgumentException("moment(v, k)")))
      // two-column relation aggregators (GroupColumnRelation,
      // fm_monad.go:1213-1240): lrs = OLS slope of y on x; weight()
      // rides the y-slice (nums.WeightedFloat64Slice) like gonum's
      // weighted stat.* forms
      case ("lrs" | "correlation" | "covariance", wOpt) =>
        val y = rest.find(e => !isAggOption(e))
          .map(e => toColumn(e, p).cast("double"))
          .getOrElse(throw new IllegalArgumentException(s"$fn(x, y)"))
        (fn, wOpt) match {
          case ("lrs", None) => StatFns.lrs(c, y)
          case ("lrs", Some(w)) => StatFns.weightedLrs(c, y, w)
          case ("correlation", None) => corr(c, y)
          case ("correlation", Some(w)) => StatFns.weightedCorrelation(c, y, w)
          case (_, None) => covar_samp(c, y)
          case (_, Some(w)) => StatFns.weightedCovariance(c, y, w)
        }
      case ("quantile", None) =>
        quantileEmpirical(c, pq.getOrElse(
          throw new IllegalArgumentException("quantile(v, p)")))
      case ("quantile", Some(w)) =>
        weightedQuantile(c, w, pq.getOrElse(
          throw new IllegalArgumentException("quantile(v, p)")))
      case ("quantileInterpolated", None) =>
        quantileLinInterp(c, pq.getOrElse(
          throw new IllegalArgumentException("quantileInterpolated(v, p)")))
      case ("mode", None) => mode(c)
      case ("mode", Some(w)) => weightedMode(c, w)
      case ("mean" | "avg", Some(w)) => StatFns.weightedMean(c, w)
      case ("variance", Some(w)) => StatFns.weightedVariance(c, w)
      case ("stddev", Some(w)) => sqrt(StatFns.weightedVariance(c, w))
      case ("stderr", Some(w)) =>
        sqrt(StatFns.weightedVariance(c, w)) / sqrt(count(c))
      case _ => buildAgg(fn, c0, p)
    }
  }

  /** Weighted empirical quantile: smallest v_i (value-sorted) whose
    * cumulative weight reaches p·Σw — gonum stat.Quantile with weights. */
  private def weightedQuantile(v: Column, w: Column, p: Double): Column = {
    val pairs = sort_array(collect_list(struct(v.as("v"), w.as("w"))))
    val total = aggregate(pairs, lit(0d), (acc, pr) => acc + pr.getField("w"))
    val scan = aggregate(pairs,
      struct(lit(0d).as("cum"), lit(null).cast("double").as("ans")),
      (acc, pr) => {
        val cum2 = acc.getField("cum") + pr.getField("w")
        struct(cum2.as("cum"),
          when(acc.getField("ans").isNull && cum2 >= lit(p) * total,
            pr.getField("v")).otherwise(acc.getField("ans")).as("ans"))
      })
    scan.getField("ans")
  }

  /** Weighted mode: the value whose weights sum highest. Sorted pairs
    * collapse into runs inside one aggregate-HOF scan (ties keep the
    * smallest value). */
  private def weightedMode(v: Column, w: Column): Column = {
    val pairs = sort_array(collect_list(struct(v.as("v"), w.as("w"))))
    val zero = struct(
      lit(null).cast("double").as("curV"), lit(0d).as("cur"),
      lit(null).cast("double").as("bestV"), lit(Double.MinValue).as("best"))
    val scanned = aggregate(pairs, zero,
      (acc, pr) => {
        val sameRun = acc.getField("curV") === pr.getField("v")
        val cur2 = when(sameRun, acc.getField("cur") + pr.getField("w"))
          .otherwise(pr.getField("w"))
        val closeBetter = acc.getField("curV").isNotNull && !sameRun &&
          acc.getField("cur") > acc.getField("best")
        struct(pr.getField("v").as("curV"), cur2.as("cur"),
          when(closeBetter, acc.getField("curV")).otherwise(acc.getField("bestV")).as("bestV"),
          when(closeBetter, acc.getField("cur")).otherwise(acc.getField("best")).as("best"))
      },
      acc => when(acc.getField("cur") > acc.getField("best"),
        acc.getField("curV")).otherwise(acc.getField("bestV")))
    scanned
  }

  private def compileGroup(p: Pipe, args: List[Expr]): Pipe = {
    import Expr._
    // GROUP(timewindow(from, until, period), aggs…) — tumbling buckets
    // over value(0) as time, empty buckets synthesized + gap-filled
    // (reference fm_monad.go:640-697)
    args.collectFirst { case Call("timewindow", twArgs) => twArgs } match {
      case Some(twArgs) => return compileTimewindow(p, twArgs, args)
      case None =>
    }
    // GROUP(by(time, timewindow(from, until, period) [, name]), aggs…) —
    // the CAUSAL per-aggregator-fill form (fm_monad GroupFillerPredict;
    // TestGroupByTimeWindow): each aggregator carries its own
    // nullValue()/predict(), fills fitted only on already-seen windows.
    args.collectFirst {
      case Call("by", timeE :: Call("timewindow", twArgs) :: byRest) =>
        (timeE, twArgs, byRest)
    } match {
      case Some((timeE, twArgs, byRest)) =>
        import graft.operators.GapFill
        def ns(e: Expr): Long = evalConstNs(e)
        val (fromNs, untilNs, periodNs) = twArgs match {
          case List(f, u, Call("period", List(Str(d)))) =>
            (ns(f), ns(u), graft.time.TimeFns.parseDurationNs(d))
          case List(f, u, per) => (ns(f), ns(u), ns(per))
          case _ => throw new IllegalArgumentException("timewindow(from, until, period)")
        }
        val byName = byRest.collectFirst { case Str(s) => s }.getOrElse("GROUP")
        val aggs = args.collect {
          case Call(fn, e :: rest) if aggNames(fn) =>
            val name = rest.collectFirst { case Str(s) => s }.getOrElse(fn.toUpperCase)
            val fill = GapFill.CausalFill(
              rest.collectFirst { case Call("predict", List(Str(k))) => k.toLowerCase },
              rest.collectFirst { case Call("nullValue", List(Num(v))) => v })
            (name, buildAggFull(fn, toColumn(e, p), rest, p), fill)
        }
        require(aggs.nonEmpty, "GROUP(timewindow) needs at least one aggregator")
        // ns-normalize on the TIME EXPRESSION's own type — not values.head,
        // which may be a different (non-time) column when time isn't first
        val timeType = p.df.select(toColumn(timeE, p)).schema.head.dataType
        val tsCol = timeType match {
          case _: org.apache.spark.sql.types.TimestampType =>
            unix_micros(toColumn(timeE, p)) * 1000L
          case _ => toColumn(timeE, p).cast("long")
        }
        // first window >= from, last window < until — ABSOLUTE alignment
        val firstW = Math.floorDiv(fromNs + periodNs - 1, periodNs) * periodNs
        val lastWExcl = (Math.floorDiv(untilNs - 1, periodNs) + 1) * periodNs
        val out = GapFill.timewindowCausal(p.df.sparkSession, p.df, tsCol,
          firstW, lastWExcl, periodNs, aggs, byName)
        return Pipe(out, byName, byName +: aggs.map(_._1))
      case None =>
    }
    var byExpr: Option[(Column, String)] = None
    val aggs = Vector.newBuilder[(Column, String)]
    val stringFills = scala.collection.mutable.Map.empty[String, String]
    args.foreach {
      case Call("by", e :: _) if (e match {
        // literal NULL, or a SET variable holding NULL (TestGroup)
        case Expr.Null => true
        case Expr.Var(n) if p.df.columns.contains(s"$$$n") =>
          p.df.schema(s"$$$n").dataType == org.apache.spark.sql.types.NullType
        case _ => false
      }) =>
        throw new IllegalArgumentException("GROUP() has by() with NULL")
      case Call("by", e :: rest) =>
        val name = rest.collectFirst { case Str(s) => s }.getOrElse("GROUP")
        byExpr = Some((toColumn(e, p), name))
      case Call("lazy", _) => // emission-order hint; hash agg + orderBy covers it
      case Call(fn, e :: rest) if aggNames(fn) =>
        // default result-column names are UPPERCASE (TestGroup header
        // GROUP,FIRST,LAST,AVG,SUM,COUNT); median/quantile share the
        // QUANTILE default
        val name = rest.collectFirst { case Str(s) => s }.getOrElse(
          if (fn == "median" || fn == "medianInterpolated" ||
            fn.startsWith("quantile")) "QUANTILE" else fn.toUpperCase)
        // where(pred): per-aggregator filter (reference fm_monad.go:559-563)
        val whereP = rest.collectFirst { case Call("where", List(pred)) => toColumn(pred, p) }
        val raw = toColumn(e, p)
        val c = whereP.map(w => when(w, raw)).getOrElse(raw)
        // count appends unconditionally — a null value still counts
        // (GroupColumnCounter.Append, fm_monad.go:1433-1437); only a
        // where() miss skips the record. Numeric aggregators silently
        // drop non-coercible values (push discards Append's error),
        // which cast("double")+null-skip already models.
        val built0 =
          if (fn == "count")
            whereP.map(w => count(when(w, lit(1)))).getOrElse(count(lit(1))).cast("double")
          else buildAggFull(fn, c, rest, p)
        // per-aggregator nullValue(): numeric fills coalesce; string
        // fills ride column metadata so the sink renders them raw while
        // data cells keep float formatting (TestGroupWhere "1" vs 2.00)
        val built = rest.collectFirst { case Call("nullValue", List(nv)) => nv } match {
          case Some(Num(v)) => coalesce(built0, lit(v))
          case Some(Str(sfill)) => stringFills += (name -> sfill); built0
          case _ => built0
        }
        aggs += ((built, name))
      case Expr.Bool(_) =>
        throw new IllegalArgumentException("GROUP() unknown type 'bool' in arguments")
      case other => throw new IllegalArgumentException(s"unsupported GROUP arg: $other")
    }
    val aggList = aggs.result()
    if (aggList.isEmpty) throw new IllegalArgumentException("GROUP() has no aggregator")
    // no by(): aggregate-all — one result row of just the aggregator
    // columns (Group.push __group_by_all, fm_monad.go:529-543;
    // task_test.go GROUP(correlation/moment/variance) with no by())
    val df0 = byExpr match {
      case Some((byCol, byName)) =>
        p.df.groupBy(byCol.as(byName))
          .agg(aggList.head._1.as(aggList.head._2),
            aggList.tail.map { case (c, n) => c.as(n) }: _*)
          .orderBy(vcol(byName)) // reference emits key-sorted (lazy mode sorts, fm_monad.go:470)
      case None =>
        p.df.agg(aggList.head._1.as(aggList.head._2),
          aggList.tail.map { case (c, n) => c.as(n) }: _*)
    }
    // string nullValue() fills travel as column metadata (sink-side raw
    // null rendering, TestGroupWhere)
    val df = stringFills.foldLeft(df0) { case (d, (n, fillStr)) =>
      val meta = new org.apache.spark.sql.types.MetadataBuilder()
        .putString("nullas", fillStr).build()
      d.withColumn(n, d(n).as(n, meta))
    }
    // the group key is result column 0 (reference synthesizes result
    // columns from by()+aggregators, fm_monad.go:405-425); with no by()
    // the first aggregator column leads
    byExpr match {
      case Some((_, byName)) => Pipe(df, byName, byName +: aggList.map(_._2))
      case None => Pipe(df, aggList.head._2, aggList.map(_._2))
    }
  }

  private def compileTimewindow(p: Pipe, twArgs: List[Expr], args: List[Expr]): Pipe = {
    import Expr._
    import graft.operators.GapFill
    def ns(e: Expr): Long = e match {
      case Num(v) => v.toLong
      case Call("time", List(Num(v))) => v.toLong
      case Str(s) => graft.time.TimeFns.parseDurationNs(s)
      case other => throw new IllegalArgumentException(s"bad timewindow arg $other")
    }
    val (fromNs, untilNs, periodNs) = twArgs match {
      case List(f, u, per) => (ns(f), ns(u), ns(per))
      case _ => throw new IllegalArgumentException("timewindow(from, until, period)")
    }
    val fill: GapFill.Fill = args.collectFirst {
      case Call("nullValue", List(Num(v))) => GapFill.FillConst(v)
      case Call("predict", List(Str(kind))) => kind.toLowerCase match {
        case "piecewiseconstant" => GapFill.FillPrevious
        case "piecewiselinear" => GapFill.FillLinear
        case "akimaspline" => GapFill.FillAkima
        case "fritschbutland" => GapFill.FillFritschButland
        case "linearregression" => GapFill.FillLinReg
        case k => throw new IllegalArgumentException(s"unknown predict($k)")
      }
    }.getOrElse(GapFill.FillNull)
    val aggs = args.collect {
      case Call(fn, e :: rest) if aggNames(fn) =>
        val name = rest.collectFirst { case Str(s) => s }.getOrElse(fn)
        // same where()/count semantics as plain GROUP: where() gates the
        // append, count still counts null values
        val whereP = rest.collectFirst { case Call("where", List(pred)) => toColumn(pred, p) }
        val raw = toColumn(e, p)
        val c = whereP.map(w => when(w, raw)).getOrElse(raw)
        name -> (if (fn == "count")
          whereP.map(w => count(when(w, lit(1)))).getOrElse(count(lit(1))).cast("double")
        else buildAggFull(fn, c, rest, p))
    }
    require(aggs.nonEmpty, "GROUP(timewindow) needs at least one aggregator")
    // the record's time is value(0), per the reference's record layout
    val timeCol = col(p.values.head)
    val out = GapFill.timewindow(p.df.sparkSession, p.df, timeCol,
      fromNs, untilNs, periodNs, aggs, fill)
      .withColumnRenamed("bucket_ns", "time")
    Pipe(out, "time", "time" +: aggs.map(_._1))
  }

  // ---------------- WHEN ----------------
  /** How many WHEN log lines the driver re-emits before suppressing: a
    * broad predicate at scale floods the task log otherwise. */
  private val WhenLogCap = 1000

  /** WHEN(cond, action) side effects (reference fm_monad.go single-
    * goroutine stream). `doLog`/`doHttp` run executor-side over the
    * filtered frame — nothing data-sized reaches the driver: doLog ships
    * a capped (partition, seq)-tagged sample back through [[WhenLogAcc]]
    * and the driver re-emits it in stream order; doHttp serializes the
    * ordered exchanges through one executor task (the reference's
    * contract is ordered, serialized emission — its tests pin request
    * order). Only the `do()` sub-routine keeps a driver collect: each
    * matching record compiles and runs a fresh TQL block, a driver
    * facility by design (and bounded by the same predicate the reference
    * runs inline). */
  private def runWhen(p: Pipe, cond: Expr, action: Expr): Unit = {
    import Expr._
    val spark = p.df.sparkSession
    def ordered: DataFrame = {
      val df = p.df.filter(toColumn(cond, p))
      if (df.columns.contains(p.keyCol)) df.orderBy(vcol(p.keyCol)) else df
    }
    def fmtV(v: Any): String = graft.sinks.GoTemplate.fmtVal(v)
    action match {
      case Call("doLog", argEs) =>
        val acc = new WhenLogAcc(WhenLogCap)
        spark.sparkContext.register(acc, "when_doLog")
        ordered.select(argEs.map(toColumn(_, p)): _*)
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            val pid = org.apache.spark.TaskContext.getPartitionId()
            var i = 0L
            it.foreach { row =>
              acc.add((pid, i,
                row.toSeq.map(graft.sinks.GoTemplate.fmtVal).mkString(" ")))
              i += 1L
            }
          }
        acc.value.foreach(t => TqlLog.log("INFO", t._3))
        if (acc.suppressed > 0)
          TqlLog.log("WARN",
            s"doLog: ${acc.suppressed} further lines suppressed (cap $WhenLogCap)")
      case Call("do", argEs :+ Call("__block", List(Str(sub)))) =>
        // sub-routine: compile the block once per matching record with its
        // args bound (ARGS()/FAKE(args())/args(i) read them)
        ordered.select(argEs.map(toColumn(_, p)): _*).collect().foreach { r =>
          val c = compileMulti(spark, sub, currentNowNs.get,
            currentParams.get + ("args" -> r.toSeq.map(fmtV)))
          if (c.sink.format != "DISCARD")
            TqlLog.log("WARN",
              s"do: ${c.sink.format}() sink does not work in a sub-routine")
        }
      case Call("doHttp", methodE :: urlE :: bodyE :: headerEs) =>
        // one exchange per matching record (fm_monad.go HttpDoer.Do);
        // loopback-only in this build — non-loopback hosts are refused
        val headers = headerEs.collect { case Str(s) => s }
        // doHttp(…, value()) posts the WHOLE record (the reference's
        // record value is the values array); value(i)/other exprs post
        // that single cell; nil posts nothing
        val bodyExprs: List[Expr] = bodyE match {
          case Null | Ident("nil") => Nil
          case Call("value", Nil) =>
            p.values.indices.toList.map(i => Call("value", List(Num(i))))
          case other => List(other)
        }
        val hasBody = bodyExprs.nonEmpty
        val method = constString(methodE)
        val acc = new WhenLogAcc(WhenLogCap)
        spark.sparkContext.register(acc, "when_doHttp")
        // coalesce(1) concatenates the sorted partitions in order: one
        // executor task issues every exchange in stream order
        ordered.select((urlE :: bodyExprs).map(toColumn(_, p)): _*)
          .coalesce(1)
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            val pid = org.apache.spark.TaskContext.getPartitionId()
            var i = 0L
            def emit(lvl: String, msg: String): Unit = {
              acc.add((pid, i, lvl + "\u0000" + msg)); i += 1L
            }
            it.foreach { row =>
              val url = String.valueOf(row.get(0))
              val body = if (hasBody) Some(row.toSeq.tail) else None
              try graft.server.HttpLoop.doHttp(method, url, body, headers, emit)
              catch { case e: Exception =>
                emit("WARN", s"http-doer ${e.getMessage}")
              }
            }
          }
        acc.value.foreach { t =>
          val sep = t._3.indexOf('\u0000')
          TqlLog.log(t._3.take(sep), t._3.drop(sep + 1))
        }
        if (acc.suppressed > 0)
          TqlLog.log("WARN",
            s"doHttp: ${acc.suppressed} further lines suppressed (cap $WhenLogCap)")
      case other => throw new IllegalArgumentException(s"unsupported WHEN action: $other")
    }
  }

  // ---------------- SCRIPT ----------------
  /** `$.db([{bridge}]).query(sql, binds…)` in driver-side SCRIPT: columns
    * + rows via the query door (or the named bridge); values converted to
    * JS types. */
  private def scriptDbQuery(spark: SparkSession)(
      bridgeName: Option[String], sql: String,
      binds: Seq[Any]): (Seq[String], Seq[Seq[Any]]) = {
    val df = bridgeName match {
      case Some(b) => graft.server.Bridge(b).query(spark, sql, binds)
      case None => graft.server.QueryDoor.execute(spark,
        graft.server.Bridge.bindSql(sql, binds))
    }
    (df.columns.toSeq,
      df.collect().toSeq.map(_.toSeq.map(graft.script.ScriptOps.toJs)))
  }

  /** `$.db([{bridge}]).exec(sql, binds…)` in driver-side SCRIPT; failures
    * come back as JS Error objects (the create-tqlbin fixture checks
    * `ret instanceof Error` — tql_test.go:756-775). */
  private def scriptDbExec(spark: SparkSession)(
      bridgeName: Option[String], sql: String, binds: Seq[Any]): Any =
    try {
      bridgeName match {
        case Some(b) => graft.server.Bridge(b).exec(spark, sql, binds)
        case None => graft.server.QueryDoor.execute(spark,
          graft.server.Bridge.bindSql(sql, binds)).collect()
      }
      graft.script.Interp.JsUndefined
    } catch {
      case e: Exception =>
        graft.script.Interp.errObj("Error",
          Option(e.getMessage).getOrElse(e.toString))
    }

  /** SCRIPT("js"?, main | init, main | init, main, deinit) block split —
    * reference fm_script.go:34-78. */
  private def scriptBlocks(args: List[Expr]): (String, String, String) = {
    val code0 = args.collect { case Expr.Str(s) => s }
    require(code0.size == args.size, "SCRIPT: arguments must be code blocks")
    val code = if (code0.nonEmpty && code0.head.trim == "js") code0.tail else code0
    code match {
      case List(m) => ("", m, "")
      case List(i, m) => (i, m, "")
      case List(i, m, d) => (i, m, d)
      case _ => throw new IllegalArgumentException(
        "script: wrong syntax, 'SCRIPT( init_script, main_script, deinit_script )'")
    }
  }

  /** SCRIPT as source: one main-block pass with `$.payload` bound
    * (fm_script.go:184-190). */
  private def compileScriptSource(spark: SparkSession, args: List[Expr]): Pipe = {
    val (i, m, d) = scriptBlocks(args)
    val res = graft.script.ScriptOps.run(Iterator.empty, isSource = true,
      i, m, d, currentNowNs.get, currentParams.get, paramFirst("payload"),
      Some(scriptDbExec(spark)), Some(scriptDbQuery(spark)),
      deadlineNanoTime = currentDeadline.get)
    res.logs.foreach { case (lvl, msg) => TqlLog.log(lvl, msg) }
    buildScriptPipe(spark, res, upstreamEnv = None)
  }

  /** SCRIPT as map: records visit the main block in key order. A SCRIPT
    * block may carry arbitrary cross-record state (the accumulate-then-
    * finalize pattern), which serializes the stream by definition — the
    * reference has the identical property (one goja event loop per node,
    * fm_script.go:123-180). Upstream rows stream through toLocalIterator;
    * the yielded result becomes a LocalRelation, which matches TQL's
    * presentation-sized result contract. For distributed per-partition
    * scripting over big data use `graft.script.ScriptOps.mapScript`. */
  private def compileScriptMap(p: Pipe, args: List[Expr]): Pipe = {
    import scala.jdk.CollectionConverters._
    val (i, m, d) = scriptBlocks(args)
    val spark = p.df.sparkSession
    val schema = p.df.schema
    val hasKey = p.df.columns.contains(p.keyCol)
    val valIdx = p.values.map(schema.fieldIndex)
    val varCols = p.df.columns.filter(_.startsWith("$")).toSeq
    val varIdx = varCols.map(schema.fieldIndex)
    val keyIdx = if (hasKey) schema.fieldIndex(p.keyCol) else -1
    val ordered = if (hasKey) p.df.orderBy(vcol(p.keyCol)) else p.df
    var ordinal = 0L
    val records = ordered.toLocalIterator().asScala.map { row =>
      ordinal += 1
      val key: Any =
        if (keyIdx >= 0) graft.script.ScriptOps.toJs(row.get(keyIdx))
        else java.lang.Long.valueOf(ordinal)
      val values = valIdx.map(ix => graft.script.ScriptOps.toJs(row.get(ix)))
      val vars = varCols.zip(varIdx).map { case (c, ix) =>
        c.stripPrefix("$") -> graft.script.ScriptOps.toJs(row.get(ix))
      }.toMap
      (key, values, vars)
    }
    val res = graft.script.ScriptOps.run(records, isSource = false,
      i, m, d, currentNowNs.get, currentParams.get, None,
      Some(scriptDbExec(spark)), Some(scriptDbQuery(spark)),
      deadlineNanoTime = currentDeadline.get)
    res.logs.foreach { case (lvl, msg) => TqlLog.log(lvl, msg) }
    // envelope: $.result wins; else the reference keeps the INPUT node's
    // column metadata even when yield arity differs (fm_script_test.go:74+)
    val upstreamEnv = (p.values,
      p.values.map(n => graft.sinks.Codecs.typeName(schema(n).dataType)))
    buildScriptPipe(spark, res, Some(upstreamEnv))
  }

  /** Yielded records → LocalRelation DataFrame with `_key`, value columns
    * (declared names > input names > columnN), and `$var` snapshots. */
  private def buildScriptPipe(spark: SparkSession,
                              res: graft.script.ScriptOps.ScriptResult,
                              upstreamEnv: Option[(Seq[String], Seq[String])]): Pipe = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    import graft.script.ScriptOps
    import scala.jdk.CollectionConverters._
    val rows = res.rows
    val arity =
      if (rows.isEmpty) upstreamEnv.map(_._1.size).getOrElse(0)
      else rows.iterator.map(_._2.size).max
    val envelope = res.envelope.orElse(upstreamEnv)
    val baseNames = res.envelope.map(_._1).orElse(upstreamEnv.map(_._1)).getOrElse(Seq.empty)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val names = (0 until arity).map { ix =>
      var n = if (ix < baseNames.size) baseNames(ix) else s"column$ix"
      while (!seen.add(n)) n = n + "_"
      n
    }
    val colTypes = (0 until arity).map(ix =>
      ScriptOps.inferType(rows.map(r => if (ix < r._2.size) r._2(ix) else null)))
    val keyType = ScriptOps.inferType(rows.map(_._1))
    val varNames = {
      val s = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach(r => r._3.keysIterator.foreach(s.add))
      s.toSeq
    }
    val varTypes = varNames.map(n =>
      ScriptOps.inferType(rows.map(_._3.getOrElse(n, null))))
    val schema = StructType(
      StructField("_key", keyType) +:
      (names.zip(colTypes).map { case (n, t) => StructField(n, t) } ++
       varNames.zip(varTypes).map { case (n, t) => StructField(s"$$$n", t) }))
    val data: java.util.List[Row] = rows.map { case (k, vs, vars) =>
      Row.fromSeq(
        ScriptOps.fromJs(k, keyType) +:
        ((0 until arity).map(ix =>
          ScriptOps.fromJs(if (ix < vs.size) vs(ix) else null, colTypes(ix))) ++
         varNames.zip(varTypes).map { case (n, t) =>
           ScriptOps.fromJs(vars.getOrElse(n, null), t) }))
    }.asJava
    Pipe(spark.createDataFrame(data, schema), "_key", names, envelope)
  }

  // ---------------- sinks ----------------
  private def compileSink(st: Statement): Sink = {
    import Expr._
    val fmt = st.call.name
    if (fmt == "SQL") {
      // statement sink: SQL([bridge('x'),] 'insert|exec|ddl …', binds…)
      // executed per record (fm_dbsrc.go SQL sink). Renders the DML
      // message envelope.
      val bridgeName = st.call.args.collectFirst {
        case Call("bridge", List(Str(b))) => b }
      val rest = st.call.args.filterNot {
        case Call("bridge", _) => true; case _ => false }
      val sql = rest.headOption.flatMap(constStringOpt).getOrElse(
        throw new IllegalArgumentException(s"SQL sink needs a statement: ${st.text}"))
      // fetch verbs are source-side only (fm_dbsink_sql_test.go:9-18)
      val verb = sql.trim.split("\\s+").headOption.getOrElse("").toUpperCase
      if (verb == "SELECT")
        throw new IllegalArgumentException(
          s"""f(SQL) sink does not allow fetch verb "$verb"""")
      return Sink("SQLEXEC", graft.sinks.Codecs.Options(),
        Some((sql, rest.drop(1))), bridge = bridgeName)
    }
    if (fmt == "CHART" || fmt == "GEOMAP" || fmt.startsWith("CHART_")) {
      // presentation spec sinks (mods/codec/internal/chart, geomap);
      // options applied when rendering
      return Sink(fmt, graft.sinks.Codecs.Options(), chartArgs = Some(st.call.args))
    }
    if (fmt == "INSERT" || fmt == "APPEND") {
      // INSERT('c1','c2',…, table('t') [, tag('name')]) / APPEND(table('t'))
      val table = st.call.args.collectFirst {
        case Call("table", List(Str(t))) => t
      }.getOrElse(throw new IllegalArgumentException(s"$fmt needs table(): ${st.text}"))
      val tag = st.call.args.collectFirst { case Call("tag", List(Str(t))) => t }
      val cols = st.call.args.collect { case Str(c) => c }
      val bridgeName = st.call.args.collectFirst {
        case Call("bridge", List(Str(b))) => b }
      return Sink("TABLEINS", graft.sinks.Codecs.Options(),
        tableIns = Some(TableInsert(fmt == "APPEND", table, tag, cols)),
        bridge = bridgeName)
    }
    val known = Set("CSV", "JSON", "NDJSON", "MARKDOWN", "BOX", "DISCARD",
      "TEXT", "HTML")
    require(known(fmt), s"unsupported sink: ${st.text}")
    var opts = graft.sinks.Codecs.Options()
    if (fmt == "TEXT" || fmt == "HTML" || fmt == "MARKDOWN") {
      // TEXT/HTML/MARKDOWN(template…) — string args are template content
      // (fm_encoder.go:68; markdown TEMPLATE case tql_test.go:1056);
      // file('/x.html') args load from the serving root (templates may
      // span files via define/template — tql_test.go:2352-2366)
      val tpl = st.call.args.collect {
        case Str(s) => s
        case Call("file", List(Str(path))) =>
          val p = java.nio.file.Paths.get(templateRoot, path)
          if (!java.nio.file.Files.exists(p))
            throw new IllegalArgumentException(s"template file '$path' not found")
          new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      }
      if (tpl.nonEmpty)
        opts = opts.copy(template = Some(tpl.mkString),
          templateParams = currentParams.get)
    }
    st.call.args.foreach {
      case Call("header", List(Bool(b))) => opts = opts.copy(heading = b)
      case Call("heading", List(Bool(b))) => opts = opts.copy(heading = b)
      case Call("header", _) | Call("heading", _) => opts = opts.copy(heading = true)
      case Call("rownum", List(Bool(b))) => opts = opts.copy(rownum = b)
      case Call("rownum", _) => opts = opts.copy(rownum = true)
      case Call("rowsFlatten", List(Bool(b))) => opts = opts.copy(rowsFlatten = b)
      case Call("rowsFlatten", _) => opts = opts.copy(rowsFlatten = true)
      // MARKDOWN brief mode: brief(true) = first 5 rows (md_encode.go
      // SetBrief), briefCount(n) = first n
      case Call("brief", List(Bool(b))) => opts = opts.copy(brief = if (b) 5L else 0L)
      case Call("brief", _) => opts = opts.copy(brief = 5L)
      case Call("briefCount", List(Num(n))) => opts = opts.copy(brief = n.toLong)
      case Call("rowsArray", List(Bool(b))) => opts = opts.copy(rowsArray = b)
      case Call("rowsArray", _) => opts = opts.copy(rowsArray = true)
      case Call("boxStyle", List(Str(st))) => opts = opts.copy(boxStyle = st)
      case Call("boxSeparateColumns", List(Bool(b))) =>
        opts = opts.copy(separateColumns = b)
      case Call("boxDrawBorder", List(Bool(b))) => opts = opts.copy(drawBorder = b)
      case Call("transpose", List(Bool(b))) => opts = opts.copy(transpose = b)
      case Call("transpose", _) => opts = opts.copy(transpose = true)
      // nullValue/substituteNull: custom token for NULL cells
      // (task_test.go TestJsonToCsv pins both spellings)
      case Call("nullValue" | "substituteNull", List(Str(nv))) =>
        opts = opts.copy(nullAs = nv)
      // non-string substitutes render with their Go value format
      // (TestJsonToCsv: nullValue(false) → "false", nullValue(3.14) → "3.14")
      case Call("nullValue" | "substituteNull", List(Bool(b))) =>
        opts = opts.copy(nullAs = b.toString)
      // numeric substitutes stay TYPED so precision() applies to the
      // rendered cell (csv_encode.go AddRow routes nullAlternative
      // through the float switch; csv_encode_test.go
      // TestCsvEncoderNullValue pins 1.234567@precision(2) → "1.23")
      case Call("nullValue" | "substituteNull", List(Num(v))) =>
        opts = opts.copy(nullAsNum = Some(v))
      case Call("delimiter", List(Str(d))) => opts = opts.copy(delimiter = d)
      case Call("timeformat", List(Str(f))) =>
        f.toLowerCase match {
          case "s" | "ms" | "us" | "ns" => opts = opts.copy(timeformat = Some(f.toLowerCase))
          case _ =>
            // full named table + Go layouts (util/time_formats.go); the
            // sink's java formatter renders zone tokens itself, and the
            // ".999" styles trim trailing fraction zeros
            val (jp, trim) = graft.time.TimeFns.resolveNamedOrGoFormat(f)
            opts = opts.copy(timeformat = Some(jp), trimFractionZeros = trim)
        }
      case Call("sqlTimeformat", List(Str(f))) =>
        opts = opts.copy(timeformat = Some(graft.time.TimeFns.translateTimeformat(f)))
      case Call("ansiTimeformat", List(Str(f))) =>
        opts = opts.copy(timeformat = Some(graft.time.TimeFns.translateAnsiTimeformat(f)))
      case Call("tz", List(Str(z))) =>
        opts = opts.copy(tz = graft.time.TimeFns.resolveTz(z))
      case Call("precision", List(Num(p))) => opts = opts.copy(precision = p.toInt)
      case Call("substituteNull", List(Str(s))) => opts = opts.copy(nullAs = s)
      case Call("binaryformat", List(Str(b))) => opts = opts.copy(binaryFormat = b)
      case Call("html", List(Bool(b))) if fmt == "MARKDOWN" =>
        opts = opts.copy(htmlRender = b)
      // bare non-string literals are never valid encoder options
      // (fm_encoder.go newEncoder: "encoder '%s' invalid option %v (%T)")
      case Bool(b) => throw new IllegalArgumentException(
        s"encoder '${fmt.toLowerCase}' invalid option $b (bool)")
      case Num(v) => throw new IllegalArgumentException(
        s"encoder '${fmt.toLowerCase}' invalid option ${graft.sinks.Codecs.goFloat(v)} (float64)")
      case Str(s) if fmt != "TEXT" && fmt != "HTML" && fmt != "MARKDOWN" =>
        throw new IllegalArgumentException(
          s"encoder '${fmt.toLowerCase}' invalid option $s (string)")
      case _ =>
    }
    val cacheSpec = st.call.args.collectFirst {
      case Call("cache", keyE :: Str(ttl) :: rest) =>
        // only row encoders cache (fm_encoder.go:21-27)
        if (!Set("JSON", "CSV", "NDJSON", "TEXT", "HTML", "BOX")(fmt))
          throw new IllegalArgumentException(
            s"encoder '${fmt.toLowerCase}' does not support cache")
        val ratio = rest.collectFirst { case Num(r) => r }.getOrElse(1.0)
        // namespace by script source (tqlcache.go:142 uses path:hash:key)
        (currentScriptHash.get + ":" + constString(keyE),
          graft.time.TimeFns.parseDurationNs(ttl), ratio)
    }
    Sink(fmt, opts, cacheSpec = cacheSpec)
  }

  // ---------------- expressions → Column ----------------
  /** Display name for a pushed/grown value column: first string option,
    * else the reference's default "column" (fm_monad.go:1613). Suffixed
    * only when the name is already a live column (Spark needs unique
    * names; the reference's positional metadata tolerates duplicates). */
  private def pushValueName(p: Pipe, rest: List[Expr]): String = {
    import Expr._
    val base = rest.collectFirst { case Str(s) => s }.getOrElse("column")
    if (!p.df.columns.contains(base)) base
    else {
      var i = 2
      while (p.df.columns.contains(s"${base}_$i")) i += 1
      s"${base}_$i"
    }
  }

  /** Pushed-value expression with the PUSHVALUE option semantics:
    * nullValue(alt) coalesces a null result, where(pred) nulls the
    * value when the predicate is false (fm_monad.go:1620-1680 sets
    * newValue = nil on a false wherePredicate, column still added). */
  private def pushValueExpr(expr: Expr, rest: List[Expr], p: Pipe): Column = {
    import Expr._
    val c0 = toColumn(expr, p)
    val c1 = rest.collectFirst { case Call("nullValue", List(nv)) =>
      coalesce(c0, toColumn(nv, p)) }.getOrElse(c0)
    rest.collectFirst { case Call("where", List(pred)) =>
      when(toColumn(pred, p), c1) }.getOrElse(c1)
  }

  def toColumn(e: Expr, p: Pipe): Column = {
    import Expr._
    e match {
      case Num(v) => if (v == math.rint(v) && math.abs(v) < 1e15) lit(v.toLong) else lit(v)
      case Str(v) => lit(v)
      case Bool(v) => lit(v)
      case Null => lit(null)
      case Ident("PI") => lit(math.Pi)
      case Ident("E") => lit(math.E)
      case Ident(name) => col(name)
      case Var(name) => col(s"$$$name")
      case Unary("-", x) => -toColumn(x, p)
      case Unary("!", x) => !toColumn(x, p)
      // float64(^int64(x)) — expression/stage.go bitwiseNotStage
      case Unary("~", x) =>
        org.apache.spark.sql.functions.bitwise_not(
          toColumn(x, p).cast("long")).cast("double")
      case Unary(op, _) => throw new IllegalArgumentException(s"unary $op")
      case Bin(op, l, r) =>
        val (a, b) = (toColumn(l, p), toColumn(r, p))
        // The reference's expression engine evaluates ALL arithmetic in
        // float64 (expression/evaluation.go:72-94 asserts .(float64); %
        // is math.Mod, the truncated remainder) — so integer-typed
        // operands must widen to double, and the result type is double.
        // Non-numeric operands (timestamps, strings) keep Spark-native
        // behavior for the engine's typed extensions.
        lazy val bothNumeric: Boolean = {
          def isNum(dt: org.apache.spark.sql.types.DataType) = dt match {
            case _: org.apache.spark.sql.types.NumericType => true
            case org.apache.spark.sql.types.NullType => true
            case _ => false
          }
          try {
            val Array(lt, rt) = p.df.select(a.as("l"), b.as("r")).schema.fields.map(_.dataType)
            isNum(lt) && isNum(rt)
          } catch { case _: Exception => false }
        }
        def arith(f: (Column, Column) => Column, fallback: (Column, Column) => Column): Column =
          if (bothNumeric) f(a.cast("double"), b.cast("double")) else fallback(a, b)
        op match {
          case "+" =>
            // TQL '+' concatenates when either operand is a string literal
            (l, r) match {
              case (Str(_), _) | (_, Str(_)) => concat(a.cast("string"), b.cast("string"))
              case _ => arith(_ + _, _ + _)
            }
          case "-" => arith(_ - _, _ - _)
          case "*" => arith(_ * _, _ * _)
          case "/" => arith(_ / _, _ / _)
          case "%" => arith(_ % _, pmod(_, _))
          case "**" => pow(a, b)
          // bitwise on float64: float64(int64(l) OP int64(r)); shifts
          // convert through uint64, so >> is a LOGICAL shift and
          // shift counts >= 64 flush to zero (Go shifts don't wrap —
          // expression/stage.go:318-330)
          case "&" => (a.cast("long").bitwiseAND(b.cast("long"))).cast("double")
          case "|" => (a.cast("long").bitwiseOR(b.cast("long"))).cast("double")
          case "^" => (a.cast("long").bitwiseXOR(b.cast("long"))).cast("double")
          case "<<" =>
            when(b.cast("long") >= 64L, lit(0d)).otherwise(
              call_function("shiftleft", a.cast("long"), b.cast("int")).cast("double"))
          case ">>" =>
            when(b.cast("long") >= 64L, lit(0d)).otherwise(
              call_function("shiftrightunsigned", a.cast("long"), b.cast("int")).cast("double"))
          // NULL comparisons have IS [NOT] NULL semantics in TQL
          // (FILTER(value(1) != NULL), tql_test.go FAKE_statz)
          case "==" => (l, r) match {
            case (Null, _) => b.isNull
            case (_, Null) => a.isNull
            case _ => a === b
          }
          case "!=" => (l, r) match {
            case (Null, _) => b.isNotNull
            case (_, Null) => a.isNotNull
            case _ => a =!= b
          }
          case ">" => a > b
          case ">=" => a >= b
          case "<" => a < b
          case "<=" => a <= b
          case "&&" => a && b
          case "||" => a || b
          case "??" => coalesce(a, b)
          case "=~" => a.rlike(r match { case Str(s) => s; case _ => "" })
          case "!~" => !a.rlike(r match { case Str(s) => s; case _ => "" })
          case other => throw new IllegalArgumentException(s"operator $other")
        }
      case Ternary(c, t, f) =>
        // TQL is dynamically typed: a ternary may yield different types per
        // branch (`x != "VALUE" ? parseFloat(x)*10 : x`). Spark's CaseWhen
        // coercion would cast the string branch to double and (ANSI) throw
        // on non-numeric rows — harmonize mixed numeric/string branches to
        // go-formatted strings instead.
        val (cc, tc, fc) = (toColumn(c, p), toColumn(t, p), toColumn(f, p))
        val branchTypes =
          try Some(p.df.select(tc.as("t"), fc.as("f")).schema.fields.map(_.dataType))
          catch { case _: Exception => None }
        branchTypes match {
          case Some(Array(tt, ft)) if tt != ft &&
            (tt == org.apache.spark.sql.types.StringType ||
             ft == org.apache.spark.sql.types.StringType) =>
            def goStr(col0: Column, dt: org.apache.spark.sql.types.DataType): Column =
              dt match {
                case org.apache.spark.sql.types.DoubleType |
                     org.apache.spark.sql.types.FloatType =>
                  when(col0 === floor(col0) && abs(col0) < 1e15,
                    col0.cast("long").cast("string"))
                    .otherwise(col0.cast("string"))
                case _ => col0.cast("string")
              }
            when(cc, goStr(tc, tt)).otherwise(goStr(fc, ft))
          case _ => when(cc, tc).otherwise(fc)
        }
      case In(v, set) => toColumn(v, p).isin(set.map(x => toColumn(x, p)): _*)
      case Index(arr, idx) => element_at(toColumn(arr, p), toColumn(idx, p) + 1)
      case Call(name, args) => callToColumn(name, args, p)
    }
  }

  private def callToColumn(name: String, args: List[Expr], p: Pipe): Column = {
    import Expr._
    def a(i: Int): Column = toColumn(args(i), p)
    name match {
      case "value" =>
        def at(i: Int): Column = {
          if (i >= p.values.size) throw new IllegalArgumentException(
            s"f(value) arg(0) $i is out of range of the value(len:${p.values.size}) in ")
          vcol(p.values(i))
        }
        args match {
          case List(Num(i)) => at(i.toInt)
          // numeric-string index works too (fm_context_test.go:47-49)
          case List(Str(si)) if si.nonEmpty && si.forall(_.isDigit) => at(si.toInt)
          case Nil => vcol(p.values.head)
          case _ => throw new IllegalArgumentException("value(n)")
        }
      case "key" => col(p.keyCol)
      case "param" => args match {
        // missing param -> null (GetRequestParam returns nil; `?? dflt` works)
        case List(Str(k)) => paramFirst(k).map(lit).getOrElse(lit(null).cast("string"))
        case _ => throw new IllegalArgumentException("param('name')")
      }
      // sub-routine argument access (fm_context.go fmArgsParam)
      case "args" =>
        def argAt(i: Int): Column = {
          val vals = currentParams.get.getOrElse("args", Seq.empty)
          if (i >= vals.size) throw new IllegalArgumentException(
            s"f(arg) arg(0) $i is out of range of the arg(len:${vals.size})")
          lit(vals(i))
        }
        args match {
          case List(Num(i)) => argAt(i.toInt)
          // numeric-string index (fm_context_test.go:92-94)
          case List(Str(si)) if si.nonEmpty && si.forall(_.isDigit) => argAt(si.toInt)
          case Nil => lit(currentParams.get.getOrElse("args", Seq.empty).mkString(","))
          case _ => throw new IllegalArgumentException("args([n])")
        }
      // math (reference fx_definitions.go:79-105)
      case "abs" => abs(a(0))
      case "acos" => acos(a(0))
      case "asin" => asin(a(0))
      case "atan" => atan(a(0))
      case "ceil" => ceil(a(0))
      case "cos" => cos(a(0))
      case "cosh" => cosh(a(0))
      case "exp" => exp(a(0))
      case "exp2" => pow(lit(2d), a(0))
      case "floor" => floor(a(0))
      case "log" => log(a(0))
      case "log10" => log10(a(0))
      case "log2" => log2(a(0))
      // Go math.Mod keeps the dividend's sign (truncated remainder);
      // Spark's % has the same convention, pmod does not
      case "mod" => a(0) % a(1)
      case "pow" =>
        // arity/type diagnostics mirror fx_definitions' conv layer
        // (func_test.go TestMathFunctions)
        if (args.size != 2) throw new IllegalArgumentException(
          s"f(pow) invalid number of args; expect:2, actual:${args.size}")
        args.zipWithIndex.foreach {
          case (Str(_), i) => throw new IllegalArgumentException(
            s"f(pow) arg($i) should be float64, but string")
          case _ => ()
        }
        pow(a(0), a(1))
      case "pow10" =>
        if (args.size != 1) throw new IllegalArgumentException(
          s"f(pow10) invalid number of args; expect:1, actual:${args.size}")
        args.head match {
          case Str(_) => throw new IllegalArgumentException(
            "f(pow10) arg(0) should be int, but string")
          case _ => ()
        }
        pow(lit(10d), a(0))
      case "round" =>
        if (args.isEmpty) throw new IllegalArgumentException(
          "f(round) invalid number of args; expect:1, actual:0")
        args.head match {
          case Str(_) => throw new IllegalArgumentException(
            "f(round) arg(0) should be float64, but string")
          case _ => ()
        }
        args.size match {
          case 1 => round(a(0))
          case _ => round(a(0), args(1).asInstanceOf[Num].v.toInt)
        }
      case "sin" => sin(a(0))
      case "sinh" => sinh(a(0))
      case "sqrt" => sqrt(a(0))
      case "tan" => tan(a(0))
      case "tanh" => tanh(a(0))
      case "acosh" => acosh(a(0))
      case "asinh" => asinh(a(0))
      case "atanh" => atanh(a(0))
      // Go math.Remainder: IEEE 754 remainder — x − y·rint(x/y); bround
      // is Spark's half-even rounding (fx_definitions.go:98)
      case "remainder" =>
        a(0).cast("double") - a(1).cast("double") *
          bround(a(0).cast("double") / a(1).cast("double"), 0)
      case "trunc" => expr(s"trunc(${a(0)})") // rarely used
      // min/max as scalar pair (reference fm_monad.go:848-878)
      case "min" => least(a(0), a(1))
      case "max" => greatest(a(0), a(1))
      // strings (reference fm_fake.go:540-637)
      case "strTrimSpace" => trim(a(0))
      case "strToUpper" => upper(a(0))
      case "strToLower" => lower(a(0))
      case "strReplaceAll" => args match {
        case List(x, Str(from), Str(to)) => regexp_replace(toColumn(x, p), java.util.regex.Pattern.quote(from), to)
        case _ => throw new IllegalArgumentException("strReplaceAll(s, from, to)")
      }
      case "strTrimPrefix" =>
        when(a(0).startsWith(a(1)), a(0).substr(length(a(1)) + 1, length(a(0)))).otherwise(a(0))
      case "strTrimSuffix" =>
        when(a(0).endsWith(a(1)), a(0).substr(lit(1), length(a(0)) - length(a(1)))).otherwise(a(0))
      case "strReplace" => args match {
        case List(x, Str(from), Str(to), Num(n)) =>
          replaceNUdf(toColumn(x, p), lit(from), lit(to), lit(n.toInt))
        case _ => throw new IllegalArgumentException("strReplace(s, old, new, n)")
      }
      case "strHasPrefix" => a(0).startsWith(a(1))
      case "strHasSuffix" => a(0).endsWith(a(1))
      case "strIndex" =>
        // Go strings.Index returns a BYTE offset (func_test.go:238-252:
        // "World"'s 'o' in "HelLo 😀 World" is 12, after the 4-byte emoji)
        // — octet-length of the character prefix before the match
        val loc = instr(a(0), args(1).asInstanceOf[Str].v)
        when(loc === 0, lit(-1))
          .otherwise(octet_length(a(0).substr(lit(1), loc - 1)))
      case "strLastIndex" =>
        // Go strings.LastIndex (fm_fake.go:636): byte offset, -1 missing —
        // last occurrence found via the reversed-string locate
        val (s, sub) = (a(0), a(1))
        val rloc = call_function("locate", reverse(sub), reverse(s))
        val charPos0 = length(s) - rloc + 1 - length(sub) // 0-based chars
        when(rloc === 0, lit(-1))
          .otherwise(octet_length(s.substr(lit(1), charPos0)))
      case "strSub" =>
        // rune-based slice with Go-side edge rules (fm_fake.go:592-630):
        // negative offset counts from the end, |offset| past either end
        // yields "", negative count means to-end
        if (args.size == 1) a(0) else {
          val s = a(0)
          val len = length(s)
          val off = a(1).cast("int")
          val idx = when(off < 0, len + off).otherwise(off)
          val invalid = when(off < 0, -off >= len).otherwise(off >= len)
          val cnt = if (args.size > 2) a(2).cast("int") else lit(-1)
          val res = when(cnt < 0, s.substr(idx + 1, len))
            .otherwise(s.substr(idx + 1, cnt))
          when(invalid, lit("")).otherwise(res)
        }
      case "strSprintf" =>
        // Go verbs java.util.Formatter rejects: %v (default format) and a
        // bare-precision %.f (= precision 0); normalize before format_string
        val jfmt = args.head.asInstanceOf[Str].v
          .replace("%v", "%s").replaceAll("%(\\d*)\\.([fge])", "%$1.0$2")
        format_string(jfmt, args.tail.map(x => toColumn(x, p)): _*)
      // Go url.QueryEscape (fm_context.go:165-168). Spark's url_encode is
      // Java URLEncoder, which differs on exactly two bytes: '*' is left
      // bare (Go wants %2A) and '~' is encoded (Go leaves it)
      case "escapeParam" =>
        regexp_replace(regexp_replace(url_encode(a(0)), "\\*", "%2A"), "%7E", "~")
      case "simplex" => args.size match {
        case 2 => graft.functions.Noise.simplex1(a(0).cast("long"), a(1).cast("double"))
        case 3 => graft.functions.Noise.simplex2(a(0).cast("long"), a(1).cast("double"), a(2).cast("double"))
        case _ => throw new IllegalArgumentException("simplex(seed, x[, y])")
      }
      case "glob" => args match {
        case List(Str(pat), x) => toColumn(x, p).rlike(graft.functions.ScalarFns.globToRegex(pat))
        case _ => throw new IllegalArgumentException("glob(pattern, text)")
      }
      case "regexp" => args match {
        case List(Str(pat), x) =>
          // eager literal-pattern check with the Go regexp error shape
          // (func_test.go: error parsing regexp: missing closing ]: `[0-9$`)
          try java.util.regex.Pattern.compile(pat)
          catch {
            case e: java.util.regex.PatternSyntaxException =>
              val desc =
                if (e.getDescription != null &&
                  e.getDescription.contains("Unclosed character class"))
                  "missing closing ]: `" + pat.substring(pat.lastIndexOf('[')) + "`"
                else e.getDescription
              throw new IllegalArgumentException(s"error parsing regexp: $desc")
          }
          toColumn(x, p).rlike(pat)
        case _ => throw new IllegalArgumentException("regexp(pattern, text)")
      }
      // conversion / misc
      case "parseFloat" => a(0).cast("double")
      case "parseBool" =>
        // Go strconv.ParseBool's accept set; rejects fail eagerly with
        // the reference's rewritten error (fm_fake.go parseBool)
        args.head match {
          case Str(s) =>
            val truthy = Set("1", "t", "T", "TRUE", "true", "True")
            val falsy = Set("0", "f", "F", "FALSE", "false", "False")
            if (truthy(s)) lit(true)
            else if (falsy(s)) lit(false)
            else throw new IllegalArgumentException(
              s"""parseBool: parsing "$s": invalid syntax""")
          case _ => a(0).cast("boolean")
        }
      case "len" =>
        // reference len() works on strings AND lists, and buffers float64
        // (func_test.go:598-609: both expectations are 4.0); a bare
        // value() is the whole record tuple, so len(value()) is its arity
        // (TestMapFunc_FILTER `len(value()) > 2`)
        args.head match {
          case Call("value", Nil) => lit(p.values.size.toDouble)
          case _ =>
            val t = try p.df.select(a(0)).schema.head.dataType
              catch { case _: Exception => org.apache.spark.sql.types.StringType }
            (t match {
              case _: org.apache.spark.sql.types.ArrayType => size(a(0))
              case _ => length(a(0))
            }).cast("double")
        }
      case "element" =>
        // nums/array.go Element — variadic values + trailing 0-based
        // index, time values as float64 epoch-ns; a TQL []any value
        // (value() with no index, or an array column) spreads
        def tsToNs(c: Column): Column = {
          val isTs = try p.df.select(c).schema.head.dataType
            .isInstanceOf[org.apache.spark.sql.types.TimestampType]
            catch { case _: Exception => false }
          if (isTs) (unix_micros(c) * 1000L).cast("double") else c
        }
        args match {
          case List(Call("value", Nil), idx) =>
            // element(value(), i): the record tuple spread (func_test.go
            // TestMapFunc_FILTER)
            element_at(array(p.values.map(v => tsToNs(vcol(v))): _*),
              toColumn(idx, p).cast("int") + 1)
          case List(arr, idx) =>
            val c = toColumn(arr, p)
            val isArr = try p.df.select(c).schema.head.dataType
              .isInstanceOf[org.apache.spark.sql.types.ArrayType]
              catch { case _: Exception => true }
            if (!isArr) throw new IllegalArgumentException(
              "f(element) invalud number of args (n:2)") // sic, array.go:34
            element_at(c, toColumn(idx, p).cast("int") + 1)
          case _ if args.size < 2 => throw new IllegalArgumentException(
            s"f(element) invalud number of args (n:${args.size})")
          case _ =>
            // literal-index diagnostics (array.go:36-48)
            args.last match {
              case Str(_) => throw new IllegalArgumentException(
                "f(element) index of element should be int, but string")
              case Bool(_) => throw new IllegalArgumentException(
                "f(element) index of element should be int, but bool")
              case Num(n) if n.toInt >= args.size - 1 =>
                throw new IllegalArgumentException(
                  s"f(element) out of index ${n.toInt} / ${args.size - 1}")
              case Num(n) =>
                // literal index: pick the arg directly — keeps each
                // value's own type (mixed tuples never build an array)
                return tsToNs(a(n.toInt))
              case _ => ()
            }
            val cols = args.indices.map(i => tsToNs(a(i)))
            element_at(array(cols.init: _*), cols.last.cast("int") + 1)
        }
      case "list" => array(args.map(x => toColumn(x, p)): _*)
      case "nullValue" => coalesce(a(0), a(1))
      case "coalesce" => coalesce(args.map(x => toColumn(x, p)): _*)
      // time (epoch-ns discipline)
      case "time" =>
        // time(ns) / time('now'±dur) → a datetime value (µs-precision
        // timestamp; the sink's timeformat/tz options format it like the
        // reference's datetime). 'now' resolves to the injected clock.
        // Diagnostics mirror fm_time.go fmTime → util.ToTime
        // (func_test.go TestTime pins each string).
        if (args.isEmpty) throw new IllegalArgumentException(
          "f(time) invalid number of args; expect:1, actual:0")
        val nsExpr = args.head match {
          case Str(s) if s.trim == "now" => lit(currentNowNs.get.longValue())
          case Str(s) if s.trim.startsWith("now") =>
            lit(nowRelativeNs(s.trim)) // 'now-1h' etc, Go error strings
          case Str(s) => throw new IllegalArgumentException(
            s"invalid time expression: incompatible conv '$s' (string) to time.Time")
          case Bool(b) => throw new IllegalArgumentException(
            s"invalid time expression: incompatible conv '$b' (bool) to time.Time")
          case _ => a(0).cast("long")
        }
        timestamp_micros(floor(nsExpr.cast("decimal(25,0)") / lit(1000)).cast("long"))
      case "parseTime" => args match {
        // parseTime(v, fmt[, tz]) → a datetime value (fm_time.go
        // fmParseTime; the reference returns time.Time — here the µs
        // timestamp every sink timeformat understands). Epoch modes are
        // tz-less; pattern mode parses wall-clock text in the given
        // location (tz may be a tz() call or a bare string like "Local")
        case x :: Str(fmt) :: rest =>
          val c = toColumn(x, p)
          val tzName = rest.collectFirst {
            case Call("tz", List(Str(z))) => graft.time.TimeFns.resolveTz(z)
            case Str(z) => graft.time.TimeFns.resolveTz(z)
          }
          fmt match {
            case "s" => timestamp_micros(c.cast("long") * 1000000L)
            case "ms" => timestamp_micros(c.cast("long") * 1000L)
            case "us" => timestamp_micros(c.cast("long"))
            case "ns" => timestamp_micros(graft.time.TimeFns.nsToUs(c.cast("long")))
            case pattern =>
              // named/Go layouts resolve like strTime; a Go ".999" fraction
              // is OPTIONAL on input (TestParseTime parses "2023-03-01
              // 14:01:02" with DEFAULT), so try the fraction variants
              // longest-first and fall back to the fractionless base
              val (jp, goStyle) = graft.time.TimeFns.resolveNamedOrGoFormat(pattern)
              val ts = "\\.S+".r.findFirstMatchIn(jp) match {
                case Some(m) if goStyle =>
                  val nmax = m.end - m.start - 1
                  val variants = (nmax to 1 by -1).map { n =>
                    jp.substring(0, m.start) + "." + "S" * n + jp.substring(m.end)
                  } :+ (jp.substring(0, m.start) + jp.substring(m.end))
                  coalesce(variants.map(v => try_to_timestamp(c, lit(v))): _*)
                case _ => to_timestamp(c, jp)
              }
              tzName.filter(_ != "UTC").map(z => to_utc_timestamp(ts, z)).getOrElse(ts)
          }
        case _ => throw new IllegalArgumentException("parseTime(v, fmt[, tz])")
      }
      case "roundTime" => args match {
        case List(x, Str(dur)) =>
          val periodNs = graft.time.TimeFns.parseDurationNs(dur)
          if (periodNs == 0) throw new IllegalArgumentException(
            "f(roundTime) arg(1) zero duration is not allowed") // func_test.go:548
          val xc = toColumn(x, p)
          // timestamp inputs round as timestamps (sink timeformat modes
          // then apply — TestGroupWhere renders epoch-s)
          val tsNs = unix_micros(xc) * 1000L
          val rounded = graft.time.TimeFns.roundTimeNs(tsNs, periodNs)
          // integer µs (division through double is exact below 2^53 µs)
          val asTs = timestamp_micros((rounded.cast("long") / lit(1000L)).cast("long"))
          // dispatch on the input type at plan build time
          try {
            if (p.df.select(xc).schema.head.dataType
              .isInstanceOf[org.apache.spark.sql.types.TimestampType]) asTs
            else graft.time.TimeFns.roundTimeNs(xc, periodNs)
          } catch {
            case _: Exception => graft.time.TimeFns.roundTimeNs(xc, periodNs)
          }
        case _ => throw new IllegalArgumentException("roundTime(t, 'dur')")
      }
      // ---- time parts (fm_time.go:53-229) — Go time.Time accessors over
      // an epoch-ns long or timestamp, with an optional tz() location
      case "timeYear" | "timeMonth" | "timeDay" | "timeHour" | "timeMinute" |
           "timeSecond" | "timeNanosecond" | "timeISOYear" | "timeISOWeek" |
           "timeYearDay" | "timeWeekDay" |
           "timeUnix" | "timeUnixMilli" | "timeUnixMicro" | "timeUnixNano" =>
        val nsL = nsLongOf(args.head, p)
        val tzName = args.collectFirst {
          case Call("tz", List(Str(z))) => graft.time.TimeFns.resolveTz(z)
        }
        def local = {
          val ts = timestamp_micros(graft.time.TimeFns.nsToUs(nsL))
          tzName.map(z => from_utc_timestamp(ts, z)).getOrElse(ts)
        }
        name match {
          case "timeYear" => year(local)
          case "timeMonth" => month(local)
          case "timeDay" => dayofmonth(local)
          case "timeHour" => hour(local)
          case "timeMinute" => minute(local)
          case "timeSecond" => second(local)
          // ns offset within the second (reference keeps full ns precision)
          case "timeNanosecond" => pmod(nsL, lit(1000000000L)).cast("int")
          case "timeISOYear" =>
            call_function("date_part", lit("YEAROFWEEK"), local).cast("int")
          case "timeISOWeek" => weekofyear(local)
          case "timeYearDay" => dayofyear(local)
          // Go Weekday(): 0=Sunday … 6=Saturday; Spark dayofweek is 1-based
          case "timeWeekDay" => dayofweek(local) - 1
          // timeUnix* return float64 epochs (fmTimeUnix0)
          case "timeUnix" => floor(nsL.cast("decimal(25,0)") / lit(1000000000L)).cast("double")
          case "timeUnixMilli" => floor(nsL.cast("decimal(25,0)") / lit(1000000L)).cast("double")
          case "timeUnixMicro" => floor(nsL.cast("decimal(25,0)") / lit(1000L)).cast("double")
          case _ => nsL.cast("double") // timeUnixNano
        }
      case "strTime" => args match {
        // strTime(t, format [, tz()]): Go-layout/named format rendering
        // (fm_time.go fmStrTime + util/types.go TimeFormatter.Format)
        case t :: fmtE :: _ =>
          val nsL = nsLongOf(t, p)
          val rawFmt = fmtE match {
            case Call("sqlTimeformat", _) | Call("ansiTimeformat", _) => ""
            case other => constString(other)
          }
          rawFmt match {
            // epoch modes render the raw epoch number (Format's switch)
            case "ns" => nsL.cast("string")
            case "us" => graft.time.TimeFns.nsToUs(nsL).cast("string")
            case "ms" => floor(nsL.cast("decimal(25,0)") / lit(1000000L)).cast("long").cast("string")
            case "s" => floor(nsL.cast("decimal(25,0)") / lit(1000000000L)).cast("long").cast("string")
            case _ =>
              val (pattern0, trim) = fmtE match {
                case Call("sqlTimeformat", List(Str(f))) =>
                  (graft.time.TimeFns.translateTimeformat(f), false)
                case Call("ansiTimeformat", List(Str(f))) =>
                  (graft.time.TimeFns.translateAnsiTimeformat(f), false)
                case _ => graft.time.TimeFns.resolveNamedOrGoFormat(rawFmt)
              }
              val tzName = args.collectFirst {
                case Call("tz", List(Str(z))) => graft.time.TimeFns.resolveTz(z)
              }.getOrElse("UTC") // fmStrTime defaults tz = time.UTC
              // zone tokens become literals resolved at the query clock —
              // Spark renders in the session zone, see zoneSubstitutedPattern
              val pattern = graft.time.TimeFns.zoneSubstitutedPattern(
                pattern0, tzName, currentNowNs.get.longValue() / 1000000000L)
              val ts = timestamp_micros(graft.time.TimeFns.nsToUs(nsL))
              val local = if (tzName == "UTC") ts else from_utc_timestamp(ts, tzName)
              val rendered = date_format(local, pattern)
              if (trim) graft.time.TimeFns.trimFractionZeros(rendered) else rendered
          }
        case _ => throw new IllegalArgumentException("strTime(t, format[, tz])")
      }
      case "timeAdd" => args match {
        // base: 'now' resolves the pinned clock; delta: duration string or
        // ns expression (FAKE_INSERT uses timeAdd('now', value(0)*2e9))
        case List(x, d) =>
          val base = x match {
            case Str(s) if s.trim == "now" => lit(currentNowNs.get.longValue())
            case Str(s) if s.trim.startsWith("now") => lit(nowRelativeNs(s.trim))
            case other => toColumn(other, p)
          }
          val delta = d match {
            case Str(dur) =>
              // fmTimeAdd wraps ToDuration's Go error (func_test.go:
              // `invalid time expression: time: unknown unit "x" in
              // duration "-2x"`)
              val ns =
                try graft.time.TimeFns.parseDurationNs(dur)
                catch {
                  case e: IllegalArgumentException =>
                    throw new IllegalArgumentException(
                      s"invalid time expression: ${e.getMessage}")
                }
              lit(ns)
            case other => toColumn(other, p).cast("long")
          }
          base + delta
        case _ => throw new IllegalArgumentException("timeAdd(t, 'dur'|ns)")
      }
      case "random" =>
        // nondeterministic uniform [0,1) (fm_fake.go random) — results
        // stabilize only behind a cache() sink (tqlcache_test.go)
        rand()
      case "dict" =>
        // dict('k', v, …) → map value the JSON envelope renders as an
        // object; an odd argument list names a key with no value
        // (TestDict pins the message)
        if (args.size % 2 != 0) {
          val last = args.last match {
            case Str(s) => s
            case other => other.toString
          }
          throw new IllegalArgumentException(
            s"""dict() name "$last" doesn't match with any value""")
        }
        map(args.map(toColumn(_, p)): _*)
      // ---- geo spatial (fx_definitions.go:111-119; nums/geography.go) --
      // Constructors produce layer/feature objects as JSON text; the
      // GEOMAP sink parses them back into leaflet layers (marker/circle
      // types carry [lat,lon], GeoJSON features [lon,lat] — geography.go
      // Coordinates vs MarshalGeoJSON).
      case "latlon" => args match {
        case List(x, y) => array(toColumn(x, p).cast("double"), toColumn(y, p).cast("double"))
        case _ => throw new IllegalArgumentException("latlon(lat, lon)")
      }
      case "geoPoint" => args match {
        case ll :: rest =>
          geoFeatureJson("Point", geoPointJson(ll, p, lonLat = true),
            geoPropsJson(rest, Nil, p))
        case _ => throw new IllegalArgumentException("geoPoint(latlon[, opt])")
      }
      case "geoMultiPoint" | "geoPolygon" =>
        // NewMultiLatLonFunc: latlon args are points, string/dict is opt
        val (pts, opt) = args.partition(geoIsPointArg)
        geoFeatureJson(if (name == "geoMultiPoint") "MultiPoint" else "Polygon",
          geoRingJson(pts, p), geoPropsJson(opt, Nil, p))
      case "geoLineString" => args match {
        case from :: to :: rest =>
          geoFeatureJson("LineString", geoRingJson(List(from, to), p),
            geoPropsJson(rest, Nil, p))
        case _ => throw new IllegalArgumentException("geoLineString(from, to[, opt])")
      }
      case "geoCircle" => args match {
        case ll :: r :: rest =>
          // radius lands in properties unless the opt already carries one
          // (NewGeoCircle, geography.go:201-219)
          geoLayerJson("circle", geoPointJson(ll, p, lonLat = false),
            geoPropsJson(rest, Seq("radius" -> geoJsonValue(r, p)), p))
        case _ => throw new IllegalArgumentException("geoCircle(latlon, radius[, opt])")
      }
      case "geoPointMarker" => args match {
        case ll :: rest =>
          geoLayerJson("marker", geoPointJson(ll, p, lonLat = false),
            geoPropsJson(rest, Nil, p))
        case _ => throw new IllegalArgumentException("geoPointMarker(latlon[, opt])")
      }
      case "geoCircleMarker" => args match {
        case ll :: r :: rest =>
          geoLayerJson("circleMarker", geoPointJson(ll, p, lonLat = false),
            geoPropsJson(rest, Seq("radius" -> geoJsonValue(r, p)), p))
        case _ => throw new IllegalArgumentException("geoCircleMarker(latlon, radius[, opt])")
      }
      case other => throw new IllegalArgumentException(s"unknown function $other")
    }
  }

  /** Normalize a time expression to an epoch-ns long column (TQL times
    * are ns longs internally; CSV datetimeType sources surface
    * timestamps). */
  /** MAP_DIFF-family input coercion: the reference's diff state machine
    * routes time.Time to a ns-duration branch and pushes everything else
    * through util.ToFloat64 — strings included, so an untyped CSV column
    * diffs numerically (fm_monad.go:1848-1906; tql_test.go:1620-1647).
    * Resolve the expression's type once against the frame to pick. */
  private def diffInput(e: Expr, p: Pipe): (Column, Boolean) = {
    val c = toColumn(e, p)
    val isTs = try p.df.select(c).schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.TimestampType]
    catch { case _: Exception => false }
    if (isTs) (c, true) else (c.cast("double"), false)
  }

  private def nsLongOf(e: Expr, p: Pipe): Column = {
    val c = toColumn(e, p)
    val isTs = try p.df.select(c).schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.TimestampType]
    catch { case _: Exception => false }
    if (isTs) unix_micros(c) * 1000L else c.cast("long")
  }

  // ---- geo constructor JSON builders --------------------------------

  /** latlon() literal or array-typed expression → (lat, lon) columns. */
  private def geoLatLon(e: Expr, p: Pipe): (Column, Column) = e match {
    case Expr.Call("latlon", List(a, b)) =>
      (toColumn(a, p).cast("double"), toColumn(b, p).cast("double"))
    case other =>
      val c = toColumn(other, p)
      (element_at(c, 1).cast("double"), element_at(c, 2).cast("double"))
  }

  private def geoIsPointArg(e: Expr): Boolean = e match {
    case Expr.Call("latlon", _) => true
    case Expr.Str(_) | Expr.Call("dict", _) => false
    case _ => false // string/dict opts only beyond latlon (NewMultiLatLonFunc)
  }

  /** `[a,b]` JSON pair — leaflet layers take [lat,lon], GeoJSON [lon,lat]. */
  private def geoPointJson(e: Expr, p: Pipe, lonLat: Boolean): Column = {
    val (lat, lon) = geoLatLon(e, p)
    val (x, y) = if (lonLat) (lon, lat) else (lat, lon)
    concat(lit("["), x.cast("string"), lit(","), y.cast("string"), lit("]"))
  }

  private def geoRingJson(pts: List[Expr], p: Pipe): Column =
    concat((lit("[") +: pts.zipWithIndex.flatMap { case (pt, i) =>
      (if (i == 0) Nil else Seq(lit(","))) :+ geoPointJson(pt, p, lonLat = true)
    } :+ lit("]")): _*)

  /** One property value as JSON text: literals render at compile time,
    * row expressions by their resolved type (strings quoted+escaped). */
  private def geoJsonValue(e: Expr, p: Pipe): Column = e match {
    case Expr.Str(s) => lit(graft.sinks.GoJs.jsonQuote(s))
    case Expr.Num(v) => lit(graft.sinks.GoJs.goNum(v))
    case Expr.Bool(b) => lit(b.toString)
    case Expr.Null => lit("null")
    case Expr.Call("dict", kvs) => geoDictJson(kvs, p)
    case other =>
      val c = toColumn(other, p)
      val isStr = try p.df.select(c).schema.head.dataType ==
        org.apache.spark.sql.types.StringType catch { case _: Exception => true }
      if (isStr)
        concat(lit("\""),
          regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
          lit("\""))
      else c.cast("string")
  }

  private def geoDictJson(kvs: List[Expr], p: Pipe): Column = {
    val parts = kvs.grouped(2).toList.collect { case List(Expr.Str(k), v) =>
      (k, geoJsonValue(v, p))
    }
    geoObjJson(parts)
  }

  private def geoObjJson(pairs: Seq[(String, Column)]): Column =
    if (pairs.isEmpty) lit("{}")
    else concat((lit("{") +: pairs.zipWithIndex.flatMap { case ((k, v), i) =>
      Seq(lit((if (i == 0) "" else ",") + graft.sinks.GoJs.jsonQuote(k) + ":"), v)
    } :+ lit("}")): _*)

  /** Properties from the trailing opt arg: a constant JSON(-ish) string
    * (brace-wrapped when bare, parse errors → empty — NewGeoPropertiesParse)
    * or a dict(); `extra` pairs (circle radius) apply unless overridden. */
  private def geoPropsJson(optArgs: List[Expr], extra: Seq[(String, Column)],
                           p: Pipe): Column = {
    val fromOpt: Seq[(String, Column)] = optArgs.headOption match {
      case Some(Expr.Str(s)) =>
        val wrapped = if (s.trim.startsWith("{")) s.trim else "{" + s + "}"
        try graft.script.Builtins.jsonParse(wrapped) match {
          case m: collection.Map[_, _] =>
            m.asInstanceOf[collection.Map[String, Any]].toSeq.map { case (k, v) =>
              k -> lit(graft.sinks.GoJs.jsonMarshal(v))
            }
          case _ => Nil
        } catch { case _: Exception => Nil }
      case Some(Expr.Call("dict", kvs)) =>
        kvs.grouped(2).toList.collect { case List(Expr.Str(k), v) =>
          (k, geoJsonValue(v, p))
        }
      case _ => Nil
    }
    geoObjJson(extra.filterNot { case (k, _) => fromOpt.exists(_._1 == k) } ++ fromOpt)
  }

  /** leaflet layer object: marker/circleMarker/circle ([lat,lon]). */
  private def geoLayerJson(kind: String, coord: Column, props: Column): Column =
    concat(lit(s"""{"type":"$kind","coordinates":"""), coord,
      lit(""","properties":"""), props, lit("}"))

  /** GeoJSON Feature (MarshalGeoJSON shape, [lon,lat]). */
  private def geoFeatureJson(geomType: String, coords: Column, props: Column): Column =
    concat(lit(s"""{"type":"Feature","geometry":{"type":"$geomType","coordinates":"""),
      coords, lit("""},"properties":"""), props, lit("}"))
}

/** Public entry points for the TQL surface. */
object Tql {
  /** Compile a script against a session (tables must be registered). */
  def compile(spark: SparkSession, script: String): Compiler.Compiled =
    Compiler.compile(spark, script)

  /** Compile with a pinned clock for between('now…') determinism. */
  def compile(spark: SparkSession, script: String, nowNs: Long): Compiler.Compiled =
    Compiler.compile(spark, script, nowNs)

  /** Compile with request params bound to `param('name')` references. */
  def compile(spark: SparkSession, script: String,
              params: Map[String, String]): Compiler.Compiled =
    Compiler.compile(spark, script, System.currentTimeMillis() * 1000000L, params)

  /** Compile and render through the sink codec — `/db/tql` semantics. */
  def run(spark: SparkSession, script: String): String =
    Compiler.run(spark, script)

  /** Render with a pinned clock. */
  def run(spark: SparkSession, script: String, nowNs: Long): String =
    Compiler.renderCompiled(Compiler.compile(spark, script, nowNs))

  /** Render with a pinned clock and multi-valued request params. */
  def run(spark: SparkSession, script: String, nowNs: Long,
          params: Map[String, Seq[String]]): String =
    Compiler.renderCompiled(Compiler.compileMulti(spark, script, nowNs, params))
}
