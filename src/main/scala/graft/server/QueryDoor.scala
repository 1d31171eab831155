package graft.server

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.Codecs

/** The `/db/query` front door (reference: mods/server/http_query.go:25-107
  * — SQL in, encoded rows out; statement-type detection
  * spi/database.go:162-245; SHOW subcommands fm_dbsrc.go:485-693).
  *
  * Spark SQL replaces the closed engine: SELECT-like statements run
  * through `spark.sql`; DDL/DML return a message row like the reference;
  * SHOW/DESC map to the catalog; EXPLAIN returns the plan text.
  */
object QueryDoor {
  sealed trait StmtType
  case object Select extends StmtType
  case object DdlDml extends StmtType
  case object Explain extends StmtType
  case object Show extends StmtType

  /** The reference's verb-table statement classifier, name-for-name
    * (spi/database.go:207-240 DetectSQLStatementType; database_test.go:
    * 388-414 pins the String() names). First whitespace-split token,
    * case-folded; DESC aliases DESCRIBE; WITH is "CTE"; anything else
    * is "OTHER". */
  def statementTypeName(sql: String): String =
    sql.trim.split("\\s+").headOption.map(_.toUpperCase).getOrElse("") match {
      case "SELECT" => "SELECT"
      case "INSERT" => "INSERT"
      case "UPDATE" => "UPDATE"
      case "DELETE" => "DELETE"
      case "CREATE" => "CREATE"
      case "DROP" => "DROP"
      case "ALTER" => "ALTER"
      case "DESCRIBE" | "DESC" => "DESCRIBE"
      case "WITH" => "CTE"
      case "SHOW" => "SHOW"
      case "EXPLAIN" => "EXPLAIN"
      case _ => "OTHER"
    }

  /** spi/database.go:242-244 IsFetch — SELECT, DESCRIBE and CTEs fetch. */
  def isFetch(stmtType: String): Boolean =
    stmtType == "SELECT" || stmtType == "DESCRIBE" || stmtType == "CTE"

  /** spi/database.go:461-489 MakeUserMessage — the humanized row-count
    * reply ("no rows"/"a row"/"N rows" + per-verb suffix; DDL verbs get
    * the "… successfully." forms; database_test.go:479-503). */
  def userMessage(stmtType: String, rows: Long): String = {
    val rowsObj = rows match {
      case 0 => "no rows"
      case 1 => "a row"
      case n => s"$n rows"
    }
    stmtType match {
      case "SELECT" | "DESCRIBE" | "CTE" => s"$rowsObj selected."
      case "INSERT" => s"$rowsObj inserted."
      case "UPDATE" => s"$rowsObj updated."
      case "DELETE" => s"$rowsObj deleted."
      case "CREATE" => "Created successfully."
      case "DROP" => "Dropped successfully."
      case "ALTER" => "Altered successfully."
      case _ => "executed."
    }
  }

  /** api.TableName.Split: `[[db.]user.]table` → (db, user, table),
    * uppercased, defaulting db=MACHBASEDB and user=SYS
    * (spi/spi_test.go:30-48 TestTableNames). */
  def splitTableName(name: String): (String, String, String) =
    name.toUpperCase.split("\\.", -1) match {
      case Array(d, u, t) => (d, u, t)
      case Array(u, t) => ("MACHBASEDB", u, t)
      case Array(t) => ("MACHBASEDB", "SYS", t)
      case parts => (parts(0), parts(1), parts.drop(2).mkString("."))
    }

  /** Statement classification, mirroring the reference's regex table. */
  def detect(sql: String): StmtType = {
    val s = sql.trim.toUpperCase
    if (s.startsWith("SELECT") || s.startsWith("WITH") || s.startsWith("VALUES") ||
      s.startsWith("TABLE ")) Select
    else if (s.startsWith("EXPLAIN")) Explain
    else if (s.startsWith("SHOW") || s.startsWith("DESC")) Show
    else DdlDml
  }

  /** Execute one statement; always yields a DataFrame (message row for
    * DDL/DML, like the reference's "executed." rows). */
  def execute(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    // the engine's SQL dialect (scalar names, machbase
    // to_timestamp/from_timestamp) — idempotent per session
    graft.functions.SqlRegistry.registerAll(spark)
    detect(sql) match {
      case Select =>
        Catalog.recordStatement(sql, "FETCH", 0L)
        checkBitand(sql)
        spark.sql(rewriteSelect(spark, sql))
      case Explain =>
        // option tokens between EXPLAIN and the statement: `--full`,
        // bare `full`, or a bare `--` delimiter (fm_dbsrc_internal_test
        // .go splitExplainSQLText — "explain full with cte ..." keeps
        // `with` as the statement head)
        val words = sql.trim.split("\\s+").toList.drop(1)
        val (tokens, stmt) = words.span(w =>
          w == "--" || w.startsWith("--") || w.equalsIgnoreCase("full"))
        if (stmt.isEmpty)
          throw new IllegalArgumentException(
            "f(SQL) missing statement after explain options")
        val full = tokens.exists(t => t.stripPrefix("--").equalsIgnoreCase("full"))
        val inner = stmt.mkString(" ")
        explainPlan(spark, rewriteSelect(spark, inner), full)
          .split("\n").toSeq.toDF("plan")
      case Show => showCommand(spark, sql)
      case DdlDml =>
        val s = sql.trim
        val lower = s.toLowerCase
        val DeleteRe =
          "(?is)^\\s*delete\\s+from\\s+(\\w+)(?:\\s+where\\s+(.*?))?\\s*$".r
        val NameEqRe = "(?is)^name\\s*=\\s*'([^']*)'$".r
        Catalog.recordStatement(s, "EXECUTED", 0L)
        val FlushRe = "(?is)^\\s*exec\\s+table_flush\\s*\\(\\s*'?(\\w+)'?\\s*\\)\\s*$".r
        val DropRe = "(?is)^\\s*drop\\s+(?:tag\\s+|log\\s+)?table\\s+(\\w+)(?:\\s+cascade)?\\s*$".r
        // backup/mount statements — the SQL text shapes backupd composes
        // (mods/backup/backupd.go:183-216, 386-391, 442)
        val BackupDbRe =
          "(?is)^\\s*backup\\s+database\\s*(.*?)\\s*into\\s+disk\\s*=\\s*'([^']+)'\\s*$".r
        val BackupTblRe =
          "(?is)^\\s*backup\\s+table\\s+(\\w+)\\s*(.*?)\\s*into\\s+disk\\s*=\\s*'([^']+)'\\s*$".r
        val CreateIdxRe =
          "(?is)^\\s*create\\s+index\\s+(?:\\w+\\.)?(\\w+)\\s+on\\s+(?:\\w+\\.)?(\\w+)\\s*\\(\\s*(\\w+)\\s*\\)\\s*$".r
        val DropIdxRe = "(?is)^\\s*drop\\s+index\\s+(?:\\w+\\.)?(\\w+)\\s*$".r
        val MountRe =
          "(?is)^\\s*mount\\s+database\\s+'([^']+)'\\s+to\\s+'?(\\w+)'?\\s*$".r
        val UnmountRe =
          "(?is)^\\s*unmount\\s+database\\s+'?(\\w+)'?\\s*$".r
        s match {
          case BackupDbRe(mid, path) =>
            val (after, fromNs, toNs) = Backup.parseWindow(mid)
            Backup.runBackup(spark, None, path, after, fromNs, toNs)
            Seq("executed.").toDF("MESSAGE")
          case BackupTblRe(tbl, mid, path) =>
            val (after, fromNs, toNs) = Backup.parseWindow(mid)
            Backup.runBackup(spark, Some(tbl), path, after, fromNs, toNs)
            Seq("executed.").toDF("MESSAGE")
          case MountRe(path, name) =>
            Backup.mount(spark, path, name)
            Seq("executed.").toDF("MESSAGE")
          case UnmountRe(name) =>
            Backup.unmount(spark, name)
            Seq("executed.").toDF("MESSAGE")
          case FlushRe(table) =>
            // table_flush makes buffered appends visible to the stat
            // views (SHOW TAGS value statistics are flush-gated)
            TagTables.markFlushed(table)
            Seq("executed.").toDF("MESSAGE")
          case _ if lower.startsWith("exec ") || lower.startsWith("exec(") =>
            // other engine procedures are no-ops here
            Seq("executed.").toDF("MESSAGE")
          case DropRe(table) if TagTables.descriptorFor(table).isDefined =>
            TagTables.dropTable(spark, table)
            Catalog.dropIndexesOf(table)
            // engine DDL classifies by the first SQL word
            // (spi/machsvr/mach_rows.go definedMessage)
            Seq("Dropped successfully.").toDF("MESSAGE")
          // CREATE/DROP INDEX — Spark needs no index object to answer the
          // same queries; the statement registers a catalog entry visible
          // via SHOW INDEXES / M$SYS_INDEXES (spi/sql_test.go
          // TestMultiUserSessionIndexBehavior; names may be user-qualified)
          case CreateIdxRe(name, table, col) =>
            Catalog.createIndex(name, table, col)
            Seq("Created successfully.").toDF("MESSAGE")
          case DropIdxRe(name) =>
            Catalog.dropIndex(name)
            Seq("Dropped successfully.").toDF("MESSAGE")
          case DeleteRe(table, where)
            if TagTables.descriptorFor(table).isDefined =>
            val n = Option(where) match {
              case None => TagTables.delete(spark, table, None)
              case Some(NameEqRe(nm)) => TagTables.delete(spark, table, Some(nm))
              case Some(pred) => TagTables.deleteWhere(spark, table, pred)
            }
            Seq(if (n == 1) "a row deleted." else s"$n rows deleted.").toDF("MESSAGE")
          case _ if lower.startsWith("create tag table") ||
            lower.startsWith("create log table") ||
            lower.startsWith("create volatile table") ||
            lower.startsWith("create lookup table") ||
            // a bare CREATE TABLE with machbase-typed columns is a LOG
            // table — machbase's default table type (machsvr_test.go
            // testCreateTables creates log_data this way). Spark-native
            // DDL (USING/AS SELECT/PARTITIONED BY) falls through.
            (lower.startsWith("create table") && isMachbaseDdl(s)) =>
            TagTables.createTagTable(spark, s)
            Seq("Created successfully.").toDF("MESSAGE")
          case InsertOnDupRe(table, cols, vals, sets)
            if TagTables.isKeyedClass(table) =>
            // volatile/lookup upsert: INSERT … ON DUPLICATE KEY UPDATE
            // [SET a=1, …] — bare form updates the inserted columns
            val columns = Option(cols)
              .map(_.split(",").map(_.trim).toSeq)
              .getOrElse(TagTables.columnsOf(table))
            val setList = Option(sets).map(splitValues(_).map { a =>
              val Array(k, v) = a.split("=", 2)
              k.trim -> parseLiterals(v.trim).head
            })
            val updated = TagTables.upsert(spark, table, columns,
              parseLiterals(vals), setList)
            Seq(if (updated) "a row updated." else "a row inserted.")
              .toDF("MESSAGE")
          case UpdateRe(table, sets, whereCol, whereVal)
            if TagTables.isKeyedClass(table) =>
            val setList = splitValues(sets).map { a =>
              val Array(k, v) = a.split("=", 2)
              k.trim -> parseLiterals(v.trim).head
            }
            val n = TagTables.updateByKey(spark, table, setList,
              whereCol, parseLiterals(whereVal).head)
            Seq(if (n == 1) "a row updated." else s"$n rows updated.")
              .toDF("MESSAGE")
          case InsertMetaRe(table, cols, vals)
            if TagTables.descriptorFor(table).isDefined =>
            // INSERT INTO t METADATA(name, …) VALUES(…) → _T_META row
            // (machsvr_test.go testInsertMeta)
            TagTables.insertMeta(spark, table,
              cols.split(",").map(_.trim).toSeq, parseLiterals(vals))
            Seq("a row inserted.").toDF("MESSAGE")
          case InsertRe(table, cols, vals)
            if TagTables.descriptorFor(table).isDefined =>
            // literal INSERT INTO <machbase table> — the conn.Exec path
            // (spi/testsuite/logtable.go:31, show_test.go:302-304)
            val columns = Option(cols)
              .map(_.split(",").map(_.trim).toSeq)
              .getOrElse(TagTables.columnsOf(table)
                .filterNot(_ == "_ARRIVAL_TIME"))
            TagTables.insert(spark, table, columns, parseLiterals(vals))
            Seq("a row inserted.").toDF("MESSAGE")
          case _ =>
            spark.sql(s)
            // first-word classification (spi/machsvr/mach_rows.go
            // definedMessage: create/drop/truncate/alter/connect)
            val msg = lower.trim.split("\\s+").headOption.getOrElse("") match {
              case "create" => "Created successfully."
              case "drop" => "Dropped successfully."
              case "truncate" => "Truncated successfully."
              case "alter" => "Altered successfully."
              case "connect" => "Connected successfully."
              case _ => "executed."
            }
            Seq(msg).toDF("MESSAGE")
        }
    }
  }

  private val InsertRe =
    ("(?is)^\\s*insert\\s+into\\s+(\\w+)\\s*(?:\\(([^)]*)\\)\\s*)?" +
      "values\\s*\\((.*)\\)\\s*$").r
  /** BITAND/BITOR take integral arguments only — a float/double column
    * or fractional literal raises the engine's type-mismatch error
    * (machsvr_test.go TestBitTypeColumn pins the MACH-ERR 2037 text,
    * github.com/machbase/neo issue 956). */
  private def checkBitand(sql0: String): Unit = {
    // strip string literals first: a BITAND token INSIDE a literal must
    // not trip the gate, and literal commas must not confuse arg splits
    val sql = sql0.replaceAll("'(?:[^']|'')*'", "''")
    val fnRe = "(?i)(BITAND|BITOR)\\s*\\(([^()]*)\\)".r
    val fromRe = "(?is)\\bfrom\\s+(\\w+)".r
    // column types resolve only for the single-table machbase form; a
    // join/subquery SELECT leaves fromDesc empty and the gate falls back
    // to literal checks alone (the engine resolves real columns there)
    val fromMatches = fromRe.findAllMatchIn(sql).toSeq
    lazy val fromDesc =
      if (fromMatches.size != 1) None
      else TagTables.descriptorFor(fromMatches.head.group(1))
    fnRe.findAllMatchIn(sql).foreach { m =>
      val fn = m.group(1).toUpperCase
      def mismatch() = throw new IllegalArgumentException(
        s"MACH-ERR 2037 Function [$fn] argument data type is mismatched.")
      m.group(2).split(",").map(_.trim).foreach { a =>
        if (a.matches("-?\\d+\\.\\d+([eE][+-]?\\d+)?")) mismatch()
        else if (a.matches("[A-Za-z_]\\w*")) {
          fromDesc.flatMap(_.find(_.name.equalsIgnoreCase(a))).foreach { c =>
            if (c.typ == "float" || c.typ == "double") mismatch()
          }
        }
      }
    }
  }

  /** True when a bare CREATE TABLE uses only machbase column types — the
    * signal it is machbase DDL (default table type: log), not Spark DDL.
    * Any Spark-only DDL signal (USING/AS SELECT/PARTITIONED BY/
    * TBLPROPERTIES/COMMENT/LOCATION/STRING columns) falls through to
    * `spark.sql`, so `CREATE TABLE t (a INT) TBLPROPERTIES(...)` still
    * creates a real Spark table; machbase-default semantics apply only
    * to the plain shared-type form, like the exec door's dialect. */
  private def isMachbaseDdl(sql: String): Boolean = {
    val open = sql.indexOf('(')
    if (open < 0) return false
    // Spark-only signals BEFORE the column defs (CREATE TABLE t USING …
    // has no paren and already fell out above; AS SELECT can precede)
    val head = sql.substring(0, open).toLowerCase
    if (head.contains(" using ") || head.contains(" as select")) return false
    var depth = 0; var close = -1; var i = open
    while (i < sql.length && close < 0) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    if (close < 0) return false
    // Spark-only signals live AFTER the closing column-def paren — a
    // column NAMED location/comment must not reroute machbase DDL
    val tail = " " + sql.substring(close + 1).toLowerCase + " "
    if (tail.contains(" using ") || tail.contains(" as select") ||
        tail.contains("partitioned by") || tail.contains("tblproperties") ||
        tail.contains(" location ") || tail.contains(" comment ") ||
        tail.contains(" stored as ")) return false
    val machTypes = Set("short", "ushort", "integer", "int", "uinteger",
      "uint", "long", "ulong", "float", "double", "varchar", "text",
      "json", "ipv4", "ipv6", "binary", "datetime")
    val defs = splitValues(sql.substring(open + 1, close))
    defs.nonEmpty && defs.forall { d =>
      d.trim.split("\\s+").lift(1).map(_.toLowerCase.takeWhile(_ != '('))
        .exists(machTypes)
    }
  }

  private val InsertMetaRe =
    ("(?is)^\\s*insert\\s+into\\s+(\\w+)\\s+metadata\\s*\\(([^)]*)\\)\\s*" +
      "values\\s*\\((.*)\\)\\s*$").r
  private val InsertOnDupRe =
    ("(?is)^\\s*insert\\s+into\\s+(\\w+)\\s*(?:\\(([^)]*)\\)\\s*)?" +
      "values\\s*\\((.*?)\\)\\s*on\\s+duplicate\\s+key\\s+update" +
      "(?:\\s+set\\s+(.*?))?\\s*$").r
  private val UpdateRe =
    ("(?is)^\\s*update\\s+(\\w+)\\s+set\\s+(.*?)\\s+where\\s+" +
      "(\\w+)\\s*=\\s*('[^']*'|\\S+)\\s*$").r

  /** split a VALUES(…) / select-list / column-def list on top-level
    * commas only: quote-aware AND paren-aware, so `NUMERIC(10,2)` or
    * `round(value,2)` stays one token. */
  private[graft] def splitValues(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inStr = false
    var depth = 0
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) {
        cur.append(c)
        // '' is an escaped quote inside a machbase string literal
        if (c == '\'' && (i + 1 >= body.length || body.charAt(i + 1) != '\'')) inStr = false
        else if (c == '\'') { cur.append('\''); i += 1 }
      } else if (c == '\'') { cur.append(c); inStr = true }
      else if (c == '(') { depth += 1; cur.append(c) }
      else if (c == ')') { depth -= 1; cur.append(c) }
      else if (c == ',' && depth == 0) { out += cur.toString.trim; cur.clear() }
      else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty || out.isEmpty) out += cur.toString.trim
    out.toSeq
  }

  /** Replace whole-word occurrences of identifier `from` with `to`,
    * skipping single-quoted string literals (`''` escapes) — a blanket
    * regex would also rewrite matches inside literals. */
  private[graft] def replaceIdent(sql: String, from: String, to: String): String = {
    val out = new StringBuilder
    val n = sql.length
    var i = 0
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_' || c == '$'
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {
        out.append(c); i += 1
        var done = false
        while (i < n && !done) {
          val ch = sql.charAt(i)
          out.append(ch)
          if (ch == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') { out.append('\''); i += 1 }
            else done = true
          }
          i += 1
        }
      } else if (isIdent(c)) {
        val start = i
        while (i < n && isIdent(sql.charAt(i))) i += 1
        val word = sql.substring(start, i)
        out.append(if (word.equalsIgnoreCase(from)) to else word)
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** one VALUES token → JVM value (quoted string, integer, double, NULL,
    * the engine's `now` keyword as epoch ns). */
  private[graft] def literalValue(tok: String): Any =
    if (tok.equalsIgnoreCase("null")) null
    else if (tok.equalsIgnoreCase("now"))
      Long.box(System.currentTimeMillis() * 1000000L)
    else if (tok.startsWith("'") && tok.endsWith("'") && tok.length >= 2)
      tok.substring(1, tok.length - 1).replace("''", "'")
    else if (tok.matches("[+-]?\\d+")) java.lang.Long.valueOf(tok)
    else java.lang.Double.valueOf(tok)

  private[server] def parseLiterals(body: String): Seq[Any] =
    splitValues(body).map(literalValue)

  /** EXPLAIN renders a machbase-shaped access-path header derived from
    * the REAL Spark plan (tag-table scans print `TAG READ (RAW)` /
    * `(INDEX)` like the engine — fm_dbsrc_test.go:17-26), followed by the
    * Spark formatted plan. EXPLAIN FULL additionally EXECUTES the query
    * and prints the engine-style per-node trace table (`EXECUTE`, the
    * `********`-framed `NAME COUNT ACCUMULATE(ms) AVERAGE(ms)` section —
    * machsvr_test.go:1236-1243) with real SQLMetrics. */
  private def explainPlan(spark: SparkSession, inner: String,
                          full: Boolean): String = {
    val df = spark.sql(inner)
    val lower = inner.toLowerCase
    val machHeader = TagTables.allVisibleTables.collectFirst {
      case (t, typ, _) if lower.matches("(?s).*\\b" + t + "\\b.*") =>
        val access =
          if (typ != "Tag") "FULL SCAN"
          else if (lower.contains("name =") || lower.contains("name=")) "TAG READ (INDEX)"
          else "TAG READ (RAW)"
        s" PROJECT\n  $access\n"
    }.getOrElse("")
    if (!full) {
      machHeader + df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    } else {
      // execute the actual plan, then read the populated metrics
      df.queryExecution.toRdd.count()
      val sb = new StringBuilder
      sb.append("********\n EXECUTE\n")
      sb.append(" NAME           COUNT   ACCUMULATE(ms)  AVERAGE(ms)\n")
      val plan = df.queryExecution.executedPlan match {
        // AQE wrapper: trace the FINAL physical plan it settled on
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.foreach { node =>
        val rows = node.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
        val timeMs = node.metrics.collect {
          case (k, m) if k.toLowerCase.contains("time") => m.value
        }.sum / 1000000L
        val avg = if (rows > 0) timeMs.toDouble / rows else 0d
        sb.append(f" ${node.nodeName.take(14)}%-14s ${rows}%7d  ${timeMs}%13d  ${avg}%10.3f\n")
      }
      sb.append("********\n")
      machHeader + sb.toString +
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
    }
  }

  /** SELECT-path rewrites: `M$…`/`V$…` system tables become their
    * registered views ($ is not a Spark identifier char), and SQL that
    * names a log table's hidden `_ARRIVAL_TIME` is pointed at the
    * arrival view that exposes it. */
  /** Machbase names an unaliased select-list expression by its VERBATIM
    * text — `select (MIN(MIN_TIME)), (MAX(MAX_TIME)) …` replies columns
    * "(MIN(MIN_TIME))" and "(MAX(MAX_TIME))" exactly as written
    * (http_query_test.go TestHttpQuery select_v$example). Spark
    * generates its own name (`min(MIN_TIME)`), so alias top-level
    * expression items — those ending in ')' with no explicit alias —
    * with their as-written text, backtick-quoted. Bare columns, `*`,
    * and already-aliased items pass through untouched. */
  private[graft] def aliasVerbatim(sql: String): String = {
    val n = sql.length
    var i = 0
    var depth = 0
    var inStr = false
    var selStart = -1
    var selEnd = -1
    val stops = Set("from", "where", "group", "order", "limit", "having",
      "union", "intersect", "except")
    while (i < n && selEnd < 0) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; i += 1 }
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql.charAt(i).isLetterOrDigit ||
          sql.charAt(i) == '_' || sql.charAt(i) == '$')) i += 1
        val w = sql.substring(start, i).toLowerCase
        if (depth == 0) {
          if (selStart < 0) { if (w == "select") selStart = i }
          else if (stops(w)) selEnd = start
        }
      } else i += 1
    }
    if (selStart < 0) return sql
    val end = if (selEnd >= 0) selEnd else n
    val items = splitValues(sql.substring(selStart, end))
    def hasTopLevelAs(item: String): Boolean = {
      var d = 0; var s = false; var j = 0
      while (j < item.length) {
        val c = item.charAt(j)
        if (s) { if (c == '\'') s = false; j += 1 }
        else if (c == '\'') { s = true; j += 1 }
        else if (c == '(') { d += 1; j += 1 }
        else if (c == ')') { d -= 1; j += 1 }
        else if (c.isLetter || c == '_') {
          val st = j
          while (j < item.length && (item.charAt(j).isLetterOrDigit ||
            item.charAt(j) == '_' || item.charAt(j) == '$')) j += 1
          if (d == 0 && item.substring(st, j).equalsIgnoreCase("as")) return true
        } else j += 1
      }
      false
    }
    val rewritten = items.map { item =>
      if (item.endsWith(")") && !item.contains("`") && !hasTopLevelAs(item))
        s"$item AS `$item`"
      else item
    }
    sql.substring(0, selStart) + " " + rewritten.mkString(", ") +
      (if (end < n) " " + sql.substring(end) else "")
  }

  /** machbase treats an empty string literal as NULL (neo#1408;
    * spi/sql_test.go TestMachbaseSQLCompatibilityEmptyVarchar pins
    * `SELECT ''` scanning as nil, not "") — rewrite standalone `''`
    * literals to a typed NULL so the column stays varchar. Literals with
    * `''` escapes inside are untouched. */
  private[graft] def emptyLiteralsAsNull(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '`') {
        // backtick-quoted identifiers (aliasVerbatim's verbatim column
        // names) pass through untouched — rewriting '' inside them would
        // corrupt the very names the alias pass preserves
        val start = i
        i += 1
        while (i < n && sql.charAt(i) != '`') i += 1
        if (i < n) i += 1
        sb.append(sql.substring(start, i))
      } else if (c == '\'') {
        val start = i
        i += 1
        var bodyLen = 0
        var done = false
        while (i < n && !done) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') { bodyLen += 1; i += 2 }
            else { done = true; i += 1 }
          } else { bodyLen += 1; i += 1 }
        }
        if (done && bodyLen == 0) sb.append("CAST(NULL AS STRING)")
        else sb.append(sql.substring(start, i))
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def rewriteSelect(spark: SparkSession, sql: String): String = {
    var out = Catalog.rewriteSysNames(spark, emptyLiteralsAsNull(aliasVerbatim(sql)))
    // mounted-archive reference spelling: <mount>.SYS.<table>
    // (backup mounts expose tables under MOUNTDB.SYS.*) → the session
    // catalog's 2-part <mount>.<table>
    Backup.mountNames.foreach { m =>
      out = out.replaceAll("(?i)\\b" + java.util.regex.Pattern.quote(m) +
        "\\.sys\\.", m + ".")
    }
    if (out.toLowerCase.contains("_arrival_time")) {
      TagTables.allVisibleTables.collect { case (t, "Log", _) => t }
        .foreach { t =>
          TagTables.ensure(spark, t)
          out = replaceIdent(out, t, TagTables.arrivalViewName(t))
        }
    }
    out
  }

  /** SHOW … — the reference's full SHOW surface mapped to the session
    * catalog (command routing fm_dbsrc.go:485-693, shapes spi/show.go).
    * Subcommands with hyphens (meta-tables, virtual-tables, table-usage)
    * also accept the space-separated spelling. */
  def showCommand(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    val all = sql.contains("--all") || sql.matches("(?is).*\\s-a(\\s.*|$)")
    val words = sql.trim.replace("--all", "").replaceAll("(?i)\\s-a(?=\\s|$)", "")
      .trim.split("\\s+").map(_.toUpperCase)
    words.take(2).toList match {
      case List("SHOW", "INFO") => Catalog.showInfo(spark)
      case List("SHOW", "LICENSE") => Catalog.showLicense(spark)
      case List("SHOW", "PORTS") =>
        Catalog.showPorts(spark, words.drop(2).headOption.getOrElse(""))
      case List("SHOW", "USERS") => Catalog.showUsers(spark)
      case List("SHOW", "META-TABLES") => Catalog.showMetaTables(spark)
      case List("SHOW", "META") if words.lift(2).contains("TABLES") =>
        Catalog.showMetaTables(spark)
      case List("SHOW", "VIRTUAL-TABLES") => Catalog.showVirtualTables(spark)
      case List("SHOW", "VIRTUAL") if words.lift(2).contains("TABLES") =>
        Catalog.showVirtualTables(spark)
      case List("SHOW", "TIMERS") =>
        graft.scheduler.Timers.defaultService(spark).showTimers(spark)
      case List("SHOW", "SUBSCRIBERS") =>
        graft.scheduler.Timers.defaultService(spark).showSubscribers(spark)
      case List("SHOW", "BRIDGES") => Bridge.showBridges(spark)
      case List("SHOW", "SESSIONS") => Catalog.showSessions(spark)
      case List("SHOW", "STATEMENTS") => Catalog.showStatements(spark)
      case List("SHOW", "INDEXES") => Catalog.showIndexes(spark)
      case List("SHOW", "INDEX") => Catalog.showIndex(spark, words(2))
      case List("SHOW", "STORAGE") => Catalog.showStorage(spark)
      case List("SHOW", "TABLE-USAGE") => Catalog.showTableUsage(spark)
      case List("SHOW", "TABLE") if words.lift(2).contains("USAGE") =>
        Catalog.showTableUsage(spark)
      case List("SHOW", "LSM") => Catalog.showLsm(spark)
      case List("SHOW", "INDEXGAP") => Catalog.showIndexGap(spark)
      case List("SHOW", "TAGINDEXGAP") => Catalog.showTagIndexGap(spark)
      case List("SHOW", "ROLLUPGAP") => Catalog.showRollupGap(spark)
      case List("SHOW", "TABLES") =>
        // machbase catalog shape (fm_dbsrc_test.go:262-295 for the
        // fixture tables; show_test.go:315-333 for a dynamic tag table
        // with rollup): base tables, then (--all) their shadow tables —
        // _DATA_0/_META (+_ROLLUP_SEC/MIN/HOUR when `with rollup`) — in
        // name order, then other session views as Volatile
        val mach = TagTables.allVisibleTables
        mach.foreach { case (t, _, _) => TagTables.ensure(spark, t) }
        val base = mach.map { case (t, typ, _) =>
          ("MACHBASEDB", "SYS", t.toUpperCase, TagTables.tableIdOf(t), typ, "")
        }
        val shadows = if (!all) Nil else
          mach.filter(_._2 == "Tag").sortBy(_._1).zipWithIndex.flatMap {
            case ((t, _, hasRollup), i) =>
              val tu = t.toUpperCase
              // dynamic tables mimic a fresh engine's shadow IDs 1..5
              // (show_test.go:327-332); fixtures keep their 100+ block
              val isDyn = TagTables.dynamicTagTables.contains(t)
              val idBase = if (isDyn) 1L else 100L + 2 * i
              val core = Seq(
                ("MACHBASEDB", "SYS", s"_${tu}_DATA_0", idBase, "KeyValue", "Data"),
                ("MACHBASEDB", "SYS", s"_${tu}_META", idBase + 1, "Lookup", "Meta"))
              val rollups = if (!hasRollup) Nil else Seq(
                ("MACHBASEDB", "SYS", s"_${tu}_ROLLUP_SEC", idBase + 2, "KeyValue", "Rollup"),
                ("MACHBASEDB", "SYS", s"_${tu}_ROLLUP_MIN", idBase + 3, "KeyValue", "Rollup"),
                ("MACHBASEDB", "SYS", s"_${tu}_ROLLUP_HOUR", idBase + 4, "KeyValue", "Rollup"))
              core ++ rollups
          }
        val machNames = mach.map(_._1).toSet
        val others = spark.catalog.listTables().collect().toSeq
          .filterNot(t => machNames(t.name.toLowerCase))
          .filterNot(_.name.toLowerCase.endsWith("__arrival"))
          .filterNot(_.name.toLowerCase.startsWith("sys_"))
          .sortBy(_.name)
          .zipWithIndex.map { case (t, i) =>
            ("MACHBASEDB", "SYS", t.name, 200L + i, "Volatile", "")
          }
        // ASCII name order: letters sort before '_', so every base table
        // precedes the shadow block exactly like ListTablesWalk's output
        (base ++ shadows).sortBy(_._3).++(others).toDF(
          "DATABASE_NAME", "USER_NAME", "TABLE_NAME", "TABLE_ID", "TABLE_TYPE", "TABLE_FLAG")
      case List("SHOW", "TAGS") =>
        // SHOW TAGS <table> [tag …]: the V$T_STAT per-tag statistics
        // shape (tql_test.go:319-330; show_test.go:454-463). Value stats
        // stay NULL until `EXEC table_flush` — the engine only folds
        // appends into the stat table on flush; both states are pinned
        // by reference tests.
        val rest = sql.trim.split("\\s+").drop(2)
        if (rest.isEmpty)
          throw new IllegalArgumentException(
            "f(SQL) show tags expects at least 1 argument, got 0")
        val table = rest(0)
        if (TagTables.typeOf(table) != "Tag")
          throw new IllegalArgumentException(
            s"table '${table.toUpperCase}' is not a tag table")
        val tagFilter = rest.drop(1).toSeq
        val flushed = TagTables.isFlushed(table) && TagTables.valueSummarized(table)
        val t0 = spark.table(table)
        val t = if (tagFilter.isEmpty) t0 else {
          val nc = if (t0.columns.contains("NAME")) "NAME" else "name"
          t0.filter(col(nc).isin(tagFilter: _*))
        }
        val nameC = if (t.columns.contains("NAME")) "NAME" else "name"
        val timeC = if (t.columns.contains("TIME")) "TIME" else "time"
        val timeNs = t.schema(timeC).dataType match {
          // epoch-ns long columns (the engine's tag layout) pass through;
          // timestamps convert exactly via decimal seconds
          case org.apache.spark.sql.types.LongType => col(timeC)
          case _ => col(timeC).cast("decimal(38,9)")
            .*(lit(1000000000L)).cast("long")
        }
        val hasValue = t.columns.exists(_.equalsIgnoreCase("VALUE"))
        val valueC = if (t.columns.contains("VALUE")) "VALUE" else "value"
        val stats =
          if (flushed && hasValue) Seq(
            min(col(valueC)).cast("double").as("MIN_VALUE"),
            min_by(timeNs, col(valueC)).as("MIN_VALUE_TIME"),
            max(col(valueC)).cast("double").as("MAX_VALUE"),
            max_by(timeNs, col(valueC)).as("MAX_VALUE_TIME"))
          else Seq(
            lit(null).cast("double").as("MIN_VALUE"),
            lit(null).cast("long").as("MIN_VALUE_TIME"),
            lit(null).cast("double").as("MAX_VALUE"),
            lit(null).cast("long").as("MAX_VALUE_TIME"))
        val aggs = Seq(
          min(timeNs).as("MIN_TIME"), max(timeNs).as("MAX_TIME"),
          max(timeNs).as("RECENT_ROW_TIME")) ++ stats
        graft.operators.RowOps.zipRownum(
          t.groupBy(col(nameC).as("NAME"))
            .agg(count(lit(1)).as("ROW_COUNT"), aggs: _*),
          "ID", Seq(col("NAME")))
          .select(col("ID"), col("NAME"), col("ROW_COUNT"),
            col("MIN_TIME"), col("MAX_TIME"), col("RECENT_ROW_TIME"),
            col("MIN_VALUE"), col("MIN_VALUE_TIME"),
            col("MAX_VALUE"), col("MAX_VALUE_TIME"))
          .orderBy("ID")
      case List("SHOW", "TABLE") =>
        machDesc(spark, resolveTableName(words(2)), all, arrivalTime = true)
      case List("DESC", t) => describe(spark, resolveTableName(t), all)
      case List("DESCRIBE", t) => describe(spark, resolveTableName(t), all)
      case List("SHOW", cmd) =>
        // reference error text, fm_dbsrc.go:687
        throw new IllegalArgumentException(
          s"""f(SQL) unsupported show command "${cmd.toLowerCase}"""")
      case _ => throw new IllegalArgumentException(s"unsupported SHOW command: $sql")
    }
  }

  /** `[[db.]user.]table` resolves through TableName.Split — the
    * reference accepts SYS.T / MACHBASEDB.SYS.T forms wherever a table
    * is named (spi/spi_test.go:30-48) — but ONLY when the table part is
    * a known machbase table: a qualified Spark name (global_temp.v,
    * somedb.t) must keep its full dotted form for spark.table. */
  private def resolveTableName(name: String): String = {
    val part = splitTableName(name)._3.toLowerCase
    if (TagTables.descriptorFor(part).isDefined) part else name.toLowerCase
  }

  private def describe(spark: SparkSession, table: String, all: Boolean): DataFrame = {
    import spark.implicits._
    if (TagTables.descriptorFor(table).isDefined)
      machDesc(spark, table, all, arrivalTime = false)
    else
      spark.table(table).schema.fields.zipWithIndex.map { case (f, i) =>
        (i, f.name, f.dataType.simpleString, f.nullable)
      }.toSeq.toDF("ID", "NAME", "TYPE", "NULLABLE")
  }

  /** machbase COLUMN/TYPE/LENGTH/FLAG/INDEX listing. `--all` exposes the
    * hidden columns: _ARRIVAL_TIME (log tables, leading) and _RID
    * (trailing) — fm_dbsrc_test.go:305-410. */
  private def machDesc(spark: SparkSession, table: String, all: Boolean,
                       arrivalTime: Boolean): DataFrame = {
    import spark.implicits._
    val desc = TagTables.descriptorFor(table).getOrElse(
      throw new IllegalArgumentException(s"unknown table: $table"))
    val isLog = TagTables.tableTypes.get(table).contains("Log")
    val pre =
      if (all && isLog && arrivalTime) Seq(TagTables.ColDesc("_ARRIVAL_TIME", "datetime", 31, ""))
      else Nil
    val post = if (all) Seq(TagTables.ColDesc("_RID", "long", 20, "")) else Nil
    (pre ++ desc ++ post).map(c => (c.name, c.typ, c.len, c.flag, ""))
      .toDF("COLUMN", "TYPE", "LENGTH", "FLAG", "INDEX")
  }

  /** Full front-door round trip: SQL in → encoded payload out
    * (format ∈ CSV/JSON/NDJSON/MARKDOWN/BOX, like the `format` param). */
  def query(spark: SparkSession, sql: String, format: String = "JSON",
            opts: Codecs.Options = Codecs.Options()): String =
    Codecs.render(execute(spark, sql), format, opts)
}
