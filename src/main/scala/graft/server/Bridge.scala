package graft.server

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** SQL bridges (reference: mods/bridge — `SQL(bridge('sqlite'), …)`,
  * `INSERT(bridge(), …)`, `$.db({bridge: 'x'})`). The reference embeds
  * sqlite/postgres/mysql drivers; here a bridge is an in-session named
  * database whose tables live as buffered rows and whose SELECTs run
  * through Spark SQL over temp views — same surface, Spark execution.
  *
  * Dialect notes mirrored from the sqlite bridge tests
  * (tql_test.go:2258-2572):
  *  - CREATE TABLE accepts sqlite type affinities (INTEGER/TEXT/REAL/
  *    BLOB) and ignores table constraints; replies "Created successfully."
  *  - unknown tables raise `no such table: x`; `DELETE <t>` (missing
  *    FROM) raises sqlite's `near "<t>": syntax error`
  *  - computed SELECT columns report type "string" (sqlite has no
  *    decltype for expressions — the reference pins this driver quirk)
  *    and keep their literal select-list text as the column name
  *    (`count(*)`, not Spark's `count(1)`).
  */
object Bridge {
  case class ExecResult(message: String, rowsAffected: Long, verb: String)

  /** Common bridge surface used by the TQL compiler's SQL/INSERT
    * routing and `$.db({bridge})`: per-statement exec + SELECT query.
    * The in-session [[Db]] emulates the sqlite dialect; [[JdbcDb]] is a
    * real passthrough whose SELECTs become Spark JDBC scans. */
  sealed trait SqlBridge {
    def name: String
    def typ: String
    def exec(spark: SparkSession, sql: String, binds: Seq[Any]): ExecResult
    def query(spark: SparkSession, sql: String, binds: Seq[Any]): DataFrame
    /** Dialect parameter marker for generated statements (the reference
      * connectors expose ParameterMarker: `?`, `$n`, `@pn`). */
    def parameterMarker(idx: Int): String = "?"
  }

  private val registry = TrieMap.empty[String, SqlBridge]
  def apply(name: String): SqlBridge =
    registry.getOrElseUpdate(name.toLowerCase, new Db(name.toLowerCase))
  /** Whether a bridge of this name has been defined (used by subscriber
    * entries, which must fail on an undefined bridge name). */
  def exists(name: String): Boolean =
    registry.contains(name.toLowerCase) || defs.contains(name.toLowerCase)
  def resetForTest(): Unit = { registry.clear(); defs.clear() }

  // ---- bridge definitions (reference mods/bridge/connector) -----------

  /** Dialect registry: bridge type → JDBC url construction + parameter
    * marker, mirroring the reference's per-connector registry
    * (connector.go). Only the generic `jdbc` type is exercisable in
    * this container (Derby in /opt/spark/jars); the url builders for
    * postgres/mysql/mssql translate the reference's connect-path
    * syntax and are spec-pinned as pure functions. */
  final case class Dialect(typ: String, marker: Int => String,
                           urlOf: String => String)

  val dialects: Map[String, Dialect] = Map(
    "postgres" -> Dialect("postgres", i => "$" + (i + 1), path => {
      // path: "host=H port=P dbname=D user=U password=W ..." (libpq form)
      val kv = pathFields(path)
      val host = kv.getOrElse("host", "127.0.0.1")
      val port = kv.getOrElse("port", "5432")
      val db = kv.getOrElse("dbname", kv.getOrElse("database", ""))
      val params = kv.view.filterKeys(k => !Set("host", "port", "dbname", "database")(k))
        .map { case (k, v) => s"$k=$v" }.mkString("&")
      s"jdbc:postgresql://$host:$port/$db" + (if (params.isEmpty) "" else s"?$params")
    }),
    "mysql" -> Dialect("mysql", _ => "?", path => {
      // path: Go DSN "user:pass@tcp(host:port)/dbname"
      val DsnRe = "(?:([^:@]*)(?::([^@]*))?@)?(?:tcp\\()?([^():/]+)(?::(\\d+))?\\)?/(.*)".r
      path match {
        case DsnRe(user, pass, host, port, db) =>
          val p = Option(port).getOrElse("3306")
          val auth = Option(user).filter(_.nonEmpty)
            .map(u => s"?user=$u" + Option(pass).filter(_.nonEmpty).map(pw => s"&password=$pw").getOrElse(""))
            .getOrElse("")
          s"jdbc:mysql://$host:$p/$db$auth"
        case _ => s"jdbc:mysql://$path"
      }
    }),
    "mssql" -> Dialect("mssql", i => s"@p${i + 1}", path => {
      // path: "server=H database=D user id=U password=W" (http_facility form)
      val kv = pathFields(path)
      val host = kv.getOrElse("server", "127.0.0.1")
      val db = kv.get("database").map(d => s";databaseName=$d").getOrElse("")
      val auth = kv.get("user id").orElse(kv.get("user"))
        .map(u => s";user=$u").getOrElse("") +
        kv.get("password").map(p => s";password=$p").getOrElse("")
      s"jdbc:sqlserver://$host$db$auth"
    }),
    // generic passthrough: the path IS the JDBC url (Derby-testable)
    "jdbc" -> Dialect("jdbc", _ => "?", identity))

  private def pathFields(path: String): Map[String, String] =
    // key=value fields; mssql keys may contain a space ("user id")
    "(?i)([a-z][a-z ]*?)\\s*=\\s*(\\S+)".r.findAllMatchIn(path)
      .map(m => m.group(1).trim.toLowerCase -> m.group(2)).toMap

  /** Define a typed bridge (management `bridge add -t type name path`).
    * `sqlite` keeps the in-session store; SQL types become JDBC
    * passthroughs. Re-defining replaces. */
  def define(name: String, typ: String, path: String): Either[String, SqlBridge] = {
    val key = name.toLowerCase
    typ.toLowerCase match {
      case "sqlite" =>
        val db = new Db(key); registry(key) = db; defs(key) = (typ, path); Right(db)
      case t if dialects.contains(t) =>
        val db = new JdbcDb(key, dialects(t), path)
        registry(key) = db; defs(key) = (t, path); Right(db)
      case other => Left(s"undefined bridge type: $other")
    }
  }
  private val defs = TrieMap.empty[String, (String, String)]
  /** (name, type, connect path) rows for the bridge listing. */
  def list: Seq[(String, String, String)] =
    defs.toSeq.map { case (n, (t, p)) => (n, t, p) }.sortBy(_._1)
  /** Registered type of a bridge, if defined (management GetBridge). */
  def typeOf(name: String): Option[String] = defs.get(name.toLowerCase).map(_._1)

  // ---- management ops (reference mods/bridge/management.go) ------------

  final case class Result(success: Boolean, reason: String)

  /** model.ParseBridgeType aliases (bridgedef.go:18-34). */
  private val typeAliases = Map(
    "sqlite" -> "sqlite", "sqlite3" -> "sqlite",
    "postgres" -> "postgres", "postgresql" -> "postgres",
    "mysql" -> "mysql", "mssql" -> "mssql",
    "mqtt" -> "mqtt", "nats" -> "nats",
    "jdbc" -> "jdbc") // extension: generic passthrough (Derby-testable)

  /** AddBridge with the management API's validation reasons. Broker
    * types (mqtt/nats) register as definitions only — their runtime is
    * the subscriber dispatch path. */
  def addBridge(name: String, typ: String, path: String): Result = {
    if (name.length > 40)
      return Result(success = false,
        "name is too long, should be shorter than 40 characters")
    typeAliases.get(typ) match {
      case None => Result(success = false, s"unsupported bridge type: $typ")
      case Some(_) if path.isEmpty =>
        Result(success = false, "path is empty, it should be specified")
      case Some(t) if t == "mqtt" || t == "nats" =>
        defs(name.toLowerCase) = (t, path)
        Result(success = true, "success")
      case Some(t) =>
        define(name, t, path) match {
          case Left(e) => Result(success = false, e)
          case Right(_) => Result(success = true, "success")
        }
    }
  }

  def delBridge(name: String): Result = {
    // removing an unknown bridge fails like the reference's os.Remove
    // of the missing definition file (model/model.go RemoveBridge)
    if (defs.remove(name.toLowerCase).isEmpty)
      return Result(success = false,
        s"remove ${name.toUpperCase}.json: no such file or directory")
    registry.remove(name.toLowerCase)
    Result(success = true, "success")
  }

  /** TestBridge: ping the backing store — in-session stores always
    * answer; JDBC bridges open a connection; broker bridges cannot be
    * reached in this container. */
  def testBridge(name: String): Result = {
    val key = name.toLowerCase
    registry.get(key) match {
      case Some(db: JdbcDb) =>
        try {
          java.sql.DriverManager.getConnection(db.url).close()
          Result(success = true, "success")
        } catch {
          case e: Exception =>
            Result(success = false, Option(e.getMessage).getOrElse(e.toString))
        }
      case Some(_) => Result(success = true, "success")
      case None => defs.get(key) match {
        case Some((t, _)) =>
          Result(success = false, s"bridge '$name' ($t) connection unavailable")
        case None => Result(success = false, s"undefined bridge name '$name'")
      }
    }
  }

  /** SHOW BRIDGES result set (the shell's bridge listing). */
  def showBridges(spark: SparkSession): DataFrame = {
    val rows = list.map { case (n, t, p) => Row(n, t, p) }
    val schema = StructType(Seq(
      StructField("NAME", StringType),
      StructField("TYPE", StringType),
      StructField("CONNECTION", StringType)))
    spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
  }

  /** JDBC passthrough bridge: statements run over a driver-side JDBC
    * connection; SELECTs become `spark.read.jdbc` scans so the data
    * plane is distributed (set `partitionColumn/numPartitions/
    * lowerBound/upperBound` in `options` for a parallel scan at scale —
    * without them a JDBC read is a single partition, which is fine for
    * dimension-sized side tables but not for facts). */
  final class JdbcDb(val name: String, dialect: Dialect, path: String,
                     options: Map[String, String] = Map.empty) extends SqlBridge {
    def typ: String = dialect.typ
    val url: String = dialect.urlOf(path)
    override def parameterMarker(idx: Int): String = dialect.marker(idx)

    /** Dialect markers back to JDBC's positional `?` (`$n`/`@pn` are
      * generated by our sinks; user SQL may carry them too). */
    private[graft] def toJdbcMarkers(sql: String): String =
      if (dialect.typ == "postgres") sql.replaceAll("\\$\\d+", "?")
      else if (dialect.typ == "mssql") sql.replaceAll("@p\\d+", "?")
      else sql

    def exec(spark: SparkSession, sql: String, binds: Seq[Any]): ExecResult = {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.prepareStatement(toJdbcMarkers(sql))
        try {
          binds.zipWithIndex.foreach { case (v, i) => st.setObject(i + 1, v) }
          val isQuery = sql.trim.toLowerCase.startsWith("select")
          if (isQuery) {
            val rs = st.executeQuery()
            var n = 0L
            while (rs.next()) n += 1
            ExecResult(s"$n rows selected.", n, "selected")
          } else {
            val n = st.executeUpdate().toLong
            val verb = sql.trim.split("\\s+").head.toLowerCase match {
              case "insert" => "inserted"
              case "update" => "updated"
              case "delete" => "deleted"
              case _ => "executed"
            }
            val msg = verb match {
              case "executed" => "Created successfully."
              case v => if (n == 1) s"a row $v." else s"$n rows $v."
            }
            ExecResult(msg, n, verb)
          }
        } finally st.close()
      } finally conn.close()
    }

    def query(spark: SparkSession, sql: String, binds: Seq[Any]): DataFrame = {
      // literal-bound SQL pushed down whole: the remote engine runs the
      // query, Spark scans the result (partitioned when options say so)
      val bound = bindSql(toJdbcMarkers(sql), binds)
      spark.read.format("jdbc")
        .option("url", url)
        .option("query", bound)
        .options(options)
        .load()
    }
  }

  final class Db(val name: String) extends SqlBridge {
    def typ: String = "sqlite"
    /** lowercase table name → (schema with machtype metadata, rows) */
    private[Bridge] val tables =
      TrieMap.empty[String, (StructType, ArrayBuffer[Row])]

    private def table(t: String): (StructType, ArrayBuffer[Row]) =
      tables.getOrElse(t.toLowerCase,
        throw new IllegalArgumentException(s"no such table: $t"))

    // ---- statement execution ----------------------------------------
    def exec(spark: SparkSession, sql: String, binds: Seq[Any]): ExecResult = {
      val s = bindSql(sql, binds).trim
      val lower = s.toLowerCase
      if (lower.startsWith("create table")) create(s)
      else if (lower.startsWith("drop table")) {
        val DropTblRe = "(?is)^drop\\s+table\\s+(?:if\\s+exists\\s+)?(\\w+)\\s*$".r
        s match {
          case DropTblRe(t) =>
            tables.remove(t.toLowerCase)
            try spark.catalog.dropTempView(viewName(t)) catch { case _: Exception => }
            ExecResult("Dropped successfully.", 0L, "executed")
          case _ => throw new IllegalArgumentException(s"syntax error in: $s")
        }
      }
      else if (lower.startsWith("insert")) insert(spark, s)
      else if (lower.startsWith("update")) update(spark, s)
      else if (lower.startsWith("delete")) delete(spark, s)
      else if (lower.startsWith("select")) {
        val n = query(spark, sql, binds).count()
        ExecResult(s"$n rows selected.", n, "selected")
      } else throw new IllegalArgumentException(s"unsupported statement: $s")
    }

    private val CreateRe = "(?is)create\\s+table\\s+(?:if\\s+not\\s+exists\\s+)?(\\w+)\\s*\\((.*)\\)\\s*$".r
    private def create(s: String): ExecResult = s match {
      case CreateRe(t, body) =>
        val constraint = Set("unique", "primary", "foreign", "check", "constraint")
        val fields = QueryDoor.splitValues(body) // top-level comma split
          .map(_.trim).filter(_.nonEmpty)
          .filterNot(d => constraint(d.split("[\\s(]+")(0).toLowerCase))
          .map { d =>
            val parts = d.split("\\s+")
            val (dt, mach) = affinity(parts.lift(1).getOrElse("text"))
            StructField(parts(0), dt, nullable = true,
              new MetadataBuilder().putString("machtype", mach).build())
          }
        tables.put(t.toLowerCase, (StructType(fields), ArrayBuffer.empty[Row]))
        ExecResult("Created successfully.", 0L, "created")
      case _ => throw new IllegalArgumentException(s"syntax error in: $s")
    }

    private def affinity(typeTok: String): (DataType, String) = {
      val t = typeTok.toLowerCase.takeWhile(_ != '(')
      if (t.contains("int")) (LongType, "int64")
      else if (t == "real" || t == "double" || t == "float" || t == "numeric")
        (DoubleType, "double")
      else if (t == "blob") (BinaryType, "binary")
      else (StringType, "string") // TEXT/CHAR/CLOB/VARCHAR affinity
    }

    private val InsertRe =
      "(?is)^insert\\s+into\\s+(\\w+)\\s*(?:\\(([^)]*)\\)\\s*)?values\\s*(\\(.*\\))\\s*$".r
    private def insert(spark: SparkSession, s: String): ExecResult = s match {
      case InsertRe(t, cols, vals) =>
        val (schema, rows) = table(t)
        val columns = Option(cols)
          .map(_.split(",").map(_.trim).toSeq)
          .getOrElse(schema.fieldNames.toSeq)
        // multi-row VALUES (1,'a'), (2,'b') — split top-level commas into
        // parenthesized tuples (http_facility_test.go
        // TestBridgeStateExecAndQuery inserts two rows in one statement)
        val tuples = QueryDoor.splitValues(vals).map(_.trim).map { tup =>
          if (!(tup.startsWith("(") && tup.endsWith(")")))
            throw new IllegalArgumentException(s"syntax error in: $s")
          QueryDoor.splitValues(tup.substring(1, tup.length - 1))
            .map(QueryDoor.literalValue)
        }
        tuples.foreach { values =>
          val byName = columns.map(_.toLowerCase).zip(values).toMap
          rows += Row.fromSeq(schema.fields.map { f =>
            byName.get(f.name.toLowerCase).map(coerceValue(_, f.dataType)).orNull
          }.toSeq)
        }
        refresh(spark, t)
        val n = tuples.size.toLong
        ExecResult(if (n == 1L) "a row inserted." else s"$n rows inserted.",
          n, "inserted")
      case _ => throw new IllegalArgumentException(s"syntax error in: $s")
    }

    private val UpdateRe =
      "(?is)^update\\s+(\\w+)\\s+set\\s+(.*?)(?:\\s+where\\s+(.*?))?\\s*$".r
    private def update(spark: SparkSession, s: String): ExecResult = s match {
      case UpdateRe(t, setList, where) =>
        val (schema, rows) = table(t)
        val sets = QueryDoor.splitValues(setList).map { a =>
          val Array(k, v) = a.split("=", 2)
          (schema.fieldIndex(schema.fieldNames.find(_.equalsIgnoreCase(k.trim))
            .getOrElse(throw new IllegalArgumentException(s"no such column: ${k.trim}"))),
            QueryDoor.literalValue(v.trim))
        }
        val hit = matchingIdx(spark, schema, rows, Option(where))
        hit.foreach { i =>
          val vals = rows(i).toSeq.toArray
          sets.foreach { case (fi, v) =>
            vals(fi) = coerceValue(v, schema.fields(fi).dataType) }
          rows(i) = Row.fromSeq(vals.toSeq)
        }
        refresh(spark, t)
        val n = hit.size
        ExecResult(if (n == 1) "a row updated." else s"$n rows updated.", n.toLong, "updated")
      case _ => throw new IllegalArgumentException(s"syntax error in: $s")
    }

    private val DeleteRe =
      "(?is)^delete\\s+from\\s+(\\w+)(?:\\s+where\\s+(.*?))?\\s*$".r
    private val BadDeleteRe = "(?is)^delete\\s+(\\w+).*$".r
    private def delete(spark: SparkSession, s: String): ExecResult = s match {
      case DeleteRe(t, where) =>
        val (schema, rows) = table(t)
        val hit = matchingIdx(spark, schema, rows, Option(where)).toSet
        val kept = rows.zipWithIndex.collect { case (r, i) if !hit(i) => r }
        rows.clear(); rows ++= kept
        refresh(spark, t)
        val n = hit.size
        ExecResult(if (n == 1) "a row deleted." else s"$n rows deleted.", n.toLong, "deleted")
      case BadDeleteRe(t) =>
        // sqlite's exact parser message for `DELETE <table> …`
        throw new IllegalArgumentException(s"""near "$t": syntax error""")
      case _ => throw new IllegalArgumentException(s"syntax error in: $s")
    }

    /** evaluate a WHERE predicate over buffered rows via Spark. */
    private def matchingIdx(spark: SparkSession, schema: StructType,
                            rows: ArrayBuffer[Row], where: Option[String]): Seq[Int] =
      where match {
        case None => rows.indices.toSeq
        case Some(pred) =>
          import org.apache.spark.sql.functions.{coalesce, expr, lit}
          val idxSchema = StructType(schema.fields :+ StructField("__idx", IntegerType))
          val idxRows = rows.toSeq.zipWithIndex.map { case (r, i) =>
            Row.fromSeq(r.toSeq :+ i) }
          val df = spark.createDataFrame(new java.util.ArrayList[Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(idxRows).asJava), idxSchema)
          df.filter(coalesce(expr(pred).cast("boolean"), lit(false)))
            .select("__idx").collect().map(_.getInt(0)).toSeq
      }

    // ---- queries ----------------------------------------------------
    // non-word chars (e.g. hyphens in bridge names like "br-test") would
    // make an invalid Spark view identifier
    def viewName(t: String): String =
      s"bridge_${name}_${t.toLowerCase}".replaceAll("\\W", "_")

    private def refresh(spark: SparkSession, t: String): Unit = {
      val (schema, rows) = table(t)
      spark.createDataFrame(new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava), schema)
        .createOrReplaceTempView(viewName(t))
    }

    def query(spark: SparkSession, sql: String, binds: Seq[Any]): DataFrame = {
      var s = bindSql(sql, binds)
      tables.keys.foreach { t =>
        refresh(spark, t)
        // quote-aware: a table name inside a string literal stays put
        s = QueryDoor.replaceIdent(s, t, viewName(t))
      }
      // any FROM/JOIN target that is not a registered view → sqlite error
      "(?i)\\b(?:from|join)\\s+([A-Za-z_]\\w*)".r.findAllMatchIn(s).foreach { m =>
        val t = m.group(1)
        if (!t.startsWith("bridge_") && !spark.catalog.tableExists(t) &&
          !Set("select", "values").contains(t.toLowerCase))
          throw new IllegalArgumentException(s"no such table: $t")
      }
      val df = spark.sql(s)
      // restore select-list text for computed columns (count(*) etc.) and
      // tag machtypes: table columns keep their decltype, expressions are
      // "string" (sqlite driver quirk the reference pins)
      val items = selectItems(sql)
      val declared: Map[String, String] = tables.values.flatMap {
        case (schema, _) => schema.fields.map(f =>
          f.name.toLowerCase -> f.metadata.getString("machtype"))
      }.toMap
      val renamed = df.columns.zipWithIndex.map { case (c, i) =>
        val wanted =
          if (items.lift(i).exists(t => t.contains("(") &&
              !t.toLowerCase.contains(" as ")))
            items(i)
          else c
        val mach = declared.getOrElse(wanted.toLowerCase, "string")
        (c, wanted, mach)
      }
      renamed.foldLeft(df) { case (d, (c, wanted, mach)) =>
        d.withColumn(wanted, d(s"`$c`").as(wanted,
          new MetadataBuilder().putString("machtype", mach).build()))
      }.select(renamed.map { case (_, wanted, _) =>
        df.sparkSession.implicits.symbolToColumn(Symbol(wanted))
        org.apache.spark.sql.functions.col(s"`$wanted`")
      }: _*)
    }

    /** top-level select-list item texts (between SELECT and its FROM). */
    private def selectItems(sql: String): Seq[String] = {
      val s = sql.trim
      val low = s.toLowerCase
      if (!low.startsWith("select")) return Nil
      var depth = 0
      var i = "select".length
      val start = i
      var end = s.length
      var found = false
      while (i < s.length && !found) {
        val c = s.charAt(i)
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0 && low.startsWith("from", i) &&
          (i == 0 || !s.charAt(i - 1).isLetterOrDigit) &&
          (i + 4 >= s.length || !s.charAt(i + 4).isLetterOrDigit)) {
          end = i; found = true
        }
        i += 1
      }
      QueryDoor.splitValues(s.substring(start, end)).map(_.trim)
    }

    private def coerceValue(v: Any, dt: DataType): Any = (v, dt) match {
      case (null, _) => null
      case (s: String, LongType) if s.matches("[+-]?\\d+") => java.lang.Long.valueOf(s)
      case (s: String, DoubleType) => java.lang.Double.valueOf(s)
      case (s: String, LongType) => java.lang.Long.valueOf(s.toDouble.toLong)
      case (other, t) => TagTables.coerce(other, t)
    }
  }

  /** substitute `?` placeholders (outside string literals) with SQL
    * literals — the bridge drivers bind, we inline exactly once. */
  def bindSql(sql: String, binds: Seq[Any]): String = {
    if (binds.isEmpty) return sql
    val out = new StringBuilder
    var inStr = false
    var b = 0
    sql.foreach { c =>
      if (inStr) { out.append(c); if (c == '\'') inStr = false }
      else if (c == '\'') { out.append(c); inStr = true }
      else if (c == '?' && b < binds.length) {
        out.append(literal(binds(b))); b += 1
      } else out.append(c)
    }
    out.toString
  }

  private def literal(v: Any): String = v match {
    case null => "NULL"
    case s: String if s.matches("[+-]?\\d+(\\.\\d+)?") => s // numeric param strings bind as numbers
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: Array[Byte] => "X'" + b.map(x => f"$x%02X").mkString + "'"
    case d: java.lang.Double =>
      if (d == math.rint(d) && !d.isInfinite) d.toLong.toString else d.toString
    case other => String.valueOf(other)
  }
}
