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
    detect(sql) match {
      case Select => spark.sql(sql)
      case Explain =>
        val inner = sql.trim.replaceFirst("(?i)^EXPLAIN(\\s+FULL)?", "")
        val plan = spark.sql(inner).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString(
            if (sql.trim.toUpperCase.startsWith("EXPLAIN FULL")) "extended" else "formatted"))
        plan.split("\n").toSeq.toDF("plan")
      case Show => showCommand(spark, sql)
      case DdlDml =>
        val s = sql.trim
        val lower = s.toLowerCase
        val DeleteRe =
          "(?is)^\\s*delete\\s+from\\s+(\\w+)(?:\\s+where\\s+(.*?))?\\s*$".r
        val NameEqRe = "(?is)^name\\s*=\\s*'([^']*)'$".r
        s match {
          case _ if lower.startsWith("exec ") || lower.startsWith("exec(") =>
            // EXEC table_flush(…) etc — engine procedures are no-ops here
            Seq("executed.").toDF("MESSAGE")
          case DeleteRe(table, where)
            if TagTables.descriptorFor(table).isDefined =>
            val n = Option(where) match {
              case None => TagTables.delete(spark, table, None)
              case Some(NameEqRe(nm)) => TagTables.delete(spark, table, Some(nm))
              case Some(pred) => TagTables.deleteWhere(spark, table, pred)
            }
            Seq(if (n == 1) "a row deleted." else s"$n rows deleted.").toDF("MESSAGE")
          case _ if lower.startsWith("create tag table") =>
            TagTables.createTagTable(spark, s)
            Seq("executed.").toDF("MESSAGE")
          case _ =>
            spark.sql(s)
            Seq("executed.").toDF("MESSAGE")
        }
    }
  }

  /** SHOW TABLES / SHOW TAGS / DESC <table> — the reference's SHOW
    * surface mapped to the Spark catalog (fm_dbsrc.go:485-693,
    * spi/show.go). */
  def showCommand(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    val all = sql.contains("--all")
    val words = sql.trim.replace("--all", "").trim.split("\\s+").map(_.toUpperCase)
    words.take(2).toList match {
      case List("SHOW", "TABLES") =>
        // machbase catalog shape (fm_dbsrc_test.go:262-295): the fixture
        // tables first, then (--all) their shadow tables, then any other
        // session views as Volatile
        TagTables.tableTypes.keys.foreach(t => TagTables.ensure(spark, t))
        val mach = TagTables.tableTypes.toSeq.sortBy(_._1)
        val base = mach.zipWithIndex.map { case ((t, typ), i) =>
          ("MACHBASEDB", "SYS", t.toUpperCase, 18 + i, typ, "")
        }
        val shadows = if (!all) Nil else mach.filter(_._2 == "Tag").sortBy(_._1)
          .zipWithIndex.flatMap { case ((t, _), i) =>
            Seq(
              ("MACHBASEDB", "SYS", s"_${t.toUpperCase}_DATA_0", 100 + 2 * i, "KeyValue", "Data"),
              ("MACHBASEDB", "SYS", s"_${t.toUpperCase}_META", 101 + 2 * i, "Lookup", "Meta"))
          }
        val machNames = TagTables.tableTypes.keySet
        val others = spark.catalog.listTables().collect().toSeq
          .filterNot(t => machNames(t.name.toLowerCase)).sortBy(_.name)
          .zipWithIndex.map { case (t, i) =>
            ("MACHBASEDB", "SYS", t.name, 200 + i, "Volatile", "")
          }
        (base ++ shadows ++ others).toDF(
          "DATABASE_NAME", "USER_NAME", "TABLE_NAME", "TABLE_ID", "TABLE_TYPE", "TABLE_FLAG")
      case List("SHOW", "TAGS") =>
        // SHOW TAGS <table>: the V$T_STAT per-tag statistics shape
        // (tql_test.go:319-330; value stats are NULL until the engine
        // flushes — matched verbatim)
        val table = sql.trim.split("\\s+")(2)
        val t = spark.table(table)
        val nameC = if (t.columns.contains("NAME")) "NAME" else "name"
        val timeC = if (t.columns.contains("TIME")) "TIME" else "time"
        val timeNs = t.schema(timeC).dataType match {
          // epoch-ns long columns (the engine's tag layout) pass through;
          // timestamps convert exactly via decimal seconds
          case org.apache.spark.sql.types.LongType => col(timeC)
          case _ => col(timeC).cast("decimal(38,9)")
            .*(lit(1000000000L)).cast("long")
        }
        t.groupBy(col(nameC).as("NAME"))
          .agg(count(lit(1)).as("ROW_COUNT"),
            min(timeNs).as("MIN_TIME"), max(timeNs).as("MAX_TIME"),
            max(timeNs).as("RECENT_ROW_TIME"))
          .withColumn("ID", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy("NAME")).cast("long"))
          .select(col("ID"), col("NAME"), col("ROW_COUNT"),
            col("MIN_TIME"), col("MAX_TIME"), col("RECENT_ROW_TIME"),
            lit(null).cast("double").as("MIN_VALUE"),
            lit(null).cast("long").as("MIN_VALUE_TIME"),
            lit(null).cast("double").as("MAX_VALUE"),
            lit(null).cast("long").as("MAX_VALUE_TIME"))
          .orderBy("ID")
      case List("SHOW", "TABLE") =>
        machDesc(spark, words(2).toLowerCase, all, arrivalTime = true)
      case List("DESC", t) => describe(spark, t.toLowerCase, all)
      case List("DESCRIBE", t) => describe(spark, t.toLowerCase, all)
      case _ => throw new IllegalArgumentException(s"unsupported SHOW command: $sql")
    }
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
