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
        spark.sql(sql)
        Seq("executed.").toDF("message")
    }
  }

  /** SHOW TABLES / SHOW TAGS / DESC <table> — the reference's SHOW
    * surface mapped to the Spark catalog (fm_dbsrc.go:485-693,
    * spi/show.go). */
  def showCommand(spark: SparkSession, sql: String): DataFrame = {
    import spark.implicits._
    val words = sql.trim.split("\\s+").map(_.toUpperCase)
    words.take(2).toList match {
      case List("SHOW", "TABLES") =>
        spark.catalog.listTables().select(
          col("name").as("TABLE_NAME"),
          col("tableType").as("TABLE_TYPE"),
          col("isTemporary").as("IS_TEMPORARY"))
          .orderBy("TABLE_NAME")
      case List("SHOW", "TAGS") =>
        // SHOW TAGS <table>: distinct series names — the _T_META dictionary
        val table = sql.trim.split("\\s+")(2)
        spark.table(table).select(col("name")).distinct().orderBy("name")
      case List("DESC", _) | List("DESCRIBE", _) =>
        val table = sql.trim.split("\\s+")(1)
        spark.table(table).schema.fields.zipWithIndex.map { case (f, i) =>
          (i, f.name, f.dataType.simpleString, f.nullable)
        }.toSeq.toDF("ID", "NAME", "TYPE", "NULLABLE")
      case _ => throw new IllegalArgumentException(s"unsupported SHOW command: $sql")
    }
  }

  /** Full front-door round trip: SQL in → encoded payload out
    * (format ∈ CSV/JSON/NDJSON/MARKDOWN/BOX, like the `format` param). */
  def query(spark: SparkSession, sql: String, format: String = "JSON",
            opts: Codecs.Options = Codecs.Options()): String =
    Codecs.render(execute(spark, sql), format, opts)
}
