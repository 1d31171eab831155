package graft.server

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The `/web/api/tables…` REST shapes (reference mods/server/http_query.go
  * + http_tables handlers; expectations pinned in http_test.go:1621-1797):
  * table listing with Kind() strings and glob name filter, per-table tag
  * listing, and the per-tag stat row. All return DataFrames whose machtype
  * metadata drives the JSON envelope's `types` array. */
object WebApi {
  private def f(name: String, dt: DataType, mach: String): StructField =
    StructField(name, dt, nullable = true,
      new MetadataBuilder().putString("machtype", mach).build())

  private def df(spark: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)

  /** `GET /web/api/tables[?showall=true][&name=glob]` — ROWNUM, DB, USER,
    * NAME, TYPE with api.TableInfo.Kind() display strings ("Tag Table",
    * "KeyValue Table (data)", …). The glob matches table NAME. */
  def tables(spark: SparkSession, showAll: Boolean = false,
             nameGlob: Option[String] = None): DataFrame = {
    val mach = TagTables.allVisibleTables
    val base = mach.map { case (t, typ, _) =>
      (t.toUpperCase, typ match {
        case "Tag" => "Tag Table"
        case "Log" => "Log Table"
        case other => s"$other Table"
      })
    }
    val shadows = if (!showAll) Nil else
      mach.filter(_._2 == "Tag").flatMap { case (t, _, hasRollup) =>
        val tu = t.toUpperCase
        val core = Seq(
          s"_${tu}_DATA_0" -> "KeyValue Table (data)",
          s"_${tu}_META" -> "Lookup Table (meta)")
        val rollups = if (!hasRollup) Nil else
          Seq("SEC", "MIN", "HOUR").map(u =>
            s"_${tu}_ROLLUP_$u" -> "KeyValue Table (rollup)")
        core ++ rollups
      }
    val re = nameGlob.map(g => ("(?i)^" +
      java.util.regex.Pattern.quote(g).replace("*", "\\E.*\\Q") + "$").r)
    val rows = (base ++ shadows)
      .filter { case (n, _) => re.forall(_.matches(n)) }
      .sortBy(_._1)
      .zipWithIndex.map { case ((n, kind), i) =>
        Row(i + 1, "MACHBASEDB", "SYS", n, kind)
      }
    df(spark, StructType(Seq(f("ROWNUM", IntegerType, "int32"),
      f("DB", StringType, "string"), f("USER", StringType, "string"),
      f("NAME", StringType, "string"), f("TYPE", StringType, "string"))), rows)
  }

  /** `GET /web/api/tables/:table/tags` — ROWNUM, NAME of distinct tags. */
  def tags(spark: SparkSession, table: String): DataFrame = {
    TagTables.ensure(spark, table)
    val t = spark.table(table)
    val nameC = if (t.columns.contains("NAME")) "NAME" else "name"
    val names = t.select(nameC).distinct().collect()
      .map(_.getString(0)).sorted
    df(spark, StructType(Seq(f("ROWNUM", IntegerType, "int32"),
      f("NAME", StringType, "string"))),
      names.zipWithIndex.map { case (n, i) => Row(i + 1, n) }.toSeq)
  }

  /** `GET /web/api/tables/:table/tags/:tag/stat` — the reference's
    * per-tag stat row (http_test.go:1748-1797): ROWNUM, NAME, ROW_COUNT,
    * MIN/MAX_TIME, MIN/MAX_VALUE(+times), RECENT_ROW_TIME; time columns
    * are machtype datetime (epoch-ns in the JSON envelope). */
  def tagStat(spark: SparkSession, table: String, tag: String): DataFrame = {
    val stat = QueryDoor.execute(spark, s"show tags $table $tag").collect()
    val rows = stat.zipWithIndex.map { case (r, i) =>
      Row(i + 1, r.get(1), r.get(2), r.get(3), r.get(4),
        r.get(6), r.get(7), r.get(8), r.get(9), r.get(5))
    }.toSeq
    df(spark, StructType(Seq(
      f("ROWNUM", IntegerType, "int32"),
      f("NAME", StringType, "string"),
      f("ROW_COUNT", LongType, "int64"),
      f("MIN_TIME", LongType, "datetime"),
      f("MAX_TIME", LongType, "datetime"),
      f("MIN_VALUE", DoubleType, "double"),
      f("MIN_VALUE_TIME", LongType, "datetime"),
      f("MAX_VALUE", DoubleType, "double"),
      f("MAX_VALUE_TIME", LongType, "datetime"),
      f("RECENT_ROW_TIME", LongType, "datetime"))), rows)
  }
}
