package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** File/payload sources (reference: mods/tql/fm_csv.go CSV with typed
  * col() declarations 25-305, fm_bytes.go BYTES/STRING 26-236).
  */
object Sources {
  /** Typed column declaration, mirroring the reference's
    * `col(n, stringType()/doubleType()/timeType()/boolType())`. */
  sealed trait ColType { def toSpark: DataType }
  case object StrCol extends ColType { def toSpark: DataType = StringType }
  case object DoubleCol extends ColType { def toSpark: DataType = DoubleType }
  case object LongCol extends ColType { def toSpark: DataType = LongType }
  /** epoch-ns time column (LongType per the ns discipline). */
  case object TimeCol extends ColType { def toSpark: DataType = LongType }
  case object BoolCol extends ColType { def toSpark: DataType = BooleanType }

  /** CSV(file(path), col(...)...) — typed read; untyped falls back to
    * all-strings exactly like the reference. */
  def csv(spark: SparkSession, path: String,
          cols: Seq[(String, ColType)] = Nil,
          header: Boolean = false, charset: String = "UTF-8",
          delimiter: String = ","): DataFrame = {
    val reader = spark.read
      .option("header", header.toString)
      .option("encoding", charset)
      .option("sep", delimiter)
    if (cols.isEmpty) reader.csv(path)
    else reader.schema(StructType(cols.map { case (n, t) => StructField(n, t.toSpark) })).csv(path)
  }

  /** STRING(file(path), separator()) — one record per line/separator. */
  def lines(spark: SparkSession, path: String, lineSep: String = "\n",
            trimspace: Boolean = false): DataFrame = {
    val df = spark.read.option("lineSep", lineSep).text(path)
    if (trimspace) df.selectExpr("trim(value) AS value") else df
  }

  /** BYTES(file(path)) — whole files as binary records with metadata
    * (path, modificationTime, length, content) — the multimodal ingest
    * shape for images/audio. */
  def binaryFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)
}
