package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-wise pipeline operators (reference: mods/tql/fm_monad.go —
  * TAKE 37-75, DROP 77-112, FILTER 114-119, FLATTEN 273-324,
  * PUSHVALUE/POPVALUE/MAPVALUE 1612-1805, TRANSPOSE 2415-2594).
  *
  * Most are direct DataFrame verbs; they exist as named functions so the
  * TQL front-end has a stable target and so the circuit-break/offset
  * semantics are encoded once. TAKE maps to limit — Spark's
  * CollectLimit/LocalLimit early-terminates upstream exactly like the
  * reference's BreakRecord circuit-break (reference task.go:481-494).
  */
object RowOps {
  /** TAKE(offset, n): deterministic only under an explicit ordering. */
  def take(df: DataFrame, order: Seq[Column], offset: Int, n: Int): DataFrame =
    df.orderBy(order: _*).offset(offset).limit(n)

  /** DROP(offset, n): skip rows [offset, offset+n) in `order`. */
  def drop(df: DataFrame, order: Seq[Column], offset: Int, n: Int): DataFrame = {
    val w = Window.orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= offset || col("__rn") > offset + n)
      .drop("__rn")
  }

  /** FLATTEN: explode an array value into one record per element. */
  def flatten(df: DataFrame, arr: Column, as: String): DataFrame =
    df.withColumn(as, explode(arr))

  /** TRANSPOSE(fixed(...)): unpivot every column not in `fixed` into
    * (name, value) rows — Spark's melt. */
  def transpose(df: DataFrame, fixed: Seq[String], varName: String = "name",
                valName: String = "value"): DataFrame = {
    val values = df.columns.filterNot(fixed.contains)
    df.unpivot(fixed.map(col).toArray, values.map(col).toArray, varName, valName)
  }
}
