package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout: interleave the bits of two dimension
  * columns so files sorted by the z-value cluster BOTH dimensions —
  * parquet min/max stats then prune row groups for predicates on either
  * dimension, not just the leading sort key.
  *
  * This is the data-layout lever for 100 TB scans with two independent
  * access paths (e.g. time AND device, or key AND quality score): a
  * single-column sort prunes one path and shreds the other; the z-curve
  * keeps both selective. The z-value is a pure codegen'd bit-twiddle
  * (magic-mask dilation, no UDF), so it costs nothing at write time and
  * is exactly reproducible by any engine with 64-bit integer ops.
  */
object ZOrder {

  /** Dilate the low 32 bits of `c` to the even bit positions. */
  private def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x3333333333333333L))
    x = (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x5555555555555555L))
    x
  }

  /** 64-bit Morton code of two non-negative 32-bit dimension values. */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Range-partition and sort `df` along the z-curve of (aCol, bCol)
    * into `files` output tasks. Write the result with any sink; parquet
    * then carries tight per-file/per-row-group min-max on BOTH columns. */
  def layout(df: DataFrame, aCol: String, bCol: String, files: Int): DataFrame = {
    val z = zValue(col(aCol).cast("long"), col(bCol).cast("long"))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
