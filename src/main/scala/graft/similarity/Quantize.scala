package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns: per-vector absmax
  * scale, codes = round(127·x/scale). 4× smaller than float32 on disk
  * and over the wire — at corpus scale the difference between an
  * embedding table that fits the cluster's NVMe tier and one that
  * doesn't. Reconstruction error is bounded by scale/254 per element,
  * which downstream ANN absorbs in its rerank stage
  * (see [[Pq]] for the stronger product-quantization variant).
  *
  * All math is per-row column expressions (codegen'd, no UDF, no
  * shuffle); the arithmetic shape (127.0 · (double)x / scale, half-up
  * round) is chosen to be bit-reproducible in any IEEE-double engine so
  * the codes themselves are oracle-checkable, not just their stats.
  */
object Quantize {

  /** Adds `scale` (double) and `codes` (array<int>) for `embCol`;
    * all-zero vectors (scale = 0) are dropped — they carry no direction
    * and would divide by zero. */
  def quantizeInt8(df: DataFrame, embCol: String): DataFrame = {
    val emb = col(embCol)
    df.withColumn("scale",
        array_max(transform(emb, x => abs(x.cast("double")))))
      .filter(col("scale") > 0)
      .withColumn("codes",
        transform(emb, x =>
          round(lit(127.0) * x.cast("double") / col("scale")).cast("int")))
  }

  /** Per-element reconstruction error array |x − code·scale/127|. */
  def reconstructionError(embCol: String): Column =
    zip_with(col(embCol), col("codes"),
      (x, c) => abs(x.cast("double") - c.cast("double") * col("scale") / lit(127.0)))
}
