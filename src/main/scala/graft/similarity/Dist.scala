package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared distance kernel for the embedding operators.
  *
  * Deliberately the higher-order-function form: an unrolled k×d
  * static expression tree was tried in r18 and REGRESSED 2-4× — per
  * centroid per dimension terms blow up the generated code (Janino
  * compile dominates, and nearest-centroid callers build k of these),
  * while the lambda form stays one small interpreted loop per row.
  */
object Dist {
  /** squared L2 between a vector column and a literal center, summed
    * in index order. */
  def sqTo(vec: Column, center: Seq[Double]): Column = {
    val c = array(center.map(lit): _*)
    aggregate(zip_with(vec, c, (x, y) => (x - y) * (x - y)),
      lit(0d), (acc, x) => acc + x)
  }
}
