package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE squared-L2 fold every similarity operator shares (kmeans,
  * IVF, k-center): an index-order zip_with/aggregate over a literal
  * center, so cross-engine exactness (SQL oracles compute the same
  * doubles in the same order) is maintained in one place — a change
  * here desynchronizes every oracle at once, which is the point. */
object Dist {
  /** squared L2 between a vector column and a literal center, summed
    * in index order. */
  def sqTo(vec: Column, center: Seq[Double]): Column = {
    val c = array(center.map(lit): _*)
    aggregate(zip_with(vec, c, (x, y) => (x - y) * (x - y)),
      lit(0d), (acc, x) => acc + x)
  }
}
