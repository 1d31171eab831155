package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval (range) join: points joined to intervals on
  * `lo <= point <= hi` — the time-range join every "events within a
  * window" query needs.
  *
  * Spark's own plan for a pure range predicate is a broadcast
  * nested-loop (or cartesian) join, which dies at scale. The standard
  * fix, built here as a first-class operator: pick a bucket width `w`,
  * map each point to bucket `floor(p/w)` and explode each interval into
  * its covered buckets `floor(lo/w)..floor(hi/w)`; the join becomes a
  * plain HASH equi-join on the bucket with the range predicate as a
  * residual filter. Interval expansion is bounded by `(hi-lo)/w + 1`
  * rows — choose `w` near the typical interval length so expansion is
  * O(1) per interval; the shuffle is an ordinary hash partition on
  * bucket, AQE-skew-splittable like any other.
  */
object RangeJoin {

  /** Join `points` (numeric column `pointCol`) to `intervals`
    * (`loCol`/`hiCol`, inclusive both ends) with bucket width
    * `bucketWidth`. Emits all point columns + all interval columns. */
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth),
        floor(col(hiCol) / bucketWidth))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
