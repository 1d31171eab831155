package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical._
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

  /** Keyless TAKE(offset, n) in ARRIVAL order. A bare `offset().limit()`
    * is only deterministic when the limit is the terminal collected
    * operator; under a sink projection Spark plans GlobalLimitExec over a
    * single-partition shuffle whose remote block fetch order is
    * randomized, so on a real cluster it may not return the
    * first-by-arrival rows. Instead: only the first offset+n rows of each
    * partition can satisfy the slice, so prefix-take per partition (the
    * iterator early-terminates upstream — the reference's circuit-break,
    * task.go:481-494), then number rows in (partition, position) order via
    * zipWithIndex — one lineage, fully distributed, no global sort and no
    * single-partition shuffle. */
  def takeArrival(df: DataFrame, offset: Int, n: Int): DataFrame = {
    val need = offset + n
    val schema = df.schema
    val sliced = df.rdd.mapPartitions(_.take(need))
      .zipWithIndex()
      .filter { case (_, i) => i >= offset && i < need }
      .map(_._1)
    df.sparkSession.createDataFrame(sliced, schema)
  }

  /** DROP(offset, n): skip rows [offset, offset+n) in `order`. Derives a
    * dense rownum via [[zipRownum]] (distributed range sort + partition
    * offsets) instead of a global `row_number()` window, which would move
    * the entire input through one partition. */
  def drop(df: DataFrame, order: Seq[Column], offset: Int, n: Int): DataFrame =
    zipRownum(df, "__rn", order)
      .filter(col("__rn") <= offset || col("__rn") > offset + n)
      .drop("__rn")

  /** Attach a 1-based dense global rownum in the frame's row order
    * WITHOUT a single-partition window exchange (the reference keys
    * records by their arrival rownum — task_record.go; a global
    * `row_number()` window is the classic 100-TB anti-pattern).
    *
    * Two paths:
    *  - shuffle-free plan (scan/filter/project/union), no `order` —
    *    attach `partitionOffset + positionInPartition` directly over the
    *    source partitioning: a lightweight probe job reads the same file
    *    splits, and the projection is pure codegen (the position lives
    *    in `monotonically_increasing_id`'s low 33 bits).
    *  - everything else — (sort +) RDD `zipWithIndex`: its count pass
    *    and data pass share ONE lineage, so shuffle partitioning cannot
    *    drift between them. A separate DataFrame probe would: range-sort
    *    sampling seeds from the RDD id, and AQE re-coalesces shuffles
    *    per query — both re-deal rows across partitions between runs.
    *    Still fully distributed; the cost is the Row materialization.
    */
  def zipRownum(df: DataFrame, as: String, order: Seq[Column] = Nil): DataFrame = {
    if (order.isEmpty && shuffleFree(df.queryExecution.analyzed)) {
      attachPartitionOffsets(df, as)
    } else {
      val src = if (order.nonEmpty) df.orderBy(order: _*) else df
      val schema = df.schema.add(as, org.apache.spark.sql.types.LongType, nullable = false)
      val rdd = src.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      }
      df.sparkSession.createDataFrame(rdd, schema)
    }
  }

  /** rownum = cumulativeOffset(partition) + low-33-bits(mid) + 1. One
    * probe job for the per-partition counts, then a codegen projection —
    * no shuffle, no window. Requires the probe and the main job to see
    * identical partitioning (guaranteed by the callers above). */
  private def attachPartitionOffsets(df: DataFrame, as: String): DataFrame = {
    val counts = df.select(spark_partition_id().as("p")).groupBy("p").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    if (counts.isEmpty) return df.withColumn(as, lit(1L)) // empty frame
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _).init
    val entries = counts.map(_._1).zip(offsets)
      .flatMap { case (p, o) => Seq(lit(p), lit(o)) }
    df.withColumn(as,
      (element_at(map(entries: _*), spark_partition_id()) +
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)) + 1L).cast("long"))
  }

  /** Conservative whitelist: plans whose partitioning is fixed by the
    * source layout, so a separate count probe cannot drift from the main
    * job (no shuffle for AQE to re-coalesce, no sort for the optimizer
    * to elide under the probe's aggregate). */
  private def shuffleFree(plan: LogicalPlan): Boolean = plan match {
    case _: LeafNode => true
    case p @ (_: Project | _: Filter | _: SubqueryAlias | _: Union | _: Generate) =>
      p.children.forall(shuffleFree)
    case _ => false
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
