package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column handles over Spark's native bloom-filter kernels — the same
  * expressions Catalyst's `InjectRuntimeFilter` plants under AQE,
  * exposed for EXPLICIT semi-join prefilters: aggregate the small side's
  * join keys into a serialized filter once, map-side-test the big side
  * (`might_contain` is codegen'd, no shuffle), then confirm survivors
  * with an exact join. False positives only enlarge the survivor set —
  * never the result — so the composed operator stays exact while the
  * big-side scan drops to ~fpp of its rows before any exchange.
  *
  * The filter rides the plan as a binary literal: size is bounded by
  * `numBits` (8 MiB at the 64M-bit default), chosen independently of the
  * build-side cardinality — overload past `expectedItems` degrades the
  * false-positive rate, not correctness.
  */
object BloomFns {
  private val registered =
    java.util.Collections.synchronizedSet(java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def register(spark: SparkSession): Unit = {
    if (registered.contains(spark)) return
    synchronized {
      val reg = spark.sessionState.functionRegistry
      // the analyzer wraps a bare AggregateFunction in AggregateExpression
      reg.createOrReplaceTempFunction("graft_bloom_agg",
        exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
        "built-in")
      reg.createOrReplaceTempFunction("graft_might_contain",
        exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
      registered.add(spark)
    }
  }

  /** Serialized bloom filter over a LongType key column (use
    * `xxhash64(col)` for non-long keys — the same hashing
    * `InjectRuntimeFilter` applies). One row out. */
  def bloomAgg(spark: SparkSession, key: Column, expectedItems: Long,
               numBits: Long): Column = {
    register(spark)
    call_function("graft_bloom_agg", key,
      org.apache.spark.sql.functions.lit(expectedItems),
      org.apache.spark.sql.functions.lit(numBits))
  }

  /** Membership probe against a serialized filter (binary literal or
    * scalar subquery). Codegen'd; false positives possible, false
    * negatives never. */
  def mightContain(spark: SparkSession, key: Column, bloom: Column): Column = {
    register(spark)
    call_function("graft_might_contain", bloom, key)
  }
}
