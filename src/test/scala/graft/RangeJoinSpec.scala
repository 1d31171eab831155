package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoin matches the naive range predicate exactly") {
    val pts = (0L to 100L).map(i => (i, i * 3 % 97)).toDF("pid", "p")
    val ivs = Seq((1L, 0L, 10L), (2L, 5L, 5L), (3L, 90L, 200L), (4L, 300L, 310L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.rangeJoin(pts, "p", ivs, "lo", "hi", 7L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive && naive.nonEmpty, s"got=${got.size} naive=${naive.size}")
  }

  test("rangeJoin emits each match once even when an interval spans many buckets") {
    val pts = Seq((1L, 50L)).toDF("pid", "p")
    val ivs = Seq((9L, 0L, 1000L)).toDF("iid", "lo", "hi") // 100+ buckets at w=7
    val got = RangeJoin.rangeJoin(pts, "p", ivs, "lo", "hi", 7L).collect()
    assert(got.length == 1, got.mkString)
  }

  test("rangeJoin plans a hash join, not a nested loop") {
    val pts = spark.range(1000).select(col("id").as("p"))
    val ivs = spark.range(100).select(col("id").as("iid"),
      (col("id") * 10).as("lo"), (col("id") * 10 + 20).as("hi"))
    val df = RangeJoin.rangeJoin(pts, "p", ivs, "lo", "hi", 10L)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(1500))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan.take(1500))
  }
}
