package graft

import org.apache.spark.sql.functions._
import graft.sinks.TableSinks

/** The co-located-join contract: two tables persisted with the same
  * bucket spec on their join key equi-join with ZERO shuffle exchanges —
  * the layout that turns a daily fact-to-fact join from a full-corpus
  * shuffle into a bucket-local merge at 100 TB. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("same-spec bucketed tables equi-join without a shuffle exchange") {
    val users = (0L until 2000L).map(i => (i, s"u$i", (i % 7).toInt))
      .toDF("user_id", "uname", "segment")
    val orders = (0L until 8000L).map(i => (i, i % 2000L, (i % 100).toDouble))
      .toDF("order_id", "user_id", "amount")
    TableSinks.writeBucketed(users, "bjs_users", "user_id", buckets = 8)
    TableSinks.writeBucketed(orders, "bjs_orders", "user_id", buckets = 8)
    try {
      // too big to broadcast in spirit: force the non-broadcast path so
      // the assertion exercises the bucket co-location, not a broadcast
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val joined = spark.table("bjs_orders")
          .join(spark.table("bjs_users"), "user_id")
          .groupBy("segment").agg(sum("amount").as("rev"))
        val n = joined.count()
        assert(n == 7, s"expected 7 segments, got $n")
        val plan = joined.queryExecution.executedPlan.toString()
          .split("== Initial Plan ==")(0)
        assert(plan.contains("SortMergeJoin"), plan.take(2000))
        // the join itself must be exchange-free: the only allowed
        // exchange is the post-join aggregation's re-key on `segment`
        val joinSide = plan.split("SortMergeJoin").last
        assert(!joinSide.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n${plan.take(3000)}")
        assert(plan.contains("Bucketed: true"), plan.take(2000))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bjs_users")
      spark.sql("DROP TABLE IF EXISTS bjs_orders")
    }
  }

  private def withSQLConf[A](kv: (String, String)*)(f: => A): A = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
