package graft

import org.apache.spark.sql.functions._
import graft.operators.SaltedJoin

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a pathologically skewed key") {
    // 90% of the big side lands on key 0 — the shape salting exists for
    val big = spark.range(10000).select(
      when(col("id") % 10 =!= 0, col("id") % 100).otherwise(0L).as("k"),
      col("id").as("v"))
    val small = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val salted = SaltedJoin.join(big, small, Seq("k"), salts = 8)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = big.join(small, Seq("k"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("the salt participates in the join keys (the hot key spreads)") {
    val big = spark.range(100).select(lit(0L).as("k"), col("id").as("v"))
    val small = Seq((0L, "hot")).toDF("k", "name")
    val df = SaltedJoin.join(big, small, Seq("k"), salts = 4)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    val cond = joins.head.condition.map(_.toString).getOrElse("")
    assert(cond.contains("__salt"), cond)
    // replication factor: every (key, salt) pair of the small side exists
    assert(df.count() == 100L)
  }
}
