package graft

import org.apache.spark.sql.functions._
import graft.tql.Tql

class BetweenSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): Unit = {
    Seq(
      ("t1", 1000L, 1.0), ("t1", 2000L, 2.0), ("t1", 3000L, 3.0),
      ("t1", 4000L, 4.0), ("t2", 9000L, 9.0)
    ).toDF("name", "time", "value").createOrReplaceTempView("tag_tbl")
  }

  test("between(last-dur, last) resolves against the tag's max time") {
    mkTable()
    val out = Tql.run(spark,
      """SQL_SELECT('time', 'value', from('tag_tbl', 't1'), between('last-1us', 'last'))
        |CSV()
        |""".stripMargin)
    // t1 last=4000ns; window [3000, 4000]
    assert(out == "3000,3\n4000,4\n")
  }

  test("between('now-dur', 'now') resolves against the injected clock") {
    mkTable()
    val c = Tql.compile(spark,
      """SQL_SELECT('time', 'value', from('tag_tbl', 't1'), between('now-1us', 'now'))
        |CSV()
        |""".stripMargin, nowNs = 3500L)
    val got = c.output.orderBy("time").as[(Long, Double)].collect()
    assert(got.toSeq == Seq((3000L, 3.0))) // [2500, 3500]
  }

  test("absolute ns bounds still work") {
    mkTable()
    val out = Tql.run(spark,
      """SQL_SELECT('time', 'value', from('tag_tbl', 't1'), between(1000, 2000), limit(5))
        |CSV()
        |""".stripMargin)
    assert(out == "1000,1\n2000,2\n")
  }
}
