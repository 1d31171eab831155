package graft

import graft.server.{QueryDoor, TagTables, WriteDoor}

/** Regression pins for the round-15 self-review findings — each test
  * reproduces a reviewed failure scenario against the fixed behavior.
  */
class Round15ReviewSpec extends SparkSpec {

  private def q(sql: String) = QueryDoor.execute(spark, sql)

  test("a column named location/comment does not reroute machbase DDL to Spark") {
    TagTables.resetDynamicForTest(spark)
    q("create table loc_cols (msg varchar(100), location varchar(200), comment varchar(50))")
    try {
      // machbase log-table semantics: descriptor registered, hidden
      // _ARRIVAL_TIME present
      assert(TagTables.descriptorFor("loc_cols").isDefined)
      assert(TagTables.columnsOf("loc_cols").contains("_ARRIVAL_TIME"))
    } finally q("drop table loc_cols")
    // the Spark-only signals AFTER the column defs still escape
    q("drop table if exists loc_spark")
    q("create table loc_spark (a INT, b DOUBLE) TBLPROPERTIES ('k'='v')")
    try assert(TagTables.descriptorFor("loc_spark").isEmpty)
    finally q("drop table loc_spark")
  }

  test("DESC keeps qualified Spark names whole; machbase split still applies") {
    import spark.implicits._
    TagTables.resetDynamicForTest(spark)
    Seq((1, "x")).toDF("id", "v").createOrReplaceTempView("plain_view")
    // a dotted GLOBAL temp view must reach spark.table un-split
    Seq((2L, "y")).toDF("id", "v").createOrReplaceGlobalTempView("r15v")
    val d = q("desc global_temp.r15v").collect()
    assert(d.map(_.getString(1)).toSeq == Seq("id", "v"), d.mkString(";"))
    // machbase-qualified form still resolves to the table part
    q("create tag table r15t (name varchar(40) primary key, time datetime basetime, value double)")
    try assert(q("desc machbasedb.sys.r15t").collect().nonEmpty)
    finally q("drop table r15t")
  }

  test("CSV write honors a custom delimiter (mqtt_write.go:86-87 delimiter prop)") {
    TagTables.resetDynamicForTest(spark)
    q("create tag table dl (name varchar(40) primary key, time datetime basetime, value double)")
    try {
      WriteDoor.write(spark, "dl",
        "semi;1717286400000000000;2.5".getBytes("UTF-8"),
        "text/csv", Map("delimiter" -> ";"))
      val r = spark.table("dl").collect()
      assert(r.length == 1 && r(0).getString(0) == "semi", r.mkString(";"))
    } finally q("drop table dl")
  }

  test("a JSON null reply field sends no reply (gjson .String() of null is empty)") {
    assert(graft.server.MqttDoor.extractReplyTo(
      """{"reply":null,"data":{"rows":[]}}""".getBytes("UTF-8")).isEmpty)
    assert(graft.server.MqttDoor.extractReplyTo(
      """{"reply":"db/reply/x"}""".getBytes("UTF-8")).contains("db/reply/x"))
    assert(graft.server.MqttDoor.extractReplyTo(
      "not json".getBytes("UTF-8")).isEmpty)
  }
}
