package graft

import graft.server.{QueryDoor, TagTables}

/** Volatile/Lookup table classes (spi/do.go:197-207): memory-resident
  * keyed side tables — plain INSERT rejects duplicate keys, ON DUPLICATE
  * KEY UPDATE upserts, UPDATE/DELETE address rows by the primary key,
  * and the class shows up in the catalog. Lookups are enrichment dims:
  * the join spec pins that Spark broadcasts them. */
class VolatileLookupSpec extends SparkSpec {

  private def exec(sql: String): String =
    QueryDoor.execute(spark, sql).collect().head.getString(0)

  test("volatile table: upsert lifecycle by primary key") {
    TagTables.resetDynamicForTest(spark)
    assert(exec("create volatile table vstate (id varchar(20) primary key, status varchar(10), hits integer)")
      == "Created successfully.")
    assert(TagTables.typeOf("vstate") == "Volatile")
    assert(TagTables.primaryKeyOf("vstate").contains("ID"))

    assert(exec("insert into vstate values('dev-1', 'up', 1)") == "a row inserted.")
    // duplicate primary key on plain INSERT is an error
    val dup = intercept[IllegalArgumentException] {
      QueryDoor.execute(spark, "insert into vstate values('dev-1', 'down', 2)")
    }
    assert(dup.getMessage.contains("duplicated primary key"))

    // bare ON DUPLICATE KEY UPDATE replaces the inserted columns
    assert(exec("insert into vstate values('dev-1', 'down', 2) on duplicate key update")
      == "a row updated.")
    // … and inserts when the key is new
    assert(exec("insert into vstate values('dev-2', 'up', 1) on duplicate key update")
      == "a row inserted.")
    // SET form updates only the listed columns
    assert(exec("insert into vstate values('dev-2', 'ignored', 9) on duplicate key update set hits=7")
      == "a row updated.")

    val got = spark.table("vstate").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(got.toSeq == Seq(("dev-1", "down", 2), ("dev-2", "up", 7)))

    // UPDATE addresses rows by the primary key only
    assert(exec("update vstate set status='idle' where id='dev-1'") == "a row updated.")
    assert(exec("update vstate set status='x' where id='nope'") == "0 rows updated.")
    val bad = intercept[IllegalArgumentException] {
      QueryDoor.execute(spark, "update vstate set hits=0 where status='up'")
    }
    assert(bad.getMessage.contains("primary key"))

    assert(exec("delete from vstate where id = 'dev-1'") == "a row deleted.")
    assert(spark.table("vstate").count() == 1)
  }

  test("lookup table: enrichment join broadcasts the lookup side") {
    TagTables.resetDynamicForTest(spark)
    exec("create lookup table site_names (site varchar(10) primary key, label varchar(40))")
    assert(TagTables.typeOf("site_names") == "Lookup")
    exec("insert into site_names values('s1', 'Seoul')")
    exec("insert into site_names values('s2', 'Busan')")
    exec("insert into site_names values('s1', 'Seoul DC') on duplicate key update")

    import spark.implicits._
    Seq(("s1", 1.0), ("s2", 2.0), ("s1", 3.0)).toDF("site", "v")
      .createOrReplaceTempView("readings")
    val joined = spark.sql(
      """SELECT r.site, l.label, sum(r.v) AS total
        |FROM readings r JOIN site_names l ON r.site = l.site
        |GROUP BY r.site, l.label ORDER BY r.site""".stripMargin)
    val rows = joined.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("s1", "Seoul DC", 4.0), ("s2", "Busan", 2.0)))
    // dimension-sized lookups must come in as a broadcast, not a shuffle
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("catalog surfaces the Volatile/Lookup classes") {
    TagTables.resetDynamicForTest(spark)
    exec("create volatile table vv (k varchar(5) primary key, v integer)")
    exec("create lookup table ll (k varchar(5) primary key, v integer)")
    val shown = QueryDoor.execute(spark, "show tables").collect()
      .map(r => r.getString(2) -> r.getString(4)).toMap
    assert(shown("VV") == "Volatile" && shown("LL") == "Lookup")
    val kinds = graft.server.WebApi.tables(spark).collect()
      .map(r => r.getString(3) -> r.getString(4)).toMap
    assert(kinds("VV") == "Volatile Table" && kinds("LL") == "Lookup Table")
    TagTables.resetDynamicForTest(spark)
  }
}
