package graft

import graft.server.{Catalog, QueryDoor, TagTables}
import graft.sinks.Codecs

/** Body-level mining of `spi/sql_test.go` — the engine-side semantics
  * embedded in the Go driver compatibility battery. The Go
  * `database/sql` plumbing itself (driver interfaces, context
  * cancellation, connection pools, NullString buffers) has no analogue
  * in a Spark library and stays out of scope; what this spec pins is
  * every statement the battery sends THROUGH the engine: the
  * drop/recreate/insert cycle, string datetime literals on INSERT,
  * CREATE/DROP INDEX + M$SYS_INDEXES, and the empty-varchar-is-NULL
  * rule (neo#1408).
  */
class SqlCompatSpec extends SparkSpec {

  private def q(sql: String) = QueryDoor.execute(spark, sql)
  private def csv(sql: String): String =
    trimClose(Codecs.render(q(sql), "CSV", Codecs.Options()))

  test("drop + re-create + insert cycle with string datetime literals (TestStatementCacheBehavior spi/sql_test.go:578-654)") {
    TagTables.resetDynamicForTest(spark)
    q("create tag table if not exists stmtcache (name varchar(80) primary key, time datetime basetime, value double)")
    try {
      q("insert into stmtcache values ('Alice', '2024-06-01 00:00:00', 123.45)")
      q("drop table stmtcache")
      // re-create under the same name and insert through the same text —
      // the engine half of the statement-cache invalidation battery
      q("create tag table if not exists stmtcache (name varchar(80) primary key, time datetime basetime, value double)")
      q("insert into stmtcache values ('Bob', '2024-06-02 00:00:00', 678.90)")
      val got = csv("select name, value from stmtcache")
      assert(got == "Bob,678.9\n", got)
      // the string datetime literal parsed as a wall-clock instant
      val t = csv("select time from stmtcache")
      assert(t == "1717286400000000000\n", t) // 2024-06-02T00:00:00Z epoch-ns
    } finally q("drop table stmtcache")
  }

  test("create/drop index lifecycle + m$sys_indexes membership (TestMultiUserSessionIndexBehavior spi/sql_test.go:786-921)") {
    TagTables.resetDynamicForTest(spark)
    Catalog.resetIndexesForTest()
    q("create tag table data (name varchar(80) primary key, time datetime basetime, value double)")
    try {
      q("insert into data values ('Alice', '2024-06-01 00:00:00', 123.45)")
      q("exec table_flush(data)")
      assert(csv("select count(*) as cnt from data") == "1\n")
      // both spellings register the same catalog entry (the reference
      // loops plain and user-qualified names)
      for (indexName <- Seq("idx_data_value", "david.idx_data_value")) {
        q(s"create index $indexName on data(value)")
        val rows = q("select name, type from m$sys_indexes").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
        // the battery expects exactly the three auto meta indexes of the
        // table plus the created one, by substring membership
        val expects = Seq("_DATA_META_NAME", "_DATA_META__LAST_UPDATE_TIME",
          "__PK_IDX__DATA_META", "IDX_DATA_VALUE")
        for (e <- expects)
          assert(rows.exists(_._1.contains(e)), s"$e missing in $rows")
        assert(rows.filter(_._1.contains("DATA_META")).forall(_._2 == 8L),
          s"meta indexes are REDBLACK(8): $rows") // spi/show.go:609-617
        assert(rows.find(_._1 == "IDX_DATA_VALUE").exists(_._2 == 6L),
          s"user index defaults to LSM(6): $rows")
        // visible through SHOW INDEXES too
        val show = q("show indexes").collect().map(_.getString(5))
        assert(show.contains("IDX_DATA_VALUE"), show.mkString(","))
        q("drop index idx_data_value")
        assert(!q("show indexes").collect().map(_.getString(5))
          .contains("IDX_DATA_VALUE"))
      }
      // duplicate create / missing drop error
      q("create index idx_data_value on data(value)")
      intercept[IllegalArgumentException](
        q("create index idx_data_value on data(value)"))
      q("drop index idx_data_value")
      intercept[IllegalArgumentException](q("drop index no_such_idx"))
    } finally {
      q("drop table data cascade")
      Catalog.resetIndexesForTest()
    }
  }

  test("dropping a table drops its user indexes") {
    TagTables.resetDynamicForTest(spark)
    Catalog.resetIndexesForTest()
    q("create tag table data2 (name varchar(80) primary key, time datetime basetime, value double)")
    q("create index idx2 on data2(value)")
    q("drop table data2")
    assert(!q("show indexes").collect().map(_.getString(5)).contains("IDX2"))
  }

  test("empty varchar literal selects as NULL (TestMachbaseSQLCompatibilityEmptyVarchar spi/sql_test.go:442-471, neo#1408)") {
    val df = q("select '' as EMPTY_VARCHAR")
    val r = df.collect()
    assert(df.columns.toSeq == Seq("EMPTY_VARCHAR"), df.columns.mkString(","))
    assert(df.schema.fields(0).dataType == org.apache.spark.sql.types.StringType)
    assert(r.length == 1 && r(0).isNullAt(0), r.mkString(";"))
    // a non-empty literal (and one carrying an escaped quote) is untouched
    assert(csv("select 'it''s' as v") == "it's\n")
    // applies inside predicates too — comparing with '' is comparing
    // with NULL, which matches nothing
    TagTables.resetDynamicForTest(spark)
    q("create tag table ev (name varchar(40) primary key, time datetime basetime, value double)")
    try {
      q("insert into ev values ('a', 1717286400000000000, 1.0)")
      assert(csv("select count(*) as c from ev where name = ''") == "0\n")
    } finally q("drop table ev")
  }
}
