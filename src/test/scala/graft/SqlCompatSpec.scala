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

  // ---- spi/database_test.go + spi/spi_test.go on-scope subsets -----------

  test("statement-type verb table + fetch classes (spi/database.go:207-244; database_test.go:388-414)") {
    import QueryDoor.{statementTypeName => st, isFetch}
    assert(st("select * from t") == "SELECT")
    assert(st("  INSERT into t values (1)") == "INSERT")
    assert(st("update t set a=1") == "UPDATE")
    assert(st("delete from t") == "DELETE")
    assert(st("create table t (a int)") == "CREATE")
    assert(st("drop table t") == "DROP")
    assert(st("alter table t add column b int") == "ALTER")
    assert(st("describe t") == "DESCRIBE")
    assert(st("DESC t") == "DESCRIBE")
    assert(st("with cte as (select 1) select * from cte") == "CTE")
    assert(st("show tables") == "SHOW")
    assert(st("explain select 1") == "EXPLAIN")
    assert(st("exec table_flush(t)") == "OTHER")
    assert(st("") == "OTHER")
    // IsFetch: SELECT, DESCRIBE and CTEs fetch; everything else executes
    assert(isFetch("SELECT") && isFetch("DESCRIBE") && isFetch("CTE"))
    assert(!isFetch("INSERT") && !isFetch("SHOW") && !isFetch("EXPLAIN") &&
      !isFetch("OTHER"))
  }

  test("MakeUserMessage humanized replies (spi/database.go:461-489; database_test.go:479-503)") {
    import QueryDoor.{userMessage => um}
    assert(um("SELECT", 0) == "no rows selected.")
    assert(um("SELECT", 1) == "a row selected.")
    assert(um("SELECT", 2) == "2 rows selected.")
    assert(um("INSERT", 3) == "3 rows inserted.")
    assert(um("UPDATE", 4) == "4 rows updated.")
    assert(um("DELETE", 5) == "5 rows deleted.")
    assert(um("CREATE", 0) == "Created successfully.")
    assert(um("DROP", 0) == "Dropped successfully.")
    assert(um("ALTER", 0) == "Altered successfully.")
    assert(um("OTHER", 0) == "executed.")
  }

  test("TableName.Split defaults db/user and uppercases (spi/spi_test.go:30-48 TestTableNames)") {
    assert(QueryDoor.splitTableName("a.b.c") == ("A", "B", "C"))
    assert(QueryDoor.splitTableName("user.table") == ("MACHBASEDB", "USER", "TABLE"))
    assert(QueryDoor.splitTableName("table") == ("MACHBASEDB", "SYS", "TABLE"))
    // wired into the doors: qualified names resolve to the table part
    TagTables.resetDynamicForTest(spark)
    q("create tag table tq (name varchar(40) primary key, time datetime basetime, value double)")
    try {
      val d1 = q("desc sys.tq").collect()
      val d2 = q("desc machbasedb.sys.tq").collect()
      assert(d1.nonEmpty && d1.length == d2.length)
    } finally q("drop table tq")
  }

  test("init SQL script loader (mods/server/server.go:2811-2854; server_test.go:2108-2136 TestLoadSqlScriptFile)") {
    import graft.server.ServerInit.loadSqlScript
    val script =
      "\n# shell style comment\n-- sql style comment\n\n" +
      "CREATE TABLE demo (\n  id INTEGER,\n  name VARCHAR(20)\n);\n\n" +
      "INSERT INTO demo VALUES\n(1, 'neo');\n"
    assert(loadSqlScript(script) == Seq(
      "CREATE TABLE demo ( id INTEGER, name VARCHAR(20) )",
      "INSERT INTO demo VALUES (1, 'neo')"))
    // unterminated trailing statement is dropped
    assert(loadSqlScript("SELECT 1\n").isEmpty)
    // comment markers skip only at column 0 (the reference prefix-tests
    // the UN-trimmed line); an indented `--` line joins its statement
    assert(loadSqlScript("SELECT 1,\n  -- 2,\n  3;\n") ==
      Seq("SELECT 1, -- 2, 3"))
  }

  test("BITAND gate ignores string literals and multi-table selects (advice r14)") {
    TagTables.resetDynamicForTest(spark)
    q("create tag table bg (name varchar(40) primary key, time datetime basetime, value double)")
    try {
      q("insert into bg values ('BITAND(x,1.5)', 1717286400000000000, 1.0)")
      // the function token INSIDE a literal must not trip MACH-ERR 2037
      assert(csv("select count(*) as c from bg where name = 'BITAND(x,1.5)'") == "1\n")
      // a double column as an argument still trips it (machsvr contract)
      val e = intercept[IllegalArgumentException](
        q("select BITAND(value, 1) from bg"))
      assert(e.getMessage.contains("MACH-ERR 2037"), e.getMessage)
    } finally q("drop table bg")
  }

  test("CREATE TABLE with Spark-only signals stays Spark DDL (advice r14)") {
    // TBLPROPERTIES marks Spark DDL even when every column type is in
    // the shared machbase set — must not reroute to the log-table double
    q("drop table if exists spark_props_t")
    q("create table spark_props_t (a INT, b DOUBLE) TBLPROPERTIES ('k'='v')")
    try {
      assert(TagTables.descriptorFor("spark_props_t").isEmpty)
      assert(spark.catalog.tableExists("spark_props_t"))
    } finally q("drop table spark_props_t")
  }

  test("init scripts run through the exec door (server.go:843-874 CreateDBQueries)") {
    TagTables.resetDynamicForTest(spark)
    val msgs = graft.server.ServerInit.runSqlScript(spark,
      """-- init script
        |CREATE TAG TABLE init_demo (
        |  name varchar(40) primary key,
        |  time datetime basetime,
        |  value double
        |);
        |INSERT INTO init_demo VALUES ('a', 1717286400000000000, 1.5);
        |""".stripMargin)
    try {
      assert(msgs == Seq("Created successfully.", "a row inserted."), msgs)
      assert(csv("select count(*) as c from init_demo") == "1\n")
    } finally q("drop table init_demo")
  }
}
