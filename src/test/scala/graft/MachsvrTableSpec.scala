package graft

import graft.server.{QueryDoor, TagTables}
import graft.sinks.Codecs

/** Body-level mining of `spi/machsvr/machsvr_test.go` TestTableBasedCases
  * — the engine-visible SQL behaviors the machbase server battery pins.
  * Out of scope: the cgo handle/slot plumbing (TestConn*, TestSetMax*,
  * query-limit channels), user auth and proxy users, and the Go
  * `database/sql` scan branches. Already covered elsewhere:
  * ColumnsNameCaseSensitivity (machsvr_test.go:1292-1325) in
  * TqlShowSpec, appended log-table ordering in LogLayoutSpec.
  */
class MachsvrTableSpec extends SparkSpec {

  private def q(sql: String) = QueryDoor.execute(spark, sql)
  private def csv(sql: String): String =
    trimClose(Codecs.render(q(sql), "CSV", Codecs.Options()))

  test("CREATE TAG TABLE with METADATA + INSERT METADATA + _T_META select (testInsertMeta machsvr_test.go:981-1035)") {
    TagTables.resetDynamicForTest(spark)
    q("""CREATE TAG TABLE MYTAG (
        |  name varchar(32) primary key,
        |  time datetime basetime,
        |  value double summarized
        |) METADATA(
        |  factory varchar(32),
        |  equipment varchar(64)
        |)""".stripMargin)
    try {
      q("INSERT INTO MYTAG METADATA(name, factory, equipment) values('FA1_CNC', 'FA1', 'CNC')")
      q("INSERT INTO MYTAG METADATA(name, factory, equipment) values('FA4_MILLING', 'FA4', 'MILLING')")
      q("EXEC table_flush(MYTAG)") // procedure no-op like the reference gate
      val got = csv("SELECT _id, name, factory, equipment FROM _MYTAG_META ORDER BY _id")
      assert(got == "1,FA1_CNC,FA1,CNC\n2,FA4_MILLING,FA4,MILLING\n", got)
      // the data side of the table is untouched by metadata inserts
      assert(csv("SELECT count(*) FROM MYTAG") == "0\n")
    } finally q("DROP TABLE MYTAG")
  }

  test("trailing machbase table options parse: TAG_DUPLICATE_CHECK_DURATION (testCreateTables machsvr_test.go:815-852)") {
    TagTables.resetDynamicForTest(spark)
    q("""create tag table if not exists tagdc(
        |  name varchar(100) primary key,
        |  time datetime basetime,
        |  value double
        |) TAG_DUPLICATE_CHECK_DURATION=1;""".stripMargin)
    try {
      q("insert into tagdc values ('a', '2024-06-01 00:00:00', 1.0)")
      assert(csv("select name, value from tagdc") == "a,1\n")
    } finally q("drop table tagdc")
  }

  test("bare CREATE TABLE defaults to a LOG table (testCreateTables machsvr_test.go:857-877)") {
    TagTables.resetDynamicForTest(spark)
    q("""create table if not exists logd(
        |  time datetime,
        |  short_value short,
        |  str_value varchar(400),
        |  bin_value binary)""".stripMargin)
    try {
      assert(TagTables.typeOf("logd") == "Log")
      q("insert into logd (time, short_value, str_value) values ('2024-06-01 00:00:00', 7, 'x')")
      // log tables iterate newest-first and hide _ARRIVAL_TIME
      q("insert into logd (time, short_value, str_value) values ('2024-06-02 00:00:00', 8, 'y')")
      assert(csv("select short_value, str_value from logd") == "8,y\n7,x\n")
    } finally q("drop table logd")
  }

  test("BITAND on integral columns works; float/double args raise MACH-ERR 2037 (TestBitTypeColumn machsvr_test.go:1630-1700)") {
    TagTables.resetDynamicForTest(spark)
    q("CREATE TABLE bit_table (i1 INTEGER, i2 UINTEGER, i3 FLOAT, i4 DOUBLE, i5 SHORT, i6 VARCHAR(10))")
    try {
      q("INSERT INTO bit_table VALUES (-1, 1, 1, 1, 2, 'aaa')")
      val got = csv("SELECT i1, i2, i5, i6 FROM bit_table WHERE BITAND(i2, 1) = 1")
      assert(got == "-1,1,2,aaa\n", got)
      val e1 = intercept[IllegalArgumentException](
        q("SELECT * FROM bit_table WHERE BITAND(i4, 1) = 1"))
      assert(e1.getMessage ==
        "MACH-ERR 2037 Function [BITAND] argument data type is mismatched.")
      val e2 = intercept[IllegalArgumentException](
        q("SELECT BITAND(i1, i3) FROM bit_table"))
      assert(e2.getMessage ==
        "MACH-ERR 2037 Function [BITAND] argument data type is mismatched.")
    } finally q("DROP TABLE bit_table")
  }

  test("tag tables without METADATA derive _T_META from the data (spi/show.go:1376-1382 tag dictionary)") {
    TagTables.resetDynamicForTest(spark)
    q("CREATE TAG TABLE plain (name varchar(40) primary key, time datetime basetime, value double)")
    try {
      q("insert into plain values ('beta', '2024-06-01 00:00:00', 1.0)")
      q("insert into plain values ('alpha', '2024-06-01 00:00:01', 2.0)")
      q("insert into plain values ('beta', '2024-06-01 00:00:02', 3.0)")
      // the dictionary is the DISTINCT name set; _ID here is name-ordered
      // (the engine numbers by first insertion — documented divergence)
      val got = csv("SELECT _ID, NAME FROM _PLAIN_META ORDER BY _ID")
      assert(got == "1,alpha\n2,beta\n", got)
    } finally q("DROP TABLE plain")
    // the derived view drops with its owner
    intercept[Exception](q("SELECT * FROM _PLAIN_META"))
  }

  test("METADATA table drops with its owner and missing-metadata insert errors") {
    TagTables.resetDynamicForTest(spark)
    q("CREATE TAG TABLE m2 (name varchar(32) primary key, time datetime basetime, value double) METADATA(site varchar(16))")
    q("INSERT INTO m2 METADATA(name, site) values('T1', 'S1')")
    assert(csv("SELECT _id, name, site FROM _M2_META") == "1,T1,S1\n")
    q("DROP TABLE m2")
    // the meta view is gone with the table
    intercept[Exception](q("SELECT * FROM _M2_META"))
    // a tag table without METADATA rejects metadata inserts
    q("CREATE TAG TABLE m3 (name varchar(32) primary key, time datetime basetime, value double)")
    try {
      val e = intercept[IllegalArgumentException](
        q("INSERT INTO m3 METADATA(name) values('T1')"))
      assert(e.getMessage.contains("no metadata columns"))
    } finally q("DROP TABLE m3")
  }
}
