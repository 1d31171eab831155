package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.server.{Catalog, QueryDoor, TagTables}

/** Reproduces the reference's SHOW catalog tests (spi/show_test.go) and
  * the log-table appender surface (spi/testsuite/logtable.go) against the
  * session catalog. Expected values are the reference's own pinned rows.
  */
class ShowCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = graft.core.Sessions.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def show(sql: String): Seq[Seq[Any]] =
    QueryDoor.execute(spark, sql).collect().toSeq.map(_.toSeq)

  private def cols(sql: String): Seq[String] =
    QueryDoor.execute(spark, sql).columns.toSeq

  test("ShowInfo: NAME/VALUE rows, keys sorted (show_test.go:66-89)") {
    val saved = Catalog.serverInfoProvider
    try {
      Catalog.serverInfoProvider = () => Seq("Name" -> "test", "Version" -> "1.0.0")
      assert(cols("show info") == Seq("NAME", "VALUE"))
      assert(show("show info") == Seq(Seq("Name", "test"), Seq("Version", "1.0.0")))
    } finally Catalog.serverInfoProvider = saved
  }

  test("ShowLicense: community defaults (show_test.go:122-147)") {
    assert(cols("show license") == Seq("ID", "TYPE", "CUSTOMER", "PROJECT",
      "COUNTRY_CODE", "INSTALL_DATE", "ISSUE_DATE", "STATUS"))
    val row = show("show license").head
    assert(row(0) == "00000000" && row(1) == "COMMUNITY")
    assert(row(2) == "NONE" && row(3) == "NONE" && row(4) == "KR")
    assert(row(5).toString.nonEmpty && row(6).toString.nonEmpty)
    assert(row(7) == "VALID")
  }

  test("ShowPorts: provider rows (show_test.go:150-170)") {
    val saved = Catalog.serverPortsProvider
    try {
      Catalog.serverPortsProvider =
        _ => Seq("servicectl" -> "tcp://127.0.0.1:40257")
      assert(cols("show ports") == Seq("PORT", "ADDRESS"))
      assert(show("show ports") == Seq(Seq("servicectl", "tcp://127.0.0.1:40257")))
    } finally Catalog.serverPortsProvider = saved
  }

  test("ShowUsers: (1, SYS) (show_test.go:173-190)") {
    assert(cols("show users") == Seq("USER_ID", "NAME"))
    assert(show("show users") == Seq(Seq(1L, "SYS")))
  }

  test("ShowMetaTables: every row Fixed (show_test.go:193-216)") {
    assert(cols("show meta-tables") == Seq("ID", "NAME", "TYPE"))
    val rows = show("show meta-tables")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r(0).asInstanceOf[Long] >= 1L)
      assert(r(1).toString.nonEmpty)
      assert(r(2) == "Fixed")
    }
  }

  test("ShowVirtualTables: Fixed or Fixed (stat) (show_test.go:218-241)") {
    assert(cols("show virtual-tables") == Seq("ID", "NAME", "TYPE"))
    val rows = show("show virtual-tables")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r(0).asInstanceOf[Long] >= 1L)
      assert(r(1).toString.nonEmpty)
      assert(r(2) == "Fixed" || r(2) == "Fixed (stat)")
    }
  }

  test("ShowSessions: CLI session row with humanized MAX_QPX_MEM (show_test.go:243-266)") {
    assert(cols("show sessions") == Seq("ID", "USER_NAME", "USER_ID",
      "LOGIN_TIME", "TYPE", "USER_IP", "MAX_QPX_MEM"))
    val row = show("show sessions").head
    assert(row(0).asInstanceOf[Long] > 0L)
    assert(row(1) == "SYS")
    assert(row(2).asInstanceOf[Long] >= 0L)
    assert(row(3).asInstanceOf[java.sql.Timestamp].getTime > 0L)
    assert(row(4) == "CLI")
    assert(row(5) == "127.0.0.1")
    assert(row(6).toString.matches("^\\d+(\\.\\d+)?[KMGT]?B$"), row(6).toString)
  }

  test("ShowStatements: recorded statements (show_test.go:270-291)") {
    QueryDoor.execute(spark, "SELECT 1 AS one").collect()
    assert(cols("show statements") == Seq("ID", "SESSION_ID", "STATE",
      "RECORD_SIZE", "QUERY"))
    val row = show("show statements").head
    assert(row(0).asInstanceOf[Long] >= 0L)
    assert(row(2).toString.nonEmpty)
    assert(row(4).toString.nonEmpty)
  }

  test("ShowTables/Indexes/Storage/RollupGap over a dynamic tag table (show_test.go:294-467)") {
    // fresh-engine state: the reference runs this against its own empty
    // test server; dynamic tables left by other suites would shift IDs
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark, "CREATE TAG TABLE RS_DATA(NAME VARCHAR(80) PRIMARY KEY, TIME DATETIME basetime, VALUE DOUBLE summarized) with rollup tag_partition_count = 1")
    try {
      QueryDoor.execute(spark, "INSERT INTO RS_DATA VALUES('test1', '2024-01-01 00:00:00', 1.0)")
      QueryDoor.execute(spark, "INSERT INTO RS_DATA VALUES('test1', '2024-01-02 00:00:00', 2.0)")
      QueryDoor.execute(spark, "exec table_flush('RS_DATA')")

      // ShowTables: RS_DATA is the first user table of a fresh engine → 11
      val base = show("show tables").filter(_(2) == "RS_DATA")
      assert(base == Seq(Seq("MACHBASEDB", "SYS", "RS_DATA", 11L, "Tag", "")))

      // ShowTables --all: shadow tables in name order with engine IDs 1-5
      val allRows = show("show tables --all")
      val shadows = allRows.filter(_(2).toString.startsWith("_RS_DATA"))
      assert(shadows == Seq(
        Seq("MACHBASEDB", "SYS", "_RS_DATA_DATA_0", 1L, "KeyValue", "Data"),
        Seq("MACHBASEDB", "SYS", "_RS_DATA_META", 2L, "Lookup", "Meta"),
        Seq("MACHBASEDB", "SYS", "_RS_DATA_ROLLUP_HOUR", 5L, "KeyValue", "Rollup"),
        Seq("MACHBASEDB", "SYS", "_RS_DATA_ROLLUP_MIN", 4L, "KeyValue", "Rollup"),
        Seq("MACHBASEDB", "SYS", "_RS_DATA_ROLLUP_SEC", 3L, "KeyValue", "Rollup")))
      // base row precedes its shadows (ASCII: letters sort before '_')
      assert(allRows.indexWhere(_(2) == "RS_DATA") <
        allRows.indexWhere(_(2) == "_RS_DATA_DATA_0"))

      // ShowTable / --all (show_test.go:336-357). Deviation: show_test's
      // sql-driver path drops the `summarized` flag; the engine's native
      // path (fm_dbsrc_test.go:370) reports it — we keep the richer one.
      assert(show("show table RS_DATA") == Seq(
        Seq("NAME", "varchar", 80, "tag name", ""),
        Seq("TIME", "datetime", 31, "base time", ""),
        Seq("VALUE", "double", 17, "summarized", "")))
      assert(show("show table RS_DATA --all").last ==
        Seq("_RID", "long", 20, "", ""))

      // ShowTable on a meta table (show_test.go:358-371)
      assert(show("show table M$SYS_TABLES") == Seq(
        Seq("NAME", "varchar", 100, "", ""),
        Seq("TYPE", "integer", 11, "", ""),
        Seq("DATABASE_ID", "long", 20, "", ""),
        Seq("ID", "long", 20, "", ""),
        Seq("USER_ID", "integer", 11, "", ""),
        Seq("COLCOUNT", "integer", 11, "", ""),
        Seq("FLAG", "integer", 11, "", "")))

      // ShowIndexes: the three auto-created _META indexes of the dynamic
      // table carry a fresh engine's ids 6/7/9 (the fixture tables'
      // indexes — pinned by fm_dbsrc_test — coexist in this session)
      assert(show("show indexes")
        .filter(_(3) == "_RS_DATA_META") == Seq(
        Seq(6L, "MACHBASEDB", "SYS", "_RS_DATA_META", "_ID",
          "__PK_IDX__RS_DATA_META_1", "REDBLACK", "UNCOMPRESSED", 0L, 100000L, "EQUAL"),
        Seq(7L, "MACHBASEDB", "SYS", "_RS_DATA_META", "NAME",
          "_RS_DATA_META_NAME", "REDBLACK", "UNCOMPRESSED", 0L, 100000L, "EQUAL"),
        Seq(9L, "MACHBASEDB", "SYS", "_RS_DATA_META", "_LAST_UPDATE_TIME",
          "_RS_DATA_META__LAST_UPDATE_TIME", "REDBLACK", "UNCOMPRESSED", 0L, 100000L, "EQUAL")))
      assert(show("show index _RS_DATA_META_NAME").map(_(5)) ==
        Seq("_RS_DATA_META_NAME"))

      // ShowStorage / ShowTableUsage: all six RS_DATA parts, sizes >= 0
      val parts = Seq("RS_DATA", "_RS_DATA_DATA_0", "_RS_DATA_META",
        "_RS_DATA_ROLLUP_HOUR", "_RS_DATA_ROLLUP_MIN", "_RS_DATA_ROLLUP_SEC")
      val storage = show("show storage").filter(r => parts.contains(r(1)))
      assert(storage.map(_(1)) == parts)
      storage.foreach { r =>
        assert(r(0) == "MACHBASEDB")
        assert(r(2).asInstanceOf[Long] >= 0L && r(3).asInstanceOf[Long] >= 0L
          && r(4).asInstanceOf[Long] >= 0L)
      }
      val usage = show("show table-usage").filter(r => parts.contains(r(2)))
      assert(usage.map(_(2)) == parts)
      usage.foreach(r => assert(r(3).asInstanceOf[Long] >= 0L))

      // ShowLsm / ShowIndexGap: empty on an idle engine
      assert(show("show lsm").isEmpty)
      assert(show("show indexgap").isEmpty)

      // ShowTagIndexGap: IDLE row per tag table, DISK_GAP >= 1
      val gap = show("show tagindexgap").filter(_(1) == "_RS_DATA_DATA_0").head
      assert(gap(0).asInstanceOf[Long] >= 1L)
      assert(gap(2) == "IDLE[0/0]")
      assert(gap(3).asInstanceOf[Long] >= 1L)
      assert(gap(4).asInstanceOf[Long] >= 0L)

      // ShowRollupGap: SEC rolls from the data part (show_test.go:444-453)
      val rg = show("show rollupgap").filter(_(1).toString.startsWith("_RS_DATA"))
      assert(rg.head(1) == "_RS_DATA_ROLLUP_SEC")
      assert(rg.head(2) == "_RS_DATA_DATA_0")
      assert(rg.head(3) == "_RS_DATA_ROLLUP_SEC")

      // ShowTags with a tag filter: flushed value stats (show_test.go:454-463)
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000000L
      val t2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00").getTime * 1000000L
      assert(show("show tags rs_data test1") == Seq(
        Seq(1L, "test1", 2L, t1, t2, t2, 1.0d, t1, 2.0d, t2)))
    } finally {
      QueryDoor.execute(spark, "DROP TAG TABLE RS_DATA CASCADE")
    }
    assert(!show("show tables").exists(_(2) == "RS_DATA"))
  }

  test("system tables are plain SQL: SELECT over M$TABLES / V$STMT") {
    val meta = QueryDoor.execute(spark,
      "SELECT NAME FROM M$TABLES ORDER BY ID").collect().map(_.getString(0))
    assert(meta.head == "M$TABLES" && meta.contains("M$SYS_USERS"))
    val stmts = QueryDoor.execute(spark,
      "SELECT QUERY FROM V$STMT").collect()
    assert(stmts.nonEmpty)
  }

  test("select preserves the query's column-name casing (machsvr_test.go:1292-1325)") {
    TagTables.ensure(spark, "log_data")
    val cols = QueryDoor.execute(spark,
      "select TiMe,Short_Value from log_data limit 10").columns.toSeq
    assert(cols == Seq("TiMe", "Short_Value"))
  }

  test("log table: appender columns lead with _ARRIVAL_TIME (logtable.go:77-96)") {
    assert(TagTables.appenderColumns("log_data") == Seq(
      ("_ARRIVAL_TIME", "datetime", 8, "datetime"),
      ("TIME", "datetime", 8, "datetime"),
      ("SHORT_VALUE", "short", 2, "int16"),
      ("USHORT_VALUE", "ushort", 2, "uint16"),
      ("INT_VALUE", "integer", 4, "int32"),
      ("UINT_VALUE", "uinteger", 4, "uint32"),
      ("LONG_VALUE", "long", 8, "int64"),
      ("ULONG_VALUE", "ulong", 8, "uint64"),
      ("DOUBLE_VALUE", "double", 8, "double"),
      ("FLOAT_VALUE", "float", 4, "float"),
      ("STR_VALUE", "varchar", 400, "string"),
      ("JSON_VALUE", "json", 32767, "json"),
      ("IPV4_VALUE", "ipv4", 5, "ipv4"),
      ("IPV6_VALUE", "ipv6", 17, "ipv6"),
      ("TEXT_VALUE", "text", 67108864, "string"),
      ("BIN_VALUE", "binary", 67108864, "binary")))
  }

  test("log table: hidden _ARRIVAL_TIME, newest-first default order") {
    val savedClock = TagTables.arrivalClock
    try {
      var tick = 1700000000000000000L
      TagTables.arrivalClock = () => { tick += 1000000000L; tick }
      QueryDoor.execute(spark, "DELETE FROM log_data")
      QueryDoor.execute(spark,
        "INSERT INTO log_data(TIME, STR_VALUE) VALUES('2024-01-01 00:00:00', 'first')")
      QueryDoor.execute(spark,
        "INSERT INTO log_data(TIME, STR_VALUE) VALUES('2024-01-01 00:00:01', 'second')")

      // select * hides the arrival column and returns newest-first
      val df = QueryDoor.execute(spark, "SELECT * FROM log_data")
      assert(!df.columns.contains("_ARRIVAL_TIME"))
      assert(df.select("STR_VALUE").collect().map(_.getString(0)).toSeq ==
        Seq("second", "first"))

      // naming _ARRIVAL_TIME explicitly routes to the arrival view
      val withArrival = QueryDoor.execute(spark,
        "SELECT _ARRIVAL_TIME, STR_VALUE FROM log_data ORDER BY _ARRIVAL_TIME")
        .collect()
      assert(withArrival.length == 2)
      assert(withArrival.map(_.getString(1)).toSeq == Seq("first", "second"))
      val arrivalNs = withArrival.head.getTimestamp(0).getTime
      assert(arrivalNs == (1700000000000L + 1000L))
    } finally {
      TagTables.arrivalClock = savedClock
      QueryDoor.execute(spark, "DELETE FROM log_data")
    }
  }
}
