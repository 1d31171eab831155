package graft

import graft.server.{QueryDoor, TagTables, WebApi}
import graft.sinks.Codecs

/** Reproduces the reference's `/web/api/tables…` REST tests
  * (http_test.go:1621-1797) through the JSON envelope renderer. */
class WebApiSpec extends SparkSpec {

  private val tick = 1705291859000000000L // testTimeTick as epoch ns

  test("tables listing with Kind strings and glob filter (TestHttpTables)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table example (NAME varchar(100) primary key, TIME datetime basetime, VALUE double summarized)")
    try {
      val plain = Codecs.render(WebApi.tables(spark), "JSON")
      assert(plain.contains(""""columns":["ROWNUM","DB","USER","NAME","TYPE"]"""), plain)
      assert(plain.contains(""""types":["int32","string","string","string","string"]"""), plain)
      assert(plain.contains(""""MACHBASEDB","SYS","EXAMPLE","Tag Table""""), plain)
      assert(plain.contains(""""MACHBASEDB","SYS","LOG_DATA","Log Table""""), plain)
      assert(plain.contains(""""MACHBASEDB","SYS","TAG_DATA","Tag Table""""), plain)
      assert(!plain.contains("_EXAMPLE_DATA_0"), plain)

      // showall + name=*DATA* glob: shadows match the glob too, but
      // _EXAMPLE_META does not (http_test.go:1636-1645)
      val filtered = Codecs.render(
        WebApi.tables(spark, showAll = true, nameGlob = Some("*DATA*")), "JSON")
      assert(filtered.contains(""""LOG_DATA","Log Table""""), filtered)
      assert(filtered.contains(""""TAG_DATA","Tag Table""""), filtered)
      assert(filtered.contains(""""_EXAMPLE_DATA_0","KeyValue Table (data)""""), filtered)
      assert(filtered.contains(""""_TAG_DATA_DATA_0","KeyValue Table (data)""""), filtered)
      assert(filtered.contains(""""_TAG_DATA_META","Lookup Table (meta)""""), filtered)
      assert(!filtered.contains("_EXAMPLE_META"), filtered)
      assert(!filtered.contains("EXAMPLE\",")
        || filtered.indexOf("\"EXAMPLE\"") < 0, filtered)
    } finally QueryDoor.execute(spark, "drop table example")
  }

  test("tags + tag stat envelopes (TestHttpTags, TestHttpTagStat)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table example (NAME varchar(100) primary key, TIME datetime basetime, VALUE double summarized)")
    try {
      TagTables.insert(spark, "example", Seq("NAME", "TIME", "VALUE"),
        Seq("temp", Long.box(tick), Double.box(3.14)))
      TagTables.insert(spark, "example", Seq("NAME", "TIME", "VALUE"),
        Seq("test.query", Long.box(tick), Double.box(1.0)))
      QueryDoor.execute(spark, "exec table_flush('example')")

      assert(Codecs.render(WebApi.tags(spark, "example"), "JSON",
        Codecs.Options(elapse = Some("0s"))) ==
        """{"data":{"columns":["ROWNUM","NAME"],"types":["int32","string"],""" +
        """"rows":[[1,"temp"],[2,"test.query"]]},"success":true,"reason":"success","elapse":"0s"}""")

      val stat = Codecs.render(WebApi.tagStat(spark, "example", "temp"), "JSON",
        Codecs.Options(elapse = Some("0s")))
      assert(stat ==
        """{"data":{"columns":["ROWNUM","NAME","ROW_COUNT","MIN_TIME","MAX_TIME","MIN_VALUE","MIN_VALUE_TIME","MAX_VALUE","MAX_VALUE_TIME","RECENT_ROW_TIME"],""" +
        """"types":["int32","string","int64","datetime","datetime","double","datetime","double","datetime","datetime"],""" +
        s""""rows":[[1,"temp",1,$tick,$tick,3.14,$tick,3.14,$tick,$tick]]},"success":true,"reason":"success","elapse":"0s"}""", stat)
    } finally QueryDoor.execute(spark, "drop table example")
  }
}
