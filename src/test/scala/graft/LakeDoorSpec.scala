package graft

import graft.server.{LakeDoor, QueryDoor, TagTables}
import graft.script.Builtins

/** Reproduces the reference's lake REST tests
  * (mods/server/http_lake_test.go): TestLakeHelperBuilders,
  * TestLakeHelperChecks, TestLakeMakeReturnFormat,
  * TestLakeHandlersRejectInvalidInput, and the TestHttpLakeAppend
  * append+calculated round trip. */
class LakeDoorSpec extends SparkSpec {

  private val tick = 1705291859000000000L // server_test.go:42 testTimeTick

  private def params(kv: (String, String)*): Map[String, Seq[String]] =
    kv.toMap.map { case (k, v) => k -> Seq(v) }

  private def json(s: String): Any = Builtins.jsonParse(s)

  test("helper builders (TestLakeHelperBuilders)") {
    assert(LakeDoor.sqlTidy("\n SELECT * \n FROM tag \n") == "SELECT * FROM tag")
    assert(LakeDoor.makeLimit("", "10") == "LIMIT 10")
    assert(LakeDoor.makeLimit("5", "10") == "LIMIT 5, 10")
    assert(LakeDoor.makeAndCondition("a,b", ",", flag = true) == " AND a AND b ")
    assert(LakeDoor.makeToDate("2023-05-16T09:10:20") == "TO_DATE('2023-05-16 09:10:20')")
    assert(LakeDoor.makeInCondition("NAME", Seq("alpha", "beta"), flag = true,
      stringFlag = true) == " AND NAME IN('alpha','beta')")
    assert(LakeDoor.makeLikeTag("factory.sensor.temp") == "'factory.sensor.%'")
    assert(LakeDoor.makeValueColumn(Seq(" value ", " level "), Seq("value_alias", "")) ==
      """, "value" AS "value_alias", "level"""")
    assert(LakeDoor.makeTimeColumn("TIME", "ms", "TS") == "TO_TIMESTAMP(TIME/1000000) AS TS")
    assert(LakeDoor.makeScanHint("1", "TAG") == "/*+ SCAN_BACKWARD(TAG) */ ")
    assert(LakeDoor.makeCalculator("VALUE", "COUNT") == "SUM(VALUE)")
    assert(LakeDoor.makeRollupHint("TIME", "day", "AVG", "VALUE") ==
      "TIME ROLLUP 1 HOUR TIME, AVG(VALUE) VALUE")
  }

  test("helper checks (TestLakeHelperChecks)") {
    assert(LakeDoor.checkSelectTagLimit("abc", 10) == "limit param is not number")
    assert(LakeDoor.checkSelectTagLimit("11", 10).contains("limit over"))
    assert(LakeDoor.checkSelectValueLimit("abc", 10) == "limit param is not number")
    assert(LakeDoor.checkSelectValueLimit("11", 10).contains("limit over"))

    assert(LakeDoor.checkTimeFormat("", nilOk = true) == Right(""))
    assert(LakeDoor.checkTimeFormat("1710000000", nilOk = false) == Right("timestamp"))
    assert(LakeDoor.checkTimeFormat("2023-05-16.09:10:20.123", nilOk = false) == Right("date"))
    assert(LakeDoor.checkTimeFormat("123456789", nilOk = false).isLeft)

    assert(LakeDoor.checkTimePeriod("1710000000", "timestamp",
      "2023-05-16.09:10:20.123", "date").contains("StartTime, EndTime Format Different"))

    assert(LakeDoor.makeNanoTimeStamp("1710000000") == "1710000000000000000")
    assert(LakeDoor.makeFromTimestamp("1710000000") == "FROM_TIMESTAMP(1710000000000000000)")
    assert(LakeDoor.makeFromTimestamp("not-a-timestamp") == "")
  }

  test("MakeReturnFormat shapes (TestLakeMakeReturnFormat)") {
    import LakeDoor.{MachColumn, MachResult}
    val dbData = MachResult(
      Seq(MachColumn("NAME", 5), MachColumn("TIME", 12), MachColumn("VALUE", 20)),
      Seq(Seq("tag1", Long.box(1L), Double.box(1.25)),
        Seq("tag1", Long.box(2L), Double.box(2.5))))

    // format 0, tag: NAME column stripped, per-tag row objects
    val tag0 = json(LakeDoor.makeReturnFormatJson(dbData, "AVG", "0", "tag", Seq("tag1")))
      .asInstanceOf[collection.Map[String, Any]]
    assert(tag0("calc_mode") == "AVG")
    val cols = tag0("columns").asInstanceOf[collection.Seq[Any]]
    assert(cols.length == 2)
    assert(cols.head.asInstanceOf[collection.Map[String, Any]]("name") == "TIME")
    val samples = tag0("samples").asInstanceOf[collection.Seq[Any]]
    assert(samples.length == 1)
    val s0 = samples.head.asInstanceOf[collection.Map[String, Any]]
    assert(s0("tag_name") == "tag1")
    val rows = s0("data").asInstanceOf[collection.Seq[Any]]
    assert(rows.length == 2)
    val r0 = rows.head.asInstanceOf[collection.Map[String, Any]]
    assert(r0("TIME") == 1L && r0("VALUE") == 1.25)

    // format 1, log: column-keyed value arrays, one unnamed sample
    val log1 = json(LakeDoor.makeReturnFormatJson(
      MachResult(Seq(MachColumn("TIME", 12), MachColumn("VALUE", 20)),
        Seq(Seq(Long.box(1L), Double.box(10.5)), Seq(Long.box(2L), Double.box(11.5)))),
      "AVG", "1", "log", Nil)).asInstanceOf[collection.Map[String, Any]]
    val logSamples = log1("samples").asInstanceOf[collection.Seq[Any]]
    assert(logSamples.length == 1)
    val logData = logSamples.head.asInstanceOf[collection.Map[String, Any]]("data")
      .asInstanceOf[collection.Map[String, Any]]
    assert(logData("TIME") == collection.Seq(1L, 2L))
    assert(logData("VALUE") == collection.Seq(10.5, 11.5))

    // empty data: samples is the empty array
    val empty = json(LakeDoor.makeReturnFormatJson(
      MachResult(Seq(MachColumn("NAME", 5)), Nil), "AVG", "0", "tag", Seq("tag1")))
      .asInstanceOf[collection.Map[String, Any]]
    assert(empty("samples") == collection.Seq())
  }

  test("handlers reject invalid input (TestLakeHandlersRejectInvalidInput)") {
    val s = spark

    // unsupported-values-type
    val unknown = LakeDoor.getValues(s, "unknown", Map.empty)
    assert(unknown.status == 400 && unknown.body.contains("This type is not available"))

    // invalid-tag-limit on GET /lakes/tags
    val tagLimit = LakeDoor.getTagList(s, params("limit" -> "abc"))
    assert(tagLimit.status == 412 && tagLimit.body.contains(""""status":"fail""""))

    // current-data-requires-tag-name
    val current = LakeDoor.getValues(s, "current", Map.empty)
    assert(current.status == 422 && current.body.contains("tag_name"))

    // raw-data-rejects-invalid-return-type
    val rawForm = LakeDoor.getValues(s, "raw", params("tag_name" -> "tag1",
      "start_time" -> "1710000000", "end_time" -> "1710000001",
      "value_return_form" -> "2"))
    assert(rawForm.status == 412 && rawForm.body.contains("value_return_form"))

    // raw-data-rejects-mismatched-alias-count
    val rawAlias = LakeDoor.getValues(s, "raw", params("tag_name" -> "tag1",
      "start_time" -> "1710000000", "end_time" -> "1710000001",
      "columns" -> "value,level", "aliases" -> "only_one"))
    assert(rawAlias.status == 422 && rawAlias.body.contains("columns' and 'aliases'"))

    // calculate-data-rejects-invalid-calc-mode
    val calcMode = LakeDoor.getValues(s, "calculated", params("tag_name" -> "tag1",
      "start_time" -> "1710000000", "end_time" -> "1710000001", "calc_mode" -> "median"))
    assert(calcMode.status == 422 && calcMode.body.contains("calc_mode"))

    // calculate-data-rejects-invalid-interval-type
    val calcInterval = LakeDoor.getValues(s, "calculated", params("tag_name" -> "tag1",
      "start_time" -> "1710000000", "end_time" -> "1710000001", "interval_type" -> "week"))
    assert(calcInterval.status == 422 && calcInterval.body.contains("interval_type"))

    // group-data-requires-tag-name
    val group = LakeDoor.getValues(s, "group", Map.empty)
    assert(group.status == 422 && group.body.contains("tag name is empty"))

    // group-data-rejects-invalid-calc-mode
    val groupMode = LakeDoor.getValues(s, "group",
      params("tag_name" -> "tag1", "calc_mode" -> "median"))
    assert(groupMode.status == 422 && groupMode.body.contains("invalid calculate mode"))

    // last-data-rejects-invalid-calc-mode
    val lastMode = LakeDoor.getValues(s, "last",
      params("tag_name" -> "tag1", "calc_mode" -> "median"))
    assert(lastMode.status == 422 && lastMode.body.contains("invalid calculate mode"))

    // stat-data-rejects-invalid-return-type
    val statForm = LakeDoor.getValues(s, "stat",
      params("tag_name" -> "tag1", "value_return_form" -> "2"))
    assert(statForm.status == 412 && statForm.body.contains("value_return_form"))

    // pivot-data-rejects-invalid-interpolation
    val pivInterp = LakeDoor.getValues(s, "pivoted", params("tag_name" -> "tag1",
      "start_time" -> "1710000000", "end_time" -> "1710000001", "interpolation" -> "4"))
    assert(pivInterp.status == 422 && pivInterp.body.contains("interpolation"))

    // pivot-data-rejects-invalid-direction
    val pivDir = LakeDoor.getValues(s, "pivoted", params("tag_name" -> "tag1",
      "start_time" -> "1710000000", "end_time" -> "1710000001", "direction" -> "3"))
    assert(pivDir.status == 422 && pivDir.body.contains("direction"))
  }

  test("append + calculated round trip (TestHttpLakeAppend)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      """create tag table tag (name varchar(200) primary key,
        |time datetime basetime, value double summarized) WITH ROLLUP(SEC)""".stripMargin)
    try {
      // default append
      val def1 = LakeDoor.postValues(spark, "", s"""{"values":[{"Tag":"tag1","Ts":$tick,"Val":11.11}]}""")
      assert(def1.status == 200, def1.body)
      val d1 = json(def1.body).asInstanceOf[collection.Map[String, Any]]
      assert(d1("success") == true && d1("reason") == "success")
      assert(d1("data").asInstanceOf[collection.Map[String, Any]] ==
        collection.Map("success" -> 1L, "fail" -> 0L))

      // standard append with the ymd date_format
      val std = LakeDoor.postValues(spark, "standard",
        """{"tag_name":"tag1","date_format":"YYYY-MM-DD HH24:MI:SS mmm:uuu:nnn",
          |"values":[["2023-11-02 00:02:00 000:000:000",22.969678741091588],
          |["2023-11-02 00:02:48 000:000:000",18.393240581695526]]}""".stripMargin)
      assert(std.status == 200, std.body)
      val d2 = json(std.body).asInstanceOf[collection.Map[String, Any]]
      assert(d2("data").asInstanceOf[collection.Map[String, Any]] ==
        collection.Map("success" -> 2L, "fail" -> 0L))

      // append_2: Val omitted defaults to 0
      val def2 = LakeDoor.postValues(spark, "", s"""{"values":[{"Tag":"tag1","Ts":$tick}]}""")
      assert(def2.status == 200, def2.body)

      // empty values rejects (http_lake.go:2280-2284)
      val emptyVals = LakeDoor.postValues(spark, "", """{"values":[]}""")
      assert(emptyVals.status == 412 && emptyVals.body.contains("values is empty"))

      // calculated over a window past all data: the verbatim empty
      // envelope from the reference test (the reference query reads the
      // not-yet-flushed rollup there; an out-of-range window pins the
      // same wire shape against a synchronous engine)
      val calcEmpty = LakeDoor.getValues(spark, "calculated", params(
        "tag_name" -> "tag1",
        "start_time" -> "2025-01-01 09:12:00 000",
        "end_time" -> "2025-12-31 12:12:00 000"))
      assert(calcEmpty.status == 200, calcEmpty.body)
      assert(json(calcEmpty.body) == json(
        """{"data":{"calc_mode":"AVG","columns":[
          |{"length":0,"name":"NAME","type":5},
          |{"length":0,"name":"TIME","type":5},
          |{"length":0,"name":"VALUE","type":20}],
          |"samples":[{"tag_name":"tag1","data":[]}]},
          |"status":"success"}""".stripMargin.replace("\n", "")))

      // calculated over the 2023 window finds the standard-append rows,
      // 1-SEC AVG buckets, TO_CHAR'd times
      val calc2023 = LakeDoor.getValues(spark, "calculated", params(
        "tag_name" -> "tag1",
        "start_time" -> "2023-01-01 00:00:00 000",
        "end_time" -> "2023-12-31 00:00:00 000"))
      assert(calc2023.status == 200, calc2023.body)
      val c = json(calc2023.body).asInstanceOf[collection.Map[String, Any]]
      val data = c("data").asInstanceOf[collection.Map[String, Any]]
      val sample = data("samples").asInstanceOf[collection.Seq[Any]]
        .head.asInstanceOf[collection.Map[String, Any]]
      assert(sample("tag_name") == "tag1")
      val rows = sample("data").asInstanceOf[collection.Seq[Any]]
        .map(_.asInstanceOf[collection.Map[String, Any]])
      assert(rows.map(r => (r("TIME"), r("VALUE"))) == collection.Seq(
        ("2023-11-02 00:02:00", 22.969678741091588),
        ("2023-11-02 00:02:48", 18.393240581695526)))

      // raw over the full window sees all four rows, newest-last
      val raw = LakeDoor.getValues(spark, "raw", params(
        "tag_name" -> "tag1",
        "start_time" -> "1690000000", "end_time" -> "1800000000",
        "date_format" -> "ns"))
      assert(raw.status == 200, raw.body)
      val rawRows = json(raw.body).asInstanceOf[collection.Map[String, Any]]("data")
        .asInstanceOf[collection.Map[String, Any]]("samples")
        .asInstanceOf[collection.Seq[Any]].head
        .asInstanceOf[collection.Map[String, Any]]("data")
        .asInstanceOf[collection.Seq[Any]]
        .map(_.asInstanceOf[collection.Map[String, Any]])
      assert(rawRows.length == 4, rawRows)
      // the two default-append rows share testTimeTick; values 11.11 and
      // the omitted-Val default 0 both land there
      assert(rawRows.filter(_("TIME") == tick).map(_("VALUE")).toSet ==
        Set(11.11, 0.0), rawRows)

      // tag list door
      val tags = LakeDoor.getTagList(spark, Map.empty)
      assert(tags.status == 200)
      assert(tags.body.contains(""""name":"TAG1""""), tags.body)

      // last + stat + current + group + pivoted smoke over the same table
      val last = LakeDoor.getValues(spark, "last", params(
        "tag_name" -> "tag1", "calc_mode" -> "last",
        "start_time" -> "1690000000", "end_time" -> "1800000000"))
      assert(last.status == 200 && last.body.contains(""""calc_mode":"LAST""""), last.body)

      val stat = LakeDoor.getValues(spark, "stat", params("tag_name" -> "tag1"))
      assert(stat.status == 200 && stat.body.contains("ROW_COUNT"), stat.body)

      val group = LakeDoor.getValues(spark, "group", params(
        "tag_name" -> "tag1", "calc_mode" -> "sum",
        "start_time" -> "1690000000", "end_time" -> "1800000000"))
      assert(group.status == 200, group.body)

      val piv = LakeDoor.getValues(spark, "pivoted", params(
        "tag_name" -> "tag1", "calc_mode" -> "avg",
        "start_time" -> "1690000000", "end_time" -> "1800000000"))
      assert(piv.status == 200 && piv.body.contains(""""tag1""""), piv.body)

      // exec query shim (three-column name/time/value contract)
      val exec = LakeDoor.execQuery(spark, """{"query":"select name, time, value from tag"}""")
      assert(exec.status == 200 && exec.body.contains(""""error_code":0"""), exec.body)
    } finally QueryDoor.execute(spark, "drop table tag cascade")
  }

  test("lake door is live over the loopback HTTP edge") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      """create tag table tag (name varchar(200) primary key,
        |time datetime basetime, value double summarized)""".stripMargin)
    try {
      val port = graft.server.HttpLoop.ensureServer(spark)
      val client = java.net.http.HttpClient.newHttpClient()
      def send(method: String, path: String, body: String = ""): (Int, String) = {
        val b = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port$path"))
        val req = (if (method == "GET") b.GET()
          else b.method(method, java.net.http.HttpRequest.BodyPublishers.ofString(body)))
          .build()
        val rsp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        (rsp.statusCode(), rsp.body())
      }
      val (ac, ab) = send("POST", "/lakes/values",
        s"""{"values":[{"Tag":"wire1","Ts":$tick,"Val":1.5}]}""")
      assert(ac == 200 && ab.contains(""""success":1"""), ab)
      val (tc, tb) = send("GET", "/lakes/tags?limit=10")
      assert(tc == 200 && tb.contains(""""name":"WIRE1""""), tb)
      val (rc, rb) = send("GET",
        "/lakes/values/raw?tag_name=wire1&start_time=1690000000&end_time=1800000000")
      assert(rc == 200 && rb.contains(""""tag_name":"wire1"""") &&
        rb.contains(""""VALUE":1.5"""), rb)
    } finally QueryDoor.execute(spark, "drop table tag cascade")
  }
}
