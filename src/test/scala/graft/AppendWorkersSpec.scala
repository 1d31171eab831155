package graft

import graft.server.{QueryDoor, TagTables}
import graft.streaming.{AppendWorkers, BrokerLoop}

/** Body-level mirror of spi/append_worker_test.go (125-260) — the
  * batched-append worker registry behind the write doors and the TQL
  * APPEND sink (spi/append_worker.go; callers http_write.go:124,
  * mqtt_write.go:385, fm_dbsink.go:191) — plus the MQTT topic ACL
  * table (mqtt_unit_test.go:85-110 TestMqttACLCheck).
  */
class AppendWorkersSpec extends SparkSpec {

  private def q(sql: String) = QueryDoor.execute(spark, sql)

  test("registry stops by lower-case name (TestAppendWorkerRegistryStopsByLowerCaseName :125)") {
    TagTables.resetDynamicForTest(spark)
    AppendWorkers.flush()
    q("create tag table awsensor (name varchar(40) primary key, time datetime basetime, value double)")
    try {
      val w = AppendWorkers.get(spark, "awsensor")
      assert(AppendWorkers.stop("AWSENSOR"))
      assert(w.isClosed)
      assert(AppendWorkers.size == 0)
      assert(!AppendWorkers.stop("awsensor")) // already gone
    } finally q("drop table awsensor")
  }

  test("flush matches names case-insensitively and removes (TestFlushAppendWorkersMatchesNamesCaseInsensitively :149)") {
    TagTables.resetDynamicForTest(spark)
    AppendWorkers.flush()
    q("create tag table awa (name varchar(40) primary key, time datetime basetime, value double)")
    q("create tag table awb (name varchar(40) primary key, time datetime basetime, value double)")
    try {
      val a = AppendWorkers.get(spark, "awa")
      val b = AppendWorkers.get(spark, "awb")
      AppendWorkers.flush("AWA")
      assert(a.isClosed && !b.isClosed)
      assert(AppendWorkers.size == 1)
      AppendWorkers.flush() // no names = all
      assert(b.isClosed && AppendWorkers.size == 0)
    } finally { q("drop table awa"); q("drop table awb") }
  }

  test("get reuses the registered worker case-insensitively (TestGetAppendWorkerReusesRegisteredWorkerCaseInsensitively :176)") {
    TagTables.resetDynamicForTest(spark)
    AppendWorkers.flush()
    q("create tag table awr (name varchar(40) primary key, time datetime basetime, value double)")
    try {
      val w1 = AppendWorkers.get(spark, "awr")
      val w2 = AppendWorkers.get(spark, "AWR")
      assert(w1 eq w2)
    } finally { AppendWorkers.flush(); q("drop table awr") }
  }

  test("WithInputColumns remaps caller order; arity error text exact (TestAppenderWithWorkerMapsInputColumns :191)") {
    TagTables.resetDynamicForTest(spark)
    AppendWorkers.flush()
    q("create tag table awm (name varchar(40) primary key, time datetime basetime, value double)")
    try {
      val w = AppendWorkers.get(spark, "awm")
      // caller order (value, time, name) remaps into table order
      w.withInputColumns("value", "time", "name")
        .append(3.14d, new java.sql.Timestamp(1717286400000L), "temperature")
      w.flush()
      val r = spark.table("awm").collect()
      assert(r.length == 1 && r(0).getString(0) == "temperature" &&
        r(0).getDouble(2) == 3.14d, r.mkString(";"))
      // identity view arity error carries the reference's exact text
      val e = intercept[IllegalArgumentException](
        w.withInputColumns().append("only-name"))
      assert(e.getMessage ==
        "value count 1, table 'awm' requires 3 columns to append", e.getMessage)
    } finally { AppendWorkers.flush(); q("drop table awm") }
  }

  test("AppendLogTime requires a log table (TestAppendWorkerAppendLogTimeRequiresLogTable :202)") {
    TagTables.resetDynamicForTest(spark)
    AppendWorkers.flush()
    // a LOG table accepts the explicit arrival time
    q("create table awlog (name varchar(40), value double)")
    // a TAG table rejects it with the reference's exact message
    q("create tag table awtag (name varchar(40) primary key, time datetime basetime, value double)")
    try {
      val lw = AppendWorkers.get(spark, "awlog")
      lw.appendLogTime(1717286400000000000L, "temperature", 3.14d)
      lw.flush()
      assert(spark.table("awlog").count() == 1)
      val tw = AppendWorkers.get(spark, "awtag")
      val e = intercept[IllegalArgumentException](
        tw.appendLogTime(1717286400000000000L, "t", 1717286400000000000L, 1.0d))
      assert(e.getMessage == "awtag is not a log table, use Append() instead",
        e.getMessage)
    } finally { AppendWorkers.flush(); q("drop table awlog"); q("drop table awtag") }
  }

  test("max-rows triggers a flush without an explicit call (append_worker.go rows/delay gates)") {
    TagTables.resetDynamicForTest(spark)
    AppendWorkers.flush()
    q("create tag table awf (name varchar(40) primary key, time datetime basetime, value double)")
    try {
      val w = AppendWorkers.get(spark, "awf", maxRows = 3, maxDelayMs = 60000L)
      w.append("a", new java.sql.Timestamp(1L), 1.0d)
      w.append("b", new java.sql.Timestamp(2L), 2.0d)
      assert(w.pendingRows == 2 && spark.table("awf").count() == 0)
      w.append("c", new java.sql.Timestamp(3L), 3.0d) // hits maxRows
      assert(w.pendingRows == 0)
      assert(spark.table("awf").count() == 3)
    } finally { AppendWorkers.flush(); q("drop table awf") }
  }

  test("max-delay ticker flushes a quiet worker; closed workers reject (review r15)") {
    TagTables.resetDynamicForTest(spark)
    AppendWorkers.flush()
    q("create tag table awt (name varchar(40) primary key, time datetime basetime, value double)")
    try {
      val w = AppendWorkers.get(spark, "awt", maxRows = 1000, maxDelayMs = 150L)
      w.append("quiet", new java.sql.Timestamp(1L), 1.0d)
      // no further appends: the shared ticker must flush within ~delay
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (spark.table("awt").count() != 1 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(spark.table("awt").count() == 1, "ticker did not flush")
      // a stopped worker rejects instead of buffering into limbo
      AppendWorkers.stop("awt")
      val e = intercept[IllegalStateException](
        w.append("late", new java.sql.Timestamp(2L), 2.0d))
      assert(e.getMessage.contains("closed"), e.getMessage)
    } finally { AppendWorkers.flush(); q("drop table awt") }
  }

  test("input-column view rejects unknown names and arity drift clearly (review r15)") {
    TagTables.resetDynamicForTest(spark)
    AppendWorkers.flush()
    q("create tag table awv (name varchar(40) primary key, time datetime basetime, value double)")
    try {
      val w = AppendWorkers.get(spark, "awv")
      // the Go form would panic on Idx=-1; here a clear rejection
      val e1 = intercept[IllegalArgumentException](
        w.withInputColumns("vaule", "time", "name")) // typo'd 'value'
      assert(e1.getMessage.contains("unknown input column"), e1.getMessage)
      // arity error names the DECLARED input-column count
      val e2 = intercept[IllegalArgumentException](
        w.withInputColumns("name", "time").append(1, 2, 3))
      assert(e2.getMessage ==
        "value count 3, 2 input columns declared for table 'awv'", e2.getMessage)
    } finally { AppendWorkers.flush(); q("drop table awv") }
  }

  test("the reference ACL leak is reproduced, not hardened: '#' subscribe passes (mqtt.go:280-283)") {
    import BrokerLoop.aclCheck
    // only the literal db/# filter is denied — # and db/+ pass, exactly
    // like the reference's prefix test
    assert(aclCheck("#", write = false))
    assert(aclCheck("db/+", write = false))
    assert(!aclCheck("db/#", write = false))
  }

  test("mqtt topic ACL table (mqtt_unit_test.go:85-110 TestMqttACLCheck)") {
    import BrokerLoop.aclCheck
    assert(!aclCheck("db/query", write = false))          // deny_subscribe_query
    assert(!aclCheck("db/reply/abc", write = true))       // deny_publish_reply
    assert(!aclCheck("db/tql/script.tql", write = false)) // deny_subscribe_tql
    assert(!aclCheck("db", write = true))                 // deny_root_topic
    assert(!aclCheck("db/#", write = false))              // deny_wildcard_subscribe
    assert(!aclCheck("$SYS/broker/load", write = true))   // deny_publish_sys
    assert(aclCheck("db/query", write = true))            // allow_write_query
    assert(aclCheck("db/reply/custom", write = false))    // allow_normal_subscribe
    // $SYS publish denies even with restrictTopics off (mqtt.go:287-290)
    assert(!aclCheck("$SYS/x", write = true, restrictTopics = false))
    assert(aclCheck("db/query", write = false, restrictTopics = false))
  }

  test("restricted broker denies ACL'd subscribes and publishes end-to-end") {
    val broker = new BrokerLoop.MqttBroker(restrictTopics = true)
    val cli = new BrokerLoop.MqttClient("127.0.0.1", broker.port, "acl-test")
    val got = new java.util.concurrent.LinkedBlockingQueue[String]()
    // an allowed subscribe still works
    cli.subscribe("ok/topic")((_, p) => got.put(new String(p, "UTF-8")))
    // a denied subscribe registers nothing: a later publish to db/query
    // (allowed, write) must not reach it
    cli.subscribe("db/query")((_, p) => got.put("LEAK:" + new String(p, "UTF-8")))
    Thread.sleep(50)
    cli.publish("db/query", "q".getBytes("UTF-8"))
    cli.publish("ok/topic", "fine".getBytes("UTF-8"))
    val first = got.poll(5, java.util.concurrent.TimeUnit.SECONDS)
    assert(first == "fine", s"$first")
    // a denied publish (db/reply write) is dropped by the broker
    val got2 = new java.util.concurrent.LinkedBlockingQueue[String]()
    cli.subscribe("db/reply/#")((_, p) => got2.put(new String(p, "UTF-8")))
    Thread.sleep(50)
    cli.publish("db/reply/x", "nope".getBytes("UTF-8"))
    assert(got2.poll(300, java.util.concurrent.TimeUnit.MILLISECONDS) == null)
    cli.close(); broker.close()
  }
}
