package graft

import graft.scheduler.Timers
import graft.streaming.BrokerLoop
import graft.streaming.Subscribers.Dispatcher
import graft.server.{QueryDoor, TagTables}
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** MQTT/NATS subscriber surface over REAL loopback sockets: in-JVM
  * brokers speaking the wire protocols (mqtt 3.1.1 control packets,
  * nats text frames) deliver into the same Dispatcher the reference's
  * sched_subs.go drives per broker message. */
class BrokerLoopSpec extends SparkSpec {

  test("mqtt topic filters: + and # wildcards (spec 4.7)") {
    import BrokerLoop.mqttTopicMatches
    assert(mqttTopicMatches("sensor/#", "sensor/a/b"))
    assert(mqttTopicMatches("sensor/#", "sensor"))
    assert(mqttTopicMatches("sensor/+/temp", "sensor/x/temp"))
    assert(!mqttTopicMatches("sensor/+/temp", "sensor/x/y/temp"))
    assert(!mqttTopicMatches("sensor/+", "sensor"))
    assert(mqttTopicMatches("a/b", "a/b") && !mqttTopicMatches("a/b", "a/c"))
  }

  test("nats subjects: * and > wildcards") {
    import BrokerLoop.natsSubjectMatches
    assert(natsSubjectMatches("metrics.>", "metrics.cpu.core0"))
    assert(natsSubjectMatches("metrics.*", "metrics.cpu"))
    assert(!natsSubjectMatches("metrics.*", "metrics.cpu.core0"))
    assert(!natsSubjectMatches("metrics.>", "metrics"))
    assert(natsSubjectMatches("a.b", "a.b") && !natsSubjectMatches("a.b", "a.c"))
  }

  test("non-loopback broker hosts are refused (egress policy)") {
    val e = intercept[IllegalArgumentException](
      new BrokerLoop.MqttClient("10.1.2.3", 1883, "x"))
    assert(e.getMessage.contains("non-loopback broker host refused"))
    val e2 = intercept[IllegalArgumentException](
      new BrokerLoop.NatsClient("example.com", 4222))
    assert(e2.getMessage.contains("non-loopback") ||
      e2.getMessage.contains("refused") || e2.isInstanceOf[IllegalArgumentException])
  }

  test("mqtt end-to-end: subscriber dispatches broker messages into a tag table") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table mq_sink (name varchar(40) primary key, time datetime basetime, value double summarized)")
    val svc = new Timers.Service(() => spark, (_: String) => Left("unused"))
    svc.register(Timers.ScheduleDef("mq_sub", "subscriber", autoStart = false,
      task = "db/write/mq_sink", bridge = "mqtt-loop", topic = "sensor/#"))
    val ent = svc.getEntry("mq_sub").get.asInstanceOf[Timers.BaseEntry]
    val disp = new Dispatcher(spark, (_: String) => Left("unused"), ent,
      "db/write/mq_sink?timeformat=s")

    val broker = new BrokerLoop.MqttBroker
    val subCli = new BrokerLoop.MqttClient("127.0.0.1", broker.port, "graft-sub")
    val done = new CountDownLatch(2)
    val reasons = new java.util.concurrent.CopyOnWriteArrayList[String]()
    subCli.subscribe("sensor/#") { (topic, payload) =>
      val r = disp.dispatchMqtt(topic, payload, msgId = 1, dup = false, retain = false)
      reasons.add(r.reason); done.countDown()
    }
    Thread.sleep(50) // let SUBSCRIBE register before publishing

    val pubCli = new BrokerLoop.MqttClient("127.0.0.1", broker.port, "graft-pub")
    pubCli.publish("sensor/a",
      """{"data":{"columns":["name","time","value"],"rows":[["m.1",1705291859,1.5]]}}""".getBytes("UTF-8"))
    pubCli.publish("sensor/b",
      """{"data":{"columns":["name","time","value"],"rows":[["m.2",1705291860,2.5],["m.3",1705291861,3.5]]}}""".getBytes("UTF-8"))
    assert(done.await(20, TimeUnit.SECONDS), "mqtt deliveries timed out")
    // scheduler subscriber reply shape (sched_subs.go:479-484)
    assert(reasons.size == 2 &&
      reasons.toArray.map(_.toString).toSet ==
        Set("1 record inserted", "2 records inserted"), reasons)
    assert(spark.table("mq_sink").count() == 3)
    // off-filter topic is NOT delivered
    pubCli.publish("other/x", "junk".getBytes("UTF-8"))
    Thread.sleep(100)
    assert(spark.table("mq_sink").count() == 3)
    pubCli.close(); subCli.close(); broker.close()
    TagTables.resetDynamicForTest(spark)
  }

  test("mqtt db/query endpoint replies on db/reply (mqtt_test.go TestMqttQuery)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table example (name varchar(100) primary key, time datetime basetime, value double summarized)")
    QueryDoor.execute(spark,
      "insert into example (name, time, value) values ('temp', 1705291859000000000, 3.14)")

    val broker = new BrokerLoop.MqttBroker
    val door = graft.server.MqttDoor.attach(spark, "127.0.0.1", broker.port)
    val got = new java.util.concurrent.LinkedBlockingQueue[String]()
    val cli = new BrokerLoop.MqttClient("127.0.0.1", broker.port, "graft-q")
    cli.subscribe("db/reply") { (_, payload) => got.put(new String(payload, "UTF-8")) }
    Thread.sleep(50)

    // query_simple: JSON envelope with columns/types/rows
    cli.publish("db/query",
      """{"q": "select * from example where name = 'temp'" }""".getBytes("UTF-8"))
    val rsp = got.poll(20, TimeUnit.SECONDS)
    assert(rsp != null, "no db/reply payload")
    val env = graft.script.Builtins.jsonParse(rsp).asInstanceOf[scala.collection.Map[String, Any]]
    assert(env("success") == true, rsp)
    assert(env("reason") == "success", rsp)
    val data = env("data").asInstanceOf[scala.collection.Map[String, Any]]
    assert(data("columns").asInstanceOf[scala.collection.Seq[Any]].toSeq == Seq("NAME", "TIME", "VALUE"), rsp)
    assert(data("types").asInstanceOf[scala.collection.Seq[Any]].toSeq == Seq("string", "datetime", "double"), rsp)
    val row0 = data("rows").asInstanceOf[scala.collection.Seq[Any]]
      .head.asInstanceOf[scala.collection.Seq[Any]]
    assert(row0.head == "temp" && row0(2) == 3.14, rsp)

    // error envelope: bad SQL reports success=false with a reason
    cli.publish("db/query", """{"q": "select * from missing_t" }""".getBytes("UTF-8"))
    val rsp2 = got.poll(20, TimeUnit.SECONDS)
    val env2 = graft.script.Builtins.jsonParse(rsp2).asInstanceOf[scala.collection.Map[String, Any]]
    assert(env2("success") == false, rsp2)

    // custom reply topic via the request's "reply" field
    val got3 = new java.util.concurrent.LinkedBlockingQueue[String]()
    cli.subscribe("db/reply/me") { (_, payload) => got3.put(new String(payload, "UTF-8")) }
    Thread.sleep(50)
    cli.publish("db/query",
      """{"q": "select count(*) as CNT from example", "reply": "db/reply/me", "format": "csv" }""".getBytes("UTF-8"))
    val rsp3 = got3.poll(20, TimeUnit.SECONDS)
    assert(rsp3 != null && rsp3.trim.endsWith("1"), s"csv reply: $rsp3")

    cli.close(); door.close(); broker.close()
    TagTables.resetDynamicForTest(spark)
  }

  test("mqtt write topics: json/csv/gzip bodies and ILP metrics (mqtt_test.go TestMqttWrite)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table test_mqtt (name varchar(100) primary key, time datetime basetime, value double summarized)")
    val broker = new BrokerLoop.MqttBroker
    val door = graft.server.MqttDoor.attach(spark, "127.0.0.1", broker.port)
    Thread.sleep(50)
    val cli = new BrokerLoop.MqttClient("127.0.0.1", broker.port, "graft-w")

    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    def countWhere(name: String): Long =
      spark.table("test_mqtt").filter(org.apache.spark.sql.functions.col("name") === name).count()
    def await(name: String, n: Long): Unit = {
      val deadline = System.nanoTime() + 20L * 1000000000L
      while (countWhere(name) != n && System.nanoTime() < deadline) Thread.sleep(50)
      assert(countWhere(name) == n, s"$name: ${countWhere(name)} != $n")
    }

    // bare-array JSON, positional columns
    cli.publish("db/write/test_mqtt",
      """[["json1", 1705291859000000000, 1.2345], ["json1", 1705291860000000000, 2.3456]]""".getBytes("UTF-8"))
    await("json1", 2)
    // JSON envelope with explicit columns
    cli.publish("db/write/test_mqtt",
      """{"data":{"columns":["NAME","TIME","VALUE"],"rows":[["json2",1705291861000000000,1.2345],["json2",1705291862000000000,2.3456]]}}""".getBytes("UTF-8"))
    await("json2", 2)
    // CSV via topic suffix
    cli.publish("db/write/test_mqtt:csv",
      "csv1,1705291863000000000,1.2345\ncsv1,1705291864000000000,2.3456".getBytes("UTF-8"))
    await("csv1", 2)
    // gzip'd JSON and CSV via topic suffixes
    cli.publish("db/write/test_mqtt:json:gzip",
      gz("""[["json3", 1705291869000000000, 1.2345], ["json3", 1705291870000000000, 2.3456]]"""))
    await("json3", 2)
    cli.publish("db/write/test_mqtt:csv:gzip",
      gz("csv5,1705291871000000000,1.2345\ncsv5,1705291872000000000,2.3456"))
    await("csv5", 2)
    // line protocol on db/metrics/<table>: name = measurement.field
    cli.publish("db/metrics/test_mqtt",
      "ilp speed=1.2345 1732742196000000000\nilp speed=2.3456 1732742197000000000\n".getBytes("UTF-8"))
    await("ilp.speed", 2)

    cli.close(); door.close(); broker.close()
    TagTables.resetDynamicForTest(spark)
  }

  test("mqtt v5 write reply via user properties (mqtt_test.go:354-430 TestWriteResponse)") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table example (name varchar(100) primary key, time datetime basetime, value double summarized)")
    val broker = new BrokerLoop.MqttBroker
    val door = graft.server.MqttDoor.attach(spark, "127.0.0.1", broker.port)
    Thread.sleep(50)
    val cli = new BrokerLoop.MqttClient("127.0.0.1", broker.port, "mqtt2-test", proto = 5)
    val got = new java.util.concurrent.LinkedBlockingQueue[(String, String)]()
    cli.subscribe("db/reply/#")((t, p) => got.put((t, new String(p, "UTF-8"))))
    Thread.sleep(50)

    // the reference test: CSV row + method/format/reply user properties →
    // WriteResponse JSON on the reply topic
    cli.publish("db/write/example",
      "my-car,1705291859000000000,1.2345".getBytes("UTF-8"),
      BrokerLoop.MqttProps(user = Seq(
        "method" -> "insert", "format" -> "csv", "reply" -> "db/reply/123")))
    val first = got.poll(20, TimeUnit.SECONDS)
    assert(first != null, "no reply received")
    assert(first._1 == "db/reply/123", first._1)
    // envelope shape byte-exact up to the dynamic elapse duration
    assert(first._2.matches(
      """\{"success":true,"reason":"success, 1 record\(s\) inserted","elapse":"[^"]+"\}"""),
      first._2)
    def count(name: String): Long =
      spark.table("example").filter(org.apache.spark.sql.functions.col("name") === name).count()
    assert(count("my-car") == 1)

    // the v5 Response Topic property routes the reply when no user-prop
    // reply is given (mqtt_write.go:76-78)
    cli.publish("db/write/example",
      "rt-car,1705291860000000000,2.5".getBytes("UTF-8"),
      BrokerLoop.MqttProps(responseTopic = "db/reply/rt",
        user = Seq("format" -> "csv")))
    val second = got.poll(20, TimeUnit.SECONDS)
    assert(second != null && second._1 == "db/reply/rt", s"$second")
    assert(second._2.contains(""""success":true"""), second._2)

    // a JSON payload's top-level "reply" field also routes
    // (mqtt_write.go:553-559 extractReplyTo)
    cli.publish("db/write/example",
      """{"reply":"db/reply/json","data":{"columns":["NAME","TIME","VALUE"],"rows":[["js-car",1705291861000000000,3.5]]}}"""
        .getBytes("UTF-8"),
      BrokerLoop.MqttProps(user = Seq("method" -> "insert")))
    val third = got.poll(20, TimeUnit.SECONDS)
    assert(third != null && third._1 == "db/reply/json", s"$third")
    assert(third._2.contains("1 record(s) inserted"), third._2)

    // a failing write reports success=false with the decoder's reason
    cli.publish("db/write/example",
      "{not valid json".getBytes("UTF-8"),
      BrokerLoop.MqttProps(user = Seq("format" -> "json", "reply" -> "db/reply/err")))
    val fourth = got.poll(20, TimeUnit.SECONDS)
    assert(fourth != null && fourth._1 == "db/reply/err", s"$fourth")
    assert(fourth._2.contains(""""success":false"""), fourth._2)

    // method=append routes to the append path, which never replies
    // (mqtt.go:302-318; handleAppend has no reply logic)
    cli.publish("db/write/example",
      "ap-car,1705291862000000000,4.5".getBytes("UTF-8"),
      BrokerLoop.MqttProps(user = Seq(
        "method" -> "append", "format" -> "csv", "reply" -> "db/reply/nope")))
    val deadline = System.nanoTime() + 20L * 1000000000L
    while (count("ap-car") != 1 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(count("ap-car") == 1)
    assert(got.poll(300, TimeUnit.MILLISECONDS) == null, "append path must not reply")

    // a 3.1.1 publisher interoperates: props-less publish still writes
    val cli4 = new BrokerLoop.MqttClient("127.0.0.1", broker.port, "mqtt4-test")
    cli4.publish("db/write/example:csv",
      "v4-car,1705291863000000000,5.5".getBytes("UTF-8"))
    val deadline2 = System.nanoTime() + 20L * 1000000000L
    while (count("v4-car") != 1 && System.nanoTime() < deadline2) Thread.sleep(50)
    assert(count("v4-car") == 1)

    cli4.close(); cli.close(); door.close(); broker.close()
    TagTables.resetDynamicForTest(spark)
  }

  test("nats end-to-end: tql task per MSG with queue-group routing") {
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table nats_sink (name varchar(40) primary key, time datetime basetime, value double summarized)")
    val script =
      """CSV(payload(), header(false),
        |  field(0, stringType(), "name"),
        |  field(1, datetimeType("s"), "time"),
        |  field(2, doubleType(), "value"))
        |INSERT('name', 'time', 'value', table('nats_sink'))
        |""".stripMargin
    val loader: Timers.TqlLoader = (_: String) => Right(script)
    val svc = new Timers.Service(() => spark, loader)
    svc.register(Timers.ScheduleDef("nats_sub", "subscriber", autoStart = false,
      task = "ingest.tql", bridge = "nats-loop", topic = "metrics.>"))
    val ent = svc.getEntry("nats_sub").get.asInstanceOf[Timers.BaseEntry]
    val disp = new Dispatcher(spark, loader, ent, "ingest.tql")

    val broker = new BrokerLoop.NatsBroker
    val subCli = new BrokerLoop.NatsClient("127.0.0.1", broker.port)
    val done = new CountDownLatch(2)
    subCli.subscribe("metrics.>", sid = "1") { (subject, payload) =>
      disp.dispatchNats(subject, payload); done.countDown()
    }
    Thread.sleep(50)

    val pubCli = new BrokerLoop.NatsClient("127.0.0.1", broker.port)
    pubCli.publish("metrics.cpu", "n.1,1705291859,0.25".getBytes("UTF-8"))
    pubCli.publish("metrics.mem", "n.2,1705291860,0.50".getBytes("UTF-8"))
    assert(done.await(20, TimeUnit.SECONDS), "nats deliveries timed out")
    assert(spark.table("nats_sink").count() == 2)

    // queue group: two members, each message goes to exactly one
    val hits = new java.util.concurrent.atomic.AtomicInteger()
    val qDone = new CountDownLatch(4)
    val m1 = new BrokerLoop.NatsClient("127.0.0.1", broker.port)
    val m2 = new BrokerLoop.NatsClient("127.0.0.1", broker.port)
    m1.subscribe("jobs.*", sid = "q1", queue = "workers") { (_, _) =>
      hits.incrementAndGet(); qDone.countDown() }
    m2.subscribe("jobs.*", sid = "q2", queue = "workers") { (_, _) =>
      hits.incrementAndGet(); qDone.countDown() }
    Thread.sleep(50)
    (1 to 4).foreach(i => pubCli.publish(s"jobs.j$i", "x".getBytes("UTF-8")))
    assert(qDone.await(20, TimeUnit.SECONDS), "queue-group deliveries timed out")
    Thread.sleep(100) // any duplicate delivery would land here
    assert(hits.get() == 4, s"queue group delivered ${hits.get()} times for 4 messages")
    Seq(m1, m2, pubCli, subCli).foreach(_.close()); broker.close()
    TagTables.resetDynamicForTest(spark)
  }

  test("mqtt db/query full QueryRequest option surface (mqtt_test.go TestMqttQuery/TestMqttQueryFailures bodies)") {
    import graft.server.MqttDoor
    val tick = 1705291859000000000L
    TagTables.resetDynamicForTest(spark)
    QueryDoor.execute(spark,
      "create tag table example (name varchar(100) primary key, time datetime basetime, value double summarized)")
    QueryDoor.execute(spark,
      s"insert into example (name, time, value) values ('temp', $tick, 3.14)")
    try {
      def serve(body: String): (String, String) = {
        val (topic, out) = MqttDoor.serveForTest(spark, body)
        (topic, new String(out, "UTF-8"))
      }
      def serveRaw(body: String): (String, Array[Byte]) =
        MqttDoor.serveForTest(spark, body)
      def noElapse(s: String): String =
        s.replaceAll(""","?"elapse":"[^"]*"""", "")

      // query_simple_timeformat: DEFAULT renders the wall clock in UTC
      val (_, tf) = serve(
        """{"q": "select * from example where name = 'temp'", "format":"json", "tz":"UTC", "timeformat": "DEFAULT" }""")
      assert(noElapse(tf) ==
        """{"data":{"columns":["NAME","TIME","VALUE"],"types":["string","datetime","double"],"rows":[["temp","2024-01-15 04:10:59",3.14]]},"success":true,"reason":"success"}""",
        tf)
      // query_bind_params
      val (_, bp) = serve(
        """{"q": "select * from example where name = ?", "p":["temp"] }""")
      assert(bp.contains(s"""["temp",$tick,3.14]"""), bp)
      // query_bind_params_invalid_nested errors with the Go-typed reason
      val (_, nested) = serve(
        """{"q": "select * from example where name = ?", "p":[["temp"]] }""")
      assert(nested.contains(""""success":false""") &&
        nested.contains("bind parameter must be scalar"), nested)
      // rowsFlatten / transpose / rowsArray ride the same decode
      val (_, fl) = serve(
        """{"q": "select * from example where name = 'temp'", "format":"json", "tz":"UTC", "timeformat": "DEFAULT", "rowsFlatten": true }""")
      assert(fl.contains(""""rows":["temp","2024-01-15 04:10:59",3.14]"""), fl)
      val (_, tr) = serve(
        """{"q": "select * from example where name = 'temp'", "format":"json", "transpose": true }""")
      assert(tr.contains(s""""cols":[["temp"],[$tick],[3.14]]"""), tr)
      val (_, ra) = serve(
        """{"q": "select * from example where name = 'temp'", "format":"json", "tz":"UTC", "timeformat": "DEFAULT", "rowsArray": true }""")
      assert(ra.contains(
        """"rows":[{"NAME":"temp","TIME":"2024-01-15 04:10:59","VALUE":3.14}]"""), ra)
      // csv with custom reply topic
      val (topic, csvOut) = serve(
        """{"q": "select * from example where name = 'temp'", "format": "csv", "reply":"db/reply/123" }""")
      assert(topic == "db/reply/123", topic)
      assert(csvOut == s"NAME,TIME,VALUE\ntemp,$tick,3.14\n\n", csvOut)
      // compress=gzip publishes the gzipped CSV bytes
      val (_, gzBytes) = serveRaw(
        """{"q": "select * from example where name = 'temp'", "format": "csv", "compress":"gzip" }""")
      val gin = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gzBytes))
      assert(new String(gin.readAllBytes(), "UTF-8") ==
        s"NAME,TIME,VALUE\ntemp,$tick,3.14\n\n")
      // csv timeformat DEFAULT
      val (_, csvTf) = serve(
        """{"q": "select * from example where name = 'temp'", "format": "csv", "tz": "UTC", "timeformat": "DEFAULT" }""")
      assert(csvTf == "NAME,TIME,VALUE\ntemp,2024-01-15 04:10:59,3.14\n\n", csvTf)
      // failures: invalid JSON answers the default topic with the decoder
      // message; invalid tz answers the REQUESTED topic
      val (ft, fj) = serve("""{"q":""")
      assert(ft == "db/reply" && fj.contains(""""success":false"""), s"$ft $fj")
      val (ft2, fz) = serve(
        """{"q":"select 1","tz":"Invalid/Zone","reply":"db/reply/query-failure"}""")
      assert(ft2 == "db/reply/query-failure" &&
        fz.contains("unknown time zone"), s"$ft2 $fz")
      // a DDL statement replies the bare envelope without data
      val (ft3, ddl) = serve(
        """{"q":"create tag table mqtt_query_exec (name varchar(20) primary key, time datetime basetime, value double)","reply":"db/reply/query-exec"}""")
      assert(ft3 == "db/reply/query-exec", ft3)
      assert(ddl.contains(""""success":true""") && !ddl.contains(""""data""""), ddl)
      QueryDoor.execute(spark, "drop table mqtt_query_exec")
    } finally {
      QueryDoor.execute(spark, "drop table example")
      TagTables.resetDynamicForTest(spark)
    }
  }
}
