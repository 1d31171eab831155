package graft.server

import org.apache.spark.sql.SparkSession
import graft.streaming.BrokerLoop

/** MQTT `db/query` endpoint (reference `mods/server/mqtt_query.go`):
  * a JSON request `{"q": …[, "format", "reply", …]}` published to the
  * `db/query` topic is executed through the same query door as HTTP,
  * and the encoded payload is published to the reply topic — the
  * request's `"reply"` field, else `db/reply` (mqtt.go:46
  * defaultReplyTopic). Attached to the loopback broker double; a
  * deployed cluster attaches the same handler to its real broker. */
object MqttDoor {

  /** Connect a door client to the broker and start serving `db/query`.
    * Returns the client so callers can close it. */
  def attach(spark: SparkSession, host: String, port: Int): BrokerLoop.MqttClient = {
    val cli = new BrokerLoop.MqttClient(host, port, "graft-mqtt-door")
    cli.subscribe("db/query") { (_, payload) =>
      val (reply, out) = serve(spark, new String(payload, "UTF-8"))
      cli.publish(reply, out)
    }
    // write topics (mqtt_write.go): db/write|append/<table>[:fmt[:gzip]];
    // db/metrics/<table> takes InfluxDB line protocol. QoS-0 publishes
    // carry no reply; failures only log, like the reference.
    def ingest(topic: String, prefix: String, payload: Array[Byte]): Unit =
      try {
        val wp = graft.streaming.Subscribers.parseWritePath(topic.stripPrefix(prefix))
          .fold(e => throw new IllegalArgumentException(e), identity)
        val fmt = if (wp.format.isEmpty) "json" else wp.format
        val contentType = if (fmt == "csv") "text/csv" else "application/json"
        val params = if (wp.compress == "gzip") Map("compress" -> "gzip") else Map.empty[String, String]
        WriteDoor.write(spark, wp.table, payload, contentType, params)
      } catch { case e: Exception =>
        graft.tql.TqlLog.log("ERROR", s"mqtt write $topic: ${e.getMessage}")
      }
    cli.subscribe("db/write/#")((t, p) => ingest(t, "db/write/", p))
    cli.subscribe("db/append/#")((t, p) => ingest(t, "db/append/", p))
    cli.subscribe("db/metrics/#") { (topic, payload) =>
      try graft.sources.LineProtocol.writeTo(spark,
        topic.stripPrefix("db/metrics/").toUpperCase, payload)
      catch { case e: Exception =>
        graft.tql.TqlLog.log("ERROR", s"mqtt metrics $topic: ${e.getMessage}")
      }
    }
    cli
  }

  /** One request → (reply topic, encoded payload bytes). The request is
    * the same QueryRequest the HTTP door decodes (mqtt_query.go routes
    * into the shared handler), so the full option surface — format, p
    * binds, tz/timeformat, transpose/rowsFlatten/rowsArray,
    * compress=gzip — behaves identically across doors (mqtt_test.go
    * TestMqttQuery). Failures return the JSON error envelope like the
    * reference's deferred responder, on the requested reply topic. */
  def serveForTest(spark: SparkSession, body: String): (String, Array[Byte]) =
    serve(spark, body)

  private[server] def serve(spark: SparkSession, body: String): (String, Array[Byte]) = {
    var reply = "db/reply"
    try {
      val params = WebApi.decodeJsonBodyParams(body)
      params.get("reply").flatMap(_.headOption).filter(_.nonEmpty)
        .foreach(reply = _)
      val r = WebApi.dbQuery(spark, params - "reply")
      // compress=gzip gzips the reply payload (TestMqttQuery
      // query_simple_format=csv_compress pins the gzipped bytes)
      if (r.status == 200 &&
        params.get("compress").exists(_.headOption.contains("gzip"))) {
        val buf = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(buf)
        gz.write(r.body.getBytes("UTF-8")); gz.close()
        (reply, buf.toByteArray)
      } else (reply, r.body.getBytes("UTF-8"))
    } catch {
      case e: Exception =>
        // a malformed request body still answers on the default (or
        // parsed-so-far) reply topic with the decoder's message
        // (TestMqttQueryFailures query_invalid_json)
        val msg = Option(e.getMessage).getOrElse(e.toString)
        (reply,
          s"""{"success":false,"reason":${graft.sinks.GoJs.quote(msg)},"elapse":"0s"}"""
            .getBytes("UTF-8"))
    }
  }
}
