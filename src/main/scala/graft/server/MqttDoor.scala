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
      cli.publish(reply, out.getBytes("UTF-8"))
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

  /** One request → (reply topic, encoded payload). Failures return the
    * JSON error envelope like the reference's deferred responder. */
  private[server] def serve(spark: SparkSession, body: String): (String, String) = {
    var reply = "db/reply"
    val out =
      try {
        val req = graft.script.Builtins.jsonParse(body) match {
          case m: scala.collection.Map[_, _] =>
            m.asInstanceOf[scala.collection.Map[String, Any]]
          case _ => throw new IllegalArgumentException("invalid query request")
        }
        req.get("reply").collect { case s: String if s.nonEmpty => s }
          .foreach(reply = _)
        val q = req.get("q").collect { case s: String => s }.getOrElse(
          throw new IllegalArgumentException("empty sql"))
        val format = req.get("format").collect { case s: String => s }
          .getOrElse("json").toUpperCase
        var opts = graft.sinks.Codecs.Options()
        req.get("timeformat").collect { case s: String => s }.foreach { f =>
          opts = opts.copy(timeformat = Some(f.toLowerCase match {
            case "s" | "ms" | "us" | "ns" => f.toLowerCase
            case "default" => "yyyy-MM-dd HH:mm:ss"
            case other => graft.time.TimeFns.translateTimeformat(other)
          }))
        }
        req.get("tz").collect { case s: String => s }.foreach(z =>
          opts = opts.copy(tz = graft.time.TimeFns.resolveTz(z)))
        req.get("rowsFlatten").collect { case b: Boolean => b }.foreach(b =>
          opts = opts.copy(rowsFlatten = b))
        QueryDoor.query(spark, q, format, opts)
      } catch {
        case e: Exception =>
          val msg = Option(e.getMessage).getOrElse(e.toString)
          s"""{"success":false,"reason":${graft.sinks.GoJs.quote(msg)},"elapse":"0s"}"""
      }
    (reply, out)
  }
}
