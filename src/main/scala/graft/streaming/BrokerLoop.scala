package graft.streaming

import java.io.{InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.CopyOnWriteArrayList

/** Loopback-only MQTT 3.1.1 and NATS broker doubles with minimal
  * clients — the socket edge of the subscriber surface (reference
  * `mods/scheduler/sched_subs.go` dials external brokers via
  * paho.mqtt / nats.go; `mods/bridge/mqtt.go`, `nats.go`).
  *
  * This container has no broker and zero egress, so a protocol-real
  * in-JVM broker bound to 127.0.0.1 closes the edge: real CONNECT /
  * SUBSCRIBE / PUBLISH control packets (remaining-length varints,
  * topic-filter wildcards) and real INFO / SUB / PUB / MSG / PING
  * frames flow over real TCP into the same [[Subscribers.Dispatcher]]
  * the file-queue stand-in drives. On a deployed cluster the client
  * side would dial the external broker instead — same bytes. Clients
  * REFUSE non-loopback hosts, mirroring HttpLoop's egress policy.
  */
object BrokerLoop {

  private def requireLoopback(host: String): Unit = {
    val ok =
      try InetAddress.getByName(host).isLoopbackAddress
      catch { case _: java.net.UnknownHostException => false } // zero egress: unresolvable = refused
    require(ok, s"non-loopback broker host refused: $host")
  }

  private def spawn(name: String)(body: => Unit): Thread = {
    val t = new Thread(() => try body catch { case _: Throwable => () }, name)
    t.setDaemon(true); t.start(); t
  }

  // ======================= MQTT 3.1.1 ===================================

  /** MQTT topic-filter match: `+` one level, `#` the rest (spec 4.7). */
  def mqttTopicMatches(filter: String, topic: String): Boolean = {
    val f = filter.split("/", -1); val t = topic.split("/", -1)
    def go(i: Int, j: Int): Boolean =
      if (i == f.length) j == t.length
      else f(i) match {
        case "#" => true
        case "+" => j < t.length && go(i + 1, j + 1)
        case seg => j < t.length && seg == t(j) && go(i + 1, j + 1)
      }
    go(0, 0)
  }

  private def writeVarint(out: OutputStream, n0: Int): Unit = {
    var n = n0
    do {
      var d = n % 128; n /= 128
      if (n > 0) d |= 0x80
      out.write(d)
    } while (n > 0)
  }

  private def readVarint(in: InputStream): Int = {
    var mult = 1; var value = 0; var d = 0
    do {
      d = in.read()
      if (d < 0) throw new java.io.EOFException("mqtt: eof in varint")
      value += (d & 0x7F) * mult
      mult *= 128
    } while ((d & 0x80) != 0)
    value
  }

  private def mqttPacket(tpe: Int, body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(tpe)
    writeVarint(bos, body.length)
    bos.write(body)
    bos.toByteArray
  }

  private def u16(n: Int): Array[Byte] =
    Array(((n >> 8) & 0xFF).toByte, (n & 0xFF).toByte)

  private def lenPrefixed(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8); u16(b.length) ++ b
  }

  private def publishPacket(topic: String, payload: Array[Byte]): Array[Byte] =
    mqttPacket(0x30, lenPrefixed(topic) ++ payload) // QoS 0, no packet id

  /** In-JVM MQTT broker on 127.0.0.1:ephemeral. QoS 0, clean session. */
  final class MqttBroker {
    private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    private final case class Sub(filter: String, out: OutputStream)
    private val subs = new CopyOnWriteArrayList[Sub]()
    @volatile private var open = true

    spawn("mqtt-broker-accept") {
      while (open) {
        val sock = server.accept()
        spawn(s"mqtt-broker-conn-${sock.getPort}")(connLoop(sock))
      }
    }

    private def connLoop(sock: Socket): Unit = {
      val in = sock.getInputStream
      val out = sock.getOutputStream
      try {
        var live = true
        while (live) {
          val h = in.read()
          if (h < 0) live = false
          else {
            val len = readVarint(in)
            val body = in.readNBytes(len)
            (h >> 4) match {
              case 1 => // CONNECT → CONNACK (accepted, no session present)
                out.write(Array[Byte](0x20, 2, 0, 0)); out.flush()
              case 8 => // SUBSCRIBE → register filters, SUBACK granted QoS 0
                val packetId = ((body(0) & 0xFF) << 8) | (body(1) & 0xFF)
                var at = 2
                val granted = Array.newBuilder[Byte]
                while (at < body.length) {
                  val flen = ((body(at) & 0xFF) << 8) | (body(at + 1) & 0xFF)
                  val filter = new String(body, at + 2, flen, UTF_8)
                  at += 2 + flen + 1 // + requested QoS byte
                  subs.add(Sub(filter, out))
                  granted += 0
                }
                out.write(mqttPacket(0x90, u16(packetId) ++ granted.result()))
                out.flush()
              case 3 => // PUBLISH (QoS 0) → route to matching subscribers
                val tlen = ((body(0) & 0xFF) << 8) | (body(1) & 0xFF)
                val topic = new String(body, 2, tlen, UTF_8)
                val payload = body.drop(2 + tlen)
                val pkt = publishPacket(topic, payload)
                subs.forEach { s =>
                  if (mqttTopicMatches(s.filter, topic))
                    try { s.out.write(pkt); s.out.flush() }
                    catch { case _: Exception => () }
                }
              case 12 => out.write(Array[Byte](0xD0.toByte, 0)); out.flush() // PINGREQ
              case 14 => live = false // DISCONNECT
              case _ => ()
            }
          }
        }
      } catch { case _: Exception => () }
      finally { try sock.close() catch { case _: Exception => () } }
    }

    def close(): Unit = { open = false; try server.close() catch { case _: Exception => () } }
  }

  /** Minimal MQTT client: CONNECT handshake, QoS-0 subscribe with a
    * delivery callback, QoS-0 publish. Loopback hosts only. */
  final class MqttClient(host: String, port: Int, clientId: String) {
    requireLoopback(host)
    private val sock = new Socket(InetAddress.getByName(host), port)
    private val in = sock.getInputStream
    private val out = sock.getOutputStream
    private val cbs = new CopyOnWriteArrayList[(String, (String, Array[Byte]) => Unit)]()
    private val readerOn = new java.util.concurrent.atomic.AtomicBoolean(false)

    // CONNECT: protocol "MQTT" level 4, clean session, keepalive 60
    out.write(mqttPacket(0x10,
      lenPrefixed("MQTT") ++ Array[Byte](4, 2) ++ u16(60) ++ lenPrefixed(clientId)))
    out.flush()
    private val ack = in.readNBytes(4) // CONNACK
    require(ack.length == 4 && (ack(0) & 0xFF) == 0x20 && ack(3) == 0,
      "mqtt connect refused")

    /** Subscribe; deliveries run on the (single) reader thread — every
      * matching subscription's callback fires, like a broker delivering
      * once per matching subscription. */
    def subscribe(filter: String)(fn: (String, Array[Byte]) => Unit): Unit = {
      cbs.add(filter -> fn)
      out.write(mqttPacket(0x82, u16(1) ++ lenPrefixed(filter) :+ 0.toByte))
      out.flush()
      if (readerOn.compareAndSet(false, true))
        spawn(s"mqtt-client-read-$clientId") {
          var live = true
          while (live) {
            val h = in.read()
            if (h < 0) live = false
            else {
              val body = in.readNBytes(readVarint(in))
              if ((h >> 4) == 3) {
                val tlen = ((body(0) & 0xFF) << 8) | (body(1) & 0xFF)
                val topic = new String(body, 2, tlen, UTF_8)
                val payload = body.drop(2 + tlen)
                cbs.forEach { case (f, fn) =>
                  if (mqttTopicMatches(f, topic))
                    try fn(topic, payload) catch { case _: Exception => () }
                }
              }
            }
          }
        }
    }

    def publish(topic: String, payload: Array[Byte]): Unit = {
      out.write(publishPacket(topic, payload)); out.flush()
    }

    def close(): Unit = {
      try { out.write(Array[Byte](0xE0.toByte, 0)); out.flush() } catch { case _: Exception => () }
      try sock.close() catch { case _: Exception => () }
    }
  }

  // ============================ NATS ====================================

  /** NATS subject match: tokens on '.', `*` one token, `>` the tail. */
  def natsSubjectMatches(pattern: String, subject: String): Boolean = {
    val p = pattern.split("\\.", -1); val s = subject.split("\\.", -1)
    def go(i: Int, j: Int): Boolean =
      if (i == p.length) j == s.length
      else p(i) match {
        case ">" => j < s.length // full wildcard needs >= 1 remaining token
        case "*" => j < s.length && go(i + 1, j + 1)
        case tok => j < s.length && tok == s(j) && go(i + 1, j + 1)
      }
    go(0, 0)
  }

  private def readCrlfLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c >= 0 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
    if (c < 0 && sb.isEmpty) null else sb.toString
  }

  /** In-JVM NATS server on 127.0.0.1:ephemeral: INFO / CONNECT / PING /
    * SUB / PUB / MSG with queue-group round-robin. */
  final class NatsBroker {
    private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    def port: Int = server.getLocalPort
    private final case class Sub(subject: String, queue: String, sid: String, out: OutputStream)
    private val subs = new CopyOnWriteArrayList[Sub]()
    private val rr = new java.util.concurrent.atomic.AtomicLong()
    @volatile private var open = true

    spawn("nats-broker-accept") {
      while (open) {
        val sock = server.accept()
        spawn(s"nats-broker-conn-${sock.getPort}")(connLoop(sock))
      }
    }

    private def connLoop(sock: Socket): Unit = {
      val in = sock.getInputStream
      val out = sock.getOutputStream
      try {
        out.write("INFO {\"server_id\":\"graft-loop\",\"proto\":1}\r\n".getBytes(UTF_8))
        out.flush()
        var line = readCrlfLine(in)
        while (line != null) {
          val toks = line.trim.split("\\s+").toList
          toks match {
            case verb :: _ if verb.equalsIgnoreCase("CONNECT") => () // fire-and-forget
            case verb :: Nil if verb.equalsIgnoreCase("PING") =>
              out.write("PONG\r\n".getBytes(UTF_8)); out.flush()
            case verb :: subject :: rest if verb.equalsIgnoreCase("SUB") =>
              // SUB <subject> [queue] <sid>
              val (queue, sid) = rest match {
                case q :: s :: Nil => (q, s)
                case s :: Nil => ("", s)
                case _ => ("", "0")
              }
              subs.add(Sub(subject, queue, sid, out))
            case verb :: subject :: rest if verb.equalsIgnoreCase("PUB") =>
              // PUB <subject> [reply-to] <#bytes>\r\n<payload>\r\n
              val nBytes = rest.last.toInt
              val payload = in.readNBytes(nBytes)
              readCrlfLine(in) // trailing CRLF
              route(subject, payload)
            case _ => ()
          }
          line = readCrlfLine(in)
        }
      } catch { case _: Exception => () }
      finally { try sock.close() catch { case _: Exception => () } }
    }

    private def route(subject: String, payload: Array[Byte]): Unit = {
      import scala.jdk.CollectionConverters._
      val matching = subs.asScala.filter(s => natsSubjectMatches(s.subject, subject)).toSeq
      // plain subs all get a copy; each queue group gets exactly one
      val (grouped, plain) = matching.partition(_.queue.nonEmpty)
      val picks = plain ++ grouped.groupBy(_.queue).values.map { g =>
        g((rr.getAndIncrement() % g.size).toInt)
      }
      picks.foreach { s =>
        try {
          s.out.write(s"MSG $subject ${s.sid} ${payload.length}\r\n".getBytes(UTF_8))
          s.out.write(payload); s.out.write("\r\n".getBytes(UTF_8)); s.out.flush()
        } catch { case _: Exception => () }
      }
    }

    def close(): Unit = { open = false; try server.close() catch { case _: Exception => () } }
  }

  /** Minimal NATS client: INFO/CONNECT/PING handshake, SUB with a
    * delivery callback, PUB. Loopback hosts only. */
  final class NatsClient(host: String, port: Int) {
    requireLoopback(host)
    private val sock = new Socket(InetAddress.getByName(host), port)
    private val in = sock.getInputStream
    private val out = sock.getOutputStream
    private val cbs = new java.util.concurrent.ConcurrentHashMap[String, (String, Array[Byte]) => Unit]()
    @volatile private var pong = false

    require(Option(readCrlfLine(in)).exists(_.startsWith("INFO")), "nats: no INFO")
    out.write("CONNECT {\"verbose\":false}\r\nPING\r\n".getBytes(UTF_8)); out.flush()
    require(Option(readCrlfLine(in)).exists(_.startsWith("PONG")), "nats: no PONG")

    spawn(s"nats-client-read-$port") {
      var line = readCrlfLine(in)
      while (line != null) {
        val toks = line.trim.split("\\s+")
        if (toks.nonEmpty && toks(0).equalsIgnoreCase("MSG")) {
          // MSG <subject> <sid> [reply-to] <#bytes>
          val subject = toks(1); val sid = toks(2); val n = toks.last.toInt
          val payload = in.readNBytes(n)
          readCrlfLine(in)
          val cb = cbs.get(sid)
          if (cb != null) cb(subject, payload)
        } else if (toks.nonEmpty && toks(0).equalsIgnoreCase("PING")) {
          out.write("PONG\r\n".getBytes(UTF_8)); out.flush()
        }
        line = readCrlfLine(in)
      }
    }

    def subscribe(subject: String, sid: String, queue: String = "")(
        fn: (String, Array[Byte]) => Unit): Unit = {
      cbs.put(sid, fn)
      val q = if (queue.isEmpty) "" else s" $queue"
      out.write(s"SUB $subject$q $sid\r\n".getBytes(UTF_8)); out.flush()
    }

    def publish(subject: String, payload: Array[Byte]): Unit = {
      out.write(s"PUB $subject ${payload.length}\r\n".getBytes(UTF_8))
      out.write(payload); out.write("\r\n".getBytes(UTF_8)); out.flush()
    }

    def close(): Unit = try sock.close() catch { case _: Exception => () }
  }
}
