package graft.server

import java.io.{EOFException, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable
import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

import org.apache.spark.sql.SparkSession

import graft.script.Builtins

/** The console WebSocket door (reference mods/server/http_ws.go:1-235)
  * over real loopback TCP: RFC 6455 framing + upgrade handshake, the
  * binary-frame `WsReadWriter`, and the `WebConsole` event pump with the
  * reference's log coalescing / flush-period / force-flush semantics and
  * its ping + JSON-RPC frame handling (eventbus event wire shapes from
  * mods/eventbus/eventbus.go:13-108).
  *
  * Spark-first note: the console is driver-side plumbing — it never holds
  * query results, only eventbus-sized log/rpc frames, so there is nothing
  * to distribute; queries launched through rpc run on the shared session.
  */
object WsConsole {

  // ---- RFC 6455 handshake ----------------------------------------------

  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  def acceptKey(key: String): String = {
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest((key + WsGuid).getBytes(UTF_8))
    java.util.Base64.getEncoder.encodeToString(sha)
  }

  private def readHttpHead(in: InputStream): Seq[String] = {
    val sb = new StringBuilder
    var done = false
    while (!done) {
      val c = in.read()
      if (c < 0) throw new EOFException("connection closed during handshake")
      sb.append(c.toChar)
      if (c == '\n' && sb.length >= 4 &&
        sb.substring(sb.length - 4) == "\r\n\r\n") done = true
    }
    sb.toString.split("\r\n").toSeq.filter(_.nonEmpty)
  }

  /** Server side: read the upgrade request, reply 101. */
  def serverHandshake(sock: Socket): Unit = {
    val head = readHttpHead(sock.getInputStream)
    val key = head.collectFirst {
      case h if h.toLowerCase.startsWith("sec-websocket-key:") =>
        h.substring(h.indexOf(':') + 1).trim
    }.getOrElse(throw new IllegalArgumentException("missing Sec-WebSocket-Key"))
    val out = sock.getOutputStream
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
    out.flush()
  }

  /** Client side: send the upgrade request, verify the accept. */
  def clientHandshake(sock: Socket, path: String): Unit = {
    val keyBytes = new Array[Byte](16)
    new java.util.Random(sock.getLocalPort.toLong).nextBytes(keyBytes)
    val key = java.util.Base64.getEncoder.encodeToString(keyBytes)
    val out = sock.getOutputStream
    out.write((s"GET $path HTTP/1.1\r\n" +
      s"Host: 127.0.0.1:${sock.getPort}\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Key: $key\r\nSec-WebSocket-Version: 13\r\n\r\n").getBytes(UTF_8))
    out.flush()
    val head = readHttpHead(sock.getInputStream)
    require(head.headOption.exists(_.contains("101")), s"upgrade refused: ${head.headOption}")
    val accept = head.collectFirst {
      case h if h.toLowerCase.startsWith("sec-websocket-accept:") =>
        h.substring(h.indexOf(':') + 1).trim
    }
    require(accept.contains(acceptKey(key)), "bad Sec-WebSocket-Accept")
  }

  // ---- framing ----------------------------------------------------------

  object Opcode {
    val Text = 0x1; val Binary = 0x2; val Close = 0x8
    val Ping = 0x9; val Pong = 0xA
  }

  final class CloseException extends EOFException("websocket: close frame")

  /** One websocket connection. Client-role connections mask their frames
    * (RFC 6455 §5.3); server-role connections send unmasked. */
  final class WsConn(val sock: Socket, clientRole: Boolean) {
    private val in = sock.getInputStream
    private val out = sock.getOutputStream
    private val rnd = new java.util.Random(7)
    private val writeLock = new Object

    def close(): Unit = try sock.close() catch { case _: Exception => () }
    def isClosed: Boolean = sock.isClosed

    def writeMessage(opcode: Int, payload: Array[Byte]): Unit = writeLock.synchronized {
      val b = new java.io.ByteArrayOutputStream
      b.write(0x80 | (opcode & 0x0F)) // FIN + opcode
      val maskBit = if (clientRole) 0x80 else 0
      val n = payload.length
      if (n < 126) b.write(maskBit | n)
      else if (n < 65536) {
        b.write(maskBit | 126); b.write(n >> 8); b.write(n & 0xFF)
      } else {
        b.write(maskBit | 127)
        var i = 7
        while (i >= 0) { b.write(((n.toLong >> (8 * i)) & 0xFF).toInt); i -= 1 }
      }
      if (clientRole) {
        val mask = new Array[Byte](4); rnd.nextBytes(mask)
        b.write(mask)
        val masked = payload.clone()
        var i = 0
        while (i < masked.length) { masked(i) = (masked(i) ^ mask(i % 4)).toByte; i += 1 }
        b.write(masked)
      } else b.write(payload)
      out.write(b.toByteArray); out.flush()
    }

    private def readN(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new EOFException("websocket: connection closed")
        off += r
      }
      buf
    }

    /** Reads one complete (possibly fragmented) message; control Close
      * frames raise [[CloseException]]; Pings are answered inline. */
    def readMessage(): (Int, Array[Byte]) = {
      var opcode = -1
      val acc = new java.io.ByteArrayOutputStream
      var fin = false
      while (!fin) {
        val b0 = in.read()
        if (b0 < 0) throw new EOFException("websocket: connection closed")
        fin = (b0 & 0x80) != 0
        val op = b0 & 0x0F
        val b1 = in.read()
        if (b1 < 0) throw new EOFException("websocket: connection closed")
        val masked = (b1 & 0x80) != 0
        var len: Long = b1 & 0x7F
        if (len == 126) {
          val ext = readN(2)
          len = ((ext(0) & 0xFF) << 8) | (ext(1) & 0xFF)
        } else if (len == 127) {
          val ext = readN(8)
          len = ext.foldLeft(0L)((a, x) => (a << 8) | (x & 0xFF))
        }
        val mask = if (masked) readN(4) else null
        val payload = readN(len.toInt)
        if (masked) {
          var i = 0
          while (i < payload.length) { payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
        }
        op match {
          case Opcode.Close => throw new CloseException
          case Opcode.Ping => writeMessage(Opcode.Pong, payload)
          case Opcode.Pong => () // ignore
          case _ =>
            if (opcode < 0 && op != 0) opcode = op
            acc.write(payload)
        }
      }
      (if (opcode < 0) Opcode.Binary else opcode, acc.toByteArray)
    }

    def writeJson(json: String): Unit = writeMessage(Opcode.Text, json.getBytes(UTF_8))
    def readJson(): LinkedHashMap[String, Any] = {
      var m: LinkedHashMap[String, Any] = null
      while (m == null) {
        val (op, payload) = readMessage()
        if (op == Opcode.Text)
          Builtins.jsonParse(new String(payload, UTF_8)) match {
            case v: LinkedHashMap[_, _] => m = v.asInstanceOf[LinkedHashMap[String, Any]]
            case _ => ()
          }
      }
      m
    }
  }

  /** Binary-frame io.Reader/io.Writer over a websocket (reference
    * WsReadWriter, pinned by http_ws_test.go:68-145): reads continue
    * across frame boundaries, writes emit one binary frame each. */
  final class WsReadWriter(val conn: WsConn) {
    private var buf: Array[Byte] = Array.emptyByteArray
    private var pos = 0

    /** Fills dst from the current frame, pulling the next frame on
      * exhaustion; returns bytes read; throws on connection errors. */
    def read(dst: Array[Byte]): Int = {
      if (pos >= buf.length) {
        val (_, payload) = conn.readMessage()
        buf = payload; pos = 0
      }
      val n = math.min(dst.length, buf.length - pos)
      System.arraycopy(buf, pos, dst, 0, n)
      pos += n
      n
    }

    def write(payload: Array[Byte]): Int = {
      conn.writeMessage(Opcode.Binary, payload)
      payload.length
    }
  }

  // ---- eventbus events (mods/eventbus/eventbus.go) ----------------------

  object Event {
    val Ping = "ping"; val Log = "log"; val OpenFile = "open_file"
    val RpcReq = "rpc_req"; val RpcRsp = "rpc_rsp"

    def newLog(level: String, message: String): LinkedHashMap[String, Any] =
      LinkedHashMap[String, Any]("type" -> Log,
        "log" -> LinkedHashMap[String, Any](
          "timestamp" -> System.nanoTime(), "level" -> level, "message" -> message))

    def newOpenFile(path: String): LinkedHashMap[String, Any] =
      LinkedHashMap[String, Any]("type" -> OpenFile,
        "open_file" -> LinkedHashMap[String, Any]("path" -> path))

    def newPing(tick: Long): LinkedHashMap[String, Any] =
      LinkedHashMap[String, Any]("type" -> Ping,
        "ping" -> LinkedHashMap[String, Any]("tick" -> tick))
  }

  /** One console session (reference WebConsole, http_ws.go:25-190).
    * `send(null)` is the periodic flush tick; repeated log messages
    * coalesce into a `repeat` count; non-log events flush immediately;
    * a write failure closes the console. */
  final class WebConsole(conn: WsConn, spark: SparkSession,
                         var flushPeriodMs: Long = 300) {
    private[graft] val messages = ArrayBuffer.empty[LinkedHashMap[String, Any]]
    private[graft] var lastFlushTime: Long = System.currentTimeMillis()
    val closed = new AtomicBoolean(false)
    private val lock = new Object

    def close(): Unit = if (closed.compareAndSet(false, true)) conn.close()

    private def logOf(evt: LinkedHashMap[String, Any]): LinkedHashMap[String, Any] =
      evt.get("log") match {
        case Some(m: LinkedHashMap[_, _]) => m.asInstanceOf[LinkedHashMap[String, Any]]
        case _ => LinkedHashMap.empty[String, Any]
      }

    def send(evt: LinkedHashMap[String, Any]): Unit = lock.synchronized {
      var shouldAppend = true
      var forceFlush = false
      if (evt != null && evt.get("type").contains(Event.Log) && messages.nonEmpty &&
        messages.last.get("type").contains(Event.Log)) {
        val lastLog = logOf(messages.last)
        if (lastLog.get("message") == logOf(evt).get("message")) {
          val repeat = lastLog.get("repeat") match {
            case Some(r: java.lang.Long) => r.toLong
            case _ => 1L
          }
          lastLog("repeat") = repeat + 1L
          shouldAppend = false
        }
      } else if (evt != null && !evt.get("type").contains(Event.Log)) {
        forceFlush = true
      }
      if (evt != null && shouldAppend) messages += evt
      if (!forceFlush && System.currentTimeMillis() - lastFlushTime < flushPeriodMs)
        return
      var failed = false
      messages.foreach { msg =>
        if (!failed)
          try conn.writeJson(String.valueOf(Builtins.jsonStringify(msg)))
          catch { case _: Exception => failed = true; close() }
      }
      lastFlushTime = System.currentTimeMillis()
      messages.clear()
    }

    /** One inbound frame: ping echoes, rpc_req dispatches through the
      * shared JSON-RPC controller and replies a rpc_rsp envelope
      * (http_ws.go:118-129, 196-233). */
    private[server] def handleFrame(evt: LinkedHashMap[String, Any]): Unit =
      evt.get("type") match {
        case Some(Event.Ping) =>
          val tick = evt.get("ping") match {
            case Some(p: LinkedHashMap[_, _]) =>
              p.asInstanceOf[LinkedHashMap[String, Any]].get("tick") match {
                case Some(t: java.lang.Long) => t.toLong
                case _ => 0L
              }
            case _ => 0L
          }
          conn.writeJson(String.valueOf(Builtins.jsonStringify(Event.newPing(tick))))
        case Some(Event.RpcReq) =>
          val session = evt.get("session") match {
            case Some(s: String) => s
            case _ => ""
          }
          evt.get("rpc") match {
            case Some(r: LinkedHashMap[_, _]) =>
              val rpc = r.asInstanceOf[LinkedHashMap[String, Any]]
              val method = rpc.get("method") match { case Some(s: String) => s; case _ => "" }
              val params = rpc.get("params") match {
                case Some(a: ArrayBuffer[_]) => a.toSeq
                case _ => Nil
              }
              val id = rpc.get("id").orNull
              val rsp = JsonRpc.responseJson(spark, method, params, id)
              conn.writeJson(s"""{"type":"${Event.RpcRsp}","session":${
                graft.sinks.GoJs.quote(session)},"rpc":$rsp}""")
            case _ => ()
          }
        case _ => ()
      }

    /** Reader loop: pump frames until close/EOF, then close the console
      * (http_ws.go readerLoop). Runs on a daemon thread via [[run]]. */
    def run(): Thread = {
      val t = new Thread(() => {
        try {
          while (!closed.get()) handleFrame(conn.readJson())
        } catch { case _: Exception => () }
        finally close()
      }, "web-console-reader")
      t.setDaemon(true); t.start(); t
    }
  }

  // ---- the door (GET /web/api/console/:id/data upgrade) -----------------

  @volatile private var doorSocket: java.net.ServerSocket = null

  /** Accept loop on 127.0.0.1:ephemeral: each connection upgrades and
    * gets its own WebConsole pump. Loopback-only like every other door
    * in this build. Returns the bound port (idempotent). */
  def ensureDoor(spark: SparkSession): Int = synchronized {
    if (doorSocket != null) return doorSocket.getLocalPort
    val srv = new java.net.ServerSocket(0, 16,
      java.net.InetAddress.getLoopbackAddress)
    doorSocket = srv
    val t = new Thread(() => {
      try {
        while (!srv.isClosed) {
          val sock = srv.accept()
          val w = new Thread(() => {
            try {
              serverHandshake(sock)
              new WebConsole(new WsConn(sock, clientRole = false), spark).run()
            } catch { case _: Exception => try sock.close() catch { case _: Exception => () } }
          }, "web-console-upgrade")
          w.setDaemon(true); w.start()
        }
      } catch { case _: Exception => () }
    }, "web-console-door")
    t.setDaemon(true); t.start()
    srv.getLocalPort
  }
}
