package graft

import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import graft.server.WsConsole
import graft.server.WsConsole._

/** WebSocket console parity with mods/server/http_ws_test.go (frame io,
  * log coalescing, flush semantics) over a real loopback socket pair with
  * an RFC 6455 handshake. */
class WsConsoleSpec extends SparkSpec {

  private def wsPair(): (WsConn, WsConn) = {
    val srv = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val serverSide = new java.util.concurrent.SynchronousQueue[Socket]()
    val t = new Thread(() => {
      val s = srv.accept()
      WsConsole.serverHandshake(s)
      serverSide.put(s)
    })
    t.setDaemon(true); t.start()
    val client = new Socket(InetAddress.getLoopbackAddress, srv.getLocalPort)
    WsConsole.clientHandshake(client, "/web/api/console/test/data")
    val server = serverSide.take()
    srv.close()
    (new WsConn(client, clientRole = true), new WsConn(server, clientRole = false))
  }

  private def read(r: WsReadWriter, n: Int): String = {
    val buf = new Array[Byte](n)
    val got = r.read(buf)
    new String(buf, 0, got, UTF_8)
  }

  test("WsReadWriter read continues across frame boundaries (TestWsReadWriterRead)") {
    val (client, server) = wsPair()
    try {
      server.writeMessage(Opcode.Binary, "hello".getBytes(UTF_8))
      server.writeMessage(Opcode.Binary, "world".getBytes(UTF_8))
      val reader = new WsReadWriter(client)
      assert(read(reader, 3) == "hel")
      assert(read(reader, 2) == "lo")
      assert(read(reader, 5) == "world")
    } finally { client.close(); server.close() }
  }

  test("WsReadWriter propagates next reader errors after frame eof") {
    val (client, server) = wsPair()
    try {
      server.writeMessage(Opcode.Binary, "hello".getBytes(UTF_8))
      val reader = new WsReadWriter(client)
      assert(read(reader, 3) == "hel")
      assert(read(reader, 2) == "lo")
      server.close()
      intercept[Exception](reader.read(new Array[Byte](8)))
    } finally client.close()
  }

  test("WsReadWriter writes binary frames (TestWsReadWriterWrite)") {
    val (client, server) = wsPair()
    try {
      val writer = new WsReadWriter(client)
      assert(writer.write("payload".getBytes(UTF_8)) == "payload".length)
      val (op, payload) = server.readMessage()
      assert(op == Opcode.Binary)
      assert(new String(payload, UTF_8) == "payload")
    } finally { client.close(); server.close() }
  }

  test("WsReadWriter returns write errors on a closed connection") {
    val (client, server) = wsPair()
    server.close()
    client.close()
    val writer = new WsReadWriter(client)
    intercept[Exception](writer.write("payload".getBytes(UTF_8)))
  }

  test("WebConsole coalesces repeated log messages (TestWebConsoleSend)") {
    val (client, server) = wsPair()
    try {
      val cons = new WebConsole(server, spark, flushPeriodMs = 3600000L)
      cons.send(Event.newLog("INFO", "same message"))
      cons.send(Event.newLog("INFO", "same message"))
      assert(cons.messages.length == 1)
      val log = cons.messages.head("log")
        .asInstanceOf[collection.mutable.LinkedHashMap[String, Any]]
      assert(log("repeat") == 2L, log)

      cons.lastFlushTime = System.currentTimeMillis() - 2 * 3600000L
      cons.send(null)

      val evt = client.readJson()
      assert(evt("type") == "log", evt)
      val rlog = evt("log").asInstanceOf[collection.mutable.LinkedHashMap[String, Any]]
      assert(rlog("message") == "same message" && rlog("repeat") == 2L, rlog)
      assert(cons.messages.isEmpty)
    } finally { client.close(); server.close() }
  }

  test("non-log events force pending logs to flush") {
    val (client, server) = wsPair()
    try {
      val cons = new WebConsole(server, spark, flushPeriodMs = 3600000L)
      cons.send(Event.newLog("INFO", "pending log"))
      cons.send(Event.newOpenFile("/tmp/result.txt"))

      val first = client.readJson()
      val second = client.readJson()
      assert(first("type") == "log", first)
      assert(first("log").asInstanceOf[collection.mutable.LinkedHashMap[String, Any]]("message")
        == "pending log", first)
      assert(second("type") == "open_file", second)
      assert(second("open_file").asInstanceOf[collection.mutable.LinkedHashMap[String, Any]]("path")
        == "/tmp/result.txt", second)
    } finally { client.close(); server.close() }
  }

  test("write failure closes the console") {
    val (client, server) = wsPair()
    val cons = new WebConsole(server, spark, flushPeriodMs = 0L)
    cons.lastFlushTime = System.currentTimeMillis() - 1000L
    client.close()
    server.close() // make the write fail deterministically
    cons.send(Event.newLog("INFO", "will fail"))
    assert(cons.closed.get())
  }

  test("reader loop echoes ping frames (http_ws.go handlePing)") {
    val (client, server) = wsPair()
    try {
      val cons = new WebConsole(server, spark)
      cons.run()
      client.writeJson("""{"type":"ping","ping":{"tick":1234567}}""")
      val evt = client.readJson()
      assert(evt("type") == "ping", evt)
      assert(evt("ping").asInstanceOf[collection.mutable.LinkedHashMap[String, Any]]("tick")
        == 1234567L, evt)
    } finally { client.close(); server.close() }
  }

  test("reader loop dispatches rpc_req and wraps rpc_rsp (http_ws.go handleRpc)") {
    val (client, server) = wsPair()
    try {
      val cons = new WebConsole(server, spark)
      cons.run()
      client.writeJson("""{"type":"rpc_req","session":"s1","rpc":""" +
        """{"jsonrpc":"2.0","id":7,"method":"nonExistentMethod","params":[]}}""")
      val evt = client.readJson()
      assert(evt("type") == "rpc_rsp" && evt("session") == "s1", evt)
      val rpc = evt("rpc").asInstanceOf[collection.mutable.LinkedHashMap[String, Any]]
      assert(rpc("jsonrpc") == "2.0" && rpc("id") == 7L, rpc)
      val err = rpc("error").asInstanceOf[collection.mutable.LinkedHashMap[String, Any]]
      assert(err("code") == -32601L && err("message") == "Method not found", err)

      // a real method rides the same pipe
      client.writeJson("""{"type":"rpc_req","session":"s2","rpc":""" +
        """{"jsonrpc":"2.0","id":8,"method":"sql.split","params":["select 1;"]}}""")
      val ok = client.readJson()
      val result = ok("rpc").asInstanceOf[collection.mutable.LinkedHashMap[String, Any]]("result")
        .asInstanceOf[collection.mutable.ArrayBuffer[Any]]
      assert(result.length == 1, ok)
    } finally { client.close(); server.close() }
  }

  test("console door accepts, upgrades and serves rpc end-to-end") {
    val port = WsConsole.ensureDoor(spark)
    val sock = new Socket(InetAddress.getLoopbackAddress, port)
    try {
      WsConsole.clientHandshake(sock, "/web/api/console/c1/data")
      val client = new WsConn(sock, clientRole = true)
      client.writeJson("""{"type":"ping","ping":{"tick":42}}""")
      val pong = client.readJson()
      assert(pong("type") == "ping", pong)
      client.writeJson("""{"type":"rpc_req","session":"d1","rpc":""" +
        """{"jsonrpc":"2.0","id":1,"method":"server.info.get","params":[]}}""")
      val rsp = client.readJson()
      assert(rsp("type") == "rpc_rsp", rsp)
      val rt = rsp("rpc").asInstanceOf[collection.mutable.LinkedHashMap[String, Any]]("result")
        .asInstanceOf[collection.mutable.LinkedHashMap[String, Any]]("runtime")
        .asInstanceOf[collection.mutable.LinkedHashMap[String, Any]]
      assert(rt("OS") == "linux", rt)
    } finally sock.close()
  }
}
