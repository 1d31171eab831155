package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.{CgiWriter, PublicDoor}
import graft.server.CgiWriter.CgiError
import graft.server.WebApi.HttpReply

/** CGI/1.1 response writer + `/db/public` door battery, mined
  * body-level from the reference's own tests
  * (mods/server/http_public_test.go TestCgiBinWriter…/TestPublicStatic
  * and the http_public.go doc contract). */
class CgiDoorSpec extends AnyFunSuite {

  private def utf8(s: String) = s.getBytes("UTF-8")

  // ---- document responses -------------------------------------------

  test("document response: Status + Content-Type + extension header + body") {
    val w = new CgiWriter()
    w.write(utf8("Status: 201 Created\r\nContent-Type: text/plain\r\nX-Test: ok\r\n\r\nhello"))
    val r = w.finish()
    assert(r.status == 201)
    assert(r.body == "hello")
    assert(r.contentType == "text/plain")
    assert(r.headers("X-Test") == "ok")
  }

  test("status defaults to 200; header written across two chunks") {
    val w = new CgiWriter()
    w.write(utf8("Content-Type: text/plain\r\n"))
    w.write(utf8("\r\nhello world"))
    val r = w.finish()
    assert(r.status == 200)
    assert(r.body == "hello world")
  }

  test("HTTP-style status line accepted instead of Status header") {
    val w = new CgiWriter()
    w.write(utf8("HTTP/1.1 204 No Content\r\nContent-Type: text/plain\r\n\r\n"))
    val r = w.finish()
    assert(r.status == 204)
    assert(r.contentType == "text/plain")
    assert(r.body.isEmpty)
  }

  test("body without Content-Type is rejected") {
    val w = new CgiWriter()
    val e = intercept[CgiError] {
      w.write(utf8("Status: 200 OK\r\n\r\nhello"))
    }
    assert(e.getMessage.contains("Content-Type"))
  }

  test("LF-only header separator works") {
    val w = new CgiWriter()
    w.write(utf8("Content-Type: text/plain\n\nbody"))
    assert(w.finish().body == "body")
  }

  // ---- redirects ------------------------------------------------------

  test("local redirect re-dispatches in-process") {
    val w = new CgiWriter(localDispatch =
      loc => HttpReply(200, "text/plain", s"redirected:$loc"))
    w.write(utf8("Location: /public/target\r\n\r\n"))
    val r = w.finish()
    assert(r.status == 200)
    assert(r.body == "redirected:/public/target")
  }

  test("client redirect replies 302 with Location") {
    val w = new CgiWriter()
    w.write(utf8("Location: https://example.com/next\r\n\r\n"))
    val r = w.finish()
    assert(r.status == 302)
    assert(r.headers("Location") == "https://example.com/next")
  }

  test("client redirect with document keeps explicit 3xx + body") {
    val w = new CgiWriter()
    w.write(utf8("Location: https://example.com/next\r\nStatus: 302 Found\r\nContent-Type: text/html\r\n\r\n<html>redirecting</html>"))
    val r = w.finish()
    assert(r.status == 302)
    assert(r.headers("Location") == "https://example.com/next")
    assert(r.body == "<html>redirecting</html>")
  }

  test("redirect responses must not include a body") {
    val w = new CgiWriter()
    w.write(utf8("Location: /public/x\r\n\r\n"))
    val e = intercept[CgiError] { w.write(utf8("body")) }
    assert(e.getMessage.contains("message body"))
  }

  test("client redirect classification guards") {
    def classifyErr(headerBlock: String): String =
      intercept[CgiError] {
        val w = new CgiWriter()
        w.write(utf8(headerBlock + "\r\n\r\n"))
        w.finish()
      }.getMessage
    assert(classifyErr("Location: https://e.com/x\r\nStatus: 302 Found")
      .contains("unless a document is returned"))
    assert(classifyErr("Location: https://e.com/x\r\nContent-Type: text/html")
      .contains("without a document"))
    assert(classifyErr("Location: https://e.com/x\r\nX-Other: v")
      .contains("protocol headers"))
    // X-Cgi-* extension headers ARE allowed on a bare client redirect
    // but stay server-internal (not forwarded)
    val w = new CgiWriter()
    w.write(utf8("Location: https://e.com/x\r\nX-Cgi-Trace: t\r\n\r\n"))
    val r = w.finish()
    assert(r.status == 302 && !r.headers.contains("X-Cgi-Trace"))
  }

  test("local redirect must be bare (only Location)") {
    val w = new CgiWriter()
    w.write(utf8("Location: /public/x\r\nContent-Type: text/plain\r\n\r\n"))
    val e = intercept[CgiError] { w.finish() }
    assert(e.getMessage.contains("other than Location"))
  }

  test("client redirect with document requires Status / Content-Type / 3xx") {
    def docErr(headers: String): String =
      intercept[CgiError] {
        val w = new CgiWriter()
        w.write(utf8(headers + "\r\n\r\nbody"))
        w.finish()
      }.getMessage
    assert(docErr("Location: https://e.com/x\r\nContent-Type: text/html")
      .contains("requires Status"))
    assert(docErr("Location: https://e.com/x\r\nStatus: 302 Found")
      .contains("requires Content-Type"))
    assert(docErr("Location: https://e.com/x\r\nStatus: 200 OK\r\nContent-Type: text/html")
      .contains("3xx"))
  }

  // ---- malformed output ----------------------------------------------

  test("no output at all → empty response") {
    val e = intercept[CgiError] { new CgiWriter().finish() }
    assert(e.getMessage.contains("empty response"))
  }

  test("output without separator → missing header separator") {
    val w = new CgiWriter()
    w.write(utf8("Content-Type: text/plain"))
    val e = intercept[CgiError] { w.finish() }
    assert(e.getMessage.contains("missing header separator"))
  }

  test("duplicate Status / Content-Type / Location rejected") {
    def dupErr(block: String): String =
      intercept[CgiError] {
        new CgiWriter().write(utf8(block + "\r\n\r\n"))
      }.getMessage
    assert(dupErr("Status: 200 OK\r\nStatus: 201 Created")
      .contains("duplicate Status"))
    assert(dupErr("Content-Type: a/b\r\nContent-Type: c/d")
      .contains("duplicate Content-Type"))
    assert(dupErr("Location: /a\r\nLocation: /b")
      .contains("duplicate Location"))
  }

  test("malformed header line reports the line") {
    val e = intercept[CgiError] {
      new CgiWriter().write(utf8("not a header\r\n\r\n"))
    }
    assert(e.getMessage.contains("malformed header line"))
    assert(e.getMessage.contains("not a header"))
  }

  // ---- SSE flushing ----------------------------------------------------

  test("SSE header-only output commits and flushes immediately") {
    val w = new CgiWriter()
    w.write(utf8("Content-Type: text/event-stream\r\nCache-Control: no-cache\r\n\r\n"))
    assert(w.flushCount >= 1)
    val r = w.finish()
    assert(r.status == 200)
    assert(r.contentType == "text/event-stream")
    assert(r.headers("Cache-Control") == "no-cache")
  }

  test("each SSE body write flushes again") {
    val w = new CgiWriter()
    w.write(utf8("Content-Type: text/event-stream\r\n\r\n"))
    val headerFlushes = w.flushCount
    w.write(utf8("event: log\ndata: hello\n\n"))
    assert(w.flushCount > headerFlushes)
    assert(w.finish().body == "event: log\ndata: hello\n\n")
  }

  // ---- body mechanics --------------------------------------------------

  test("HEAD requests discard the body but keep headers") {
    val w = new CgiWriter(method = "HEAD")
    w.write(utf8("Content-Type: text/plain\r\n\r\nbody to discard"))
    val r = w.finish()
    assert(r.status == 200)
    assert(r.body.isEmpty)
    assert(r.contentType == "text/plain")
  }

  test("console-style Log/Println writes plain CGI output") {
    val w = new CgiWriter()
    w.log("INFO", Seq("Content-Type: text/plain"))
    w.println()
    w.log("INFO", Seq("hello"))
    val r = w.finish()
    assert(r.status == 200)
    assert(r.contentType == "text/plain")
    assert(r.body == "hello\n")
  }

  test("print writes without newline") {
    val w = new CgiWriter()
    w.print("Content-Type: text/plain")
    w.print("\r\n\r\n")
    w.print("hello")
    val r = w.finish()
    assert(r.contentType == "text/plain")
    assert(r.body == "hello")
  }

  test("large body: 2000 printf lines intact") {
    val w = new CgiWriter()
    w.log("INFO", Seq("Content-Type: text/plain"))
    w.println()
    (0 until 2000).foreach(i => w.printf("line %05d: %s\n", i, "x" * 40))
    val body = w.finish().body
    val lines = body.stripSuffix("\n").split("\n", -1)
    assert(lines.length == 2000)
    assert(lines(0) == "line 00000: " + "x" * 40)
    assert(lines(1999) == "line 01999: " + "x" * 40)
  }

  test("body delivered byte-by-byte reassembles completely") {
    val w = new CgiWriter()
    w.write(utf8("Content-Type: text/plain\r\n\r\n"))
    val body = "abcdefghijklmnopqrstuvwxyz0123456789"
    body.foreach(ch => w.write(utf8(ch.toString)))
    assert(w.finish().body == body)
  }

  test("zero-progress sink write is a short write") {
    val w = new CgiWriter(bodySink = Some(_ => 0))
    val e = intercept[CgiError] {
      w.write(utf8("Content-Type: text/plain\r\n\r\nhello"))
    }
    assert(e.getMessage.contains("short write"))
  }

  test("partial sink writes (1 byte per call) succeed") {
    val sb = new StringBuilder
    val w = new CgiWriter(bodySink = Some { bytes =>
      sb.append(bytes(0).toChar); 1
    })
    w.write(utf8("Content-Type: text/plain\r\n\r\nhello"))
    w.finish()
    assert(sb.toString == "hello")
  }

  test("empty write is a no-op") {
    val w = new CgiWriter()
    w.write(Array.emptyByteArray)
    val e = intercept[CgiError] { w.finish() }
    assert(e.getMessage.contains("empty response"))
  }

  // ---- diagnostics ------------------------------------------------------

  test("appendDiagnostic attaches captured stdout/stderr when present") {
    val base = "invalid cgi response: missing header separator"
    val msg = CgiWriter.appendDiagnostic(base, "Content-Type: text/plain", "Error: boom")
    assert(msg.contains(base))
    assert(msg.contains("cgi_stdout="))
    assert(msg.contains("cgi_stderr="))
    assert(CgiWriter.appendDiagnostic(base, "", "") == base)
  }

  test("LimitedCapture keeps a bounded prefix and marks truncation") {
    val c = new CgiWriter.LimitedCapture(10)
    assert(c.write("hello") == 5)
    assert(c.toString == "hello")
    assert(c.write(" world and more") == " world and more".length)
    assert(c.toString.startsWith("hello worl"))
    assert(c.toString.contains("...<truncated>"))
  }

  // ---- the public door ---------------------------------------------------

  private val fsFiles = Map(
    "/public/app/index.html" -> "<html><body>CGI Test</body></html>",
    "/public/app/cgi-bin/hello.js" ->
      """console.log('Content-Type: text/plain; charset=utf-8;');
        |console.log('');
        |console.log('GREETING: Good morning', '');""".stripMargin,
    "/public/app/cgi-bin/basic_201.js" ->
      """console.log('Status: 201 Created');
        |console.log('Content-Type: text/plain');
        |console.log('X-Test: ok');
        |console.log('');
        |console.log('hello');""".stripMargin,
    "/public/app/cgi-bin/env.js" ->
      """console.log('Content-Type: text/plain');
        |console.log('');
        |console.log(process.env.GATEWAY_INTERFACE, process.env.QUERY_STRING);""".stripMargin,
    "/public/app/cgi-bin/bad.js" -> "console.log('no separator here');",
    "/public/app/cgi-bin/redir.js" ->
      """console.log('Location: /public/app/index.html');
        |console.log('');""".stripMargin,
    "/public/app/cgi-bin/selfloop.js" ->
      """console.log('Location: /public/app/cgi-bin/selfloop.js');
        |console.log('');""".stripMargin,
    "/public/app/cgi-bin/echo_body.js" ->
      """console.log('Content-Type: text/plain');
        |console.log('');
        |console.log('LEN', process.env.CONTENT_LENGTH);
        |console.log('BODY', process.stdin.read());
        |console.log('EOF', process.stdin.read());""".stripMargin,
    "/public/app/cgi-bin/lines.js" ->
      """console.log('Content-Type: text/plain');
        |console.log('');
        |var l; var n = 0;
        |while ((l = process.stdin.readLine()) !== null) { n = n + 1; }
        |console.log('LINES', n);""".stripMargin,
    "/public/app/cgi-bin/redir_body.js" ->
      """console.log('Location: /public/target');
        |console.log('');
        |console.log('a body after a local redirect');""".stripMargin
  ).map { case (k, v) => k -> v.getBytes("UTF-8") }
  private val fsDirs = Set("/public/app", "/public/app/")

  private def door(path: String, method: String = "GET", qs: String = "") =
    PublicDoor.handle(path, method, fsFiles.get, fsDirs.contains, qs)

  test("static file serves with content type (TestPublicStatic)") {
    // the explicit index.html path redirects to the directory form...
    val r1 = door("app/index.html")
    assert(r1.status == 302)
    assert(r1.headers("Location") == "/public/app/")
    // ...whose dir resolution serves the same bytes (the Go test's
    // redirect-following client sees 200 text/html)
    val r2 = door("app/")
    assert(r2.status == 200)
    assert(r2.contentType == "text/html")
    assert(r2.body == "<html><body>CGI Test</body></html>")
  }

  test("CGI basic: .js suffix auto-appended, console output parsed") {
    val r = door("app/cgi-bin/hello")
    assert(r.status == 200, r.body)
    assert(r.contentType == "text/plain; charset=utf-8;")
    assert(r.body == "GREETING: Good morning \n")
  }

  test("CGI basic 201: status + extension header + body") {
    val r = door("app/cgi-bin/basic_201")
    assert(r.status == 201)
    assert(r.contentType == "text/plain")
    assert(r.headers("X-Test") == "ok")
    assert(r.body == "hello\n")
  }

  test("CGI env carries the standard CGI/1.1 variables") {
    val r = door("app/cgi-bin/env", qs = "a=1&b=2")
    assert(r.status == 200)
    assert(r.body == "CGI/1.1 a=1&b=2\n")
  }

  test("CGI local redirect re-enters the door") {
    val r = door("app/cgi-bin/redir")
    // /public/app/index.html → 302 to the directory form (as the
    // router would re-serve it)
    assert(r.status == 302)
    assert(r.headers("Location") == "/public/app/")
  }

  test("malformed CGI output → 500 invalid cgi response + diagnostics") {
    val r = door("app/cgi-bin/bad")
    assert(r.status == 500)
    assert(r.body.contains("invalid cgi response"))
    assert(r.body.contains("missing header separator"))
    assert(r.body.contains("cgi_stdout="))
  }

  test("path traversal rejected with 400 invalid path") {
    val r = door("app/../secret")
    assert(r.status == 400)
    assert(r.body.contains("invalid path"))
  }

  test("self-redirecting CGI script replies 500 too many redirects") {
    val r = door("app/cgi-bin/selfloop")
    assert(r.status == 500)
    assert(r.body.contains("too many redirects"))
  }

  test("POST body reaches the script as process.stdin") {
    val payload = "line one\nline two"
    val r = PublicDoor.handle("app/cgi-bin/echo_body", "POST",
      fsFiles.get, fsDirs.contains,
      requestHeaders = Map("Content-Length" -> payload.length.toString,
        "Content-Type" -> "text/plain"),
      body = payload.getBytes("UTF-8"))
    assert(r.status == 200, r.body)
    assert(r.body == s"LEN ${payload.length}\nBODY $payload\nEOF null\n")
    // readLine() consumes line-wise: "line one\nline two" = 2 lines
    val r2 = PublicDoor.handle("app/cgi-bin/lines", "POST",
      fsFiles.get, fsDirs.contains, body = payload.getBytes("UTF-8"))
    assert(r2.status == 200, r2.body)
    assert(r2.body == "LINES 2\n")
  }

  test("write-time CGI parse failure surfaces as engine run error") {
    // a body after local-redirect headers fails AT THE WRITE while the
    // script runs — the reference folds that into the engine run error,
    // not the finalize-time "invalid cgi response" form
    val r = door("app/cgi-bin/redir_body")
    assert(r.status == 500)
    assert(r.body.contains("engine run error"))
    assert(r.body.contains("must not include a message body"))
  }

  test("duplicate custom headers combine comma-separated") {
    val w = new CgiWriter()
    w.write(utf8("Content-Type: text/plain\r\nX-A: 1\r\nX-A: 2\r\nX-B: z\r\n\r\nok"))
    val r = w.finish()
    assert(r.headers("X-A") == "1, 2")
    assert(r.headers("X-B") == "z")
  }

  test("pre-separator buffer is capped with missing header separator") {
    val w = new CgiWriter()
    val chunk = new Array[Byte](64 * 1024)
    java.util.Arrays.fill(chunk, 'a'.toByte)
    val e = intercept[CgiError] {
      var i = 0
      while (i <= CgiWriter.MaxHeaderBytes / chunk.length + 1) {
        w.write(chunk); i += 1
      }
    }
    assert(e.getMessage.contains("missing header separator"))
  }

  test("header separator found across byte-at-a-time writes") {
    val w = new CgiWriter()
    val full = "Content-Type: text/plain\r\nX-Test: ok\r\n\r\nstreamed body"
    full.getBytes("UTF-8").foreach(b => w.write(Array(b)))
    val r = w.finish()
    assert(r.status == 200)
    assert(r.contentType == "text/plain")
    assert(r.headers("X-Test") == "ok")
    assert(r.body == "streamed body")
  }

  test("missing file and missing script both 404") {
    assert(door("app/nope.html").status == 404)
    assert(door("app/cgi-bin/nope").status == 404)
    // non-GET static requests are not served
    assert(door("app/index.html", method = "POST").status == 404)
  }
}
