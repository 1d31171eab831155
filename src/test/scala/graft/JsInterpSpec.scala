package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer
import graft.script.{Interpreter, Js, ScriptOps}
import graft.script.Interp._

/** JS-subset interpreter unit battery — expressions, statements, builtins,
  * and the $.yield record bridge, mirroring the semantics the reference's
  * goja runtime exhibits in mods/tql/fm_script_test.go. */
class JsInterpSpec extends AnyFunSuite {

  private def newInterp(nowNs: Long = 1700000000000000000L): (Interpreter, ArrayBuffer[String]) = {
    val logs = ArrayBuffer.empty[String]
    val host = new Host {
      def nowNs: Long = 1700000000000000000L
      override def log(level: String, parts: Seq[Any]): Unit =
        logs += s"[$level] ${parts.map(display).mkString(" ")}"
    }
    (new Interpreter(host), logs)
  }

  private def evalJs(src: String): Any = {
    val (in, _) = newInterp()
    in.run(s"__res = ($src)")
    in.global.vars("__res")
  }

  private def runJs(src: String): Interpreter = {
    val (in, _) = newInterp()
    in.run(src)
    in
  }

  test("number literals and arithmetic keep integral Long semantics") {
    assert(evalJs("1 + 2") == 3L)
    assert(evalJs("2 * 3 + 4") == 10L)
    assert(evalJs("10 / 4") == 2.5)
    assert(evalJs("8 / 4") == 2.0) // division is double; export normalizes
    assert(evalJs("7 % 3") == 1L)
    assert(evalJs("2 ** 10") == 1024.0)
    assert(evalJs("1.5 + 1") == 2.5)
    // epoch-ns sized longs survive + / - exactly
    assert(evalJs("1685714509000000000 + 1000000000") == 1685714510000000000L)
  }

  test("string ops and coercion") {
    assert(evalJs(""" "a" + "b" """) == "ab")
    assert(evalJs(""" "n=" + 4 """) == "n=4")
    assert(evalJs(""" "n=" + 4.5 """) == "n=4.5")
    assert(evalJs(""" "1,2,3".split(",").length """) == 3L)
    assert(evalJs(""" "a,b,,".split(",").length """) == 4L) // JS keeps trailing empties
    assert(evalJs(""" "  x ".trim() """) == "x")
    assert(evalJs(""" "abcdef".slice(1, 3) """) == "bc")
    assert(evalJs(""" "ab".repeat(3) """) == "ababab")
    assert(evalJs(""" "a-b-c".replace("-", "+") """) == "a+b-c")
    assert(evalJs(""" "a-b-c".replaceAll("-", "+") """) == "a+b+c")
  }

  test("comparisons, logical, ternary, nullish") {
    assert(evalJs("1 < 2") == true)
    assert(evalJs("'true' === 'true'") == true)
    assert(evalJs("1 == '1'") == true)
    assert(evalJs("1 === '1'") == false)
    assert(evalJs("null == undefined") == true)
    assert(evalJs("null ?? 'x'") == "x")
    assert(evalJs("0 ?? 'x'") == 0L)
    assert(evalJs("0 || 'x'") == "x")
    assert(evalJs("1 && 'x'") == "x")
    assert(evalJs("true ? 'a' : 'b'") == "a")
  }

  test("arrays: literals, methods, spread") {
    assert(evalJs("[1,2,3].length") == 3L)
    assert(evalJs("[1,2,3].map(function(v){ return v * v }).join(',')") == "1,4,9")
    assert(evalJs("[1,2,3].map((v) => { return v + 1 }).join(',')") == "2,3,4")
    assert(evalJs("[1,2,3].map(v => v * 2).join('-')") == "2-4-6")
    assert(evalJs("[1,2,3,4].filter(v => v % 2 === 0).length") == 2L)
    assert(evalJs("[1,2,3].reduce((a,b) => a + b, 0)") == 6L)
    assert(evalJs("[...[1,2],...[3]].length") == 3L)
    assert(evalJs("[3,1,2].sort((a,b)=>a-b).join('')") == "123")
    assert(evalJs("[1,2,3].indexOf(2)") == 1L)
    assert(evalJs("[1,2,3].includes(4)") == false)
    assert(evalJs("[[1,2],[3]].flat().length") == 3L)
  }

  test("objects: literals, member access, mutation, delete, ++") {
    val in = runJs("o = {a: 1, b: 'x'}; o.a++; o.c = true; n = o.a; has = 'b' in o; delete o.b;")
    assert(in.global.vars("n") == 2L)
    assert(in.global.vars("has") == true)
    val o = in.global.vars("o").asInstanceOf[JsObj]
    assert(!o.contains("b"))
    assert(o("c") == true)
  }

  test("functions, closures, recursion, hoisting") {
    val in = runJs(
      """
        r1 = square(4);
        function square(x) { return x * x }
        function fib(n) { return n < 2 ? n : fib(n-1) + fib(n-2) }
        r2 = fib(10);
        function counter() { var c = 0; return function() { c++; return c; } }
        inc = counter();
        inc(); inc();
        r3 = inc();
      """)
    assert(in.global.vars("r1") == 16L)
    assert(in.global.vars("r2") == 55L)
    assert(in.global.vars("r3") == 3L)
  }

  test("control flow: for, while, for-of, break/continue, try/catch/finally") {
    val in = runJs(
      """
        s = 0;
        for (i = 0; i < 10; i++) { if (i % 2 === 0) continue; if (i > 7) break; s += i; }
        t = 0;
        for (let v of [10, 20, 30]) { t += v; }
        u = 0;
        while (u < 5) { u++; }
        caught = '';
        fin = false;
        try { throw "boom"; } catch (e) { caught = e; } finally { fin = true; }
      """)
    assert(in.global.vars("s") == 1L + 3 + 5 + 7)
    assert(in.global.vars("t") == 60L)
    assert(in.global.vars("u") == 5L)
    assert(in.global.vars("caught") == "boom")
    assert(in.global.vars("fin") == true)
  }

  test("exceptions: member-call on missing object member, .message") {
    val (in, logs) = newInterp()
    in.run(
      """
        o = {a: 1, other: ()=>{throw "other error";}};
        o.a++;
        r = o.a;
        try { o.undef_function(); } catch (e) { console.error(e.message); }
        try { o.other(); } catch (e) { console.error(e); }
      """)
    assert(in.global.vars("r") == 2L)
    assert(logs.toList == List(
      "[ERROR] Object has no member 'undef_function'",
      "[ERROR] other error"))
  }

  test("ReferenceError for undefined variable") {
    val ex = intercept[JsThrown](runJs("var1 + 1;"))
    assert(display(ex.value) == "ReferenceError: var1 is not defined")
  }

  test("Date: construct, parse, toISOString, numeric coercion") {
    assert(evalJs("new Date(808210800 * 1000).toISOString()") == "1995-08-12T07:00:00.000Z")
    assert(evalJs("Date.parse('1995-08-12T00:00:00.000Z')") == 808185600000L)
    assert(evalJs("new Date(Date.parse('1995-08-12T00:00:00.000Z')) / 1000") == 808185600.0)
    assert(evalJs("new Date(0).getUTCFullYear()") == 1970L)
  }

  test("parseInt / parseFloat / isNaN") {
    assert(evalJs("parseInt('808210800')") == 808210800L)
    assert(evalJs("parseInt('3.4')") == 3L)
    assert(evalJs("parseFloat('1.2')") == 1.2)
    assert(evalJs("parseFloat('2.5abc')") == 2.5)
    assert(evalJs("isNaN(parseInt('abc'))") == true)
  }

  test("Math and JSON") {
    assert(evalJs("Math.floor(2.7)") == 2.0)
    assert(evalJs("Math.max(1, 2.5, 2)") == 2.5)
    assert(evalJs("Math.round(2.5)") == 3.0)
    assert(evalJs("JSON.stringify({b: 1, a: [1, 'x', true]})") == """{"b":1,"a":[1,"x",true]}""")
    assert(evalJs("JSON.parse('{\"a\": [1, 2.5, \"s\"]}').a[1]") == 2.5)
    assert(evalJs("JSON.parse('[1,2,3]').length") == 3L)
  }

  test("template literals") {
    assert(evalJs("`a${1+1}b`") == "a2b")
  }

  test("typeof") {
    assert(evalJs("typeof 'x'") == "string")
    assert(evalJs("typeof 1") == "number")
    assert(evalJs("typeof undefined_var") == "undefined")
    assert(evalJs("typeof {}") == "object")
  }

  // ------------------------------------------------------------------
  // $.yield bridge via ScriptOps.run
  // ------------------------------------------------------------------
  private val NOW = 1700000000000000000L

  test("js-finalize pattern: per-record yield + finalize yieldKey") {
    val records = Iterator(
      (1L: Any, Seq[Any](1.0), Map.empty[String, Any]),
      (2L: Any, Seq[Any](2.0), Map.empty[String, Any]),
      (3L: Any, Seq[Any](3.0), Map.empty[String, Any]))
    val res = ScriptOps.run(records, isSource = false,
      "", """
        function finalize(){ $.yieldKey("last", 1.234); }
        function square(x) { return x * x };
        $.yield(square($.values[0]));
      """, "", NOW, Map.empty, None)
    assert(res.rows.map(_._2) == Seq(Seq(1L), Seq(4L), Seq(9L), Seq(1.234)))
    assert(res.rows.map(_._1) == Seq(1L, 2L, 3L, "last"))
  }

  test("source mode: payload split and yield ordinal keys") {
    val res = ScriptOps.run(Iterator.empty, isSource = true,
      "", """
        $.payload.split(",").forEach((v) => {
          $.yield(parseInt(v));
        });
      """, "", NOW, Map.empty, Some("1,2,3,4,5"))
    assert(res.rows.map(_._2) == Seq(Seq(1L), Seq(2L), Seq(3L), Seq(4L), Seq(5L)))
    assert(res.rows.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("params: array and scalar export") {
    val res = ScriptOps.run(Iterator.empty, isSource = true,
      "", """
        var1 = $.params.p1;
        var2 = $.params["p2"];
        $.yield(...var1, var2);
      """, "", NOW, Map("p1" -> Seq("1", "2"), "p2" -> Seq("abc")), None)
    assert(res.rows.map(_._2) == Seq(Seq("1", "2", "abc")))
  }

  test("$.result declares envelope columns") {
    val res = ScriptOps.run(Iterator.empty, isSource = true,
      "", """
        $.result = { columns: ["a", "b", "c", "d"], types: ["int64", "double", "string", "bool"] };
        var arr = [1, 2.3, '3.4', true];
        $.yield(...arr);
      """, "", NOW, Map.empty, None)
    assert(res.envelope.contains((Seq("a", "b", "c", "d"), Seq("int64", "double", "string", "bool"))))
    assert(res.rows.head._2 == Seq(1L, 2.3, "3.4", true))
  }

  test("inflight set/get bridges SET variables") {
    val res = ScriptOps.run(
      Iterator((1L: Any, Seq[Any](1.0), Map[String, Any]("key1" -> 123L, "key2" -> "abc"))),
      isSource = false,
      "", """$.yield($.inflight().get("key1"), $.inflight().get("key2"));""",
      "", NOW, Map.empty, None)
    assert(res.rows.head._2 == Seq(123L, "abc"))

    val res2 = ScriptOps.run(
      Iterator((1L: Any, Seq[Any](1.0), Map.empty[String, Any])),
      isSource = false,
      "", """
        $.inflight().set("key1", 123);
        $.inflight().set("key2", "abc");
        $.yield("");
      """, "", NOW, Map.empty, None)
    assert(res2.rows.head._3 == Map("key1" -> 123L, "key2" -> "abc"))
  }

  test("mathx.fft over accumulated arrays (init/main/deinit shape)") {
    val n = 64
    val records = (0 until n).iterator.map { i =>
      val t = 1685714509000000000L + i.toLong * 10000000L // 10ms steps
      val v = math.sin(2 * math.Pi * 10 * (i * 0.01)) // 10 Hz
      (i.toLong: Any, Seq[Any](t, v), Map.empty[String, Any])
    }
    val res = ScriptOps.run(records, isSource = false,
      """m = require("mathx"); times = []; values = [];""",
      "times.push($.values[0]); values.push($.values[1]);",
      """
        result = m.fft(times, values);
        for( i = 0; i < result.length; i++ ) {
          $.yield(result[i][0], result[i][1]);
        }
      """, NOW, Map.empty, None)
    assert(res.rows.nonEmpty)
    // peak amplitude should be at ~10 Hz
    val peak = res.rows.maxBy(r => ScriptOps.fromJs(r._2(1), org.apache.spark.sql.types.DoubleType)
      .asInstanceOf[Double])
    val hz = peak._2.head match { case d: java.lang.Double => d.toDouble; case l: java.lang.Long => l.toDouble }
    assert(math.abs(hz - 10.0) < 1.6, s"peak at $hz Hz")
  }

  test("Number statics are reachable on Number itself") {
    assert(evalJs("Number.isInteger(4)") == true)
    assert(evalJs("Number.isInteger(4.5)") == false)
    assert(evalJs("Number.MAX_SAFE_INTEGER") == 9007199254740991L)
    assert(evalJs("Number('2.5')") == 2.5) // still callable
  }

  test("NUL string escape is a real NUL") {
    assert(evalJs(""" 'a\0b'.charCodeAt(1) """) == 0L)
  }

  test("console.log capture") {
    val logs = ArrayBuffer.empty[(String, String)]
    val res = ScriptOps.run(Iterator.empty, isSource = true,
      "", "console.log('Hello, World!'); console.println('Hi Everyone!');",
      "", NOW, Map.empty, None)
    assert(res.logs == Seq(("INFO", "Hello, World!"), ("INFO", "Hi Everyone!")))
  }

  test("require invalid module") {
    val ex = intercept[JsThrown] {
      ScriptOps.run(Iterator.empty, isSource = true,
        "", """const y = require("invalid_module");""", "", NOW, Map.empty, None)
    }
    assert(display(ex.value).contains("Invalid module"))
  }

  test("@jsh/system module") {
    val res = ScriptOps.run(Iterator.empty, isSource = true,
      "", """
        m = require("@jsh/system");
        m.free_os_memory();
        m.gc();
        let now = m.now();
        $.yield("ok", now.unix());
      """, "", NOW, Map.empty, None)
    assert(res.rows.head._2 == Seq("ok", NOW / 1000000000L))
    assert(res.envelope.contains((Seq("column0", "column1"), Seq("string", "int64"))))
  }
}
