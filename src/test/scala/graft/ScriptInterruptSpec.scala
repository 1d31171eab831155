package graft

import graft.tql.{Compiler, TqlLog}

/** Reproduces TestScriptInterrupt (tql_test.go:2182-2256): a task
  * deadline interrupts runaway SCRIPT loops. Main/init interrupts drop
  * the payload entirely; a finalize interrupt keeps the yielded rows.
  * The interrupt is not catchable by script-level try/catch. */
class ScriptInterruptSpec extends SparkSpec {

  private val TimeoutMs = 500L

  test("js-timeout: infinite main loop → no payload + ERROR log") {
    val (out, logs) = TqlLog.capture {
      Compiler.runWithTimeout(spark,
        "FAKE( linspace(1,10,10))\n" +
          "SCRIPT(\"js\", {\n  while(true) {\n  }\n  $.yield(123)\n})\nCSV()\n",
        TimeoutMs)
    }
    assert(out.trim.isEmpty, out)
    assert(logs.exists(l => l.contains("[ERROR]") && l.contains("interrupt at SCRIPT main")), logs)
  }

  test("js-timeout-init: infinite init loop → no payload") {
    val (out, _) = TqlLog.capture {
      Compiler.runWithTimeout(spark,
        "FAKE( linspace(1,10,10))\n" +
          "SCRIPT(\"js\", {\n  while(true) {\n  }\n},{\n  $.yield(123)\n})\nCSV()\n",
        TimeoutMs)
    }
    assert(out.trim.isEmpty, out)
  }

  test("js-timeout-finalize: rows survive, finalize interrupt logged") {
    val (out, logs) = TqlLog.capture {
      Compiler.runWithTimeout(spark,
        "FAKE( linspace(1,10,10))\n" +
          "SCRIPT(\"js\", {\n  function finalize(){\n    while(true) {}\n  }\n},{\n  $.yield($.values[0])\n})\nCSV()\n",
        TimeoutMs)
    }
    assert(trimClose(out) == "1\n2\n3\n4\n5\n6\n7\n8\n9\n10\n", out)
    assert(logs.exists(l => l.contains("[ERROR]") &&
      l.contains("SCRIPT finalize, interrupt")), logs)
  }

  test("interrupt is not catchable by script try/catch") {
    val (out, logs) = TqlLog.capture {
      Compiler.runWithTimeout(spark,
        "FAKE( once(1) )\n" +
          "SCRIPT(\"js\", {\n  try {\n    while(true) {}\n  } catch (e) {\n    $.yield(\"caught\")\n  }\n})\nCSV()\n",
        TimeoutMs)
    }
    assert(!out.contains("caught"), out)
    assert(logs.exists(_.contains("interrupt")), logs)
  }
  test("runaway recursion (no loops) is interruptible at call entry") {
    // exponential fib: bounded stack depth, unbounded call count — a
    // loop-header-only interrupt check would never fire (goja interrupts
    // any statement; we check on every function call)
    val (out, logs) = TqlLog.capture {
      Compiler.runWithTimeout(spark,
        "FAKE( once(1) )\n" +
          "SCRIPT(\"js\", {\n  function fib(n){ return n < 2 ? 1 : fib(n-1) + fib(n-2) }\n  fib(80)\n  $.yield(123)\n})\nCSV()\n",
        TimeoutMs)
    }
    assert(out.trim.isEmpty, out)
    assert(logs.exists(l => l.contains("interrupt at SCRIPT main")), logs)
  }
}
