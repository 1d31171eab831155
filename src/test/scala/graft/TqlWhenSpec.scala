package graft

import graft.tql.{Tql, TqlLog}

/** WHEN(cond, doLog|do(sub-routine)) — the reference's TestDiscardSink and
  * sub-routine cases (task_test.go:702-750, 1590-1620) with their exact
  * ExpectLog lines. */
class TqlWhenSpec extends SparkSpec {

  test("WHEN doLog fires per matching record (task_test.go:702-727)") {
    val (_, logs) = TqlLog.capture {
      runTrim(
        """CSV("1,line-1\n2,line-2\n3,line-3")
          |MAPVALUE(0, parseFloat(value(0)))
          |WHEN(
          |  value(0) == 2 &&
          |  strHasPrefix( strToUpper(value(1)), "LINE-") &&
          |  strHasSuffix(value(1), "-2"),
          |  do(value(0), strToUpper(value(1)), {
          |    ARGS()
          |    WHEN(true, doLog("OUTPUT:", value(0), strToLower(value(1)) ))
          |    CSV()
          |  })
          |)
          |DISCARD()
          |""".stripMargin)
    }
    assert(logs.contains("[WARN] do: CSV() sink does not work in a sub-routine"), logs)
    assert(logs.contains("[INFO] OUTPUT: 2 line-2"), logs)
  }

  test("WHEN do() sub-routine over json source (task_test.go:728-750)") {
    val (_, logs) = TqlLog.capture {
      runTrim(
        """FAKE( json({
          |  [ 1, "hello" ],
          |  [ 2, "you" ],
          |  [ 3, "world" ],
          |  [ 4, "there" ]
          |}))
          |WHEN(
          |  mod(value(0), 2) == 0,
          |  do( value(0), strToUpper(value(1)), {
          |    ARGS()
          |    WHEN( true, doLog("OUTPUT:", value(0), value(1)))
          |    DISCARD()
          |  })
          |)
          |CSV()
          |""".stripMargin)
    }
    assert(logs.contains("[INFO] OUTPUT: 2 YOU"), logs)
    assert(logs.contains("[INFO] OUTPUT: 4 THERE"), logs)
  }

  test("WHEN do('name', …) with args(i) and FAKE(args()) (task_test.go:1590-1620)") {
    val (_, logs) = TqlLog.capture {
      runTrim(
        """FAKE( linspace(0, 1, 2) )
          |WHEN( mod(value(0),2) == 1, do("test", value(0), {
          |  ARGS() // some comment
          |  WHEN(true, doLog("MSG", args(0), args(1), "hi") ) // some comment
          |  DISCARD() // some comment
          |} )) // some comment
          |DISCARD() // some comment
          |""".stripMargin)
    }
    assert(logs.contains("[INFO] MSG test 1 hi"), logs)

    val (_, logs2) = TqlLog.capture {
      runTrim(
        """FAKE( linspace(0, 1, 2) )
          |WHEN( mod(value(0),2) == 1, do("test", value(0), {
          |  FAKE( args() )
          |  WHEN(true, doLog("MSG", args(0), args(1), "hi") )
          |  DISCARD()
          |} ))
          |DISCARD()
          |""".stripMargin)
    }
    assert(logs2.contains("[INFO] MSG test 1 hi"), logs2)
  }

  test("pragma log-level=warn suppresses INFO console output (tql_test.go:2744-2767)") {
    val (out, logs) = TqlLog.capture {
      runTrim(
        """#pragma log-level=warn
          |FAKE( linspace(1, 5, 5))
          |SCRIPT("js", { console.log("-", $.values[0]); $.yield($.values[0]) })
          |JSON()
          |""".stripMargin)
    }
    assert(out.contains(""""success":true"""), out)
    assert(out.contains(""""rows":[[1],[2],[3],[4],[5]]"""), out)
    assert(logs.isEmpty, logs)
  }

  test("//+ log-level comment pragma form (tql_pragma_test.go TestPragma2)") {
    val (_, logs) = TqlLog.capture {
      runTrim(
        """//+ log-level=error sql-thread-lock
          |FAKE( linspace(1, 2, 2))
          |SCRIPT("js", { console.log("line", $.values[0]); $.yield($.values[0]) })
          |DISCARD()
          |""".stripMargin)
    }
    assert(logs.isEmpty, logs)
  }

  test("SCRIPT console output is captured in the task log (fm_script_test.go:18-33)") {
    val (_, logs) = TqlLog.capture {
      runTrim(
        """SCRIPT("js", "console.log('Hello, World!'); console.println('Hi Everyone!');")
          |DISCARD()
          |""".stripMargin)
    }
    assert(logs == Seq("[INFO] Hello, World!", "[INFO] Hi Everyone!"), logs)
  }
}
