package graft

import graft.tql.Tql

/** Round-4 verbatim task_test.go cases: DROP/TAKE offset forms and
  * validation errors (TestDropTake), the unpredicted-bins streaming
  * histogram (TestHistogramUnpredictedBins), and the millisecond-grid
  * TIMEWINDOW under a pinned clock (TestTimeWindowHighDef). */
class ReferenceCases2Spec extends SparkSpec {

  private def run(script: String): String = Tql.run(spark, script)

  test("DROP/TAKE offset forms (task_test.go TestDropTake)") {
    assert(run("FAKE( linspace(0, 2, 100))\nDROP(50)\nTAKE(3)\nPUSHKEY('test')\nCSV(precision(6))\n")
      == "51,1.010101\n52,1.030303\n53,1.050505\n")
    assert(run("FAKE( linspace(0, 2, 100))\nDROP(0)\nTAKE(2)\nPUSHKEY('test')\nCSV(precision(6))\n")
      == "1,0.000000\n2,0.020202\n")
    assert(run("FAKE( linspace(0, 2, 100))\nDROP(0)\nTAKE(0)\nPUSHKEY('test')\nCSV(precision(6))\n")
      == "")
    assert(run("FAKE( linspace(0, 2, 100))\nDROP(5, 45)\nTAKE(5, 3)\nPUSHKEY('test')\nCSV(precision(6))\n")
      == "51,1.010101\n52,1.030303\n53,1.050505\n")
  }

  test("TAKE/DROP reject non-positive two-arg limits (fm_monad.go)") {
    val e1 = intercept[IllegalArgumentException](
      run("FAKE( linspace(0, 2, 100) )\nTAKE(5, -1)\nCSV(precision(6))\n"))
    assert(e1.getMessage == "f(TAKE) arg(1) limit should be larger than 0")
    val e2 = intercept[IllegalArgumentException](
      run("FAKE( linspace(0, 2, 100) )\nDROP(5, -1)\nCSV(precision(6))\n"))
    assert(e2.getMessage == "f(DROP) arg(1) limit should be larger than 0")
  }

  test("HISTOGRAM bins(10): unpredicted streaming bins (task_test.go:326-348)") {
    val out = run(
      """FAKE( arrange(1, 100, 1) )
        |MAPVALUE(0, (simplex(12, value(0)) + 1) * 100)
        |HISTOGRAM(value(0), bins(10))
        |CSV( header(true), precision(0) )
        |""".stripMargin)
    assert(out ==
      "value,count\n23,1\n44,6\n59,12\n80,26\n99,20\n113,18\n129,5\n141,2\n153,7\n170,3\n", out)
  }

  test("TIMEWINDOW 1s grid over 1ms oscillator, first agg (task_test.go:2460)") {
    val tick = 1692329338315327000L
    val out = Tql.run(spark,
      """FAKE(
        |    oscillator(
        |      freq(15, 1.0), freq(24, 1.5),
        |      range('now', '10s', '1ms'))
        |  )
        |TIMEWINDOW(
        |    time('now'),
        |    time('now+10s'),
        |    period('1s'),
        |    'time', 'first')
        |CSV(timeformat("ns"), heading(true), precision(7))
        |""".stripMargin, tick)
    assert(out ==
      """time,value
        |1692329339000000000,0.1046705
        |1692329340000000000,0.1046637
        |1692329341000000000,0.1046874
        |1692329342000000000,0.1046806
        |1692329343000000000,0.1046738
        |1692329344000000000,0.1046670
        |1692329345000000000,0.1046906
        |1692329346000000000,0.1046838
        |1692329347000000000,0.1046770
        |1692329348000000000,0.1046702
        |""".stripMargin, out)
  }
}
