package graft

import graft.tql.Tql

class Tql2Spec extends SparkSpec {

  test("SET statement creates a $var usable downstream") {
    val out = Tql.run(spark,
      """FAKE(linspace(1, 4, 4))
        |SET doubled = value(0) * 2
        |MAPVALUE(1, $doubled + 1, 'd1')
        |CSV()
        |""".stripMargin)
    assert(out == "1.0,3.0\n2.0,5.0\n3.0,7.0\n4.0,9.0\n")
  }

  test("GROUP where() filters per aggregator") {
    val out = Tql.run(spark,
      """FAKE(linspace(0, 9, 10))
        |MAPVALUE(1, value(0) % 2, 'parity')
        |GROUP(by(value(1), 'parity'),
        |      sum(value(0), 'all_sum'),
        |      sum(value(0), where(value(0) > 4), 'big_sum'))
        |CSV(header())
        |""".stripMargin)
    assert(out == "parity,all_sum,big_sum\n0.0,20.0,14.0\n1.0,25.0,21.0\n")
  }

  test("MAP_DIFF over record order") {
    val out = Tql.run(spark,
      """FAKE(linspace(1, 4, 4))
        |MAPVALUE(0, value(0) * value(0))
        |MAP_DIFF(1, value(0), 'diff')
        |CSV()
        |""".stripMargin)
    assert(out == "1.0,NULL\n4.0,3.0\n9.0,5.0\n16.0,7.0\n")
  }

  test("MAP_MOVAVG with warm-up and noWait") {
    val out = Tql.run(spark,
      """FAKE(linspace(1, 5, 5))
        |MAP_MOVAVG(1, value(0), 3, 'ma')
        |CSV()
        |""".stripMargin)
    assert(out == "1.0,NULL\n2.0,NULL\n3.0,2.0\n4.0,3.0\n5.0,4.0\n")
    val out2 = Tql.run(spark,
      """FAKE(linspace(1, 5, 5))
        |MAP_MOVAVG(1, value(0), 3, noWait(), 'ma')
        |CSV()
        |""".stripMargin)
    assert(out2 == "1.0,1.0\n2.0,1.5\n3.0,2.0\n4.0,3.0\n5.0,4.0\n")
  }

  test("FILTER_CHANGED with and without retain") {
    val out = Tql.run(spark,
      """FAKE(linspace(1, 6, 6))
        |MAPVALUE(1, value(0) <= 3 ? 'lo' : 'hi', 'band')
        |FILTER_CHANGED(value(1))
        |CSV()
        |""".stripMargin)
    assert(out == "1.0,lo\n4.0,hi\n")
  }
}
