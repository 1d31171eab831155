package graft

/** Verbatim cases from the reference expression engine's evaluation
  * battery (mods/tql/expression/evaluation_test.go
  * TestNoParameterEvaluation), driven through the TQL surface: each
  * expression lands in MAPVALUE over a one-record FAKE and renders via
  * the CSV sink (float64 arithmetic, 6-dec trimmed format).
  */
class ExprEvalSpec extends SparkSpec {

  private def eval(expr: String): String =
    runTrim(s"FAKE(once(1))\nMAPVALUE(0, $expr)\nCSV()").trim

  private val cases: Seq[(String, String)] = Seq(
    // arithmetic
    "51 + 49" -> "100",
    "100 - 51" -> "49",
    "5 * 20" -> "100",
    "100 / 20" -> "5",
    "100 % 2" -> "0",
    "101 % 2" -> "1",
    "10 ** 2" -> "100",
    "20 + 30 + 50" -> "100",
    "20 * 5 - 49" -> "51",
    "100 - (5 * 10)" -> "50",
    "50 + (5 * (15 - 5))" -> "100",
    "5 + 10 * 2" -> "25",
    "10 * 10 * 10" -> "1000",
    "10 * 10 * 10 + 1 * 10 * 10" -> "1100",
    "1 + 101 % 2 * 5" -> "6",
    "1 + 5 ** 3 % 2 * 5" -> "6",
    "1 - 2 - 4 - 8" -> "-13",
    "1 * 4 / 2 * 8" -> "16",
    "10 * -10" -> "-100",
    // bitwise (expression/stage.go: float64(int64 OP int64))
    "100 & 50" -> "32",
    "100 | 50" -> "118",
    "100 ^ 50" -> "86",
    "2 << 1" -> "4",
    "2 >> 1" -> "1",
    "~10" -> "-11",
    "20 & 30 & 50" -> "16",
    "100 ^ (23 * (2 | 5))" -> "197",
    "50 << 1 & 90" -> "64",
    "90 & 50 << 1" -> "64",
    "90 + 50 << 1 * 5" -> "4480",
    // booleans and comparators
    "(1 == 1) || (true == true)" -> "true",
    "(1 == 1) && (true == true)" -> "true",
    "2 > 1" -> "true",
    "5 < 10 && 1 < 5" -> "true",
    "1 > 10 && 11 > 10" -> "false",
    "true == true && false == true" -> "false",
    "10 < 50 && (1 != 2 && 1 > 0)" -> "true",
    "'foo' == 'foo'" -> "true",
    "'foo' != 'bar'" -> "true",
    "'foobar' =~ 'oba'" -> "true",
    "'foo' !~ 'bar'" -> "true",
    "-1 < 0" -> "true",
    "'ab' < 'abc'" -> "true",
    "'ab' <= 'abc'" -> "true",
    "'aba' > 'abc'" -> "false",
    "'aba' >= 'abc'" -> "false",
    "!true == false" -> "true",
    "!(10 < 0)" -> "true",
    "(true && true) || (true && false)" -> "true",
    "true && true || true && false" -> "true",
    "false || true && true || false" -> "true",
    "(10 * 10 * 10) > 10" -> "true",
    "false && true || true" -> "true",
    "true || false && true" -> "true",
    "true && true || false && false" -> "true",
    // date-like strings compare as their text (equal-length patterns)
    "'2014-01-02 14:12:22' == '2014-01-02 14:12:22'" -> "true",
    "'2014-01-02 14:12:22' > '2014-01-02 12:12:22'" -> "true",
    "'2014-01-02 14:12:22' > '2014-01-02 16:12:22'" -> "false",
    "'2014-01-02 09:12:22' <= '2014-01-02 12:12:22'" -> "true",
    "'2014-01-02 14:12:22' >= '2014-01-02 12:12:22'" -> "true",
    "'2014-01-02 14:12:22' >= '2014-01-02 16:12:22'" -> "false",
    "'2014-01-02 14:12:22' < '2014-01-02 16:12:22'" -> "true",
    "'2014-01-02 14:12:22' < '2014-01-02 11:12:22'" -> "false",
    "'2014-01-02 14:12:22' <= '2014-01-02 11:12:22'" -> "false",
    // ternary precedence (evaluation_test.go:361-377): ternary binds
    // loosest, so the bare else-arm swallows the comparison
    "(true ? 1 : 5) < 10" -> "true",
    "true ? 1 : 5 > 10" -> "1",
    "(2 == 2) ? 1 : (true ? 2 : 3)" -> "1",
    "false ? 1 : (true ? 2 : 3)" -> "2",
    // ternary (else optional — nil when absent)
    "true ? 10" -> "10",
    "false ? 10" -> "NULL",
    "10 > 5 ? 35.50" -> "35.5",
    "1 > 5 ? 35.50" -> "NULL",
    "(5 * (15 - 5)) > 5 ? 35.50" -> "35.5",
    "true ? 35.50 > 10" -> "true",
    "false ? 35.50 : 50" -> "50",
    "(false ? 5 : 35.50) > 10" -> "true",
    "true ? (false ? 1 : (false ? 2 : 3)) : (false ? 4 : 5)" -> "3",
    "true ?? true ? 100 + 200 : 400" -> "300",
    // string concatenation via '+' with a string literal operand
    "'foo' + 'bar' == 'foobar'" -> "true",
    "'foo' + 123 == 'foo123'" -> "true",
    "123 + 'bar' == '123bar'" -> "true",
    "'foo' + '02/05/1970' == 'foobar'" -> "false",
    "'foo' + true == 'footrue'" -> "true",
    "true + 'bar' == 'truebar'" -> "true",
    // chained concat keeps string typing through non-literal operands
    // (evaluation_test.go:978-989 "Mixed multiple string concat")
    "'baz' + 123 + 'bar' + true" -> "baz123bartrue",
    // array self-equality (evaluation_test.go:1099-1120)
    "list(0, 0, 0) == list(0, 0, 0)" -> "true",
    "list(0, 0, 0) != list(0, 0, 0)" -> "false",
    // hex literals (parse_test.go TestConstantParsing)
    "0x1" -> "1",
    "0x10" -> "16",
    "0xabcdef" -> "11259375",
    "0xABCDEF" -> "11259375",
    "0x10 + 1" -> "17",
    // coalesce and membership
    "1 ?? 2" -> "1",
    "1 in (1, 2, 3)" -> "true",
    "!(1 in (1, 2, 3))" -> "false")

  test("no-parameter evaluation battery (evaluation_test.go TestNoParameterEvaluation)") {
    // not mirrored: the harness-local Go function cases (foo/passthrough/
    // sum/ten/numeric/success/nope/null, foo:length) — they exercise the
    // Go library's pluggable function map, not TQL semantics; the real
    // TQL registry is covered by FuncBatterySpec/SqlRegistry
    val failures = cases.flatMap { case (input, want) =>
      val got =
        try eval(input)
        catch { case e: Exception => s"<error: ${e.getMessage.linesIterator.next()}>" }
      if (got == want) None else Some(s"$input => $got (want $want)")
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }

  test("NULL-parameter evaluation (evaluation_test.go TestOrParameterEval:624-661, TestNilTernary:1316-1331)") {
    def evalNull(expr: String): String =
      runTrim(s"FAKE( json({ [null] }))\nMAPVALUE(0, $expr)\nCSV()").trim
    assert(evalNull("value(0) == NULL || value(0) > 0") == "true")
    assert(evalNull("value(0) != NULL ? 1 : 2") == "2")
    assert(eval("true ? NULL : 12.3") == "NULL")
  }
}
