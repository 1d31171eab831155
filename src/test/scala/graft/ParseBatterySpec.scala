package graft

import graft.tql.{Expr, Parser}
import graft.tql.Expr._

/** Body-level mining of the expression parser tests:
  * `mods/tql/expression/parse_test.go` (token semantics re-expressed as
  * AST/eval asserts — our Pratt parser emits trees, not token streams),
  * `pratt_regression_test.go` (associativity), and
  * `error_position_test.go` (error kind + line/column/near spans).
  */
class ParseBatterySpec extends SparkSpec {

  private def p(s: String): Expr = Parser.parseExpression(s)
  private def eval(expr: String): String =
    runTrim(s"FAKE(once(1))\nMAPVALUE(0, $expr)\nCSV()").trim

  // ---- TestConstantParsing (parse_test.go:20-307) ----------------------

  test("string literal forms: quotes, backtick, clause, unicode (parse_test.go:76-112,165-177)") {
    assert(p("'foo'") == Str("foo"))
    assert(p("\"foo\"") == Str("foo"))
    // backtick raw keeps embedded double quotes and unicode
    assert(p("`foo\"bar\"`") == Str("foo\"bar\""))
    assert(p("`foo\"bar안녕🌶️\"`") == Str("foo\"bar안녕🌶️\""))
    // clause string {foo} lexes as a STRING token
    assert(p("{foo}") == Call("json", Nil) || p("{foo}") == Str("foo"),
      p("{foo}").toString)
    // \n escape inside a single-quoted literal (:104-110)
    assert(p("'foo\\nbar'") == Str("foo\nbar"))
    // backslash escape of a quote inside double quotes (:1014-1020)
    assert(p("\"foo\\'bar\"") == Str("foo'bar"))
    // nested quote forms (TestNestedQuote :816-836)
    assert(p("'foo\"bar\"'") == Str("foo\"bar\""))
    assert(p("\"foo'bar'\"") == Str("foo'bar'"))
    // internationalized parameter name lexes as one variable (:172-177)
    assert(p("ÆŦǽഈᚥஇคٸ") == Ident("ÆŦǽഈᚥஇคٸ"))
  }

  test("function trees: parameterless, nested, modifier afterwards (parse_test.go:179-265)") {
    assert(p("foo()") == Call("foo", Nil))
    assert(p("foo('bar')") == Call("foo", List(Str("bar"))))
    assert(p("foo('bar', 1.0)") == Call("foo", List(Str("bar"), Num(1.0))))
    assert(p("foo(foo('bar'), 1.0, foo(2.0))") ==
      Call("foo", List(Call("foo", List(Str("bar"))), Num(1.0),
        Call("foo", List(Num(2.0))))))
    assert(p("foo() + 1") == Bin("+", Call("foo", Nil), Num(1.0)))
    assert(p("(foo()-1) > 3") ==
      Bin(">", Bin("-", Call("foo", Nil), Num(1.0)), Num(3.0)))
    // function call following an inline comment (:292-303)
    assert(p("foo() // this is comment") == Call("foo", Nil))
  }

  test("inline comments inside a multi-line call (TestInlineComment :308-340)") {
    val e = p("(\n\t\t\t\tfoo(\n\t\t\t\t\t\"bar\", // comment\n\t\t\t\t\tnoop()\n\t\t\t\t)\n\t\t\t\t-1\n\t\t\t) > 3")
    assert(e == Bin(">",
      Bin("-", Call("foo", List(Str("bar"), Call("noop", Nil))), Num(1.0)),
      Num(3.0)), e.toString)
  }

  test("script blocks and tagged heredocs (TestScriptBlock :342-422)") {
    assert(p("script({l = a + b\n return l\n})") ==
      Call("script", List(Str("l = a + b\n return l\n"))))
    assert(p("script('tengo', {l = a + b\n return l\n})") ==
      Call("script", List(Str("tengo"), Str("l = a + b\n return l\n"))))
    // {<<TAG … TAG} body may hold literal braces
    assert(p("script({<<JS\n// this is a function return '{'\nfunction a () { return '{' };\nJS})") ==
      Call("script", List(Str("// this is a function return '{'\nfunction a () { return '{' };\n"))))
    assert(p("script({<<MD\n```mermaid\nerDiagram\n    CUSTOMER ||--o{ ORDER :places\n```\nMD})") ==
      Call("script", List(Str("```mermaid\nerDiagram\n    CUSTOMER ||--o{ ORDER :places\n```\n"))))
    // tagged backtick form keeps nested backticks
    assert(p("script(`<<MD\n```mermaid\nerDiagram\n    CUSTOMER ||--o{ ORDER :places\n    NOTE : `inline` text\n```\nMD`)") ==
      Call("script", List(Str("```mermaid\nerDiagram\n    CUSTOMER ||--o{ ORDER :places\n    NOTE : `inline` text\n```\n"))))
    // tagged block with a trailing option function
    assert(p("markdown({<<EOF\n{{ if .IsFirst }}\n```d2\n{{ end }}\nEOF}, html(true))") ==
      Call("markdown", List(Str("{{ if .IsFirst }}\n```d2\n{{ end }}\n"),
        Call("html", List(Bool(true))))))
  }

  test("prefix operators on literals and variables (TestPrefixParsing :837-928)") {
    assert(p("-1") == Num(-1.0))
    assert(p("-foo") == Unary("-", Ident("foo")))
    assert(p("!true") == Unary("!", Bool(true)))
    assert(p("!foo") == Unary("!", Ident("foo")))
    assert(p("~1") == Unary("~", Num(1.0)))
    assert(p("~foo") == Unary("~", Ident("foo")))
  }

  test("comparator/membership/ternary shapes (TestComparatorParsing :461-686, TestTernaryParsing :1050-1117)") {
    assert(p("'foo' in ('foo', 'bar')") ==
      In(Str("foo"), List(Str("foo"), Str("bar"))))
    // uppercase IN is the same comparator (:604-613)
    assert(p("'foo' IN ('foo', 'bar')") ==
      In(Str("foo"), List(Str("foo"), Str("bar"))))
    assert(p("true ? 1") == Ternary(Bool(true), Num(1.0), Null))
    assert(p("1 == 0 ? true") ==
      Ternary(Bin("==", Num(1.0), Num(0.0)), Bool(true), Null))
    assert(p("1 ?? 2") == Bin("??", Num(1.0), Num(2.0)))
    // modifier characters inside string operands stay strings (:532-567)
    assert(eval("'foo' == '+'") == "false")
    assert(eval("'foo' == '/'") == "false")
    assert(eval("'foo' == '**'") == "false")
    assert(eval("'foo' == '^'") == "false")
    assert(eval("'foo' == '>>'") == "false")
    assert(eval("'foo' == '?'") == "false")
    // string ordering comparators (:504-531)
    assert(eval("'ab.cd' < 'abc.def'") == "true")
    assert(eval("'ab.cd' <= 'abc.def'") == "true")
    assert(eval("'ab.cd' > 'abc.def'") == "false")
    assert(eval("'ab.cd' >= 'abc.def'") == "false")
    // concatenation across quote styles (:568-591)
    assert(eval("'foo'+`bar`") == "foobar")
    assert(eval("'foo'+{bar}") == "foobar")
    // membership evaluates (uppercase too)
    assert(eval("'foo' IN ('foo', 'bar')") == "true")
  }

  // ---- pratt_regression_test.go ----------------------------------------

  test("associativity regressions (pratt_regression_test.go:8-53)") {
    assert(eval("10 - 3 - 2") == "5")
    assert(eval("2 ** 3 ** 2") == "512") // exponent is right-associative
    assert(p("2 ** 3 ** 2") ==
      Bin("**", Num(2.0), Bin("**", Num(3.0), Num(2.0))))
    assert(p("10 - 3 - 2") ==
      Bin("-", Bin("-", Num(10.0), Num(3.0)), Num(2.0)))
  }

  // ---- error_position_test.go ------------------------------------------

  private def parseErr(s: String): Parser.ParseException =
    intercept[Parser.ParseException](p(s))

  test("invalid token reports kind and position (TestParseErrorInvalidTokenPosition)") {
    val e = parseErr("1 @ 2")
    assert(e.kind == "invalid_token", e.kind)
    assert(e.line == 1 && e.column == 3, s"${e.line},${e.column}")
    assert(e.near == "@", e.near)
    assert(e.getMessage == "invalid token: '@' (line=1, column=3, near=\"@\")",
      e.getMessage)
  }

  test("unexpected end reports the position past the last token (TestParseErrorUnexpectedEndPosition)") {
    val e = parseErr("1 +")
    assert(e.kind == "unexpected_end", e.kind)
    assert(e.line == 1 && e.column == 4, s"${e.line},${e.column}")
    assert(e.near == "+", e.near)
    assert(e.getMessage ==
      "unexpected end of expression (line=1, column=4, near=\"+\")",
      e.getMessage)
  }

  test("unbalanced parenthesis reports the opening token (TestParseErrorUnbalancedParenthesisPosition)") {
    val e = parseErr("(1 + 2")
    assert(e.kind == "unbalanced_parenthesis", e.kind)
    assert(e.line == 1 && e.column == 1, s"${e.line},${e.column}")
    assert(e.near == "(", e.near)
    // dangling call parenthesis is the same kind at its own '('
    val e2 = parseErr("foo(1, 2")
    assert(e2.kind == "unbalanced_parenthesis", e2.kind)
    assert(e2.column == 4, e2.column)
  }

  // ---- evaluationfail_test.go typing batteries --------------------------

  test("static literal typing: modifier/comparator/logical/ternary/prefix errors (evaluationfail_test.go:94-414)") {
    def fails(expr: String, contains: String): Unit = {
      val e = intercept[Exception](
        runTrim(s"FAKE(once(1))\nMAPVALUE(0, $expr)\nCSV()"))
      assert(String.valueOf(e.getMessage).contains(contains),
        s"$expr → ${e.getMessage}")
    }
    // TestModifierTyping: "cannot be used with the modifier"
    fails("1 + true", "Value 'true' cannot be used with the modifier '+', it is not a number")
    fails("1 - true", "cannot be used with the modifier")
    fails("1 * true", "cannot be used with the modifier")
    fails("1 / true", "cannot be used with the modifier")
    fails("1 ** true", "cannot be used with the modifier")
    fails("1 % true", "cannot be used with the modifier")
    fails("1 | true", "cannot be used with the modifier")
    fails("1 & true", "cannot be used with the modifier")
    fails("1 ^ true", "cannot be used with the modifier")
    fails("1 << true", "cannot be used with the modifier")
    fails("1 >> true", "cannot be used with the modifier")
    // TestComparatorTyping: bools never order; number vs string mixes fail
    fails("true > true", "Value 'true' cannot be used with the comparator '>', it is not a number")
    fails("true >= true", "cannot be used with the comparator")
    fails("true < true", "cannot be used with the comparator")
    fails("true <= true", "cannot be used with the comparator")
    fails("1 > 'foo'", "cannot be used with the comparator")
    fails("1 =~ 'foo'", "cannot be used with the comparator")
    fails("1 !~ 'foo'", "cannot be used with the comparator")
    fails("true =~ 'foo'", "cannot be used with the comparator")
    fails("'foo' =~ 1", "cannot be used with the comparator")
    // TestLogicalOperatorTyping: "cannot be used with the logical operator"
    fails("1 && true", "Value '1' cannot be used with the logical operator '&&', it is not a bool")
    fails("true || 1", "cannot be used with the logical operator")
    // TestTernaryTyping
    fails("1 ? true", "cannot be used with the ternary operator '?', it is not a bool")
    // TestPrefixTyping-ish (prefixErrorFormat)
    fails("!1", "Value '1' cannot be used with the prefix '!'")
    fails("-'foo'", "cannot be used with the prefix '-'")
    fails("~true", "cannot be used with the prefix '~'")
    // TestRegexParameterCompilation: a bad literal pattern fails compile
    fails("'foo' =~ '[invalid'", "unable to compile regexp pattern '[invalid'")
    // string-string ordering and concat stay legal (evaluation_test.go)
    assert(runTrim("FAKE(once(1))\nMAPVALUE(0, 'ab' < 'abc')\nCSV()").trim == "true")
    assert(runTrim("FAKE(once(1))\nMAPVALUE(0, 'foo' + true)\nCSV()").trim == "footrue")
  }

  test("trailing tokens no longer silently truncate (parse.go:300 invalid_token)") {
    // an accessor is a Go-struct feature the TQL fm context cannot
    // reach; it must ERROR, not quietly evaluate the left operand
    val e = parseErr("foo.Var")
    assert(e.kind == "invalid_token" && e.near == ".", s"${e.kind} ${e.near}")
    val e2 = parseErr("1 2")
    assert(e2.kind == "invalid_token", e2.kind)
    // multi-line span: the offending token's line is reported
    val e3 = parseErr("foo() +\n10 @")
    assert(e3.line == 2, s"${e3.line},${e3.column}")
  }
}
