package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tql.ScriptStructure
import graft.tql.ScriptStructure.{Kind, ParseError}

/** Script-structure parity with mods/tql/script_parser_test.go and
  * func_test.go TestStatementKindByFunctionName. */
class ScriptStructureSpec extends AnyFunSuite {

  test("statement kinds by function name (func_test.go:35-51)") {
    assert(ScriptStructure.kindByFunctionName("CSV()") == (Kind.SourceOrSink, true))
    assert(ScriptStructure.kindByFunctionName("SQL()") == (Kind.SourceOrMapOrSink, true))
    assert(ScriptStructure.kindByFunctionName("customMap") == (Kind.Map, true))
    assert(ScriptStructure.kindByFunctionName("") == (Kind.Unknown, false))
  }

  test("ParseScript classifies name/kind per statement") {
    val s = ScriptStructure.parse("FAKE(json({\n  [1]\n}))\nMAPVALUE(0, value(0)*10)\nCSV()")
    assert(s.statements.size == 3)
    assert(s.statements(0).name == "FAKE()" && s.statements(0).kind == Kind.Source)
    assert(s.statements(1).name == "MAPVALUE()" && s.statements(1).kind == Kind.Map)
    assert(s.statements(2).name == "CSV()" && s.statements(2).kind == Kind.SourceOrSink)
  }

  test("comments and pragmas are retained as statements") {
    val s = ScriptStructure.parse("FAKE(json({[1]}))\n//+ stateful\n// comment\nCSV()")
    assert(s.statements.size == 4)
    assert(s.statements(1).isPragma && s.statements(1).kind == Kind.Pragma)
    assert(s.statements(2).isComment && s.statements(2).kind == Kind.Comment)
  }

  test("multiline statement keeps its start line") {
    val s = ScriptStructure.parse("FAKE(json({[1]}))\nMAPVALUE(2,\n value(1) * 10,\n true\n)\nCSV()")
    assert(s.statements.size == 3)
    assert(s.statements(1).name == "MAPVALUE()")
    assert(s.statements(1).line == 2)
  }

  test("statement span raw-matches the source") {
    val src = "FAKE(json({[1]})) // trailing\nMAPVALUE(2,\n value(1) * 10,\n true\n)\nCSV()"
    val s = ScriptStructure.parse(src)
    assert(s.statements.size == 3)
    assert(s.statements(0).span.rawFrom(src).trim.startsWith("FAKE(json({[1]}))"))
  }

  test("parse error carries the absolute line and near token") {
    val err = intercept[ParseError](ScriptStructure.parse(
      "FAKE( linspace(0, 360, 50))\nMAPVALUE(1, sin((value(0)/180)*PI))\nMAPVALUE(2, cos((value(0)/180)*PI))3\nCHART()"))
    assert(err.line == 3, err)
    assert(err.near == "3")

    val err2 = intercept[ParseError](ScriptStructure.parse(
      "FAKE( linspace(0, 360, 50))\nMAPVALUE(1, sin((value(0)/180)*PI))2\nCHART()"))
    assert(err2.line == 2 && err2.near == "2")
  }

  test("ParseError formats its location (expression.ParseError)") {
    val e = ParseError("unexpected token '3'", "3", 3, 36)
    assert(e.getMessage == "unexpected token '3' (line=3, column=36, near=\"3\")")
  }

  test("validation: valid pipeline, SQL as map and sink") {
    val ok = ScriptStructure.parse("FAKE(json({[1]}))\nMAPVALUE(0, value(0))\nCSV()")
    assert(ScriptStructure.validate(ok).isEmpty)
    val sql = ScriptStructure.parse(
      "FAKE(json({[1]}))\nSQL('select 1')\nSQL('insert into example values(1)')")
    assert(ScriptStructure.validate(sql).isEmpty)
    val csvSrc = ScriptStructure.parse("CSV(file(\"/tmp/x.csv\"))\nTEXT()")
    assert(ScriptStructure.validate(csvSrc).isEmpty)
  }

  test("validation error kinds (script_parser_test.go)") {
    def kindOf(src: String): String =
      ScriptStructure.validate(ScriptStructure.parse(src)).map(_.kind).getOrElse("ok")
    assert(kindOf("MAPVALUE(0, 1)\nCSV()") == "invalid_source")
    assert(kindOf("FAKE(json({[1]}))\nINSERT(table('example'))\nCSV()") == "invalid_map")
    assert(kindOf("FAKE(json({[1]}))") == "no_sink")
    assert(ScriptStructure.validate(ScriptStructure.Script("", Nil)).map(_.kind)
      .contains("no_source"))
    assert(kindOf("FAKE(json({[1]}))\nMAPVALUE(0, 1)\nSCRIPT({ x })") == "invalid_sink")
  }

  test("ScriptError message format with position and snippet") {
    val e = ScriptStructure.ScriptError("invalid_map",
      "\"INSERT()\" is not applicable for MAP", 2, 1, "INSERT(table('example'))")
    assert(e.getMessage ==
      "line 2, column 1: \"INSERT()\" is not applicable for MAP [statement: INSERT(table('example'))]")
  }
}
