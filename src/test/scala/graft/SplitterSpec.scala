package graft

import java.nio.file.{Files, Paths}
import graft.server.Splitters
import graft.server.Splitters.{SqlEnv, SqlStatement}
import org.scalatest.funsuite.AnyFunSuite

/** Reproduces the reference's statement-splitter batteries
  * (mods/util/split_test.go, http_test.go TestSplitSQL/TestSplitHTTP)
  * including the splitter_sql_1/2 golden JSON fixtures read from the
  * read-only checkout. */
class SplitterSpec extends AnyFunSuite {

  test("single-line select; quoted -- is not a comment (TestSplitSqlStatementsSingleLine)") {
    val got = Splitters.splitSqlStatements("SELECT 2 FROM T WHERE name = '--abc';")
    assert(got == Seq(SqlStatement(
      "SELECT 2 FROM T WHERE name = '--abc';", 1, 1, false, "select", SqlEnv())))
  }

  test("double-dash flags survive on explain/show (TestSplitSqlStatementsDoubleDashFlags)") {
    assert(Splitters.splitSqlStatements("explain --full select * from example;") ==
      Seq(SqlStatement("explain --full select * from example;", 1, 1, false, "explain", SqlEnv())))
    assert(Splitters.splitSqlStatements("show tables --all;") ==
      Seq(SqlStatement("show tables --all;", 1, 1, false, "show", SqlEnv())))
    assert(Splitters.splitSqlStatements("explain --full select * from example -- comment\nwhere id = 1;") ==
      Seq(
        SqlStatement("-- comment", 1, 1, true, "", SqlEnv()),
        SqlStatement("explain --full select * from example where id = 1;", 1, 2, false, "explain", SqlEnv())))
  }

  test("statement walk: comments as statements, strings shield ; -- // (ExampleSplitSqlStatements)") {
    val input =
      "SELECT 1; SELECT 2 FROM T WHERE name = '--abc';\n" +
      "\t-- comment\n" +
      "\t\n" +
      "\tSELECT *  -- start of statement\n" +
      "\tFROM\n" +
      "\t\ttable \n" +
      "\tWHERE\n" +
      "\t\tname = 'a;b--c'; -- end of statement\n" +
      "\tSELECT 4;\n" +
      "\n" +
      "\twrong statement\n" +
      "\t"
    val got = Splitters.splitSqlStatements(input)
    val summary = got.map(s =>
      (s.beginLine, s.endLine, s.isComment,
        s.text.replaceAll("\\s+", " ").trim))
    assert(summary == Seq(
      (1, 1, false, "SELECT 1;"),
      (1, 1, false, "SELECT 2 FROM T WHERE name = '--abc';"),
      (2, 2, true, "-- comment"),
      (4, 4, true, "-- start of statement"),
      (4, 8, false, "SELECT * FROM table WHERE name = 'a;b--c';"),
      (8, 8, true, "-- end of statement"),
      (9, 9, false, "SELECT 4;"),
      (11, 12, false, "wrong statement")), summary)
  }

  test("env directives thread bridge onto later statements (split.go ParseStatementEnv)") {
    val got = Splitters.splitSqlStatements(
      "-- env: bridge=sqlite\nselect 1;\n-- env: reset\nselect 2;\n-- env: nope=1\nselect 3;")
    assert(got(0).env == SqlEnv(bridge = "sqlite"))
    assert(got(1).env == SqlEnv(bridge = "sqlite"))
    assert(got(3).env == SqlEnv())
    assert(got(4).env.error == "unknown env: nope")
    assert(got(5).env.error == "unknown env: nope")
  }

  test("name=value pair parsing with quoted values (ExampleParseNameValuePairs)") {
    val got = Splitters.parseNameValuePairs(
      """name1=value1 name2="value \"with\" spaces" name3=value3 name4 log-level=info""")
    assert(got == Seq(
      "name1" -> "value1",
      "name2" -> "value \"with\" spaces",
      "name3" -> "value3",
      "name4" -> "",
      "log-level" -> "info"), got)
  }

  test("splitter_sql_1/2 golden fixtures round-trip field-exact") {
    val dir = "/root/reference/mods/util/testdata"
    for (n <- Seq(1, 2)) {
      val sql = new String(Files.readAllBytes(Paths.get(s"$dir/splitter_sql_$n.sql")), "UTF-8")
      val wantJson = new String(Files.readAllBytes(Paths.get(s"$dir/splitter_sql_$n.json")), "UTF-8")
      val got = Splitters.splitSqlStatements(sql).map(_.toJson).mkString("[", ",", "]")
      // compare structurally: strip whitespace outside strings from the fixture
      def canon(s: String): String = {
        val sb = new StringBuilder
        var inStr = false
        var i = 0
        while (i < s.length) {
          val c = s(i)
          if (inStr) {
            sb.append(c)
            if (c == '\\' && i + 1 < s.length) { sb.append(s(i + 1)); i += 1 }
            else if (c == '"') inStr = false
          } else if (c == '"') { inStr = true; sb.append(c) }
          else if (!c.isWhitespace) sb.append(c)
          i += 1
        }
        sb.toString
      }
      assert(canon(got) == canon(wantJson), s"splitter_sql_$n: $got")
    }
  }

  test("http statements split on ### with line spans (TestSplitHTTP)") {
    assert(Splitters.splitHttpStatements("GET /web/api/tables HTTP/1.1\nHost: localhost:8080") ==
      Seq(Splitters.HttpStatement("GET /web/api/tables HTTP/1.1\nHost: localhost:8080\n", 1, 2)))
    assert(Splitters.splitHttpStatements("\n###\nGET /abc\n###\nGET /def\n###\nGET /gih") ==
      Seq(
        Splitters.HttpStatement("GET /abc\n", 3, 3),
        Splitters.HttpStatement("GET /def\n", 5, 5),
        Splitters.HttpStatement("GET /gih\n", 7, 7)))
    // ExampleSplitHttpStatements: a leading blank line stays in the block
    val ex = Splitters.splitHttpStatements(
      "\nPOST /api/echo HTTP/1.1\nContent-Type: application/json\n\n{\"key\": \"value\"}\n")
    assert(ex.size == 1 && ex.head.beginLine == 1 && ex.head.endLine == 5, ex)
  }

  test("splitter endpoints reply the console envelope (TestSplitSQL wire)") {
    val r = graft.server.WebApi.splitterSql("select * from first;")
    assert(r.status == 200 && r.contentType == "application/json")
    assert(r.body.contains(""""statements":[{"text":"select * from first;","beginLine":1,"endLine":1,"isComment":false,"stmtType":"select","env":{}}]"""), r.body)
    val h = graft.server.WebApi.splitterHttp("GET /abc")
    assert(h.body.contains(""""statements":[{"text":"GET /abc\n","beginLine":1,"endLine":1}]"""), h.body)
  }
}
