package graft.server

import scala.collection.mutable.ListBuffer
import graft.sinks.GoJs

/** The web console's statement splitters (reference mods/util/split.go
  * SplitSqlStatements/SplitHttpStatements, served at
  * `/web/api/splitter/sql` and `/web/api/splitter/http` —
  * http_test.go TestSplitSQL/TestSplitHTTP, split_test.go goldens).
  *
  * SQL splitting is a character walk: `;` outside single-quoted strings
  * closes a statement; `--`/`//` start line comments which are emitted
  * as their OWN statements (with positions) and removed from statement
  * text; `--` after `explain`/`desc`/`show tables`/`show table` (with
  * only flag tokens since) is a flag, not a comment; `-- env: …`
  * comments thread an environment (bridge=…, reset) onto every later
  * statement.
  */
object Splitters {
  case class SqlEnv(error: String = "", bridge: String = "") {
    def toJson: String = {
      val fields = Seq(
        Option(error).filter(_.nonEmpty).map(e => s""""error":${GoJs.quote(e)}"""),
        Option(bridge).filter(_.nonEmpty).map(b => s""""bridge":${GoJs.quote(b)}""")).flatten
      fields.mkString("{", ",", "}")
    }
  }

  case class SqlStatement(text: String, beginLine: Int, endLine: Int,
                          isComment: Boolean, stmtType: String, env: SqlEnv) {
    def toJson: String = {
      val sb = new StringBuilder
      sb.append(s"""{"text":${GoJs.quote(text)},"beginLine":$beginLine,""")
      sb.append(s""""endLine":$endLine,"isComment":$isComment""")
      if (stmtType.nonEmpty) sb.append(s""","stmtType":"$stmtType"""")
      sb.append(s""","env":${env.toJson}}""")
      sb.toString
    }
  }

  case class HttpStatement(text: String, beginLine: Int, endLine: Int) {
    def toJson: String =
      s"""{"text":${GoJs.quote(text)},"beginLine":$beginLine,"endLine":$endLine}"""
  }

  private val doubleDashAsFlags: Seq[Seq[String]] =
    Seq(Seq("explain"), Seq("desc"), Seq("show", "tables"), Seq("show", "table"))

  /** `--` is a statement flag (not a comment) when the statement so far
    * is one of the flag-bearing verbs followed only by flag tokens. */
  private def treatDoubleDashAsFlag(statement: String): Boolean = {
    val tokens = statement.trim.split("\\s+").filter(_.nonEmpty).toSeq
    if (tokens.isEmpty) return false
    doubleDashAsFlags.exists { prefix =>
      tokens.size >= prefix.size &&
        prefix.indices.forall(i => tokens(i).equalsIgnoreCase(prefix(i))) &&
        tokens.drop(prefix.size).forall(_.startsWith("--"))
    }
  }

  /** Leading keyword, lowercased, non-letters trimmed from both ends;
    * WITH scans forward for the first verb keyword. */
  private def detectSqlStatementType(statement: String): String = {
    def normalize(tok: String): String = {
      val s = tok.dropWhile(!_.isLetter)
      val t = s.reverse.dropWhile(!_.isLetter).reverse
      t.toUpperCase
    }
    val tokens = statement.trim.split("\\s+").filter(_.nonEmpty).toSeq
    if (tokens.isEmpty) return ""
    val primary = normalize(tokens.head)
    if (primary.isEmpty) return ""
    if (primary == "WITH") {
      val verbs = Set("SELECT", "INSERT", "UPDATE", "DELETE", "MERGE",
        "CREATE", "ALTER", "DROP", "TRUNCATE", "EXPLAIN", "SHOW", "DESC",
        "DESCRIBE", "CALL", "EXEC", "EXECUTE", "GRANT", "REVOKE")
      tokens.tail.map(normalize).find(verbs.contains).foreach(kw => return kw.toLowerCase)
    }
    primary.toLowerCase
  }

  /** name=value pairs with double-quoted values that may hold spaces and
    * escaped quotes (split.go ParseNameValuePairs). */
  private[graft] def parseNameValuePairs(input: String): Seq[(String, String)] = {
    val re = """([-\w_.]+)(?:=("([^"\\]*(\\.[^"\\]*)*)"|[^ ]+))?""".r
    re.findAllMatchIn(input).map { m =>
      val key = m.group(1)
      val raw = Option(m.group(2)).getOrElse("")
      val value =
        if (raw.startsWith("\"") && raw.endsWith("\"") && raw.length >= 2)
          raw.substring(1, raw.length - 1).replace("\\\"", "\"")
        else raw
      key -> value
    }.toSeq
  }

  /** `-- env: bridge=sqlite` / `-- env: reset` comment directives; an
    * unrecognized name records the reference's error string. */
  private def parseStatementEnv(prev: SqlEnv, text0: String): SqlEnv = {
    val text = text0.trim.stripPrefix("--").trim
    if (!text.startsWith("env:")) return prev
    val pairs = parseNameValuePairs(text.stripPrefix("env:").trim)
    if (pairs.isEmpty) return prev
    var env = prev
    pairs.foreach {
      case ("bridge", v) => env = env.copy(bridge = v)
      case ("reset", _) => env = SqlEnv()
      case (name, _) => env = env.copy(error = s"unknown env: $name")
    }
    env
  }

  def splitSqlStatements(input: String): Seq[SqlStatement] = {
    var env = SqlEnv()
    val out = ListBuffer.empty[SqlStatement]
    val buffer = new StringBuilder
    val comment = new StringBuilder
    var inString = false
    var inComment = false
    var inDash = false
    var inSlash = false
    var line = 1
    var startLine = 1
    var i = 0
    val n = input.length
    while (i < n) {
      val ch = input(i)
      if (inComment) {
        if (ch == '\n') {
          inComment = false
          env = parseStatementEnv(env, comment.toString)
          out += SqlStatement(comment.toString, startLine, line,
            isComment = true, "", env)
          line += 1
          if (buffer.toString.trim.isEmpty) startLine = line
        }
        if (ch != '\r') comment.append(ch)
      } else {
        var consumed = false
        ch match {
          case '\'' => inString = !inString
          case '-' if !inString =>
            if (inDash) {
              if (treatDoubleDashAsFlag(buffer.toString)) {
                buffer.append("--"); inDash = false
              } else {
                comment.clear(); inComment = true
                comment.append("--"); inDash = false
              }
            } else inDash = true
            consumed = true
          case '/' if !inString =>
            if (inSlash) {
              comment.clear(); inComment = true; comment.append("//")
            }
            inSlash = !inSlash
            consumed = true
          case ';' if !inString =>
            val text = buffer.toString + ";"
            out += SqlStatement(text, startLine, line, isComment = false,
              detectSqlStatementType(text), env)
            buffer.clear(); startLine = line
            consumed = true
          case '\n' => line += 1
          case _ =>
        }
        if (!consumed) {
          if (buffer.toString.trim.isEmpty && " \t\r\n".indexOf(ch) >= 0)
            startLine = line
          else {
            if (inDash) { buffer.append('-'); inDash = false }
            if (inSlash) { buffer.append('/'); inSlash = false }
            buffer.append(ch)
          }
        }
      }
      i += 1
    }
    if (buffer.toString.trim.nonEmpty)
      out += SqlStatement(buffer.toString, startLine, line, isComment = false,
        detectSqlStatementType(buffer.toString), env)
    out.toList
  }

  /** `###`-separated request blocks, 1-based line spans; blank blocks are
    * skipped, each block keeps its raw lines with a trailing newline. */
  def splitHttpStatements(input: String): Seq[HttpStatement] = {
    val out = ListBuffer.empty[HttpStatement]
    val buffer = new StringBuilder
    var lineNumber = 0
    var startLine = 1
    // bufio.ScanLines: a trailing \n does not produce an empty last line
    val lines = input.split("\n", -1) match {
      case ls if ls.nonEmpty && ls.last.isEmpty => ls.dropRight(1)
      case ls => ls
    }
    lines.foreach { line0 =>
      val line = line0.stripSuffix("\r")
      lineNumber += 1
      if (line.trim.startsWith("###")) {
        if (buffer.nonEmpty) {
          val text = buffer.toString
          if (text.trim.nonEmpty)
            out += HttpStatement(text, startLine, lineNumber - 1)
          buffer.clear()
        }
        startLine = lineNumber + 1
      } else {
        buffer.append(line).append('\n')
      }
    }
    if (buffer.nonEmpty)
      out += HttpStatement(buffer.toString, startLine, lineNumber)
    out.toList
  }
}
