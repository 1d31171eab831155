package graft.tql

import scala.collection.mutable.ListBuffer

/** Lexer + Pratt parser for TQL expressions, and the line-based statement
  * splitter (reference: mods/tql/script_parser.go:40-139 — newline
  * statements, `//` comments, `#pragma`, multi-line calls balanced by
  * parens; expression grammar expression/parse.go with binding powers
  * from expression/operator_table.go).
  */
object Parser {
  // ---------------- tokens ----------------
  sealed trait Tok
  case class TNum(v: Double) extends Tok
  case class TStr(v: String) extends Tok
  case class TIdent(s: String) extends Tok
  case class TOp(s: String) extends Tok
  case object TEof extends Tok

  private val multiOps = List("**", "==", "!=", ">=", "<=", "=~", "!~", "&&", "||", "??", "<<", ">>")
  // single characters that form valid operator tokens; anything else is
  // an invalid_token parse error like the reference lexer
  // (expression/parse.go:300, error_position_test.go "1 @ 2" → col 3)
  private val singleOps = "()[]{},+-*/%&|^~!?:<>=$.;".toSet

  /** Parse error carrying the reference's kind/span/near fields
    * (expression/errors.go ParseError; message format `msg (line=N,
    * column=M, near="X")`). */
  final class ParseException(val kind: String, val baseMessage: String,
                             val line: Int, val column: Int, val near: String)
    extends IllegalArgumentException(
      if (near.nonEmpty)
        s"$baseMessage (line=$line, column=$column, near=" + "\"" + near + "\")"
      else s"$baseMessage (line=$line, column=$column)")

  private def parseError(kind: String, msg: String, src: String, offset: Int,
                         near: String): Nothing = {
    var line = 1; var col = 1; var k = 0
    val lim = math.min(offset, src.length)
    while (k < lim) {
      if (src.charAt(k) == '\n') { line += 1; col = 1 } else col += 1
      k += 1
    }
    if (offset >= src.length && offset > 0) col += offset - src.length
    throw new ParseException(kind, msg, line, col, near)
  }

  def lex(s: String): Vector[Tok] = lexSpans(s)._1

  /** Tokens plus each token's start offset in the source (error spans). */
  def lexSpans(s: String): (Vector[Tok], Vector[Int]) = {
    val toks = Vector.newBuilder[Tok]
    val offs = Vector.newBuilder[Int]
    var tokStart = 0
    val out = new AnyRef {
      def +=(t: Tok): Unit = { toks += t; offs += tokStart }
    }
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      tokStart = i
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && s(i + 1) == '/') {
        while (i < n && s(i) != '\n') i += 1
      } else if (c == '0' && i + 1 < n && s(i + 1) == 'x') {
        // 0x hex literal → uint64 → float64 (parse.go:80-95; only the
        // lowercase x form)
        val start = i + 2
        var j = start
        while (j < n && (s(j).isDigit ||
          ("abcdef".indexOf(s(j).toLower) >= 0))) j += 1
        require(j > start, s"unable to parse hex value '' to uint64")
        out += TNum(java.lang.Long.parseUnsignedLong(s.substring(start, j), 16).toDouble)
        i = j
      } else if (c.isDigit || (c == '.' && i + 1 < n && s(i + 1).isDigit)) {
        val start = i
        while (i < n && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
          ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
        out += TNum(s.substring(start, i).toDouble)
      } else if (c == '`') {
        heredocBody(s, i) match {
          case Some((body, end)) =>
            // `<<TAG … TAG` tagged raw block (parse.go:329-393)
            out += TStr(body)
            i = end
          case None =>
            // backtick raw string (no escapes), reference multi-line literals
            val end = s.indexOf('`', i + 1)
            require(end >= 0, s"unterminated backtick string")
            out += TStr(s.substring(i + 1, end))
            i = end + 1
        }
      } else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && s(i) != quote) {
          if (s(i) == '\\' && i + 1 < n) {
            s(i + 1) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case 'r' => sb.append('\r'); case other => sb.append(other)
            }
            i += 2
          } else { sb.append(s(i)); i += 1 }
        }
        require(i < n, s"unterminated string in: $s")
        i += 1
        out += TStr(sb.toString)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += TIdent(s.substring(start, i))
      } else if (c == '$') {
        out += TOp("$"); i += 1
        // ${name} interpolation keeps structural braces
        if (i < n && s(i) == '{') { out += TOp("{"); i += 1 }
      } else if (c == '{') {
        heredocBody(s, i) match {
          case Some((body, end)) =>
            // {<<TAG … TAG} tagged raw block — body may hold unbalanced
            // braces (parse.go readTaggedBlock)
            out += TStr(body)
            i = end
          case None =>
            // `{ … }` is a raw string block to the expression lexer —
            // pure brace-depth counting, quotes NOT honored
            // (expression/parse.go readBlock; SQL({create tag table …})
            // ships DDL this way)
            var depth = 1
            var j = i + 1
            val sb = new StringBuilder
            while (j < n && depth > 0) {
              val ch = s(j)
              if (ch == '{') depth += 1
              else if (ch == '}') depth -= 1
              if (depth > 0) sb.append(ch)
              j += 1
            }
            require(depth == 0, "unterminated { block }")
            out += TStr(sb.toString)
            i = j
        }
      } else {
        multiOps.find(op => s.startsWith(op, i)) match {
          case Some(op) => out += TOp(op); i += op.length
          case None =>
            if (!singleOps.contains(c))
              parseError("invalid_token", s"invalid token: '$c'", s, i, c.toString)
            out += TOp(c.toString); i += 1
        }
      }
    }
    tokStart = n
    out += TEof
    (toks.result(), offs.result())
  }

  // ---------------- Pratt parser ----------------
  /** Binding powers per the reference's operator table. */
  private def lbp(op: String): Int = op match {
    case "?" => 10
    case "??" => 15
    case "||" => 20
    case "&&" => 25
    case "in" => 30
    case "==" | "!=" | ">" | ">=" | "<" | "<=" | "=~" | "!~" => 35
    // bitwise sits between comparators and additive, shifts tighter
    // than bitwise but looser than +/- (operator_table.go:22-27)
    case "&" | "|" | "^" => 38
    case "<<" | ">>" => 40
    case "+" | "-" => 45
    case "*" | "/" | "%" => 50
    case "**" => 60
    case "(" | "[" => 80
    case _ => 0
  }

  final class P(toks: Vector[Tok], offs: Vector[Int] = Vector.empty,
                src: String = "") {
    private var pos = 0
    def peek: Tok = toks(pos)
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def offsetAt(idx: Int): Int =
      if (offs.isEmpty) 0 else offs(math.min(idx, offs.length - 1))
    private def rawOf(t: Tok): String = t match {
      case TOp(o) => o
      case TIdent(x) => x
      case TStr(v) => v
      case TNum(v) => if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString
      case TEof => ""
    }
    /** reference unexpected_end: span points past the last token
      * (error_position_test.go "1 +" → column 4, near "+") */
    private def unexpectedEnd(): Nothing = {
      val near = if (pos >= 2) rawOf(toks(pos - 2)) else ""
      parseError("unexpected_end", "unexpected end of expression",
        src, if (src.isEmpty) 0 else src.length + 0, near)
    }
    private def unbalanced(openIdx: Int): Nothing =
      parseError("unbalanced_parenthesis", "unbalanced parenthesis",
        src, offsetAt(openIdx), "(")
    def expectOp(op: String): Unit = next() match {
      case TOp(`op`) =>
      case TEof if op == ")" || op == "]" || op == "}" => unexpectedEnd()
      case other => throw new IllegalArgumentException(s"expected '$op', got $other")
    }
    /** index of the token just consumed. */
    private def prevIdx: Int = pos - 1

    def parseExpr(rbp: Int = 0): Expr = {
      var left = nud(next())
      var continue = true
      while (continue) {
        peek match {
          case TOp(op) if lbp(op) > rbp => next(); left = led(op, left)
          // `in` / `IN` both spell membership (parse_test.go
          // TestComparatorParsing "Array membership uppercase")
          case TIdent(w) if w.equalsIgnoreCase("in") && lbp("in") > rbp =>
            next(); left = parseIn(left)
          case _ => continue = false
        }
      }
      left
    }

    /** full-expression parse: trailing tokens are a parse error like the
      * reference (parse.go:300 invalid_token — "1 @ 2" or "foo.Var" must
      * not silently truncate to the leading operand). */
    def parseFull(): Expr = {
      val e = parseExpr(0)
      peek match {
        case TEof => e
        case t => parseError("invalid_token",
          s"invalid token: '${rawOf(t)}'", src, offsetAt(pos), rawOf(t))
      }
    }

    private def nud(t: Tok): Expr = t match {
      case TNum(v) => Expr.Num(v)
      case TStr(v) => Expr.Str(v)
      case TIdent("true") => Expr.Bool(true)
      case TIdent("false") => Expr.Bool(false)
      case TIdent("null") | TIdent("NULL") => Expr.Null
      case TIdent(name) =>
        peek match {
          case TOp("(") =>
            next(); val openIdx = prevIdx
            Expr.Call(name, parseArgs(openIdx))
          case _ => Expr.Ident(name)
        }
      case TOp("$") => next() match {
        case TIdent(n) => Expr.Var(n)
        case TOp("{") => // ${name}
          val e = next() match {
            case TIdent(n) => Expr.Var(n)
            case o => throw new IllegalArgumentException(s"bad var $o")
          }
          expectOp("}"); e
        case o => throw new IllegalArgumentException(s"bad var $o")
      }
      case TOp("(") =>
        // reference reports a dangling '(' as unbalanced_parenthesis at
        // the OPENING token (error_position_test.go "(1 + 2" → col 1)
        val openIdx = prevIdx
        val e = parseExpr(0)
        peek match {
          case TOp(")") => next(); e
          case TEof => unbalanced(openIdx)
          case other => throw new IllegalArgumentException(
            s"expected ')', got $other")
        }
      case TOp("{") => Expr.Call("__obj", parseUntil("}"))
      case TOp("[") => Expr.Call("__arr", parseUntil("]"))
      case TOp("-") => parseExpr(70) match {
        case Expr.Num(v) => Expr.Num(-v) // fold negative literals
        case other => Expr.Unary("-", other)
      }
      case TOp("+") => parseExpr(70)
      case TOp("!") => Expr.Unary("!", parseExpr(70))
      case TOp("~") => Expr.Unary("~", parseExpr(70))
      case TEof => unexpectedEnd()
      case other => throw new IllegalArgumentException(s"unexpected token $other")
    }

    private def led(op: String, left: Expr): Expr = op match {
      case "(" => left match {
        case Expr.Ident(n) => Expr.Call(n, parseArgs(prevIdx))
        case _ => throw new IllegalArgumentException("call on non-identifier")
      }
      case "[" =>
        val idx = parseExpr(0); expectOp("]"); Expr.Index(left, idx)
      case "?" =>
        // the else-branch is optional — `true ? 10` yields nil when
        // false (evaluation_test.go "Ternary with single boolean")
        val t = parseExpr(0)
        peek match {
          case TOp(":") => next(); Expr.Ternary(left, t, parseExpr(9))
          case _ => Expr.Ternary(left, t, Expr.Null)
        }
      case "**" => Expr.Bin("**", left, parseExpr(lbp("**") - 1)) // right-assoc
      case _ => Expr.Bin(op, left, parseExpr(lbp(op)))
    }

    private def parseIn(left: Expr): Expr = {
      expectOp("(")
      Expr.In(left, parseArgs(prevIdx))
    }

    /** Comma-separated expressions closed by `close` (for {…} / […]). */
    private def parseUntil(close: String): List[Expr] = {
      val items = ListBuffer.empty[Expr]
      peek match {
        case TOp(`close`) => next(); return items.toList
        case _ =>
      }
      var continue = true
      while (continue) {
        items += parseExpr(0)
        next() match {
          case TOp(",") =>
          case TOp(`close`) => continue = false
          case other => throw new IllegalArgumentException(
            s"expected ',' or '$close', got $other")
        }
      }
      items.toList
    }

    private def parseArgs(openIdx: Int): List[Expr] = {
      val args = ListBuffer.empty[Expr]
      peek match {
        case TOp(")") => next(); return args.toList
        case _ =>
      }
      var continue = true
      while (continue) {
        args += parseExpr(0)
        next() match {
          case TOp(",") =>
          case TOp(")") => continue = false
          case TEof => unbalanced(openIdx)
          case other => throw new IllegalArgumentException(s"expected ',' or ')', got $other")
        }
      }
      args.toList
    }
  }

  def parseExpression(s: String): Expr = {
    val (toks, offs) = lexSpans(s)
    new P(toks, offs, s).parseFull()
  }

  // ---------------- statement splitting ----------------
  /** `{<<TAG` / `` `<<TAG `` heredoc tag: letter/_ head, word tail
    * (reference expression/parse.go isTaggedBlockTag:501-515). */
  private[tql] def heredocTag(rest: String): Option[String] = {
    val t = rest.trim
    if (t.nonEmpty && (t.head.isLetter || t.head == '_') &&
        t.forall(ch => ch.isLetterOrDigit || ch == '_')) Some(t) else None
  }

  /** The closer is a line of optional whitespace, the tag, optional
    * whitespace, then `}` or `` ` `` (parse.go:549-575). Returns the
    * index just past the close char. */
  private def heredocCloserEnd(line: String, tag: String, close: Char): Option[Int] = {
    val t = line.trim
    if (!(t.startsWith(tag) && t.drop(tag.length).trim.startsWith(close.toString)))
      return None
    val at = line.indexOf(tag) + tag.length
    Some(line.indexOf(close, at) + 1)
  }

  /** Split a script into statements: a statement ends at a newline with
    * balanced parens; `//` comments and `#pragma` lines are stripped;
    * `{<<TAG … TAG}` / `` `<<TAG … TAG` `` heredoc bodies pass through
    * verbatim with no comment/paren interpretation (tqlreader_test.go
    * SCRIPT({<<JS … JS}) cases). */
  def splitStatements(script: String): List[String] = {
    val out = ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr: Char = 0
    var heredoc: Option[(String, Char)] = None // (tag, close char)
    def scanFrom(line: String, i0: Int): Unit = {
      var i = i0
      while (i < line.length) {
        val c = line(i)
        if (inStr != 0) {
          if (c == '\\') { cur.append(c); if (i + 1 < line.length) { cur.append(line(i + 1)); i += 1 } }
          else { if (c == inStr) inStr = 0; cur.append(c) }
        } else c match {
          case '/' if i + 1 < line.length && line(i + 1) == '/' &&
            (i == 0 || line(i - 1) != ':') => // "://" is a URL, not a comment
            i = line.length - 1
          case '{' | '`' if line.startsWith("<<", i + 1) &&
              heredocTag(line.substring(i + 3)).isDefined =>
            heredoc = Some((heredocTag(line.substring(i + 3)).get,
              if (c == '{') '}' else '`'))
            cur.append(line.substring(i)).append('\n')
            i = line.length - 1
          case '\'' | '"' => inStr = c; cur.append(c)
          case '(' => depth += 1; cur.append(c)
          case ')' => depth -= 1; cur.append(c)
          case _ => cur.append(c)
        }
        i += 1
      }
    }
    for (line0 <- script.split("\n", -1)) {
      heredoc match {
        case Some((tag, close)) =>
          heredocCloserEnd(line0, tag, close) match {
            case Some(after) =>
              heredoc = None
              cur.append(line0.substring(0, after))
              scanFrom(line0, after)
            case None => cur.append(line0).append('\n')
          }
        case None =>
          val line = if (line0.trim.startsWith("#")) "" else line0
          scanFrom(line, 0)
      }
      if (heredoc.isEmpty) {
        if (depth == 0 && cur.toString.trim.nonEmpty) {
          out += cur.toString.trim
          cur.clear()
        } else if (depth > 0) cur.append('\n')
      }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.toList
  }

  private val SetStmt = "(?s)^SET\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*=\\s*(.+)$".r
  /** Statements whose args may be raw `{ … }` code/template blocks
    * (reference script_parser.go treats {} payloads as uninterpreted
    * text for SCRIPT and TEXT). */
  private val RawHead = "(?s)^\\s*(SCRIPT|TEXT|MARKDOWN|HTML|HTTP)\\s*\\((.*)\\)\\s*$".r
  private val WhenHead = "(?s)^\\s*WHEN\\s*\\((.*)\\)\\s*$".r
  private val ActionHead = "(?s)^(doLog|doHttp|do)\\s*\\((.*)\\)\\s*$".r

  def parseScript(script: String): List[Statement] =
    splitStatements(script).map {
      case text @ SetStmt(name, rhs) =>
        // `SET name = expr` (reference task_node.go:137-147)
        Statement(Expr.Call("SET", List(Expr.Str(name), parseExpression(rhs))), text)
      case text @ RawHead(name, body) =>
        val args = splitRawArgs(body).map { raw =>
          val t = raw.trim
          if (t.startsWith("{<<") && heredocBody(t, 0).isDefined)
            Expr.Str(heredocBody(t, 0).get._1)
          else if (t.startsWith("{") && t.endsWith("}")) Expr.Str(t.substring(1, t.length - 1))
          else parseExpression(t)
        }
        Statement(Expr.Call(name, args), text)
      case text @ WhenHead(body) =>
        // WHEN(cond, doLog(…) | doHttp(…) | do(args…, { sub-TQL }))
        // (reference fm_monad.go:2171-2413); the do-block is raw TQL text
        val parts = splitRawArgs(body)
        require(parts.size == 2, s"WHEN(cond, action): $text")
        val action = parts(1).trim match {
          case ActionHead(name, inner) =>
            val args = splitRawArgs(inner).map { raw =>
              val t = raw.trim
              if (t.startsWith("{") && t.endsWith("}"))
                Expr.Call("__block", List(Expr.Str(t.substring(1, t.length - 1))))
              else parseExpression(t)
            }
            Expr.Call(name, args)
          case other => parseExpression(other)
        }
        Statement(Expr.Call("WHEN", List(parseExpression(parts(0)), action)), text)
      case text =>
        parseExpression(text) match {
          case c: Expr.Call => Statement(c, text)
          case Expr.Ident(n) => Statement(Expr.Call(n, Nil), text)
          case other => throw new IllegalArgumentException(
            s"statement must be a function call: $text ($other)")
        }
    }

  /** Split `a, b, c` at top-level commas, tracking (), [], {} nesting and
    * ' " ` strings (with backslash escapes) so JS code blocks survive. */
  /** Heredoc body and end position for an opener at `i`: the lines
    * between the tag line and the closer line, verbatim. */
  private[tql] def heredocBody(s: String, i: Int): Option[(String, Int)] =
    heredocSpan(s, i).map { end =>
      val nl = s.indexOf('\n', i + 3)
      val chunk = s.substring(nl + 1, end - 1)
      // strip the closer line's "TAG" tail; the body keeps its final
      // newline (parse_test.go TestScriptBlock pins "…};\n")
      val lastNl = chunk.lastIndexOf('\n')
      (if (lastNl < 0) "" else chunk.substring(0, lastNl + 1), end)
    }

  /** The end index (exclusive of nothing — just past the close char) of a
    * heredoc opened at `i` (s(i) is '{' or '`' followed by "<<TAG\n"), or
    * None if `i` doesn't open one. */
  private def heredocSpan(s: String, i: Int): Option[Int] = {
    if (!s.startsWith("<<", i + 1)) return None
    val nl = s.indexOf('\n', i + 3)
    if (nl < 0) return None
    heredocTag(s.substring(i + 3, nl)).flatMap { tag =>
      val close = if (s(i) == '{') '}' else '`'
      var from = nl + 1
      while (from <= s.length) {
        val lineEnd0 = s.indexOf('\n', from)
        val lineEnd = if (lineEnd0 < 0) s.length else lineEnd0
        val line = s.substring(from, lineEnd)
        val t = line.trim
        if (t.startsWith(tag) && t.drop(tag.length).trim.startsWith(close.toString)) {
          val at = line.indexOf(tag) + tag.length
          return Some(from + line.indexOf(close, at) + 1)
        }
        if (lineEnd0 < 0) return None
        from = lineEnd0 + 1
      }
      None
    }
  }

  private[tql] def splitRawArgs(s: String): List[String] = {
    val out = ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (inStr != 0) {
        cur.append(c)
        if (c == '\\' && i + 1 < s.length && inStr != '`') {
          cur.append(s(i + 1)); i += 1
        } else if (c == inStr) inStr = 0
      } else c match {
        case '{' | '`' if heredocSpan(s, i).isDefined =>
          // heredoc block: verbatim, no comma/nesting interpretation
          val end = heredocSpan(s, i).get
          cur.append(s.substring(i, end))
          i = end - 1
        case '\'' | '"' | '`' => inStr = c; cur.append(c)
        case '(' | '[' | '{' => depth += 1; cur.append(c)
        case ')' | ']' | '}' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    if (cur.toString.trim.nonEmpty || out.nonEmpty) out += cur.toString
    out.toList
  }
}
