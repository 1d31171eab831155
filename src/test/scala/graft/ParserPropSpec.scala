package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tql.{Expr, Parser}
import scala.util.Random

/** Property tests for the TQL lexer/parser/statement-splitter: thousands
  * of generated scripts round-tripped against the grammar facts the
  * reference pins (mods/tql/script_parser_test.go — newline statements,
  * multi-line calls balanced by parens, `//` comments, `#pragma` lines,
  * heredoc bodies verbatim; expression/operator_table.go binding powers).
  * Seeded RNG — failures reproduce. */
class ParserPropSpec extends AnyFunSuite {

  // ---- expression generator with a known expected AST -----------------

  private val identPool = Vector("value", "key", "x", "abc", "foo_2", "ts", "_v")
  private val callPool = Vector("value", "sin", "list", "strTrim", "f")
  private val strChars = "abc XYZ09_.;:+*#@()-=<>".toVector // quote/backslash-free

  /** Render + expected AST, fully parenthesized so only lexing and node
    * construction are under test (precedence has its own property). */
  private def genExpr(depth: Int, r: Random): (String, Expr) = {
    val choice = if (depth <= 0) r.nextInt(5) else r.nextInt(12)
    choice match {
      case 0 => // integer literal
        val v = r.nextInt(10000)
        (v.toString, Expr.Num(v))
      case 1 => // decimal / scientific literal
        val v = r.nextInt(1000)
        val frac = r.nextInt(100)
        val s = s"$v.$frac"
        (s, Expr.Num(s.toDouble))
      case 2 => // quoted string with occasional escapes
        val quote = if (r.nextBoolean()) '\'' else '"'
        val body = Vector.fill(r.nextInt(8))(strChars(r.nextInt(strChars.size))).mkString
        val (rendered, decoded) =
          if (r.nextInt(4) == 0) (body + "\\n\\t", body + "\n\t") else (body, body)
        (s"$quote$rendered$quote", Expr.Str(decoded))
      case 3 =>
        val n = identPool(r.nextInt(identPool.size))
        (n, Expr.Ident(n))
      case 4 =>
        val n = identPool(r.nextInt(identPool.size))
        (if (r.nextBoolean()) s"$$$n" else s"$${$n}", Expr.Var(n))
      case 5 | 6 => // call
        val name = callPool(r.nextInt(callPool.size))
        val args = Vector.fill(r.nextInt(3))(genExpr(depth - 1, r))
        (s"$name(${args.map(_._1).mkString(", ")})",
          Expr.Call(name, args.map(_._2).toList))
      case 7 => // fully parenthesized binary
        val ops = Vector("+", "-", "*", "/", "%", "**", "==", "!=", ">", ">=",
          "<", "<=", "&&", "||", "??", "=~", "!~")
        val op = ops(r.nextInt(ops.size))
        val (ls, le) = genExpr(depth - 1, r)
        val (rs, re) = genExpr(depth - 1, r)
        (s"($ls $op $rs)", Expr.Bin(op, le, re))
      case 8 => // unary: - folds a numeric literal, ! wraps
        val (s, e) = genExpr(depth - 1, r)
        if (r.nextBoolean()) {
          val expected = e match {
            case Expr.Num(v) => Expr.Num(-v) // parser folds -literal
            case other => Expr.Unary("-", other)
          }
          (s"(-$s)", expected)
        } else (s"(!$s)", Expr.Unary("!", e))
      case 9 => // ternary
        val (cs, ce) = genExpr(depth - 1, r)
        val (ts, te) = genExpr(depth - 1, r)
        val (fs, fe) = genExpr(depth - 1, r)
        (s"($cs ? $ts : $fs)", Expr.Ternary(ce, te, fe))
      case 10 => // index
        val (bs, be) = genExpr(depth - 1, r)
        val (is, ie) = genExpr(depth - 1, r)
        (s"($bs[$is])", Expr.Index(be, ie))
      case 11 => // IN set
        val (vs, ve) = genExpr(depth - 1, r)
        val items = Vector.fill(1 + r.nextInt(3))(genExpr(depth - 1, r))
        (s"($vs in (${items.map(_._1).mkString(", ")}))",
          Expr.In(ve, items.map(_._2).toList))
    }
  }

  test("1000 generated expressions parse to the expected AST") {
    val r = new Random(20260813L)
    for (i <- 0 until 1000) {
      val (src, want) = genExpr(3, r)
      val got = Parser.parseExpression(src)
      assert(got == want, s"[$i] $src\n  got  $got\n  want $want")
    }
  }

  // ---- precedence property against an independent binding-power table --

  /** operator_table.go facts, re-stated independently of Parser.lbp. */
  private val power = Map(
    "??" -> 15, "||" -> 20, "&&" -> 25,
    "==" -> 35, "!=" -> 35, ">" -> 35, ">=" -> 35, "<" -> 35, "<=" -> 35,
    "=~" -> 35, "!~" -> 35,
    "+" -> 45, "-" -> 45, "*" -> 50, "/" -> 50, "%" -> 50, "**" -> 60)

  /** Reference fold: precedence climbing over a flat chain, left-assoc
    * everywhere except right-assoc `**`. */
  private def fold(atoms: Vector[Expr], ops: Vector[String]): Expr = {
    var pos = 0
    def climb(rbp: Int): Expr = {
      var left = atoms(pos); pos += 1
      while (pos <= ops.size && pos < atoms.size && {
        val op = ops(pos - 1); power(op) > rbp
      }) {
        val op = ops(pos - 1)
        val right = climb(if (op == "**") power(op) - 1 else power(op))
        left = Expr.Bin(op, left, right)
      }
      left
    }
    climb(0)
  }

  test("500 unparenthesized operator chains follow the published binding powers") {
    val r = new Random(777L)
    val ops = power.keys.toVector
    for (i <- 0 until 500) {
      val n = 2 + r.nextInt(5)
      val atoms = Vector.fill(n)(r.nextInt(3) match {
        case 0 => Expr.Num(r.nextInt(100))
        case 1 => Expr.Ident(identPool(r.nextInt(identPool.size)))
        case 2 => Expr.Num(r.nextInt(9) + 1)
      })
      val chain = Vector.fill(n - 1)(ops(r.nextInt(ops.size)))
      val src = atoms.zipWithIndex.map { case (a, j) =>
        val at = a match {
          case Expr.Num(v) => BigDecimal(v).underlying.stripTrailingZeros.toPlainString
          case Expr.Ident(nm) => nm
          case _ => "0"
        }
        if (j < chain.size) s"$at ${chain(j)} " else at
      }.mkString
      val got = Parser.parseExpression(src)
      val want = fold(atoms, chain)
      assert(got == want, s"[$i] $src\n  got  $got\n  want $want")
    }
  }

  // ---- statement-splitting property ------------------------------------

  private val heredocBodies = Vector(
    Vector("var a = 1, b = 2;", "if (a > 1) { b = (a); }"),
    Vector("// not a comment here", "unbalanced ((( and 'quote"),
    Vector("}, \"tricky\"", "", "  indented, trailing,"),
    Vector("SELECT 1 // keep", "FROM x)"))

  /** One generated statement: rendered lines + expected head (+ heredoc
    * body when the statement is a SCRIPT heredoc). */
  private def genStatement(r: Random): (Vector[String], String, Option[String]) =
    r.nextInt(4) match {
      case 0 => // single-line call, maybe a trailing comment
        val name = s"MAPVALUE"
        val line = s"$name(${r.nextInt(5)}, value(${r.nextInt(3)}) * ${r.nextInt(9) + 1})"
        val withC = if (r.nextBoolean()) line + " // trailing comment" else line
        (Vector(withC), name, None)
      case 1 => // multi-line call split at argument commas
        val name = "GROUP"
        val lines = Vector(
          s"$name(by(value(0), 'k'),",
          s"  count(value(1), 'cnt'),${if (r.nextBoolean()) " // mid comment" else ""}",
          s"  max(value(1), 'mx')",
          ")")
        (lines, name, None)
      case 2 => // single-arg source
        val name = "FAKE"
        (Vector(s"$name(linspace(0, ${r.nextInt(360)}, ${r.nextInt(50) + 2}))"), name, None)
      case 3 => // heredoc SCRIPT: body passes through verbatim
        val tag = "EOT" + ('A' + r.nextInt(26)).toChar
        val body = heredocBodies(r.nextInt(heredocBodies.size))
        val lines = Vector(s"SCRIPT({<<$tag") ++ body ++ Vector(s"$tag})")
        // the body keeps its final newline (parse_test.go TestScriptBlock)
        (lines, "SCRIPT", Some(body.mkString("\n") + "\n"))
    }

  test("300 generated scripts split into exactly the generated statements") {
    val r = new Random(4242L)
    for (i <- 0 until 300) {
      val k = 1 + r.nextInt(6)
      val stmts = Vector.fill(k)(genStatement(r))
      val noise = Vector("#pragma sql-thread-lock", "", "   ")
      val script = stmts.flatMap { case (lines, _, _) =>
        (if (r.nextInt(3) == 0) Vector(noise(r.nextInt(noise.size))) else Vector.empty) ++ lines
      }.mkString("\n") + "\n"
      val got = Parser.splitStatements(script)
      assert(got.size == k, s"[$i] expected $k statements, got ${got.size}:\n$script\n--\n${got.mkString("\n==\n")}")
      for (((_, head, _), stmt) <- stmts.zip(got))
        assert(stmt.startsWith(head), s"[$i] statement '$stmt' should start with $head")
      // heredoc bodies must survive verbatim through full parseScript
      val parsed = Parser.parseScript(script)
      assert(parsed.size == k)
      for (((_, _, bodyOpt), st) <- stmts.zip(parsed); body <- bodyOpt) {
        assert(st.call.name == "SCRIPT")
        assert(st.call.args == List(Expr.Str(body)),
          s"[$i] heredoc body diverged:\n${st.call.args}\n  want Str(${body})")
      }
    }
  }
}
