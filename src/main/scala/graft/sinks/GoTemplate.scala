package graft.sinks

import scala.collection.mutable
import scala.collection.mutable.ListBuffer

/** Minimal Go text/template engine for the TEXT/HTML sinks (reference:
  * mods/codec/internal/templ/templ.go — the exporter executes the template
  * once per record against a Record context with `.Value n`, `.V`,
  * `.Values`, `.Num`, `.IsFirst/.IsLast/.IsEmpty`, `.Column(s)`, plus the
  * funcs param/paramDefault/format/toUpper/toLower).
  *
  * Supported template syntax: `{{ pipeline }}` actions with `{{-`/`-}}`
  * whitespace trimming, field/method chains (`.V`, `.Value 0`, `.a.b`),
  * string/number/bool literals, function calls, pipes (`a | f`), and
  * `with`/`if`/`range` … `else` … `end` blocks — the subset the
  * reference's own templates exercise.
  */
object GoTemplate {

  // ---------------- AST ----------------
  sealed trait Node
  private case class Lit(s: String) extends Node
  private case class Action(pipe: Pipeline) extends Node
  private case class Block(kind: String, pipe: Pipeline, body: List[Node],
                           elseBody: List[Node]) extends Node
  /** `{{ template "name" [pipeline] }}` invocation of a define block. */
  private case class TemplateCall(name: String, pipe: Option[Pipeline]) extends Node

  private case class Pipeline(cmds: List[Cmd])
  private case class Cmd(terms: List[Term])
  private sealed trait Term
  private case object DotT extends Term
  private case class FieldT(path: List[String]) extends Term
  private case class StrT(s: String) extends Term
  private case class NumT(d: Double) extends Term
  private case class BoolT(b: Boolean) extends Term
  private case class IdentT(name: String) extends Term
  private case class ParenT(pipe: Pipeline) extends Term

  final case class TemplateError(msg: String) extends RuntimeException(msg)

  // ---------------- parse ----------------
  def parse(src: String): Template = {
    // split into raw text and {{ … }} actions, applying trim markers
    val parts = ListBuffer.empty[(Boolean, String)] // (isAction, content)
    var i = 0
    val sb = new StringBuilder
    while (i < src.length) {
      if (src.startsWith("{{", i)) {
        val end = src.indexOf("}}", i + 2)
        if (end < 0) throw TemplateError("unclosed {{ action")
        var inner = src.substring(i + 2, end)
        if (inner.startsWith("-")) {
          // trim trailing whitespace of preceding text
          inner = inner.substring(1)
          while (sb.nonEmpty && sb.last.isWhitespace) sb.setLength(sb.length - 1)
        }
        val trimAfter = inner.endsWith("-")
        if (trimAfter) inner = inner.dropRight(1)
        parts += ((false, sb.toString)); sb.clear()
        parts += ((true, inner.trim))
        i = end + 2
        if (trimAfter) while (i < src.length && src(i).isWhitespace) i += 1
      } else { sb.append(src(i)); i += 1 }
    }
    parts += ((false, sb.toString))

    // recursive-descent over the flat part list for block structure
    var pos = 0
    val defs = scala.collection.mutable.Map.empty[String, List[Node]]
    def parseNodes(stopAt: Set[String]): (List[Node], Option[String]) = {
      val out = ListBuffer.empty[Node]
      while (pos < parts.length) {
        val (isAction, content) = parts(pos)
        if (!isAction) {
          if (content.nonEmpty) out += Lit(content)
          pos += 1
        } else {
          val kw = content.split("\\s+", 2).head
          if (stopAt(kw)) return (out.toList, Some(kw))
          pos += 1
          kw match {
            case "with" | "if" | "range" =>
              val pipe = parsePipeline(content.split("\\s+", 2)(1))
              val (body, stop) = parseNodes(Set("end", "else"))
              var elseBody: List[Node] = Nil
              if (stop.contains("else")) {
                pos += 1 // consume else
                val (eb, stop2) = parseNodes(Set("end"))
                if (!stop2.contains("end")) throw TemplateError(s"missing end for $kw")
                elseBody = eb
              }
              pos += 1 // consume end
              out += Block(kw, pipe, body, elseBody)
            case "define" =>
              // {{ define "name" }} … {{ end }} — named sub-template
              val name = "\"([^\"]+)\"".r.findFirstMatchIn(content)
                .map(_.group(1)).getOrElse(throw TemplateError("define needs a name"))
              val (body, stop) = parseNodes(Set("end"))
              if (!stop.contains("end")) throw TemplateError("missing end for define")
              pos += 1 // consume end
              defs(name) = body
            case "template" =>
              // {{ template "name" [pipeline] }}
              val m = "\"([^\"]+)\"\\s*(.*)".r.findFirstMatchIn(
                content.split("\\s+", 2).lift(1).getOrElse(""))
                .getOrElse(throw TemplateError("template needs a name"))
              val pipe = Option(m.group(2)).map(_.trim).filter(_.nonEmpty)
                .map(parsePipeline)
              out += TemplateCall(m.group(1), pipe)
            case "end" | "else" =>
              throw TemplateError(s"unexpected $kw")
            case _ =>
              out += Action(parsePipeline(content))
          }
        }
      }
      (out.toList, None)
    }
    val (nodes, stop) = parseNodes(Set.empty)
    if (stop.nonEmpty) throw TemplateError(s"unexpected ${stop.get}")
    new Template(nodes, defs.toMap)
  }

  private def parsePipeline(src: String): Pipeline =
    Pipeline(src.split("\\|").map(_.trim).filter(_.nonEmpty)
      .map(part => Cmd(tokenize(part).map(parseTerm))).toList)

  private def tokenize(s: String): List[String] = {
    val out = ListBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '"' || c == '`') {
        val quote = c
        val sb = new StringBuilder("\"")
        i += 1
        while (i < s.length && s(i) != quote) {
          if (s(i) == '\\' && i + 1 < s.length && quote == '"') {
            sb.append(s(i)).append(s(i + 1)); i += 2
          } else { sb.append(s(i)); i += 1 }
        }
        i += 1
        out += sb.toString
      } else if (c == '(') {
        var depth = 1
        val sb = new StringBuilder("(")
        i += 1
        while (i < s.length && depth > 0) {
          if (s(i) == '(') depth += 1
          else if (s(i) == ')') depth -= 1
          if (depth > 0) sb.append(s(i))
          i += 1
        }
        sb.append(')')
        out += sb.toString
      } else {
        val start = i
        while (i < s.length && !s(i).isWhitespace && s(i) != '(') i += 1
        out += s.substring(start, i)
      }
    }
    out.toList
  }

  private def parseTerm(tok: String): Term = {
    if (tok.startsWith("\"")) StrT(unescape(tok.substring(1)))
    else if (tok.startsWith("(") && tok.endsWith(")"))
      ParenT(parsePipeline(tok.substring(1, tok.length - 1)))
    else if (tok == ".") DotT
    else if (tok.startsWith(".")) FieldT(tok.substring(1).split("\\.").toList)
    else if (tok == "true") BoolT(true)
    else if (tok == "false") BoolT(false)
    else if (tok.headOption.exists(c => c.isDigit || c == '-')) NumT(tok.toDouble)
    else IdentT(tok)
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case 'r' => sb.append('\r'); case other => sb.append(other)
        }
        i += 2
      } else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }

  // ---------------- record context ----------------
  /** Go-side Record (templ.go:213-282). */
  final case class Record(num: Long, isFirst: Boolean, isLast: Boolean,
                          values: Seq[Any], colNames: Seq[String]) {
    def isEmpty: Boolean = values.isEmpty
    lazy val v: Map[String, Any] =
      colNames.zip(values).toMap
  }

  /** A value exempt from HTML escaping — what the reference's
    * template.HTML/HTMLAttr/URL/CSS/JS types mark (templ.go ValueHTML
    * and friends; templ_test.go TestUnsafeHTML/CSS). */
  final case class RawValue(v: Any)

  // ---------------- execute ----------------
  final class Template(nodes: List[Node],
                       defs: Map[String, List[Node]] = Map.empty) {

    /** htmlEscape mirrors Go html/template's base escaping for the HTML
      * sink: interpolated values escape &<>"' unless marked [[RawValue]].
      * (The reference's full contextual autoescape — JS-quoting inside
      * script elements — is deliberately out of scope; TEXT templates
      * never escape, like text/template.) */
    def render(rec: Record, params: Map[String, Seq[String]],
               htmlEscape: Boolean = false): String = {
      val sb = new StringBuilder
      renderNodes(nodes, rec, rec, params, sb, htmlEscape)
      sb.toString
    }

    private def htmlEsc(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&#34;"
      case '\'' => "&#39;"
      case c => c.toString
    }

    private def renderNodes(ns: List[Node], dot: Any, root: Any,
                            params: Map[String, Seq[String]], sb: StringBuilder,
                            escape: Boolean): Unit =
      ns.foreach {
        case Lit(s) => sb.append(s)
        case Action(pipe) =>
          val v = evalPipe(pipe, dot, root, params)
          v match {
            case () =>
            case RawValue(inner) => sb.append(fmtVal(inner))
            case other =>
              sb.append(if (escape) htmlEsc(fmtVal(other)) else fmtVal(other))
          }
        case Block("with", pipe, body, elseBody) =>
          val v = evalPipe(pipe, dot, root, params)
          if (goTruthy(v)) renderNodes(body, v, root, params, sb, escape)
          else renderNodes(elseBody, dot, root, params, sb, escape)
        case Block("if", pipe, body, elseBody) =>
          val v = evalPipe(pipe, dot, root, params)
          if (goTruthy(v)) renderNodes(body, dot, root, params, sb, escape)
          else renderNodes(elseBody, dot, root, params, sb, escape)
        case Block("range", pipe, body, elseBody) =>
          val v = evalPipe(pipe, dot, root, params)
          val items: Seq[Any] = v match {
            case s: Seq[_] => s.asInstanceOf[Seq[Any]]
            case a: Array[_] => a.toSeq
            case m: Map[_, _] => m.values.toSeq.asInstanceOf[Seq[Any]]
            case _ => Seq.empty
          }
          if (items.isEmpty) renderNodes(elseBody, dot, root, params, sb, escape)
          else items.foreach(item => renderNodes(body, item, root, params, sb, escape))
        case TemplateCall(name, pipe) =>
          val body = defs.getOrElse(name,
            throw TemplateError(s"undefined template $name"))
          val dot2 = pipe.map(evalPipe(_, dot, root, params)).getOrElse(dot)
          renderNodes(body, dot2, root, params, sb, escape)
        case b: Block => throw TemplateError(s"unsupported block ${b.kind}")
      }

    private def evalPipe(pipe: Pipeline, dot: Any, root: Any,
                         params: Map[String, Seq[String]]): Any =
      pipe.cmds.foldLeft[Option[Any]](None) { (prev, cmd) =>
        Some(evalCmd(cmd, prev, dot, root, params))
      }.getOrElse(())

    private def evalCmd(cmd: Cmd, piped: Option[Any], dot: Any, root: Any,
                        params: Map[String, Seq[String]]): Any = {
      val head :: rest = cmd.terms: @unchecked
      val args = rest.map(t => evalTerm(t, dot, root, params)) ++ piped.toList
      head match {
        case DotT => dot
        case FieldT(path) => evalField(dot, path, args)
        case StrT(s) => s
        case NumT(d) => if (d == math.rint(d)) d.toLong else d
        case BoolT(b) => b
        case ParenT(p) => evalPipe(p, dot, root, params)
        case IdentT(fn) => callFunc(fn, args, params)
      }
    }

    private def evalTerm(t: Term, dot: Any, root: Any,
                         params: Map[String, Seq[String]]): Any = t match {
      case DotT => dot
      case FieldT(path) => evalField(dot, path, Nil)
      case StrT(s) => s
      case NumT(d) => if (d == math.rint(d)) d.toLong else d
      case BoolT(b) => b
      case ParenT(p) => evalPipe(p, dot, root, params)
      case IdentT(name) => callFunc(name, Nil, params)
    }

    private def evalField(dot: Any, path: List[String], args: List[Any]): Any =
      path match {
        case Nil => dot
        case name :: restPath =>
          val argList = if (restPath.isEmpty) args else Nil
          val v = member(dot, name, argList)
          evalField(v, restPath, args)
      }

    private def member(dot: Any, name: String, args: List[Any]): Any = dot match {
      case r: Record => name match {
        case "Value" => args.headOption.map(a => r.values.lift(toInt(a)).orNull).orNull
        case "ValueString" => args.headOption.map(a => fmtVal(r.values.lift(toInt(a)).orNull)).getOrElse("")
        // escape-exempt accessors (templ.go ValueHTML/HTMLAttr/URL/CSS/JS)
        case "ValueHTML" | "ValueHTMLAttr" | "ValueURL" | "ValueCSS" | "ValueJS" =>
          RawValue(args.headOption.map(a => r.values.lift(toInt(a)).orNull).orNull)
        case "Values" => r.values
        case "V" => r.v
        case "Num" => r.num
        case "IsFirst" => r.isFirst
        case "IsLast" => r.isLast
        case "IsEmpty" => r.isEmpty
        case "Columns" => r.colNames
        case "Column" => args.headOption.map(a => r.colNames.lift(toInt(a)).getOrElse("")).getOrElse("")
        case other => throw TemplateError(s"Record has no field $other")
      }
      case m: Map[_, _] => lookupJson(m.asInstanceOf[Map[String, Any]].get(name))
      case m: mutable.LinkedHashMap[_, _] =>
        lookupJson(m.asInstanceOf[mutable.LinkedHashMap[String, Any]].get(name))
      // object values arrive JSON-serialized from SCRIPT nodes — decode on
      // first member access (templ test: {{ with .Value 0 }}{{ .name }})
      case s: String if s.startsWith("{") =>
        graft.script.Builtins.jsonParse(s) match {
          case m: mutable.LinkedHashMap[_, _] =>
            lookupJson(m.asInstanceOf[mutable.LinkedHashMap[String, Any]].get(name))
          case _ => null
        }
      case null => null
      case other => throw TemplateError(s"cannot access .$name on ${other.getClass.getSimpleName}")
    }

    private def lookupJson(v: Option[Any]): Any = v.orNull

    private def callFunc(fn: String, args: List[Any],
                         params: Map[String, Seq[String]]): Any = fn match {
      case "param" => params.get(fmtVal(args.head)).flatMap(_.headOption).getOrElse("")
      case "paramDefault" =>
        params.get(fmtVal(args.head)).flatMap(_.headOption)
          .getOrElse(fmtVal(args(1)))
      case "toUpper" => fmtVal(args.head).toUpperCase
      case "toLower" => fmtVal(args.head).toLowerCase
      // Go text/template builtins (templ_test.go first_last_empty uses
      // `not`, columns/values uses `index`)
      case "not" => !goTruthy(args.head)
      case "index" => args.head match {
        case s: Seq[_] => s.asInstanceOf[Seq[Any]].lift(toInt(args(1))).orNull
        case a: Array[_] => a.toSeq.asInstanceOf[Seq[Any]].lift(toInt(args(1))).orNull
        case m: Map[_, _] => m.asInstanceOf[Map[Any, Any]].get(args(1)).orNull
        case null => null
        case other => throw TemplateError(s"can't index ${other.getClass.getSimpleName}")
      }
      case "len" => args.head match {
        case s: Seq[_] => s.size
        case a: Array[_] => a.length
        case m: Map[_, _] => m.size
        case s: String => s.length
        case null => 0
        case _ => 0
      }
      // Go text/template eq is variadic (arg1 == any of the rest), ne is
      // binary; comparison is on VALUES (numeric kinds compare by value,
      // not by rendered string)
      case "eq" => args.drop(1).exists(goValueEq(args.head, _))
      case "ne" => !goValueEq(args.head, args(1))
      case "format" => goSprintf(fmtVal(args.head), args.drop(1))
      case "timeformat" =>
        // named/Go layouts AND SQL tokens, like every other timeformat
        // consumer (templ_test.go TestTimeformat formats with the Go
        // reference layout "2006-01-02 15:04:05" in a named location)
        val (pattern, trim) =
          graft.time.TimeFns.resolveNamedOrGoFormat(fmtVal(args.head))
        val tz = graft.time.TimeFns.resolveTz(fmtVal(args(1)))
        val t = args(2) match {
          case l: java.lang.Long => java.time.Instant.ofEpochSecond(0, l)
          case ts: java.sql.Timestamp => ts.toInstant
          case other => java.time.Instant.ofEpochMilli(toInt(other).toLong)
        }
        val out = java.time.format.DateTimeFormatter.ofPattern(pattern)
          .withZone(java.time.ZoneId.of(tz)).format(t)
        if (trim) graft.time.TimeFns.trimFractionZerosStr(out) else out
      case other => throw TemplateError(s"unknown template func $other")
    }

    private def toInt(a: Any): Int = a match {
      case l: java.lang.Long => l.toInt
      case d: java.lang.Double => d.toInt
      case i: java.lang.Integer => i
      case s: String => s.toInt
      case _ => 0
    }
  }

  /** Go fmt.Sprint rendering of one value. */
  def fmtVal(v: Any): String = v match {
    case null => "<no value>"
    case d: java.lang.Double =>
      val s = java.lang.Double.toString(d)
      if (s.endsWith(".0")) s.dropRight(2) else s
    case f: java.lang.Float => fmtVal(java.lang.Double.valueOf(f.toDouble))
    case s: Seq[_] => s.map(fmtVal).mkString("[", " ", "]")
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => s"$k:${fmtVal(x)}" }.mkString("map[", " ", "]")
    case other => String.valueOf(other)
  }

  /** The %-verbs Go's templates use in practice. */
  private def goSprintf(format: String, args: List[Any]): String = {
    val out = new StringBuilder
    var i = 0
    var ai = 0
    while (i < format.length) {
      val c = format(i)
      if (c == '%' && i + 1 < format.length) {
        val start = i
        i += 1
        while (i < format.length && !"vdsfgeExXob%".contains(format(i))) i += 1
        if (i < format.length) {
          val verb = format(i)
          val spec = format.substring(start, i + 1)
          if (verb == '%') out.append('%')
          else {
            val arg = if (ai < args.length) args(ai) else null
            ai += 1
            verb match {
              case 'v' => out.append(fmtVal(arg))
              case 'd' =>
                val lv: Long = arg match {
                  case l: java.lang.Long => l
                  case d: java.lang.Double => d.toLong
                  case other => String.valueOf(other).toLong
                }
                out.append(String.format(spec.dropRight(1) + "d",
                  java.lang.Long.valueOf(lv)))
              case 's' => out.append(String.format(spec, fmtVal(arg)))
              case 'f' | 'g' | 'e' | 'E' =>
                val dv: Double = arg match {
                  case d: java.lang.Double => d
                  case l: java.lang.Long => l.toDouble
                  case other => String.valueOf(other).toDouble
                }
                out.append(String.format(spec, java.lang.Double.valueOf(dv)))
              case _ => out.append(fmtVal(arg))
            }
          }
          i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def goTruthy(v: Any): Boolean = v match {
    case null | () => false
    case b: java.lang.Boolean => b
    case l: java.lang.Long => l != 0L
    case d: java.lang.Double => d != 0d
    case s: String => s.nonEmpty
    case s: Seq[_] => s.nonEmpty
    case m: Map[_, _] => m.nonEmpty
    case _ => true
  }

  /** `eq`/`ne` value comparison: numeric kinds compare by value (the
    * template literal 1 parses as Double while a cell may hold Long/Int),
    * everything else by plain equality — never by rendered string, so a
    * string "1" does NOT equal the number 1 (Go errors there; we compare
    * false, the branch-safe reading). */
  private def goValueEq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: java.lang.Number, y: java.lang.Number) =>
      // integral pairs compare exactly — doubleValue would collapse
      // distinct Longs above 2^53 (e.g. adjacent epoch-ns timestamps)
      def integral(n: java.lang.Number): Boolean = n match {
        case _: java.lang.Long | _: java.lang.Integer |
             _: java.lang.Short | _: java.lang.Byte => true
        case _ => false
      }
      if (integral(x) && integral(y)) x.longValue() == y.longValue()
      else x.doubleValue() == y.doubleValue()
    case (x, y) => x == y
  }
}
