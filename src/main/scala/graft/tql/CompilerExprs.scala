package graft.tql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Fake

/** Expression → Column compilation (toColumn and the scalar-function
  * registry) plus the GeoJSON emitters — split out of Compiler.scala
  * (same object via self-type). */
private[tql] trait CompilerExprs { this: Compiler.type =>
  /** Display name for a pushed/grown value column: first string option,
    * else the reference's default "column" (fm_monad.go:1613). Suffixed
    * only when the name is already a live column (Spark needs unique
    * names; the reference's positional metadata tolerates duplicates). */
  private[tql] def pushValueName(p: Pipe, rest: List[Expr]): String = {
    import Expr._
    val base = rest.collectFirst { case Str(s) => s }.getOrElse("column")
    if (!p.df.columns.contains(base)) base
    else {
      var i = 2
      while (p.df.columns.contains(s"${base}_$i")) i += 1
      s"${base}_$i"
    }
  }

  /** Pushed-value expression with the PUSHVALUE option semantics:
    * nullValue(alt) coalesces a null result, where(pred) nulls the
    * value when the predicate is false (fm_monad.go:1620-1680 sets
    * newValue = nil on a false wherePredicate, column still added). */
  private[tql] def pushValueExpr(expr: Expr, rest: List[Expr], p: Pipe): Column = {
    import Expr._
    val c0 = toColumn(expr, p)
    val c1 = rest.collectFirst { case Call("nullValue", List(nv)) =>
      coalesce(c0, toColumn(nv, p)) }.getOrElse(c0)
    rest.collectFirst { case Call("where", List(pred)) =>
      when(toColumn(pred, p), c1) }.getOrElse(c1)
  }

  /** Literal operand rendering + kind ('n'umber, 's'tring, 'b'ool) for
    * the static typing checks. Dynamic operands (columns, calls) return
    * None — runtime types are unknowable at compile. */
  private def litKind(x: Expr): Option[(Char, String)] = x match {
    case Expr.Num(v) => Some(('n',
      if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString))
    case Expr.Str(s) => Some(('s', s))
    case Expr.Bool(b) => Some(('b', b.toString))
    case _ => None
  }

  /** The reference expression engine type-checks every stage at eval
    * (expression/evaluation.go:13-17, stage.go findTypeChecks;
    * evaluationfail_test.go TestModifierTyping/TestComparatorTyping/
    * TestLogicalOperatorTyping): modifiers take numbers (`+` concats
    * when a side is a string), ordering comparators take number-number
    * or string-string, `=~`/`!~` take strings, `&&`/`||` take bools.
    * We enforce the same rules wherever operand types are STATICALLY
    * known (literals), with the reference's exact messages — dynamic
    * columns keep Spark-native behavior since the engine cannot know
    * runtime types at compile. Surfaced eagerly as a compile error
    * rather than the reference's per-record drop (documented). */
  private[tql] def checkLiteralTyping(op: String, l: Expr, r: Expr): Unit = {
    def bad(v: String, clause: String, kind: String): Nothing =
      throw new IllegalArgumentException(
        s"Value '$v' cannot be used with the $clause '$op', it is not a $kind")
    val lk = litKind(l)
    val rk = litKind(r)
    op match {
      case "-" | "*" | "/" | "%" | "**" | "&" | "|" | "^" | "<<" | ">>" =>
        lk.foreach { case (k, v) => if (k != 'n') bad(v, "modifier", "number") }
        rk.foreach { case (k, v) => if (k != 'n') bad(v, "modifier", "number") }
      case "+" =>
        // either side a string → concatenation, any types allowed; a
        // '+'-subtree that contains a string literal is itself a string
        // ("'baz' + 123 + 'bar' + true", evaluation_test.go:978-989)
        def definitelyString(e: Expr): Boolean = e match {
          case Expr.Str(_) => true
          case Expr.Bin("+", a, b) => definitelyString(a) || definitelyString(b)
          case _ => false
        }
        val anyString = lk.exists(_._1 == 's') || rk.exists(_._1 == 's') ||
          definitelyString(l) || definitelyString(r)
        if (!anyString) {
          lk.foreach { case (k, v) => if (k != 'n') bad(v, "modifier", "number") }
          rk.foreach { case (k, v) => if (k != 'n') bad(v, "modifier", "number") }
        }
      case ">" | ">=" | "<" | "<=" =>
        // number-number or string-string; bools never order
        lk.foreach { case (k, v) => if (k == 'b') bad(v, "comparator", "number") }
        rk.foreach { case (k, v) => if (k == 'b') bad(v, "comparator", "number") }
        (lk, rk) match {
          case (Some((a, av)), Some((b, _))) if a != b =>
            bad(av, "comparator", "number")
          case _ =>
        }
      case "=~" | "!~" =>
        lk.foreach { case (k, v) => if (k != 's') bad(v, "comparator", "number") }
        rk.foreach { case (k, v) => if (k != 's') bad(v, "comparator", "number") }
        // a literal pattern must compile (evaluation.go:168)
        rk.collect { case ('s', pat) =>
          try java.util.regex.Pattern.compile(pat)
          catch { case e: Exception => throw new IllegalArgumentException(
            s"unable to compile regexp pattern '$pat': ${e.getMessage}") }
        }
      case "&&" | "||" =>
        lk.foreach { case (k, v) => if (k != 'b') bad(v, "logical operator", "bool") }
        rk.foreach { case (k, v) => if (k != 'b') bad(v, "logical operator", "bool") }
      case _ => // ==/!=/??/in place no static restriction
    }
  }

  def toColumn(e: Expr, p: Pipe): Column = {
    import Expr._
    e match {
      case Num(v) => if (v == math.rint(v) && math.abs(v) < 1e15) lit(v.toLong) else lit(v)
      case Str(v) => lit(v)
      case Bool(v) => lit(v)
      case Null => lit(null)
      case Ident("PI") => lit(math.Pi)
      case Ident("E") => lit(math.E)
      case Ident(name) => col(name)
      case Var(name) => col(s"$$$name")
      case Unary("-", x) =>
        litKind(x).foreach { case (k, v) => if (k != 'n')
          throw new IllegalArgumentException(
            s"Value '$v' cannot be used with the prefix '-'") }
        -toColumn(x, p)
      case Unary("!", x) =>
        litKind(x).foreach { case (k, v) => if (k != 'b')
          throw new IllegalArgumentException(
            s"Value '$v' cannot be used with the prefix '!'") }
        !toColumn(x, p)
      // float64(^int64(x)) — expression/stage.go bitwiseNotStage
      case Unary("~", x) =>
        litKind(x).foreach { case (k, v) => if (k != 'n')
          throw new IllegalArgumentException(
            s"Value '$v' cannot be used with the prefix '~'") }
        org.apache.spark.sql.functions.bitwise_not(
          toColumn(x, p).cast("long")).cast("double")
      case Unary(op, _) => throw new IllegalArgumentException(s"unary $op")
      case Bin(op, l, r) =>
        checkLiteralTyping(op, l, r)
        val (a, b) = (toColumn(l, p), toColumn(r, p))
        // The reference's expression engine evaluates ALL arithmetic in
        // float64 (expression/evaluation.go:72-94 asserts .(float64); %
        // is math.Mod, the truncated remainder) — so integer-typed
        // operands must widen to double, and the result type is double.
        // Non-numeric operands (timestamps, strings) keep Spark-native
        // behavior for the engine's typed extensions.
        lazy val bothNumeric: Boolean = {
          def isNum(dt: org.apache.spark.sql.types.DataType) = dt match {
            case _: org.apache.spark.sql.types.NumericType => true
            case org.apache.spark.sql.types.NullType => true
            case _ => false
          }
          try {
            val Array(lt, rt) = p.df.select(a.as("l"), b.as("r")).schema.fields.map(_.dataType)
            isNum(lt) && isNum(rt)
          } catch { case _: Exception => false }
        }
        def arith(f: (Column, Column) => Column, fallback: (Column, Column) => Column): Column =
          if (bothNumeric) f(a.cast("double"), b.cast("double")) else fallback(a, b)
        op match {
          case "+" =>
            // TQL '+' concatenates when either operand is a string — the
            // literal case AND the chained case where the left side is a
            // concat RESULT ("foo + 123 + 'bar' + true" → "baz123bartrue",
            // evaluation_test.go:978-989: Go dispatches on the runtime
            // type, so a string-typed subtree keeps concatenating)
            lazy val anyString: Boolean =
              try p.df.select(a.as("l"), b.as("r")).schema.fields
                .exists(_.dataType == org.apache.spark.sql.types.StringType)
              catch { case _: Exception => false }
            (l, r) match {
              case (Str(_), _) | (_, Str(_)) => concat(a.cast("string"), b.cast("string"))
              case _ if !bothNumeric && anyString =>
                concat(a.cast("string"), b.cast("string"))
              case _ => arith(_ + _, _ + _)
            }
          case "-" => arith(_ - _, _ - _)
          case "*" => arith(_ * _, _ * _)
          case "/" => arith(_ / _, _ / _)
          case "%" => arith(_ % _, pmod(_, _))
          case "**" => pow(a, b)
          // bitwise on float64: float64(int64(l) OP int64(r)); shifts
          // convert through uint64, so >> is a LOGICAL shift and
          // shift counts >= 64 flush to zero (Go shifts don't wrap —
          // expression/stage.go:318-330)
          case "&" => (a.cast("long").bitwiseAND(b.cast("long"))).cast("double")
          case "|" => (a.cast("long").bitwiseOR(b.cast("long"))).cast("double")
          case "^" => (a.cast("long").bitwiseXOR(b.cast("long"))).cast("double")
          case "<<" =>
            when(b.cast("long") >= 64L, lit(0d)).otherwise(
              call_function("shiftleft", a.cast("long"), b.cast("int")).cast("double"))
          case ">>" =>
            when(b.cast("long") >= 64L, lit(0d)).otherwise(
              call_function("shiftrightunsigned", a.cast("long"), b.cast("int")).cast("double"))
          // NULL comparisons have IS [NOT] NULL semantics in TQL
          // (FILTER(value(1) != NULL), tql_test.go FAKE_statz)
          case "==" => (l, r) match {
            case (Null, _) => b.isNull
            case (_, Null) => a.isNull
            case _ => a === b
          }
          case "!=" => (l, r) match {
            case (Null, _) => b.isNotNull
            case (_, Null) => a.isNotNull
            case _ => a =!= b
          }
          case ">" => a > b
          case ">=" => a >= b
          case "<" => a < b
          case "<=" => a <= b
          case "&&" => a && b
          case "||" => a || b
          case "??" => coalesce(a, b)
          case "=~" => a.rlike(r match { case Str(s) => s; case _ => "" })
          case "!~" => !a.rlike(r match { case Str(s) => s; case _ => "" })
          case other => throw new IllegalArgumentException(s"operator $other")
        }
      case Ternary(c, t, f) =>
        // a literal condition must be a bool (ternaryErrorFormat)
        litKind(c).foreach { case (k, v) => if (k != 'b')
          throw new IllegalArgumentException(
            s"Value '$v' cannot be used with the ternary operator '?', it is not a bool") }
        // TQL is dynamically typed: a ternary may yield different types per
        // branch (`x != "VALUE" ? parseFloat(x)*10 : x`). A LITERAL bool
        // condition picks its branch statically — exact Go semantics with
        // no type unification at all ("true ? 1 : 5 > 10" → 1,
        // evaluation_test.go:366). Otherwise Spark's CaseWhen coercion
        // would cast a string branch to double and (ANSI) throw on
        // non-numeric rows — harmonize mixed numeric/string (or boolean)
        // branches to go-formatted strings instead.
        c match {
          case Bool(true) => toColumn(t, p)
          case Bool(false) => toColumn(f, p)
          case _ =>
        val (cc, tc, fc) = (toColumn(c, p), toColumn(t, p), toColumn(f, p))
        val branchTypes =
          try Some(p.df.select(tc.as("t"), fc.as("f")).schema.fields.map(_.dataType))
          catch { case _: Exception => None }
        branchTypes match {
          case Some(Array(tt, ft)) if tt != ft &&
            (tt == org.apache.spark.sql.types.StringType ||
             ft == org.apache.spark.sql.types.StringType ||
             tt == org.apache.spark.sql.types.BooleanType ||
             ft == org.apache.spark.sql.types.BooleanType) =>
            def goStr(col0: Column, dt: org.apache.spark.sql.types.DataType): Column =
              dt match {
                case org.apache.spark.sql.types.DoubleType |
                     org.apache.spark.sql.types.FloatType =>
                  when(col0 === floor(col0) && abs(col0) < 1e15,
                    col0.cast("long").cast("string"))
                    .otherwise(col0.cast("string"))
                case _ => col0.cast("string")
              }
            when(cc, goStr(tc, tt)).otherwise(goStr(fc, ft))
          case _ => when(cc, tc).otherwise(fc)
        }
        }
      case In(v, set) => toColumn(v, p).isin(set.map(x => toColumn(x, p)): _*)
      case Index(arr, idx) => element_at(toColumn(arr, p), toColumn(idx, p) + 1)
      case Call(name, args) => callToColumn(name, args, p)
    }
  }

  private[tql] def callToColumn(name: String, args: List[Expr], p: Pipe): Column = {
    import Expr._
    def a(i: Int): Column = toColumn(args(i), p)
    name match {
      case "value" =>
        def at(i: Int): Column = {
          if (i >= p.values.size) throw new IllegalArgumentException(
            s"f(value) arg(0) $i is out of range of the value(len:${p.values.size}) in ")
          vcol(p.values(i))
        }
        args match {
          case List(Num(i)) => at(i.toInt)
          // numeric-string index works too (fm_context_test.go:47-49)
          case List(Str(si)) if si.nonEmpty && si.forall(_.isDigit) => at(si.toInt)
          case Nil => vcol(p.values.head)
          case _ => throw new IllegalArgumentException("value(n)")
        }
      case "key" => col(p.keyCol)
      case "param" => args match {
        // missing param -> null (GetRequestParam returns nil; `?? dflt` works)
        case List(Str(k)) => paramFirst(k).map(lit).getOrElse(lit(null).cast("string"))
        case _ => throw new IllegalArgumentException("param('name')")
      }
      // sub-routine argument access (fm_context.go fmArgsParam)
      case "args" =>
        def argAt(i: Int): Column = {
          val vals = currentParams.get.getOrElse("args", Seq.empty)
          if (i >= vals.size) throw new IllegalArgumentException(
            s"f(arg) arg(0) $i is out of range of the arg(len:${vals.size})")
          lit(vals(i))
        }
        args match {
          case List(Num(i)) => argAt(i.toInt)
          // numeric-string index (fm_context_test.go:92-94)
          case List(Str(si)) if si.nonEmpty && si.forall(_.isDigit) => argAt(si.toInt)
          case Nil => lit(currentParams.get.getOrElse("args", Seq.empty).mkString(","))
          case _ => throw new IllegalArgumentException("args([n])")
        }
      // math (reference fx_definitions.go:79-105)
      case "abs" => abs(a(0))
      case "acos" => acos(a(0))
      case "asin" => asin(a(0))
      case "atan" => atan(a(0))
      // the script runtime context object (fm_context.go:22 GetContext):
      // no public fields, so it surfaces as an empty object ({} under
      // JSON) — the docs' canonical use is `MAPVALUE(0, context())`
      case "context" =>
        if (args.nonEmpty) throw new IllegalArgumentException(
          s"f(context) invalid number of args; expect:0, actual:${args.size}")
        struct()
      case "ceil" => ceil(a(0))
      case "cos" => cos(a(0))
      case "cosh" => cosh(a(0))
      case "exp" => exp(a(0))
      case "exp2" => pow(lit(2d), a(0))
      case "floor" => floor(a(0))
      case "log" => log(a(0))
      case "log10" => log10(a(0))
      case "log2" => log2(a(0))
      // Go math.Mod keeps the dividend's sign (truncated remainder);
      // Spark's % has the same convention, pmod does not
      case "mod" => a(0) % a(1)
      case "pow" =>
        // arity/type diagnostics mirror fx_definitions' conv layer
        // (func_test.go TestMathFunctions)
        if (args.size != 2) throw new IllegalArgumentException(
          s"f(pow) invalid number of args; expect:2, actual:${args.size}")
        args.zipWithIndex.foreach {
          case (Str(_), i) => throw new IllegalArgumentException(
            s"f(pow) arg($i) should be float64, but string")
          case _ => ()
        }
        pow(a(0), a(1))
      case "pow10" =>
        if (args.size != 1) throw new IllegalArgumentException(
          s"f(pow10) invalid number of args; expect:1, actual:${args.size}")
        args.head match {
          case Str(_) => throw new IllegalArgumentException(
            "f(pow10) arg(0) should be int, but string")
          case _ => ()
        }
        pow(lit(10d), a(0))
      case "round" =>
        if (args.isEmpty) throw new IllegalArgumentException(
          "f(round) invalid number of args; expect:1, actual:0")
        args.head match {
          case Str(_) => throw new IllegalArgumentException(
            "f(round) arg(0) should be float64, but string")
          case _ => ()
        }
        args.size match {
          case 1 => round(a(0))
          case _ => round(a(0), args(1).asInstanceOf[Num].v.toInt)
        }
      case "sin" => sin(a(0))
      case "sinh" => sinh(a(0))
      case "sqrt" => sqrt(a(0))
      case "tan" => tan(a(0))
      case "tanh" => tanh(a(0))
      case "acosh" => acosh(a(0))
      case "asinh" => asinh(a(0))
      case "atanh" => atanh(a(0))
      // Go math.Remainder: IEEE 754 remainder — x − y·rint(x/y); bround
      // is Spark's half-even rounding (fx_definitions.go:98)
      case "remainder" =>
        a(0).cast("double") - a(1).cast("double") *
          bround(a(0).cast("double") / a(1).cast("double"), 0)
      case "trunc" => expr(s"trunc(${a(0)})") // rarely used
      // min/max as scalar pair (reference fm_monad.go:848-878)
      case "min" => least(a(0), a(1))
      case "max" => greatest(a(0), a(1))
      // strings (reference fm_fake.go:540-637)
      case "strTrimSpace" => trim(a(0))
      case "strToUpper" => upper(a(0))
      case "strToLower" => lower(a(0))
      case "strReplaceAll" => args match {
        case List(x, Str(from), Str(to)) => regexp_replace(toColumn(x, p), java.util.regex.Pattern.quote(from), to)
        case _ => throw new IllegalArgumentException("strReplaceAll(s, from, to)")
      }
      case "strTrimPrefix" =>
        when(a(0).startsWith(a(1)), a(0).substr(length(a(1)) + 1, length(a(0)))).otherwise(a(0))
      case "strTrimSuffix" =>
        when(a(0).endsWith(a(1)), a(0).substr(lit(1), length(a(0)) - length(a(1)))).otherwise(a(0))
      case "strReplace" => args match {
        case List(x, Str(from), Str(to), Num(n)) =>
          replaceNUdf(toColumn(x, p), lit(from), lit(to), lit(n.toInt))
        case _ => throw new IllegalArgumentException("strReplace(s, old, new, n)")
      }
      case "strHasPrefix" => a(0).startsWith(a(1))
      case "strHasSuffix" => a(0).endsWith(a(1))
      case "strIndex" =>
        // Go strings.Index returns a BYTE offset (func_test.go:238-252:
        // "World"'s 'o' in "HelLo 😀 World" is 12, after the 4-byte emoji)
        // — octet-length of the character prefix before the match
        val loc = instr(a(0), args(1).asInstanceOf[Str].v)
        when(loc === 0, lit(-1))
          .otherwise(octet_length(a(0).substr(lit(1), loc - 1)))
      case "strLastIndex" =>
        // Go strings.LastIndex (fm_fake.go:636): byte offset, -1 missing —
        // last occurrence found via the reversed-string locate
        val (s, sub) = (a(0), a(1))
        val rloc = call_function("locate", reverse(sub), reverse(s))
        val charPos0 = length(s) - rloc + 1 - length(sub) // 0-based chars
        when(rloc === 0, lit(-1))
          .otherwise(octet_length(s.substr(lit(1), charPos0)))
      case "strSub" =>
        // rune-based slice with Go-side edge rules (fm_fake.go:592-630):
        // negative offset counts from the end, |offset| past either end
        // yields "", negative count means to-end
        if (args.size == 1) a(0) else {
          val s = a(0)
          val len = length(s)
          val off = a(1).cast("int")
          val idx = when(off < 0, len + off).otherwise(off)
          val invalid = when(off < 0, -off >= len).otherwise(off >= len)
          val cnt = if (args.size > 2) a(2).cast("int") else lit(-1)
          val res = when(cnt < 0, s.substr(idx + 1, len))
            .otherwise(s.substr(idx + 1, cnt))
          when(invalid, lit("")).otherwise(res)
        }
      case "strSprintf" =>
        // Go verbs java.util.Formatter rejects: %v (default format) and a
        // bare-precision %.f (= precision 0); normalize before format_string
        val jfmt = args.head.asInstanceOf[Str].v
          .replace("%v", "%s").replaceAll("%(\\d*)\\.([fge])", "%$1.0$2")
        format_string(jfmt, args.tail.map(x => toColumn(x, p)): _*)
      // Go url.QueryEscape (fm_context.go:165-168). Spark's url_encode is
      // Java URLEncoder, which differs on exactly two bytes: '*' is left
      // bare (Go wants %2A) and '~' is encoded (Go leaves it)
      case "escapeParam" =>
        regexp_replace(regexp_replace(url_encode(a(0)), "\\*", "%2A"), "%7E", "~")
      case "simplex" => args.size match {
        case 2 => graft.functions.Noise.simplex1(a(0).cast("long"), a(1).cast("double"))
        case 3 => graft.functions.Noise.simplex2(a(0).cast("long"), a(1).cast("double"), a(2).cast("double"))
        case _ => throw new IllegalArgumentException("simplex(seed, x[, y])")
      }
      case "glob" => args match {
        case List(Str(pat), x) => toColumn(x, p).rlike(graft.functions.ScalarFns.globToRegex(pat))
        case _ => throw new IllegalArgumentException("glob(pattern, text)")
      }
      case "regexp" => args match {
        case List(Str(pat), x) =>
          // eager literal-pattern check with the Go regexp error shape
          // (func_test.go: error parsing regexp: missing closing ]: `[0-9$`)
          try java.util.regex.Pattern.compile(pat)
          catch {
            case e: java.util.regex.PatternSyntaxException =>
              val desc =
                if (e.getDescription != null &&
                  e.getDescription.contains("Unclosed character class"))
                  "missing closing ]: `" + pat.substring(pat.lastIndexOf('[')) + "`"
                else e.getDescription
              throw new IllegalArgumentException(s"error parsing regexp: $desc")
          }
          toColumn(x, p).rlike(pat)
        case _ => throw new IllegalArgumentException("regexp(pattern, text)")
      }
      // conversion / misc
      case "parseFloat" => a(0).cast("double")
      case "parseBool" =>
        // Go strconv.ParseBool's accept set; rejects fail eagerly with
        // the reference's rewritten error (fm_fake.go parseBool)
        args.head match {
          case Str(s) =>
            val truthy = Set("1", "t", "T", "TRUE", "true", "True")
            val falsy = Set("0", "f", "F", "FALSE", "false", "False")
            if (truthy(s)) lit(true)
            else if (falsy(s)) lit(false)
            else throw new IllegalArgumentException(
              s"""parseBool: parsing "$s": invalid syntax""")
          case _ => a(0).cast("boolean")
        }
      case "len" =>
        // reference len() works on strings AND lists, and buffers float64
        // (func_test.go:598-609: both expectations are 4.0); a bare
        // value() is the whole record tuple, so len(value()) is its arity
        // (TestMapFunc_FILTER `len(value()) > 2`)
        args.head match {
          case Call("value", Nil) => lit(p.values.size.toDouble)
          case _ =>
            val t = try p.df.select(a(0)).schema.head.dataType
              catch { case _: Exception => org.apache.spark.sql.types.StringType }
            (t match {
              case _: org.apache.spark.sql.types.ArrayType => size(a(0))
              case _ => length(a(0))
            }).cast("double")
        }
      case "element" =>
        // nums/array.go Element — variadic values + trailing 0-based
        // index, time values as float64 epoch-ns; a TQL []any value
        // (value() with no index, or an array column) spreads
        def tsToNs(c: Column): Column = {
          val isTs = try p.df.select(c).schema.head.dataType
            .isInstanceOf[org.apache.spark.sql.types.TimestampType]
            catch { case _: Exception => false }
          if (isTs) (unix_micros(c) * 1000L).cast("double") else c
        }
        args match {
          case List(Call("value", Nil), idx) =>
            // element(value(), i): the record tuple spread (func_test.go
            // TestMapFunc_FILTER)
            element_at(array(p.values.map(v => tsToNs(vcol(v))): _*),
              toColumn(idx, p).cast("int") + 1)
          case List(arr, idx) =>
            val c = toColumn(arr, p)
            val isArr = try p.df.select(c).schema.head.dataType
              .isInstanceOf[org.apache.spark.sql.types.ArrayType]
              catch { case _: Exception => true }
            if (!isArr) throw new IllegalArgumentException(
              "f(element) invalud number of args (n:2)") // sic, array.go:34
            element_at(c, toColumn(idx, p).cast("int") + 1)
          case _ if args.size < 2 => throw new IllegalArgumentException(
            s"f(element) invalud number of args (n:${args.size})")
          case _ =>
            // literal-index diagnostics (array.go:36-48)
            args.last match {
              case Str(_) => throw new IllegalArgumentException(
                "f(element) index of element should be int, but string")
              case Bool(_) => throw new IllegalArgumentException(
                "f(element) index of element should be int, but bool")
              case Num(n) if n.toInt >= args.size - 1 =>
                throw new IllegalArgumentException(
                  s"f(element) out of index ${n.toInt} / ${args.size - 1}")
              case Num(n) =>
                // literal index: pick the arg directly — keeps each
                // value's own type (mixed tuples never build an array)
                return tsToNs(a(n.toInt))
              case _ => ()
            }
            val cols = args.indices.map(i => tsToNs(a(i)))
            element_at(array(cols.init: _*), cols.last.cast("int") + 1)
        }
      case "list" => array(args.map(x => toColumn(x, p)): _*)
      case "nullValue" => coalesce(a(0), a(1))
      case "coalesce" => coalesce(args.map(x => toColumn(x, p)): _*)
      // time (epoch-ns discipline)
      case "time" =>
        // time(ns) / time('now'±dur) → a datetime value (µs-precision
        // timestamp; the sink's timeformat/tz options format it like the
        // reference's datetime). 'now' resolves to the injected clock.
        // Diagnostics mirror fm_time.go fmTime → util.ToTime
        // (func_test.go TestTime pins each string).
        if (args.isEmpty) throw new IllegalArgumentException(
          "f(time) invalid number of args; expect:1, actual:0")
        val nsExpr = args.head match {
          case Str(s) if s.trim == "now" => lit(currentNowNs.get.longValue())
          case Str(s) if s.trim.startsWith("now") =>
            lit(nowRelativeNs(s.trim)) // 'now-1h' etc, Go error strings
          case Str(s) => throw new IllegalArgumentException(
            s"invalid time expression: incompatible conv '$s' (string) to time.Time")
          case Bool(b) => throw new IllegalArgumentException(
            s"invalid time expression: incompatible conv '$b' (bool) to time.Time")
          case _ => a(0).cast("long")
        }
        timestamp_micros(floor(nsExpr.cast("decimal(25,0)") / lit(1000)).cast("long"))
      case "parseTime" => args match {
        // parseTime(v, fmt[, tz]) → a datetime value (fm_time.go
        // fmParseTime; the reference returns time.Time — here the µs
        // timestamp every sink timeformat understands). Epoch modes are
        // tz-less; pattern mode parses wall-clock text in the given
        // location (tz may be a tz() call or a bare string like "Local")
        case x :: fmtArg :: rest if (fmtArg match {
          case Str(_) | Call("sqlTimeformat", List(Str(_)))
               | Call("ansiTimeformat", List(Str(_))) => true
          case _ => false
        }) =>
          val c = toColumn(x, p)
          val tzName = rest.collectFirst {
            case Call("tz", List(Str(z))) => graft.time.TimeFns.resolveTz(z)
            case Str(z) => graft.time.TimeFns.resolveTz(z)
          }
          // epoch text tolerates scientific notation — util.ToInt64 falls
          // back to a float parse (types_test.go:389 "1.691800174e+09").
          // Integral text keeps the exact long path (ns precision); only
          // non-integral shapes ride the double fallback (ANSI-safe: a
          // plain cast would throw before coalesce could fall through)
          def epochLong = {
            val s = c.cast("string")
            when(s.rlike("^[+-]?\\d+$"), c.cast("long"))
              .otherwise(s.cast("double").cast("long"))
          }
          def wallParse(jp: String, goStyle: Boolean): org.apache.spark.sql.Column = {
            // a Go ".999" fraction is OPTIONAL on input (TestParseTime
            // parses "2023-03-01 14:01:02" with DEFAULT): try the fraction
            // variants longest-first, fall back to the fractionless base
            val ts = "\\.S+".r.findFirstMatchIn(jp) match {
              case Some(m) if goStyle =>
                val nmax = m.end - m.start - 1
                val variants = (nmax to 1 by -1).map { n =>
                  jp.substring(0, m.start) + "." + "S" * n + jp.substring(m.end)
                } :+ (jp.substring(0, m.start) + jp.substring(m.end))
                coalesce(variants.map(v => try_to_timestamp(c, lit(v))): _*)
              case _ => to_timestamp(c, jp)
            }
            tzName.filter(_ != "UTC").map(z => to_utc_timestamp(ts, z)).getOrElse(ts)
          }
          fmtArg match {
            case Call("sqlTimeformat", List(Str(f))) =>
              wallParse(graft.time.TimeFns.goLayoutPattern(
                graft.time.TimeFns.toSqlGoLayout(f))._1, goStyle = true)
            case Call("ansiTimeformat", List(Str(f))) =>
              wallParse(graft.time.TimeFns.goLayoutPattern(
                graft.time.TimeFns.toAnsiGoLayout(f))._1, goStyle = true)
            case Str("s") => timestamp_micros(epochLong * 1000000L)
            case Str("ms") => timestamp_micros(epochLong * 1000L)
            case Str("us") => timestamp_micros(epochLong)
            case Str("ns") => timestamp_micros(graft.time.TimeFns.nsToUs(epochLong))
            case Str(pattern) =>
              // named/Go layouts resolve like strTime
              val (jp, goStyle) = graft.time.TimeFns.resolveNamedOrGoFormat(pattern)
              wallParse(jp, goStyle)
            case _ => throw new IllegalArgumentException("parseTime(v, fmt[, tz])")
          }
        case _ => throw new IllegalArgumentException("parseTime(v, fmt[, tz])")
      }
      case "roundTime" => args match {
        case List(x, Str(dur)) =>
          val periodNs = graft.time.TimeFns.parseDurationNs(dur)
          if (periodNs == 0) throw new IllegalArgumentException(
            "f(roundTime) arg(1) zero duration is not allowed") // func_test.go:548
          val xc = toColumn(x, p)
          // timestamp inputs round as timestamps (sink timeformat modes
          // then apply — TestGroupWhere renders epoch-s)
          val tsNs = unix_micros(xc) * 1000L
          val rounded = graft.time.TimeFns.roundTimeNs(tsNs, periodNs)
          // integer µs (division through double is exact below 2^53 µs)
          val asTs = timestamp_micros((rounded.cast("long") / lit(1000L)).cast("long"))
          // dispatch on the input type at plan build time
          try {
            if (p.df.select(xc).schema.head.dataType
              .isInstanceOf[org.apache.spark.sql.types.TimestampType]) asTs
            else graft.time.TimeFns.roundTimeNs(xc, periodNs)
          } catch {
            case _: Exception => graft.time.TimeFns.roundTimeNs(xc, periodNs)
          }
        case _ => throw new IllegalArgumentException("roundTime(t, 'dur')")
      }
      // ---- time parts (fm_time.go:53-229) — Go time.Time accessors over
      // an epoch-ns long or timestamp, with an optional tz() location
      case "timeYear" | "timeMonth" | "timeDay" | "timeHour" | "timeMinute" |
           "timeSecond" | "timeNanosecond" | "timeISOYear" | "timeISOWeek" |
           "timeYearDay" | "timeWeekDay" |
           "timeUnix" | "timeUnixMilli" | "timeUnixMicro" | "timeUnixNano" =>
        val nsL = nsLongOf(args.head, p)
        val tzName = args.collectFirst {
          case Call("tz", List(Str(z))) => graft.time.TimeFns.resolveTz(z)
        }
        def local = {
          val ts = timestamp_micros(graft.time.TimeFns.nsToUs(nsL))
          tzName.map(z => from_utc_timestamp(ts, z)).getOrElse(ts)
        }
        name match {
          case "timeYear" => year(local)
          case "timeMonth" => month(local)
          case "timeDay" => dayofmonth(local)
          case "timeHour" => hour(local)
          case "timeMinute" => minute(local)
          case "timeSecond" => second(local)
          // ns offset within the second (reference keeps full ns precision)
          case "timeNanosecond" => pmod(nsL, lit(1000000000L)).cast("int")
          case "timeISOYear" =>
            call_function("date_part", lit("YEAROFWEEK"), local).cast("int")
          case "timeISOWeek" => weekofyear(local)
          case "timeYearDay" => dayofyear(local)
          // Go Weekday(): 0=Sunday … 6=Saturday; Spark dayofweek is 1-based
          case "timeWeekDay" => dayofweek(local) - 1
          // timeUnix* return float64 epochs (fmTimeUnix0)
          case "timeUnix" => floor(nsL.cast("decimal(25,0)") / lit(1000000000L)).cast("double")
          case "timeUnixMilli" => floor(nsL.cast("decimal(25,0)") / lit(1000000L)).cast("double")
          case "timeUnixMicro" => floor(nsL.cast("decimal(25,0)") / lit(1000L)).cast("double")
          case _ => nsL.cast("double") // timeUnixNano
        }
      case "strTime" => args match {
        // strTime(t, format [, tz()]): Go-layout/named format rendering
        // (fm_time.go fmStrTime + util/types.go TimeFormatter.Format)
        case t :: fmtE :: _ =>
          val nsL = nsLongOf(t, p)
          val rawFmt = fmtE match {
            case Call("sqlTimeformat", _) | Call("ansiTimeformat", _) => ""
            case other => constString(other)
          }
          rawFmt match {
            // epoch modes render the raw epoch number (Format's switch)
            case "ns" => nsL.cast("string")
            case "us" => graft.time.TimeFns.nsToUs(nsL).cast("string")
            case "ms" => floor(nsL.cast("decimal(25,0)") / lit(1000000L)).cast("long").cast("string")
            case "s" => floor(nsL.cast("decimal(25,0)") / lit(1000000000L)).cast("long").cast("string")
            case _ =>
              val (pattern0, trim) = fmtE match {
                case Call("sqlTimeformat", List(Str(f))) =>
                  graft.time.TimeFns.goLayoutPattern(graft.time.TimeFns.toSqlGoLayout(f))
                case Call("ansiTimeformat", List(Str(f))) =>
                  graft.time.TimeFns.goLayoutPattern(graft.time.TimeFns.toAnsiGoLayout(f))
                case _ => graft.time.TimeFns.resolveNamedOrGoFormat(rawFmt)
              }
              val tzName = args.collectFirst {
                case Call("tz", List(Str(z))) => graft.time.TimeFns.resolveTz(z)
              }.getOrElse("UTC") // fmStrTime defaults tz = time.UTC
              // zone tokens become literals resolved at the query clock —
              // Spark renders in the session zone, see zoneSubstitutedPattern
              val pattern = graft.time.TimeFns.zoneSubstitutedPattern(
                pattern0, tzName, currentNowNs.get.longValue() / 1000000000L)
              val ts = timestamp_micros(graft.time.TimeFns.nsToUs(nsL))
              val local = if (tzName == "UTC") ts else from_utc_timestamp(ts, tzName)
              val rendered = date_format(local, pattern)
              if (trim) graft.time.TimeFns.trimFractionZeros(rendered) else rendered
          }
        case _ => throw new IllegalArgumentException("strTime(t, format[, tz])")
      }
      case "timeAdd" => args match {
        // base: 'now' resolves the pinned clock; delta: duration string or
        // ns expression (FAKE_INSERT uses timeAdd('now', value(0)*2e9))
        case List(x, d) =>
          val base = x match {
            case Str(s) if s.trim == "now" => lit(currentNowNs.get.longValue())
            case Str(s) if s.trim.startsWith("now") => lit(nowRelativeNs(s.trim))
            case other => toColumn(other, p)
          }
          val delta = d match {
            case Str(dur) =>
              // fmTimeAdd wraps ToDuration's Go error (func_test.go:
              // `invalid time expression: time: unknown unit "x" in
              // duration "-2x"`)
              val ns =
                try graft.time.TimeFns.parseDurationNs(dur)
                catch {
                  case e: IllegalArgumentException =>
                    throw new IllegalArgumentException(
                      s"invalid time expression: ${e.getMessage}")
                }
              lit(ns)
            case other => toColumn(other, p).cast("long")
          }
          base + delta
        case _ => throw new IllegalArgumentException("timeAdd(t, 'dur'|ns)")
      }
      case "random" =>
        // nondeterministic uniform [0,1) (fm_fake.go random) — results
        // stabilize only behind a cache() sink (tqlcache_test.go)
        rand()
      case "dict" =>
        // dict('k', v, …) → map value the JSON envelope renders as an
        // object; an odd argument list names a key with no value
        // (TestDict pins the message)
        if (args.size % 2 != 0) {
          val last = args.last match {
            case Str(s) => s
            case other => other.toString
          }
          throw new IllegalArgumentException(
            s"""dict() name "$last" doesn't match with any value""")
        }
        map(args.map(toColumn(_, p)): _*)
      // ---- geo spatial (fx_definitions.go:111-119; nums/geography.go) --
      // Constructors produce layer/feature objects as JSON text; the
      // GEOMAP sink parses them back into leaflet layers (marker/circle
      // types carry [lat,lon], GeoJSON features [lon,lat] — geography.go
      // Coordinates vs MarshalGeoJSON).
      case "latlon" => args match {
        case List(x, y) => array(toColumn(x, p).cast("double"), toColumn(y, p).cast("double"))
        case _ => throw new IllegalArgumentException("latlon(lat, lon)")
      }
      case "geoPoint" => args match {
        case ll :: rest =>
          geoFeatureJson("Point", geoPointJson(ll, p, lonLat = true),
            geoPropsJson(rest, Nil, p))
        case _ => throw new IllegalArgumentException("geoPoint(latlon[, opt])")
      }
      case "geoMultiPoint" | "geoPolygon" =>
        // NewMultiLatLonFunc: latlon args are points, string/dict is opt
        val (pts, opt) = args.partition(geoIsPointArg)
        geoFeatureJson(if (name == "geoMultiPoint") "MultiPoint" else "Polygon",
          geoRingJson(pts, p), geoPropsJson(opt, Nil, p))
      case "geoLineString" => args match {
        case from :: to :: rest =>
          geoFeatureJson("LineString", geoRingJson(List(from, to), p),
            geoPropsJson(rest, Nil, p))
        case _ => throw new IllegalArgumentException("geoLineString(from, to[, opt])")
      }
      case "geoCircle" => args match {
        case ll :: r :: rest =>
          // radius lands in properties unless the opt already carries one
          // (NewGeoCircle, geography.go:201-219)
          geoLayerJson("circle", geoPointJson(ll, p, lonLat = false),
            geoPropsJson(rest, Seq("radius" -> geoJsonValue(r, p)), p))
        case _ => throw new IllegalArgumentException("geoCircle(latlon, radius[, opt])")
      }
      case "geoPointMarker" => args match {
        case ll :: rest =>
          geoLayerJson("marker", geoPointJson(ll, p, lonLat = false),
            geoPropsJson(rest, Nil, p))
        case _ => throw new IllegalArgumentException("geoPointMarker(latlon[, opt])")
      }
      case "geoCircleMarker" => args match {
        case ll :: r :: rest =>
          geoLayerJson("circleMarker", geoPointJson(ll, p, lonLat = false),
            geoPropsJson(rest, Seq("radius" -> geoJsonValue(r, p)), p))
        case _ => throw new IllegalArgumentException("geoCircleMarker(latlon, radius[, opt])")
      }
      case other => throw new IllegalArgumentException(s"unknown function $other")
    }
  }

  /** Normalize a time expression to an epoch-ns long column (TQL times
    * are ns longs internally; CSV datetimeType sources surface
    * timestamps). */
  /** MAP_DIFF-family input coercion: the reference's diff state machine
    * routes time.Time to a ns-duration branch and pushes everything else
    * through util.ToFloat64 — strings included, so an untyped CSV column
    * diffs numerically (fm_monad.go:1848-1906; tql_test.go:1620-1647).
    * Resolve the expression's type once against the frame to pick. */
  private[tql] def diffInput(e: Expr, p: Pipe): (Column, Boolean) = {
    val c = toColumn(e, p)
    val isTs = try p.df.select(c).schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.TimestampType]
    catch { case _: Exception => false }
    if (isTs) (c, true) else (c.cast("double"), false)
  }

  private[tql] def nsLongOf(e: Expr, p: Pipe): Column = {
    val c = toColumn(e, p)
    val isTs = try p.df.select(c).schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.TimestampType]
    catch { case _: Exception => false }
    if (isTs) unix_micros(c) * 1000L else c.cast("long")
  }

  // ---- geo constructor JSON builders --------------------------------

  /** latlon() literal or array-typed expression → (lat, lon) columns. */
  private[tql] def geoLatLon(e: Expr, p: Pipe): (Column, Column) = e match {
    case Expr.Call("latlon", List(a, b)) =>
      (toColumn(a, p).cast("double"), toColumn(b, p).cast("double"))
    case other =>
      val c = toColumn(other, p)
      (element_at(c, 1).cast("double"), element_at(c, 2).cast("double"))
  }

  private[tql] def geoIsPointArg(e: Expr): Boolean = e match {
    case Expr.Call("latlon", _) => true
    case Expr.Str(_) | Expr.Call("dict", _) => false
    case _ => false // string/dict opts only beyond latlon (NewMultiLatLonFunc)
  }

  /** `[a,b]` JSON pair — leaflet layers take [lat,lon], GeoJSON [lon,lat]. */
  private[tql] def geoPointJson(e: Expr, p: Pipe, lonLat: Boolean): Column = {
    val (lat, lon) = geoLatLon(e, p)
    val (x, y) = if (lonLat) (lon, lat) else (lat, lon)
    concat(lit("["), x.cast("string"), lit(","), y.cast("string"), lit("]"))
  }

  private[tql] def geoRingJson(pts: List[Expr], p: Pipe): Column =
    concat((lit("[") +: pts.zipWithIndex.flatMap { case (pt, i) =>
      (if (i == 0) Nil else Seq(lit(","))) :+ geoPointJson(pt, p, lonLat = true)
    } :+ lit("]")): _*)

  /** One property value as JSON text: literals render at compile time,
    * row expressions by their resolved type (strings quoted+escaped). */
  private[tql] def geoJsonValue(e: Expr, p: Pipe): Column = e match {
    case Expr.Str(s) => lit(graft.sinks.GoJs.jsonQuote(s))
    case Expr.Num(v) => lit(graft.sinks.GoJs.goNum(v))
    case Expr.Bool(b) => lit(b.toString)
    case Expr.Null => lit("null")
    case Expr.Call("dict", kvs) => geoDictJson(kvs, p)
    case other =>
      val c = toColumn(other, p)
      val isStr = try p.df.select(c).schema.head.dataType ==
        org.apache.spark.sql.types.StringType catch { case _: Exception => true }
      if (isStr)
        concat(lit("\""),
          regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
          lit("\""))
      else c.cast("string")
  }

  private[tql] def geoDictJson(kvs: List[Expr], p: Pipe): Column = {
    val parts = kvs.grouped(2).toList.collect { case List(Expr.Str(k), v) =>
      (k, geoJsonValue(v, p))
    }
    geoObjJson(parts)
  }

  private[tql] def geoObjJson(pairs: Seq[(String, Column)]): Column =
    if (pairs.isEmpty) lit("{}")
    else concat((lit("{") +: pairs.zipWithIndex.flatMap { case ((k, v), i) =>
      Seq(lit((if (i == 0) "" else ",") + graft.sinks.GoJs.jsonQuote(k) + ":"), v)
    } :+ lit("}")): _*)

  /** Properties from the trailing opt arg: a constant JSON(-ish) string
    * (brace-wrapped when bare, parse errors → empty — NewGeoPropertiesParse)
    * or a dict(); `extra` pairs (circle radius) apply unless overridden. */
  private[tql] def geoPropsJson(optArgs: List[Expr], extra: Seq[(String, Column)],
                           p: Pipe): Column = {
    val fromOpt: Seq[(String, Column)] = optArgs.headOption match {
      case Some(Expr.Str(s)) =>
        val wrapped = if (s.trim.startsWith("{")) s.trim else "{" + s + "}"
        try graft.script.Builtins.jsonParse(wrapped) match {
          case m: collection.Map[_, _] =>
            m.asInstanceOf[collection.Map[String, Any]].toSeq.map { case (k, v) =>
              k -> lit(graft.sinks.GoJs.jsonMarshal(v))
            }
          case _ => Nil
        } catch { case _: Exception => Nil }
      case Some(Expr.Call("dict", kvs)) =>
        kvs.grouped(2).toList.collect { case List(Expr.Str(k), v) =>
          (k, geoJsonValue(v, p))
        }
      case _ => Nil
    }
    geoObjJson(extra.filterNot { case (k, _) => fromOpt.exists(_._1 == k) } ++ fromOpt)
  }

  /** leaflet layer object: marker/circleMarker/circle ([lat,lon]). */
  private[tql] def geoLayerJson(kind: String, coord: Column, props: Column): Column =
    concat(lit(s"""{"type":"$kind","coordinates":"""), coord,
      lit(""","properties":"""), props, lit("}"))

  /** GeoJSON Feature (MarshalGeoJSON shape, [lon,lat]). */
  private[tql] def geoFeatureJson(geomType: String, coords: Column, props: Column): Column =
    concat(lit(s"""{"type":"Feature","geometry":{"type":"$geomType","coordinates":"""),
      coords, lit("""},"properties":"""), props, lit("}"))
}
