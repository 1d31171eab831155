package graft.script

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer
import Js._

/** Tree-walking interpreter for the SCRIPT("js") subset.
  *
  * Value model mirrors how goja exports to Go (the reference embeds goja,
  * mods/tql/fm_script.go:123-356): numbers are `java.lang.Long` when
  * integral and `java.lang.Double` otherwise, strings/booleans are the JVM
  * types, arrays are `ArrayBuffer[Any]`, objects are insertion-ordered
  * `LinkedHashMap[String, Any]`. Arithmetic on two Longs stays exact in
  * Long (goja's integer fast path); anything fractional promotes to
  * Double. Epoch-nanosecond timestamps therefore survive pass-through and
  * +/- arithmetic without float rounding.
  *
  * Determinism: `Date.now`/`new Date()` and `Math.random` resolve against
  * the host-injected clock/seed, never the wall clock, so the same script
  * over the same records yields byte-identical output on every executor.
  */
object Interp {

  /** JS `undefined` (distinct from `null`). */
  case object JsUndefined { override def toString = "undefined" }

  /** JS Date: epoch milliseconds (may hold fractional ms). */
  final case class JsDate(ms: Double)

  trait Callable { def name: String }
  /** User function: params+body closed over `env`. */
  final case class Closure(fn: FuncLit, env: Env) extends Callable {
    def name: String = fn.name.getOrElse("anonymous")
  }
  final case class Native(name: String, arity: Int, f: (Any, List[Any]) => Any)
    extends Callable

  /** A thrown JS value (string, Error object, anything). */
  final case class JsThrown(value: Any) extends RuntimeException(display(value), null, false, false)

  // control-flow signals (no stack traces — these are hot)
  final case class ReturnSig(v: Any) extends RuntimeException(null, null, false, false)
  final class BreakSig extends RuntimeException(null, null, false, false)
  final class ContinueSig extends RuntimeException(null, null, false, false)

  /** deadline interrupt — deliberately NOT a JsThrown, so script-level
    * try/catch cannot swallow it (goja interrupt semantics). */
  final case class ScriptInterrupt(msg: String) extends RuntimeException(msg)

  def errObj(name: String, message: String): mutable.LinkedHashMap[String, Any] = {
    val m = mutable.LinkedHashMap[String, Any]()
    m("name") = name
    m("message") = message
    m
  }
  def throwErr(name: String, message: String): Nothing =
    throw JsThrown(errObj(name, message))

  /** Render a JS value for display/log (JS `String(v)` semantics). */
  def display(v: Any): String = v match {
    case null => "null"
    case JsUndefined => "undefined"
    case s: String => s
    case b: java.lang.Boolean => b.toString
    case l: java.lang.Long => l.toString
    case d: java.lang.Double => numToString(d)
    case i: java.lang.Integer => i.toString
    case date: JsDate => Host.isoString(date.ms)
    case a: ArrayBuffer[_] => a.map(x => if (x == null || x == JsUndefined) "" else display(x)).mkString(",")
    case m: mutable.LinkedHashMap[_, _] =>
      val mm = m.asInstanceOf[mutable.LinkedHashMap[String, Any]]
      (mm.get("name"), mm.get("message")) match {
        case (Some(n: String), Some(msg)) if n.endsWith("Error") => s"$n: ${display(msg)}"
        case _ => "[object Object]"
      }
    case c: Callable => s"function ${c.name}() { [code] }"
    case other => String.valueOf(other)
  }

  /** JS number→string: integral doubles print without a decimal point. */
  def numToString(d: Double): String = {
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "Infinity"
    else if (d.isNegInfinity) "-Infinity"
    else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else {
      val s = d.toString
      if (s.endsWith(".0")) s.dropRight(2) else s
    }
  }

  def toNum(v: Any): Double = v match {
    case l: java.lang.Long => l.toDouble
    case d: java.lang.Double => d
    case i: java.lang.Integer => i.toDouble
    case f: java.lang.Float => f.toDouble
    case s: java.lang.Short => s.toDouble
    case b: java.lang.Boolean => if (b) 1d else 0d
    case null => 0d
    case JsUndefined => Double.NaN
    case s: String =>
      val t = s.trim
      if (t.isEmpty) 0d
      else try t.toDouble catch { case _: NumberFormatException => Double.NaN }
    case date: JsDate => date.ms
    case a: ArrayBuffer[_] if a.isEmpty => 0d
    case a: ArrayBuffer[_] if a.size == 1 => toNum(a.head)
    case _ => Double.NaN
  }

  def truthy(v: Any): Boolean = v match {
    case null | JsUndefined => false
    case b: java.lang.Boolean => b
    case l: java.lang.Long => l != 0L
    case d: java.lang.Double => !(d == 0d || d.isNaN)
    case i: java.lang.Integer => i != 0
    case s: String => s.nonEmpty
    case _ => true
  }

  /** Integral-double → Long normalization (goja export of JS numbers). */
  def exportNum(v: Any): Any = v match {
    case d: java.lang.Double
      if d == math.rint(d) && !d.isInfinite && math.abs(d) <= 9.007199254740992e15 =>
      java.lang.Long.valueOf(d.toLong)
    case other => other
  }

  def isNumber(v: Any): Boolean = v match {
    case _: java.lang.Long | _: java.lang.Double | _: java.lang.Integer |
         _: java.lang.Float | _: java.lang.Short => true
    case _ => false
  }

  def strictEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (JsUndefined, JsUndefined) => true
    case (null, _) | (_, null) | (JsUndefined, _) | (_, JsUndefined) => false
    case (x, y) if isNumber(x) && isNumber(y) => toNum(x) == toNum(y)
    case (x: String, y: String) => x == y
    case (x: java.lang.Boolean, y: java.lang.Boolean) => x == y
    case (x: AnyRef, y: AnyRef) => x eq y
  }

  def looseEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null | JsUndefined, null | JsUndefined) => true
    case (x, y) if isNumber(x) && isNumber(y) => toNum(x) == toNum(y)
    case (x: String, y) if isNumber(y) => toNum(x) == toNum(y)
    case (x, y: String) if isNumber(x) => toNum(x) == toNum(y)
    case (x: java.lang.Boolean, y) => looseEq(if (x) 1L else 0L, y)
    case (x, y: java.lang.Boolean) => looseEq(x, if (y) 1L else 0L)
    case _ => strictEq(a, b)
  }

  /** Host services a SCRIPT runs against: deterministic clock, module
    * table, and log capture. */
  trait Host extends Serializable {
    def nowNs: Long
    def log(level: String, parts: Seq[Any]): Unit =
      Console.err.println(s"[$level] ${parts.map(display).mkString(" ")}")
    /** `require(name)` modules beyond the built-ins. */
    def module(name: String): Option[Any] = None
  }

  object Host {
    private val isoFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").withZone(java.time.ZoneOffset.UTC)
    def isoString(ms: Double): String =
      isoFmt.format(java.time.Instant.ofEpochMilli(ms.toLong))
  }

  /** Lexical scope chain. Assignment to an undeclared name creates a
    * global (sloppy-mode JS, what the reference's scripts rely on). */
  final class Env(val parent: Env) {
    val vars: mutable.HashMap[String, Any] = mutable.HashMap.empty
    def global: Env = if (parent == null) this else parent.global
    def lookup(name: String): Option[Any] = {
      var e = this
      while (e != null) {
        val v = e.vars.getOrElse(name, Sentinel)
        if (!v.isInstanceOf[Sentinel.type]) return Some(v)
        e = e.parent
      }
      None
    }
    def has(name: String): Boolean = lookup(name).isDefined
    def assign(name: String, v: Any): Unit = {
      var e = this
      while (e != null) {
        if (e.vars.contains(name)) { e.vars(name) = v; return }
        e = e.parent
      }
      global.vars(name) = v
    }
    def declare(name: String, v: Any): Unit = vars(name) = v
  }
  private case object Sentinel

  type JsObj = mutable.LinkedHashMap[String, Any]
  def newObj(entries: (String, Any)*): JsObj = {
    val m = mutable.LinkedHashMap[String, Any]()
    entries.foreach { case (k, v) => m(k) = v }
    m
  }
}

import Interp._

/** One interpreter instance = one isolated global scope (per SCRIPT node,
  * or per partition in the distributed `mapScript` path). */
final class Interpreter(val host: Interp.Host) {
  /** wall-clock interrupt deadline (System.nanoTime scale) — runaway
    * scripts are cut off like goja's ctx interrupt (the reference runs
    * each SCRIPT under the task context, tql_test.go:2182-2256). NOT
    * catchable by JS try/catch. */
  @volatile var deadlineNanoTime: Long = Long.MaxValue
  /** label for the interrupt message ("SCRIPT main", "finalize", …). */
  @volatile var interruptLabel: String = "SCRIPT main"
  private var interruptCounter = 0
  @inline private def checkInterrupt(): Unit = {
    interruptCounter += 1
    if ((interruptCounter & 0x3FF) == 0 &&
      deadlineNanoTime != Long.MaxValue &&
      System.nanoTime() > deadlineNanoTime)
      throw Interp.ScriptInterrupt(s"interrupt at $interruptLabel")
  }
  val global = new Env(null)
  private var rngState: Long = host.nowNs ^ 0x5DEECE66DL
  Builtins.install(this)

  def run(src: String): Unit = exec(Js.parseProgram(src), global)

  def exec(stmts: List[Stmt], env: Env): Unit = {
    // hoist function declarations (scripts call before define)
    stmts.foreach {
      case FuncDecl(fn, _) => env.declare(fn.name.get, Closure(fn, env))
      case _ =>
    }
    stmts.foreach(s => execStmt(s, env))
  }

  def execStmt(s: Stmt, env: Env): Unit = s match {
    case ExprStmt(e, _) => eval(e, env)
    case VarDecl(_, decls, _) =>
      decls.foreach { case (name, init) =>
        env.declare(name, init.map(eval(_, env)).getOrElse(JsUndefined))
      }
    case FuncDecl(_, _) => // hoisted
    case Return(e, _) => throw ReturnSig(e.map(eval(_, env)).getOrElse(JsUndefined))
    case If(c, t, f, _) =>
      if (truthy(eval(c, env))) execStmt(t, env)
      else f.foreach(execStmt(_, env))
    case ForClassic(init, cond, update, body, _) =>
      val loopEnv = new Env(env)
      init.foreach(execStmt(_, loopEnv))
      while (cond.forall(c => truthy(eval(c, loopEnv)))) {
        checkInterrupt()
        try execStmt(body, loopEnv)
        catch {
          case _: ContinueSig =>
          case _: BreakSig => return
        }
        update.foreach(eval(_, loopEnv))
      }
    case ForInOf(kind, varName, _, objE, body, l) =>
      val obj = eval(objE, env)
      val items: Iterator[Any] = (kind, obj) match {
        case ("of", a: ArrayBuffer[_]) => a.iterator.asInstanceOf[Iterator[Any]]
        case ("of", s: String) => s.iterator.map(_.toString)
        case ("of", m: mutable.LinkedHashMap[_, _]) =>
          m.asInstanceOf[JsObj].iterator.map { case (k, v) => ArrayBuffer[Any](k, v) }
        case ("in", m: mutable.LinkedHashMap[_, _]) =>
          m.asInstanceOf[JsObj].keysIterator
        case ("in", a: ArrayBuffer[_]) => a.indices.iterator.map(_.toString)
        case (_, JsUndefined | null) =>
          throwErr("TypeError", s"cannot iterate over ${display(obj)}")
        case _ => Iterator.single(obj)
      }
      val loopEnv = new Env(env)
      loopEnv.declare(varName, JsUndefined)
      var continue = true
      val it = items
      while (continue && it.hasNext) {
        checkInterrupt()
        loopEnv.vars(varName) = it.next()
        try execStmt(body, loopEnv)
        catch {
          case _: ContinueSig =>
          case _: BreakSig => continue = false
        }
      }
    case While(c, body, _) =>
      var continue = true
      while (continue && truthy(eval(c, env))) {
        checkInterrupt()
        try execStmt(body, env)
        catch {
          case _: ContinueSig =>
          case _: BreakSig => continue = false
        }
      }
    case DoWhile(body, c, _) =>
      var continue = true
      while (continue) {
        checkInterrupt()
        try execStmt(body, env)
        catch {
          case _: ContinueSig =>
          case _: BreakSig => continue = false
        }
        if (continue) continue = truthy(eval(c, env))
      }
    case Block(stmts, _) => exec(stmts, new Env(env))
    case TryStmt(block, catchParam, catchBlock, finallyBlock, _) =>
      try exec(block, new Env(env))
      catch {
        case JsThrown(v) if catchBlock.isDefined =>
          val cenv = new Env(env)
          catchParam.foreach(p => cenv.declare(p, v))
          exec(catchBlock.get, cenv)
      } finally {
        finallyBlock.foreach(fb => exec(fb, new Env(env)))
      }
    case Throw(e, _) => throw JsThrown(eval(e, env))
    case Break(_) => throw new BreakSig
    case Continue(_) => throw new ContinueSig
    case Empty(_) =>
  }

  def eval(e: Expr, env: Env): Any = e match {
    case NumLit(v, isInt, _) =>
      if (isInt && math.abs(v) <= 9.007199254740992e15) java.lang.Long.valueOf(v.toLong)
      else java.lang.Double.valueOf(v)
    case StrLit(v, _) => v
    case TemplateLit(parts, exprs, _) =>
      val sb = new StringBuilder(parts.head)
      exprs.zip(parts.tail).foreach { case (ex, part) =>
        sb.append(display(eval(ex, env))).append(part)
      }
      sb.toString
    case BoolLit(v, _) => java.lang.Boolean.valueOf(v)
    case NullLit(_) => null
    case UndefLit(_) => JsUndefined
    case Ident(name, _) =>
      env.lookup(name).getOrElse(throwErr("ReferenceError", s"$name is not defined"))
    case ArrLit(items, _) =>
      val buf = ArrayBuffer.empty[Any]
      items.foreach {
        case Spread(inner, _) => eval(inner, env) match {
          case a: ArrayBuffer[_] => buf ++= a
          case s: String => buf ++= s.map(_.toString)
          case other => buf += other
        }
        case item => buf += eval(item, env)
      }
      buf
    case ObjLit(entries, _) =>
      val m = mutable.LinkedHashMap[String, Any]()
      entries.foreach { case (k, ve) => m(k) = eval(ve, env) }
      m
    case Member(objE, name, _) => getMember(eval(objE, env), name)
    case IndexE(objE, idxE, _) =>
      val obj = eval(objE, env)
      val idx = eval(idxE, env)
      getIndex(obj, idx)
    case Spread(_, l) => throw JsParseError("unexpected spread", l)
    case CallE(callee, args, l) => evalCall(callee, args, env, l)
    case NewE(calleeE, argEs, _) =>
      val args = spreadArgs(argEs, env)
      calleeE match {
        case Ident("Date", _) => Builtins.newDate(this, args)
        case Ident("Error", _) | Ident("TypeError", _) | Ident("RangeError", _) =>
          val nm = calleeE.asInstanceOf[Ident].name
          errObj(nm, args.headOption.map(display).getOrElse(""))
        case Ident("Array", _) => args match {
          case List(n) if isNumber(n) => ArrayBuffer.fill[Any](toNum(n).toInt)(JsUndefined)
          case _ => ArrayBuffer[Any](args: _*)
        }
        case Ident("Map", _) => mutable.LinkedHashMap[String, Any]()
        case Ident("Uint8Array", _) => args match {
          case List(a: ArrayBuffer[_]) => a.map(x => toNum(x).toByte).toArray
          case List(n) if isNumber(n) => new Array[Byte](toNum(n).toInt)
          case _ => Array.empty[Byte]
        }
        case other => eval(other, env) match {
          case c: Callable => callFunction(c, JsUndefined, args)
          case v => throwErr("TypeError", s"${display(v)} is not a constructor")
        }
      }
    case Unary(op, inner, _) => op match {
      case "!" => java.lang.Boolean.valueOf(!truthy(eval(inner, env)))
      case "-" => eval(inner, env) match {
        case l: java.lang.Long if l != Long.MinValue => java.lang.Long.valueOf(-l)
        case v => java.lang.Double.valueOf(-toNum(v))
      }
      case "+" => eval(inner, env) match {
        case l: java.lang.Long => l
        case v => java.lang.Double.valueOf(toNum(v))
      }
      case "~" => java.lang.Long.valueOf(~jsToInt32(eval(inner, env)).toLong)
      case "typeof" =>
        val v = inner match {
          case Ident(name, _) => env.lookup(name).getOrElse(JsUndefined)
          case _ => eval(inner, env)
        }
        v match {
          case JsUndefined => "undefined"
          case null => "object"
          case _: String => "string"
          case _: java.lang.Boolean => "boolean"
          case x if isNumber(x) => "number"
          case _: Callable => "function"
          case _ => "object"
        }
      case "delete" => inner match {
        case Member(objE, name, _) => eval(objE, env) match {
          case m: mutable.LinkedHashMap[_, _] =>
            java.lang.Boolean.valueOf(m.asInstanceOf[JsObj].remove(name).isDefined)
          case _ => java.lang.Boolean.TRUE
        }
        case IndexE(objE, idxE, _) =>
          val obj = eval(objE, env)
          val idx = eval(idxE, env)
          obj match {
            case m: mutable.LinkedHashMap[_, _] =>
              java.lang.Boolean.valueOf(m.asInstanceOf[JsObj].remove(display(idx)).isDefined)
            case a: ArrayBuffer[_] =>
              val i = toNum(idx).toInt
              val ab = a.asInstanceOf[ArrayBuffer[Any]]
              if (i >= 0 && i < ab.size) ab(i) = JsUndefined
              java.lang.Boolean.TRUE
            case _ => java.lang.Boolean.TRUE
          }
        case _ => java.lang.Boolean.TRUE
      }
      case "void" => eval(inner, env); JsUndefined
    }
    case Update(op, target, prefix, l) =>
      val old = toNumPreserve(evalRef(target, env))
      val delta = if (op == "++") 1L else -1L
      val nv = numAdd(old, java.lang.Long.valueOf(delta))
      assignTo(target, nv, env, l)
      if (prefix) nv else old
    case Bin(op, le, re, _) => binOp(op, eval(le, env), eval(re, env))
    case Logical(op, le, re, _) =>
      val l = eval(le, env)
      op match {
        case "&&" => if (truthy(l)) eval(re, env) else l
        case "||" => if (truthy(l)) l else eval(re, env)
        case "??" => if (l == null || l == JsUndefined) eval(re, env) else l
      }
    case Assign(op, target, valueE, l) =>
      val value =
        if (op == "=") eval(valueE, env)
        else binOp(op.dropRight(1), evalRef(target, env), eval(valueE, env))
      assignTo(target, value, env, l)
      value
    case Cond(c, t, f, _) =>
      if (truthy(eval(c, env))) eval(t, env) else eval(f, env)
    case fn: FuncLit => Closure(fn, env)
  }

  private def toNumPreserve(v: Any): Any = v match {
    case l: java.lang.Long => l
    case d: java.lang.Double => d
    case other => java.lang.Double.valueOf(toNum(other))
  }

  private def evalRef(target: Expr, env: Env): Any = target match {
    case Ident(name, _) => env.lookup(name).getOrElse(JsUndefined)
    case _ => eval(target, env)
  }

  private def assignTo(target: Expr, value: Any, env: Env, line: Int): Unit = target match {
    case Ident(name, _) => env.assign(name, value)
    case Member(objE, name, _) => eval(objE, env) match {
      case m: mutable.LinkedHashMap[_, _] => m.asInstanceOf[JsObj](name) = value
      case a: ArrayBuffer[_] if name == "length" =>
        val ab = a.asInstanceOf[ArrayBuffer[Any]]
        val n = toNum(value).toInt
        if (n < ab.size) ab.remove(n, ab.size - n)
        else while (ab.size < n) ab += JsUndefined
      case JsUndefined | null =>
        throwErr("TypeError", s"Cannot set property '$name' of ${display(JsUndefined)}")
      case _ => // ignore sets on primitives (JS sloppy mode)
    }
    case IndexE(objE, idxE, _) =>
      val obj = eval(objE, env)
      val idx = eval(idxE, env)
      obj match {
        case a: ArrayBuffer[_] =>
          val ab = a.asInstanceOf[ArrayBuffer[Any]]
          val i = toNum(idx).toInt
          while (ab.size <= i) ab += JsUndefined
          ab(i) = value
        case m: mutable.LinkedHashMap[_, _] =>
          m.asInstanceOf[JsObj](display(idx)) = value
        case JsUndefined | null =>
          throwErr("TypeError", s"Cannot set property of ${display(obj)}")
        case _ =>
      }
    case _ => throw JsParseError("invalid assignment target", line)
  }

  def jsToInt32(v: Any): Int = {
    val d = toNum(v)
    if (d.isNaN || d.isInfinite) 0 else d.toLong.toInt
  }

  private def numAdd(a: Any, b: Any): Any = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) =>
      try java.lang.Long.valueOf(Math.addExact(x, y))
      catch { case _: ArithmeticException => java.lang.Double.valueOf(x.toDouble + y.toDouble) }
    case _ => java.lang.Double.valueOf(toNum(a) + toNum(b))
  }

  def binOp(op: String, l: Any, r: Any): Any = op match {
    case "+" =>
      if (l.isInstanceOf[String] || r.isInstanceOf[String]) display(l) + display(r)
      else if (l.isInstanceOf[ArrayBuffer[_]] || r.isInstanceOf[ArrayBuffer[_]] ||
               l.isInstanceOf[mutable.LinkedHashMap[_, _]] || r.isInstanceOf[mutable.LinkedHashMap[_, _]])
        display(l) + display(r)
      else numAdd(l, r)
    case "-" => (l, r) match {
      case (x: java.lang.Long, y: java.lang.Long) =>
        try java.lang.Long.valueOf(Math.subtractExact(x, y))
        catch { case _: ArithmeticException => java.lang.Double.valueOf(x.toDouble - y.toDouble) }
      case _ => java.lang.Double.valueOf(toNum(l) - toNum(r))
    }
    case "*" => (l, r) match {
      case (x: java.lang.Long, y: java.lang.Long) =>
        try java.lang.Long.valueOf(Math.multiplyExact(x, y))
        catch { case _: ArithmeticException => java.lang.Double.valueOf(x.toDouble * y.toDouble) }
      case _ => java.lang.Double.valueOf(toNum(l) * toNum(r))
    }
    case "/" => java.lang.Double.valueOf(toNum(l) / toNum(r))
    case "%" => (l, r) match {
      case (x: java.lang.Long, y: java.lang.Long) if y != 0L => java.lang.Long.valueOf(x % y)
      case _ => java.lang.Double.valueOf(toNum(l) % toNum(r))
    }
    case "**" => java.lang.Double.valueOf(math.pow(toNum(l), toNum(r)))
    case "==" => java.lang.Boolean.valueOf(looseEq(l, r))
    case "!=" => java.lang.Boolean.valueOf(!looseEq(l, r))
    case "===" => java.lang.Boolean.valueOf(strictEq(l, r))
    case "!==" => java.lang.Boolean.valueOf(!strictEq(l, r))
    case "<" | ">" | "<=" | ">=" =>
      val res = (l, r) match {
        case (x: String, y: String) => op match {
          case "<" => x < y; case ">" => x > y; case "<=" => x <= y; case _ => x >= y
        }
        case _ =>
          val (x, y) = (toNum(l), toNum(r))
          op match {
            case "<" => x < y; case ">" => x > y; case "<=" => x <= y; case _ => x >= y
          }
      }
      java.lang.Boolean.valueOf(res)
    case "&" => java.lang.Long.valueOf((jsToInt32(l) & jsToInt32(r)).toLong)
    case "|" => java.lang.Long.valueOf((jsToInt32(l) | jsToInt32(r)).toLong)
    case "^" => java.lang.Long.valueOf((jsToInt32(l) ^ jsToInt32(r)).toLong)
    case "<<" => java.lang.Long.valueOf((jsToInt32(l) << (jsToInt32(r) & 31)).toLong)
    case ">>" => java.lang.Long.valueOf((jsToInt32(l) >> (jsToInt32(r) & 31)).toLong)
    case ">>>" => java.lang.Long.valueOf(((jsToInt32(l) >>> (jsToInt32(r) & 31)).toLong) & 0xFFFFFFFFL)
    case "instanceof" => (l, r) match {
      // `x instanceof Error` — the $.db() fixtures branch on it
      case (m: mutable.LinkedHashMap[_, _], c: Native)
        if c.name.endsWith("Error") =>
        java.lang.Boolean.valueOf(m.asInstanceOf[JsObj].get("name").exists {
          case s: String => s.endsWith("Error"); case _ => false
        })
      case _ => java.lang.Boolean.FALSE
    }
    case "in" => r match {
      case m: mutable.LinkedHashMap[_, _] =>
        java.lang.Boolean.valueOf(m.asInstanceOf[JsObj].contains(display(l)))
      case a: ArrayBuffer[_] =>
        val i = toNum(l).toInt
        java.lang.Boolean.valueOf(i >= 0 && i < a.size)
      case _ => java.lang.Boolean.FALSE
    }
    case other => throw new IllegalStateException(s"unknown operator $other")
  }

  private def spreadArgs(argEs: List[Expr], env: Env): List[Any] = {
    val out = ArrayBuffer.empty[Any]
    argEs.foreach {
      case Spread(inner, _) => eval(inner, env) match {
        case a: ArrayBuffer[_] => out ++= a
        case s: String => out ++= s.map(_.toString)
        case other => out += other
      }
      case a => out += eval(a, env)
    }
    out.toList
  }

  private def evalCall(calleeE: Expr, argEs: List[Expr], env: Env, line: Int): Any = {
    val args = spreadArgs(argEs, env)
    calleeE match {
      case Member(objE, name, _) =>
        val obj = eval(objE, env)
        val fn = getMember(obj, name)
        fn match {
          case c: Callable => callFunction(c, obj, args)
          case JsUndefined => obj match {
            case _: mutable.LinkedHashMap[_, _] =>
              // goja's exact wording, asserted by the reference's
              // js-exception test (fm_script_test.go:611-638)
              throwErr("TypeError", s"Object has no member '$name'")
            case _ =>
              throwErr("TypeError", s"${display(obj)}.$name is not a function")
          }
          case other =>
            throwErr("TypeError", s"$name is not a function (got ${display(other)})")
        }
      case IndexE(objE, idxE, _) =>
        val obj = eval(objE, env)
        val fn = getIndex(obj, eval(idxE, env))
        fn match {
          case c: Callable => callFunction(c, obj, args)
          case _ => throwErr("TypeError", "value is not a function")
        }
      case _ =>
        eval(calleeE, env) match {
          case c: Callable => callFunction(c, JsUndefined, args)
          case v => throwErr("TypeError", s"${display(v)} is not a function")
        }
    }
  }

  def callFunction(c: Callable, thisV: Any, args: List[Any]): Any = c match {
    case Native(_, _, f) => f(thisV, args)
    case Closure(fn, closedEnv) =>
      // runaway RECURSION must be interruptible too, not just loops —
      // goja's interrupt fires on any statement (tql_test.go interrupt
      // battery drives both shapes)
      checkInterrupt()
      val fenv = new Env(closedEnv)
      if (!fn.isArrow) fenv.declare("this", thisV)
      fn.params.zipWithIndex.foreach { case (p, i) =>
        fenv.declare(p, if (i < args.length) args(i) else JsUndefined)
      }
      fn.rest.foreach { r =>
        fenv.declare(r, ArrayBuffer[Any](args.drop(fn.params.length): _*))
      }
      fn.name.foreach(n => if (!fenv.vars.contains(n)) fenv.declare(n, c))
      fn.exprBody match {
        case Some(e) => eval(e, fenv)
        case None =>
          try { exec(fn.body, fenv); JsUndefined }
          catch { case ReturnSig(v) => v }
      }
  }

  def getIndex(obj: Any, idx: Any): Any = obj match {
    case a: ArrayBuffer[_] =>
      if (isNumber(idx)) {
        val i = toNum(idx).toInt
        if (i >= 0 && i < a.size) a(i) else JsUndefined
      } else getMember(obj, display(idx))
    case s: String =>
      if (isNumber(idx)) {
        val i = toNum(idx).toInt
        if (i >= 0 && i < s.length) s.charAt(i).toString else JsUndefined
      } else getMember(obj, display(idx))
    case m: mutable.LinkedHashMap[_, _] =>
      m.asInstanceOf[JsObj].getOrElse(display(idx), JsUndefined)
    case JsUndefined | null =>
      throwErr("TypeError", s"Cannot read property '${display(idx)}' of ${display(obj)}")
    case _ => getMember(obj, display(idx))
  }

  def getMember(obj: Any, name: String): Any = obj match {
    case m: mutable.LinkedHashMap[_, _] =>
      m.asInstanceOf[JsObj].getOrElse(name, JsUndefined)
    case a: ArrayBuffer[_] =>
      if (name == "length") java.lang.Long.valueOf(a.size.toLong)
      else Builtins.arrayMethod(this, name)
    case s: String =>
      if (name == "length") java.lang.Long.valueOf(s.length.toLong)
      else Builtins.stringMethod(this, name)
    case d: JsDate => Builtins.dateMethod(this, name)
    case n if isNumber(n) => Builtins.numberMethod(this, name)
    case JsUndefined | null =>
      throwErr("TypeError", s"Cannot read property '$name' of ${display(obj)}")
    case c: Callable => name match {
      // constructor statics (Number.isInteger, Number.MAX_SAFE_INTEGER, …)
      // live on a companion "<Name>Statics" object
      case _ if global.lookup(c.name + "Statics").exists {
        case m: mutable.LinkedHashMap[_, _] =>
          m.asInstanceOf[JsObj].contains(name)
        case _ => false
      } =>
        global.lookup(c.name + "Statics").get
          .asInstanceOf[JsObj](name)
      case "call" => Native("call", 1, (_, args) =>
        callFunction(c, args.headOption.getOrElse(JsUndefined), args.drop(1)))
      case "apply" => Native("apply", 2, (_, args) => {
        val argList = args.drop(1).headOption match {
          case Some(a: ArrayBuffer[_]) => a.toList.asInstanceOf[List[Any]]
          case _ => Nil
        }
        callFunction(c, args.headOption.getOrElse(JsUndefined), argList)
      })
      case "name" => c.name
      case _ => JsUndefined
    }
    case _ => JsUndefined
  }

  /** Deterministic xorshift64* PRNG for Math.random. */
  def nextRandom(): Double = {
    var x = rngState
    x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
    rngState = x
    val bits = (x * 0x2545F4914F6CDD1DL) >>> 11
    bits.toDouble / (1L << 53).toDouble
  }
}
