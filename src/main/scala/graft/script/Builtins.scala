package graft.script

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer
import Interp._

/** Standard-library surface for the SCRIPT("js") interpreter: console,
  * Math, JSON, Date, Object/Array statics, string/array/number prototype
  * methods, `require` modules `@jsh/system` (fm_script.go's system module:
  * free_os_memory/gc/now) and `mathx` (fft — mods/nums/fft.go semantics
  * via graft.operators.FftOp).
  */
object Builtins {

  def install(interp: Interpreter): Unit = {
    val g = interp.global
    val host = interp.host

    def native(name: String)(f: (Any, List[Any]) => Any): Native = Native(name, -1, f)

    // ---- console ----
    val console = newObj()
    def logFn(level: String) = native(level.toLowerCase) { (_, args) =>
      host.log(level, args); JsUndefined
    }
    console("log") = logFn("INFO")
    console("println") = logFn("INFO")
    console("info") = logFn("INFO")
    console("debug") = logFn("DEBUG")
    console("warn") = logFn("WARN")
    console("error") = logFn("ERROR")
    g.declare("console", console)

    // ---- numeric globals ----
    g.declare("NaN", java.lang.Double.valueOf(Double.NaN))
    g.declare("Infinity", java.lang.Double.valueOf(Double.PositiveInfinity))
    g.declare("undefined", JsUndefined)
    g.declare("globalThis", newObj())

    g.declare("parseInt", native("parseInt") { (_, args) =>
      val s = display(args.headOption.getOrElse(JsUndefined)).trim
      val radix = args.drop(1).headOption.map(a => toNum(a).toInt).filter(_ != 0).getOrElse(10)
      val neg = s.startsWith("-")
      val body0 = if (neg || s.startsWith("+")) s.substring(1) else s
      val body =
        if (radix == 16 && (body0.startsWith("0x") || body0.startsWith("0X"))) body0.substring(2)
        else body0
      val digits = body.takeWhile(c => Character.digit(c, radix) >= 0)
      if (digits.isEmpty) java.lang.Double.valueOf(Double.NaN)
      else {
        try {
          val v = java.lang.Long.parseLong(digits, radix)
          java.lang.Long.valueOf(if (neg) -v else v)
        } catch { case _: NumberFormatException =>
          val v = digits.foldLeft(0d)((acc, c) => acc * radix + Character.digit(c, radix))
          java.lang.Double.valueOf(if (neg) -v else v)
        }
      }
    })
    g.declare("parseFloat", native("parseFloat") { (_, args) =>
      val s = display(args.headOption.getOrElse(JsUndefined)).trim
      val m = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?".r.findFirstIn(s)
      m.map(x => java.lang.Double.valueOf(x.toDouble))
        .getOrElse(java.lang.Double.valueOf(Double.NaN))
    })
    g.declare("isNaN", native("isNaN") { (_, args) =>
      java.lang.Boolean.valueOf(toNum(args.headOption.getOrElse(JsUndefined)).isNaN)
    })
    g.declare("isFinite", native("isFinite") { (_, args) =>
      val d = toNum(args.headOption.getOrElse(JsUndefined))
      java.lang.Boolean.valueOf(!d.isNaN && !d.isInfinite)
    })

    // ---- Math ----
    val mathObj = newObj()
    mathObj("PI") = java.lang.Double.valueOf(math.Pi)
    mathObj("E") = java.lang.Double.valueOf(math.E)
    def math1(name: String)(f: Double => Double): Unit =
      mathObj(name) = native(name) { (_, args) =>
        java.lang.Double.valueOf(f(toNum(args.headOption.getOrElse(JsUndefined))))
      }
    math1("abs")(math.abs); math1("floor")(math.floor); math1("ceil")(math.ceil)
    math1("round")(d => math.floor(d + 0.5)); math1("trunc")(d => d.toLong.toDouble)
    math1("sqrt")(math.sqrt); math1("cbrt")(math.cbrt)
    math1("sin")(math.sin); math1("cos")(math.cos); math1("tan")(math.tan)
    math1("asin")(math.asin); math1("acos")(math.acos); math1("atan")(math.atan)
    math1("log")(math.log); math1("log10")(math.log10)
    math1("log2")(d => math.log(d) / math.log(2)); math1("exp")(math.exp)
    math1("sign")(math.signum)
    mathObj("pow") = native("pow") { (_, args) =>
      java.lang.Double.valueOf(math.pow(toNum(args.head), toNum(args(1))))
    }
    mathObj("atan2") = native("atan2") { (_, args) =>
      java.lang.Double.valueOf(math.atan2(toNum(args.head), toNum(args(1))))
    }
    mathObj("hypot") = native("hypot") { (_, args) =>
      java.lang.Double.valueOf(math.hypot(toNum(args.head), toNum(args(1))))
    }
    mathObj("min") = native("min") { (_, args) =>
      if (args.isEmpty) java.lang.Double.valueOf(Double.PositiveInfinity)
      else exportNum(java.lang.Double.valueOf(args.map(toNum).min))
    }
    mathObj("max") = native("max") { (_, args) =>
      if (args.isEmpty) java.lang.Double.valueOf(Double.NegativeInfinity)
      else exportNum(java.lang.Double.valueOf(args.map(toNum).max))
    }
    mathObj("random") = native("random") { (_, _) =>
      java.lang.Double.valueOf(interp.nextRandom())
    }
    g.declare("Math", mathObj)

    // ---- JSON ----
    val jsonObj = newObj()
    jsonObj("stringify") = native("stringify") { (_, args) =>
      jsonStringify(args.headOption.getOrElse(JsUndefined))
    }
    jsonObj("parse") = native("parse") { (_, args) =>
      jsonParse(display(args.headOption.getOrElse(JsUndefined)))
    }
    g.declare("JSON", jsonObj)

    // ---- Date (as a callable static object; `new Date` handled in Interp) ----
    val dateObj = newObj()
    dateObj("now") = native("now") { (_, _) => java.lang.Long.valueOf(host.nowNs / 1000000L) }
    dateObj("parse") = native("parse") { (_, args) =>
      exportNum(java.lang.Double.valueOf(parseDateString(display(args.head))))
    }
    dateObj("UTC") = native("UTC") { (_, args) =>
      val c = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
      c.clear()
      val a = args.map(x => toNum(x).toInt).padTo(7, 0)
      c.set(a(0), a(1), if (args.length > 2) a(2) else 1, a(3), a(4), a(5))
      java.lang.Long.valueOf(c.getTimeInMillis + a(6))
    }
    g.declare("Date", dateObj)

    // ---- Object / Array statics ----
    val objectObj = newObj()
    objectObj("keys") = native("keys") { (_, args) =>
      args.headOption match {
        case Some(m: mutable.LinkedHashMap[_, _]) =>
          ArrayBuffer[Any](m.asInstanceOf[JsObj].keys.toSeq: _*)
        case Some(a: ArrayBuffer[_]) => ArrayBuffer[Any](a.indices.map(_.toString): _*)
        case _ => ArrayBuffer.empty[Any]
      }
    }
    objectObj("values") = native("values") { (_, args) =>
      args.headOption match {
        case Some(m: mutable.LinkedHashMap[_, _]) =>
          ArrayBuffer[Any](m.asInstanceOf[JsObj].values.toSeq: _*)
        case Some(a: ArrayBuffer[_]) => a.asInstanceOf[ArrayBuffer[Any]].clone()
        case _ => ArrayBuffer.empty[Any]
      }
    }
    objectObj("entries") = native("entries") { (_, args) =>
      args.headOption match {
        case Some(m: mutable.LinkedHashMap[_, _]) =>
          ArrayBuffer[Any](m.asInstanceOf[JsObj].toSeq.map {
            case (k, v) => ArrayBuffer[Any](k, v)
          }: _*)
        case _ => ArrayBuffer.empty[Any]
      }
    }
    objectObj("assign") = native("assign") { (_, args) =>
      args.headOption match {
        case Some(dst: mutable.LinkedHashMap[_, _]) =>
          val d = dst.asInstanceOf[JsObj]
          args.drop(1).foreach {
            case src: mutable.LinkedHashMap[_, _] =>
              src.asInstanceOf[JsObj].foreach { case (k, v) => d(k) = v }
            case _ =>
          }
          d
        case other => other.getOrElse(JsUndefined)
      }
    }
    g.declare("Object", objectObj)

    val arrayObj = newObj()
    arrayObj("isArray") = native("isArray") { (_, args) =>
      java.lang.Boolean.valueOf(args.headOption.exists(_.isInstanceOf[ArrayBuffer[_]]))
    }
    arrayObj("from") = native("from") { (_, args) =>
      args.headOption match {
        case Some(a: ArrayBuffer[_]) => a.asInstanceOf[ArrayBuffer[Any]].clone()
        case Some(s: String) => ArrayBuffer[Any](s.map(_.toString): _*)
        case _ => ArrayBuffer.empty[Any]
      }
    }
    g.declare("Array", arrayObj)

    // ---- String/Number/Boolean conversion functions ----
    g.declare("String", native("String") { (_, args) =>
      display(args.headOption.getOrElse(""))
    })
    val numberFn = newObj()
    numberFn("isInteger") = native("isInteger") { (_, args) =>
      java.lang.Boolean.valueOf(args.headOption.exists {
        case _: java.lang.Long => true
        case d: java.lang.Double => d == math.rint(d) && !d.isInfinite
        case _ => false
      })
    }
    numberFn("MAX_SAFE_INTEGER") = java.lang.Long.valueOf(9007199254740991L)
    numberFn("MIN_SAFE_INTEGER") = java.lang.Long.valueOf(-9007199254740991L)
    numberFn("parseFloat") = g.lookup("parseFloat").get
    numberFn("parseInt") = g.lookup("parseInt").get
    // Number(x) must stay callable AND carry statics: Native with members is
    // not modeled, so expose call-form via a wrapper object convention:
    g.declare("Number", native("Number") { (_, args) =>
      exportNum(java.lang.Double.valueOf(toNum(args.headOption.getOrElse(0L))))
    })
    g.declare("NumberStatics", numberFn)
    g.declare("Boolean", native("Boolean") { (_, args) =>
      java.lang.Boolean.valueOf(truthy(args.headOption.getOrElse(JsUndefined)))
    })

    g.declare("encodeURIComponent", native("encodeURIComponent") { (_, args) =>
      java.net.URLEncoder.encode(display(args.head), "UTF-8").replace("+", "%20")
    })
    g.declare("decodeURIComponent", native("decodeURIComponent") { (_, args) =>
      java.net.URLDecoder.decode(display(args.head), "UTF-8")
    })

    // ---- Error constructors (also the instanceof markers) ----
    Seq("Error", "TypeError", "RangeError", "SyntaxError").foreach { nm =>
      g.declare(nm, Native(nm, 1, (_, args) =>
        errObj(nm, args.headOption.map(display).getOrElse(""))))
    }

    // ---- require ----
    g.declare("require", native("require") { (_, args) =>
      val name = display(args.headOption.getOrElse(JsUndefined))
      builtinModule(interp, name)
        .orElse(host.module(name))
        .getOrElse(throwErr("Error", s"Invalid module, SCRIPT $name"))
    })
  }

  /** `new Date(...)` forms. */
  def newDate(interp: Interpreter, args: List[Any]): JsDate = args match {
    case Nil => JsDate((interp.host.nowNs / 1000000L).toDouble)
    case List(one) => one match {
      case s: String => JsDate(parseDateString(s))
      case d: JsDate => d
      case n => JsDate(toNum(n))
    }
    case _ =>
      val a = args.map(x => toNum(x).toInt).padTo(7, 0)
      val c = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
      c.clear()
      c.set(a(0), a(1), if (args.length > 2) a(2) else 1, a(3), a(4), a(5))
      JsDate((c.getTimeInMillis + a(6)).toDouble)
  }

  private[script] def parseDateString(s: String): Double = {
    val t = s.trim
    try java.time.Instant.parse(t).toEpochMilli.toDouble
    catch { case _: Exception =>
      try java.time.OffsetDateTime.parse(t).toInstant.toEpochMilli.toDouble
      catch { case _: Exception =>
        // zone-less datetime: UTC (the session's pinned zone)
        try java.time.LocalDateTime.parse(t).toInstant(java.time.ZoneOffset.UTC)
          .toEpochMilli.toDouble
        catch { case _: Exception =>
          try java.time.LocalDate.parse(t).atStartOfDay(java.time.ZoneOffset.UTC)
            .toInstant.toEpochMilli.toDouble
          catch { case _: Exception => Double.NaN }
        }
      }
    }
  }

  // -------------------------------------------------------------------
  // prototype methods (created per access — cheap value objects)
  // -------------------------------------------------------------------
  def arrayMethod(interp: Interpreter, name: String): Any = {
    def self(thisV: Any): ArrayBuffer[Any] = thisV.asInstanceOf[ArrayBuffer[Any]]
    def call1(f: Callable, v: Any, i: Int): Any =
      interp.callFunction(f, JsUndefined, List(v, java.lang.Long.valueOf(i.toLong)))
    name match {
      case "push" => Native("push", -1, (t, args) => {
        self(t) ++= args; java.lang.Long.valueOf(self(t).size.toLong)
      })
      case "pop" => Native("pop", 0, (t, _) => {
        val a = self(t); if (a.isEmpty) JsUndefined else a.remove(a.size - 1)
      })
      case "shift" => Native("shift", 0, (t, _) => {
        val a = self(t); if (a.isEmpty) JsUndefined else a.remove(0)
      })
      case "unshift" => Native("unshift", -1, (t, args) => {
        self(t).prependAll(args); java.lang.Long.valueOf(self(t).size.toLong)
      })
      case "slice" => Native("slice", 2, (t, args) => {
        val a = self(t)
        val n = a.size
        def idx(v: Option[Any], dflt: Int): Int = v match {
          case Some(x) if x != JsUndefined =>
            val i = toNum(x).toInt
            if (i < 0) math.max(0, n + i) else math.min(i, n)
          case _ => dflt
        }
        val from = idx(args.headOption, 0)
        val until = idx(args.drop(1).headOption, n)
        ArrayBuffer[Any](a.slice(from, math.max(from, until)).toSeq: _*)
      })
      case "splice" => Native("splice", -1, (t, args) => {
        val a = self(t)
        val start0 = toNum(args.headOption.getOrElse(0L)).toInt
        val start = if (start0 < 0) math.max(0, a.size + start0) else math.min(start0, a.size)
        val count = args.drop(1).headOption.map(x => toNum(x).toInt)
          .getOrElse(a.size - start).max(0).min(a.size - start)
        val removed = ArrayBuffer[Any](a.slice(start, start + count).toSeq: _*)
        a.remove(start, count)
        a.insertAll(start, args.drop(2))
        removed
      })
      case "concat" => Native("concat", -1, (t, args) => {
        val out = self(t).clone()
        args.foreach {
          case a: ArrayBuffer[_] => out ++= a
          case v => out += v
        }
        out
      })
      case "join" => Native("join", 1, (t, args) => {
        val sep = args.headOption.filter(_ != JsUndefined).map(display).getOrElse(",")
        self(t).map(x => if (x == null || x == JsUndefined) "" else display(x)).mkString(sep)
      })
      case "indexOf" => Native("indexOf", 1, (t, args) => {
        java.lang.Long.valueOf(self(t).indexWhere(strictEq(_, args.headOption.getOrElse(JsUndefined))).toLong)
      })
      case "includes" => Native("includes", 1, (t, args) => {
        java.lang.Boolean.valueOf(self(t).exists(strictEq(_, args.headOption.getOrElse(JsUndefined))))
      })
      case "map" => Native("map", 1, (t, args) => {
        val f = args.head.asInstanceOf[Callable]
        val out = ArrayBuffer.empty[Any]
        self(t).zipWithIndex.foreach { case (v, i) => out += call1(f, v, i) }
        out
      })
      case "forEach" => Native("forEach", 1, (t, args) => {
        val f = args.head.asInstanceOf[Callable]
        self(t).zipWithIndex.foreach { case (v, i) => call1(f, v, i) }
        JsUndefined
      })
      case "filter" => Native("filter", 1, (t, args) => {
        val f = args.head.asInstanceOf[Callable]
        val out = ArrayBuffer.empty[Any]
        self(t).zipWithIndex.foreach { case (v, i) => if (truthy(call1(f, v, i))) out += v }
        out
      })
      case "reduce" => Native("reduce", 2, (t, args) => {
        val f = args.head.asInstanceOf[Callable]
        val a = self(t)
        var acc: Any = null
        var start = 0
        if (args.length > 1) acc = args(1)
        else {
          if (a.isEmpty) throwErr("TypeError", "Reduce of empty array with no initial value")
          acc = a.head; start = 1
        }
        var i = start
        while (i < a.size) {
          acc = interp.callFunction(f, JsUndefined,
            List(acc, a(i), java.lang.Long.valueOf(i.toLong)))
          i += 1
        }
        acc
      })
      case "find" => Native("find", 1, (t, args) => {
        val f = args.head.asInstanceOf[Callable]
        self(t).zipWithIndex.collectFirst {
          case (v, i) if truthy(call1(f, v, i)) => v
        }.getOrElse(JsUndefined)
      })
      case "findIndex" => Native("findIndex", 1, (t, args) => {
        val f = args.head.asInstanceOf[Callable]
        java.lang.Long.valueOf(self(t).zipWithIndex.collectFirst {
          case (v, i) if truthy(call1(f, v, i)) => i.toLong
        }.getOrElse(-1L))
      })
      case "some" => Native("some", 1, (t, args) => {
        val f = args.head.asInstanceOf[Callable]
        java.lang.Boolean.valueOf(self(t).zipWithIndex.exists { case (v, i) => truthy(call1(f, v, i)) })
      })
      case "every" => Native("every", 1, (t, args) => {
        val f = args.head.asInstanceOf[Callable]
        java.lang.Boolean.valueOf(self(t).zipWithIndex.forall { case (v, i) => truthy(call1(f, v, i)) })
      })
      case "reverse" => Native("reverse", 0, (t, _) => {
        val a = self(t)
        val r = a.reverse
        a.clear(); a ++= r; a
      })
      case "sort" => Native("sort", 1, (t, args) => {
        val a = self(t)
        val sorted = args.headOption match {
          case Some(f: Callable) =>
            a.sortWith((x, y) =>
              toNum(interp.callFunction(f, JsUndefined, List(x, y))) < 0)
          case _ => a.sortBy(display)
        }
        a.clear(); a ++= sorted; a
      })
      case "fill" => Native("fill", 1, (t, args) => {
        val a = self(t)
        val v = args.headOption.getOrElse(JsUndefined)
        a.indices.foreach(i => a(i) = v)
        a
      })
      case "flat" => Native("flat", 0, (t, _) => {
        val out = ArrayBuffer.empty[Any]
        self(t).foreach {
          case inner: ArrayBuffer[_] => out ++= inner
          case v => out += v
        }
        out
      })
      case "toString" => Native("toString", 0, (t, _) => display(t))
      case _ => JsUndefined
    }
  }

  def stringMethod(interp: Interpreter, name: String): Any = {
    def self(thisV: Any): String = display(thisV)
    name match {
      case "split" => Native("split", 2, (t, args) => {
        val s = self(t)
        args.headOption match {
          case None | Some(JsUndefined) => ArrayBuffer[Any](s)
          case Some(sep0) =>
            val sep = display(sep0)
            val parts =
              if (sep.isEmpty) s.map(_.toString)
              else {
                // JS split keeps trailing empty strings (unlike Java's)
                val out = ArrayBuffer.empty[String]
                var from = 0
                var idx = s.indexOf(sep, from)
                while (idx >= 0) {
                  out += s.substring(from, idx)
                  from = idx + sep.length
                  idx = s.indexOf(sep, from)
                }
                out += s.substring(from)
                out.toSeq
              }
            val limited = args.drop(1).headOption.filter(_ != JsUndefined) match {
              case Some(n) => parts.take(toNum(n).toInt)
              case None => parts
            }
            ArrayBuffer[Any](limited: _*)
        }
      })
      case "charAt" => Native("charAt", 1, (t, args) => {
        val s = self(t); val i = toNum(args.headOption.getOrElse(0L)).toInt
        if (i >= 0 && i < s.length) s.charAt(i).toString else ""
      })
      case "charCodeAt" => Native("charCodeAt", 1, (t, args) => {
        val s = self(t); val i = toNum(args.headOption.getOrElse(0L)).toInt
        if (i >= 0 && i < s.length) java.lang.Long.valueOf(s.charAt(i).toLong)
        else java.lang.Double.valueOf(Double.NaN)
      })
      case "indexOf" => Native("indexOf", 1, (t, args) =>
        java.lang.Long.valueOf(self(t).indexOf(display(args.headOption.getOrElse(JsUndefined))).toLong))
      case "lastIndexOf" => Native("lastIndexOf", 1, (t, args) =>
        java.lang.Long.valueOf(self(t).lastIndexOf(display(args.headOption.getOrElse(JsUndefined))).toLong))
      case "includes" => Native("includes", 1, (t, args) =>
        java.lang.Boolean.valueOf(self(t).contains(display(args.headOption.getOrElse(JsUndefined)))))
      case "startsWith" => Native("startsWith", 1, (t, args) =>
        java.lang.Boolean.valueOf(self(t).startsWith(display(args.headOption.getOrElse(JsUndefined)))))
      case "endsWith" => Native("endsWith", 1, (t, args) =>
        java.lang.Boolean.valueOf(self(t).endsWith(display(args.headOption.getOrElse(JsUndefined)))))
      case "slice" => Native("slice", 2, (t, args) => {
        val s = self(t); val n = s.length
        def idx(v: Option[Any], dflt: Int): Int = v match {
          case Some(x) if x != JsUndefined =>
            val i = toNum(x).toInt
            if (i < 0) math.max(0, n + i) else math.min(i, n)
          case _ => dflt
        }
        val from = idx(args.headOption, 0)
        val until = idx(args.drop(1).headOption, n)
        if (until <= from) "" else s.substring(from, until)
      })
      case "substring" => Native("substring", 2, (t, args) => {
        val s = self(t); val n = s.length
        def idx(v: Option[Any], dflt: Int): Int = v match {
          case Some(x) if x != JsUndefined => math.min(math.max(0, toNum(x).toInt), n)
          case _ => dflt
        }
        val a = idx(args.headOption, 0)
        val b = idx(args.drop(1).headOption, n)
        s.substring(math.min(a, b), math.max(a, b))
      })
      case "substr" => Native("substr", 2, (t, args) => {
        val s = self(t)
        val from0 = toNum(args.headOption.getOrElse(0L)).toInt
        val from = if (from0 < 0) math.max(0, s.length + from0) else math.min(from0, s.length)
        val len = args.drop(1).headOption.map(x => toNum(x).toInt).getOrElse(s.length - from)
        s.substring(from, math.min(s.length, from + math.max(0, len)))
      })
      case "toUpperCase" => Native("toUpperCase", 0, (t, _) => self(t).toUpperCase)
      case "toLowerCase" => Native("toLowerCase", 0, (t, _) => self(t).toLowerCase)
      case "trim" => Native("trim", 0, (t, _) => self(t).trim)
      case "replace" => Native("replace", 2, (t, args) => {
        val s = self(t)
        val target = display(args.head)
        val repl = display(args(1))
        val i = s.indexOf(target)
        if (i < 0) s else s.substring(0, i) + repl + s.substring(i + target.length)
      })
      case "replaceAll" => Native("replaceAll", 2, (t, args) =>
        self(t).replace(display(args.head), display(args(1))))
      case "repeat" => Native("repeat", 1, (t, args) =>
        self(t) * toNum(args.headOption.getOrElse(0L)).toInt)
      case "padStart" => Native("padStart", 2, (t, args) => {
        val s = self(t)
        val len = toNum(args.head).toInt
        val pad = args.drop(1).headOption.filter(_ != JsUndefined).map(display).getOrElse(" ")
        if (s.length >= len || pad.isEmpty) s
        else {
          val sb = new StringBuilder
          while (sb.length < len - s.length) sb.append(pad)
          sb.substring(0, len - s.length) + s
        }
      })
      case "padEnd" => Native("padEnd", 2, (t, args) => {
        val s = self(t)
        val len = toNum(args.head).toInt
        val pad = args.drop(1).headOption.filter(_ != JsUndefined).map(display).getOrElse(" ")
        if (s.length >= len || pad.isEmpty) s
        else {
          val sb = new StringBuilder(s)
          while (sb.length < len) sb.append(pad)
          sb.substring(0, len)
        }
      })
      case "concat" => Native("concat", -1, (t, args) => self(t) + args.map(display).mkString)
      case "toString" => Native("toString", 0, (t, _) => self(t))
      case _ => JsUndefined
    }
  }

  def dateMethod(interp: Interpreter, name: String): Any = {
    def ms(t: Any): Double = t.asInstanceOf[JsDate].ms
    def utc(t: Any): java.time.ZonedDateTime =
      java.time.Instant.ofEpochMilli(ms(t).toLong).atZone(java.time.ZoneOffset.UTC)
    name match {
      case "toISOString" => Native("toISOString", 0, (t, _) => Interp.Host.isoString(ms(t)))
      case "getTime" | "valueOf" => Native(name, 0, (t, _) => exportNum(java.lang.Double.valueOf(ms(t))))
      case "unix" => Native("unix", 0, (t, _) => java.lang.Long.valueOf((ms(t) / 1000).toLong))
      case "unixMilli" => Native("unixMilli", 0, (t, _) => java.lang.Long.valueOf(ms(t).toLong))
      case "unixNano" => Native("unixNano", 0, (t, _) => java.lang.Long.valueOf(ms(t).toLong * 1000000L))
      case "getUTCFullYear" | "getFullYear" => Native(name, 0, (t, _) => java.lang.Long.valueOf(utc(t).getYear.toLong))
      case "getUTCMonth" | "getMonth" => Native(name, 0, (t, _) => java.lang.Long.valueOf((utc(t).getMonthValue - 1).toLong))
      case "getUTCDate" | "getDate" => Native(name, 0, (t, _) => java.lang.Long.valueOf(utc(t).getDayOfMonth.toLong))
      case "getUTCHours" | "getHours" => Native(name, 0, (t, _) => java.lang.Long.valueOf(utc(t).getHour.toLong))
      case "getUTCMinutes" | "getMinutes" => Native(name, 0, (t, _) => java.lang.Long.valueOf(utc(t).getMinute.toLong))
      case "getUTCSeconds" | "getSeconds" => Native(name, 0, (t, _) => java.lang.Long.valueOf(utc(t).getSecond.toLong))
      case "getUTCMilliseconds" | "getMilliseconds" => Native(name, 0, (t, _) =>
        java.lang.Long.valueOf((ms(t).toLong % 1000 + 1000) % 1000))
      case "getUTCDay" | "getDay" => Native(name, 0, (t, _) =>
        java.lang.Long.valueOf(utc(t).getDayOfWeek.getValue.toLong % 7))
      case "toString" => Native("toString", 0, (t, _) => Interp.Host.isoString(ms(t)))
      case _ => JsUndefined
    }
  }

  def numberMethod(interp: Interpreter, name: String): Any = name match {
    case "toFixed" => Native("toFixed", 1, (t, args) => {
      val digits = toNum(args.headOption.getOrElse(0L)).toInt
      val bd = new java.math.BigDecimal(toNum(t))
        .setScale(digits, java.math.RoundingMode.HALF_UP)
      bd.toPlainString
    })
    case "toString" => Native("toString", 1, (t, args) => args.headOption match {
      case Some(r) if r != JsUndefined =>
        java.lang.Long.toString(toNum(t).toLong, toNum(r).toInt)
      case _ => display(t)
    })
    case "valueOf" => Native("valueOf", 0, (t, _) => t)
    case _ => JsUndefined
  }

  // -------------------------------------------------------------------
  // JSON
  // -------------------------------------------------------------------
  /** JSON.stringify with JS semantics: insertion order preserved,
    * undefined members dropped, functions dropped. */
  def jsonStringify(v: Any): Any = {
    val sb = new StringBuilder
    def go(v: Any): Boolean = v match {
      case null => sb.append("null"); true
      case JsUndefined => false
      case _: Callable => false
      case b: java.lang.Boolean => sb.append(b.toString); true
      case s: String => appendQuoted(sb, s); true
      case l: java.lang.Long => sb.append(l.toString); true
      case d: java.lang.Double =>
        if (d.isNaN || d.isInfinite) sb.append("null") else sb.append(numToString(d))
        true
      case date: JsDate => appendQuoted(sb, Interp.Host.isoString(date.ms)); true
      case a: ArrayBuffer[_] =>
        sb.append('[')
        var first = true
        a.foreach { item =>
          if (!first) sb.append(',')
          first = false
          if (!go(item)) sb.append("null")
        }
        sb.append(']'); true
      case m: mutable.LinkedHashMap[_, _] =>
        sb.append('{')
        var first = true
        m.asInstanceOf[JsObj].foreach { case (k, value) =>
          val mark = sb.length
          if (!first) sb.append(',')
          appendQuoted(sb, k)
          sb.append(':')
          if (!go(value)) sb.setLength(mark) else first = false
        }
        sb.append('}'); true
      case other => appendQuoted(sb, String.valueOf(other)); true
    }
    if (go(v)) sb.toString else JsUndefined
  }

  /** Canonical JSON for sink-side "any" values: keys sorted, matching the
    * reference's Go `json.Marshal(map[string]any)` behavior. */
  def jsonStringifySorted(v: Any): String = {
    val sb = new StringBuilder
    def go(v: Any): Unit = v match {
      case m: mutable.LinkedHashMap[_, _] =>
        sb.append('{')
        var first = true
        m.asInstanceOf[JsObj].toSeq.sortBy(_._1).foreach { case (k, value) =>
          if (value != JsUndefined && !value.isInstanceOf[Callable]) {
            if (!first) sb.append(',')
            first = false
            appendQuoted(sb, k)
            sb.append(':')
            go(value)
          }
        }
        sb.append('}')
      case a: ArrayBuffer[_] =>
        sb.append('[')
        var first = true
        a.foreach { item =>
          if (!first) sb.append(',')
          first = false
          go(item)
        }
        sb.append(']')
      case null | JsUndefined => sb.append("null")
      case s: String => appendQuoted(sb, s)
      case b: java.lang.Boolean => sb.append(b.toString)
      case l: java.lang.Long => sb.append(l.toString)
      case d: java.lang.Double =>
        if (d.isNaN || d.isInfinite) sb.append("null") else sb.append(numToString(d))
      case date: JsDate => appendQuoted(sb, Interp.Host.isoString(date.ms))
      case other => appendQuoted(sb, String.valueOf(other))
    }
    go(v)
    sb.toString
  }

  private def appendQuoted(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  def jsonParse(s: String): Any = {
    val p = new JsonP(s)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) throwErr("SyntaxError", "Unexpected token in JSON")
    v
  }

  private final class JsonP(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    // truncated input fails with Go's json decoder wording — door error
    // envelopes surface it verbatim (http_test.go TestHandleStatzConfig
    // "rejects malformed body", mqtt_test.go query_invalid_json)
    private def fail(): Nothing =
      if (i >= s.length) throwErr("SyntaxError", "unexpected EOF")
      else throwErr("SyntaxError", s"Unexpected token in JSON at position $i")
    def parseValue(): Any = {
      skipWs()
      if (atEnd) fail()
      s(i) match {
        case '{' =>
          i += 1
          val m = mutable.LinkedHashMap[String, Any]()
          skipWs()
          if (!atEnd && s(i) == '}') { i += 1; return m }
          var continue = true
          while (continue) {
            skipWs()
            val k = parseString()
            skipWs()
            if (atEnd || s(i) != ':') fail()
            i += 1
            m(k) = parseValue()
            skipWs()
            if (!atEnd && s(i) == ',') i += 1
            else if (!atEnd && s(i) == '}') { i += 1; continue = false }
            else fail()
          }
          m
        case '[' =>
          i += 1
          val a = ArrayBuffer.empty[Any]
          skipWs()
          if (!atEnd && s(i) == ']') { i += 1; return a }
          var continue = true
          while (continue) {
            a += parseValue()
            skipWs()
            if (!atEnd && s(i) == ',') i += 1
            else if (!atEnd && s(i) == ']') { i += 1; continue = false }
            else fail()
          }
          a
        case '"' => parseString()
        case 't' if s.startsWith("true", i) => i += 4; java.lang.Boolean.TRUE
        case 'f' if s.startsWith("false", i) => i += 5; java.lang.Boolean.FALSE
        case 'n' if s.startsWith("null", i) => i += 4; null
        case c if c == '-' || c.isDigit =>
          val start = i
          if (s(i) == '-') i += 1
          while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
            s(i) == '+' || (s(i) == '-' && (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
          val raw = s.substring(start, i)
          if (raw.exists(c => c == '.' || c == 'e' || c == 'E'))
            java.lang.Double.valueOf(raw.toDouble)
          else
            try java.lang.Long.valueOf(raw.toLong)
            catch { case _: NumberFormatException => java.lang.Double.valueOf(raw.toDouble) }
        case _ => fail()
      }
    }
    def parseString(): String = {
      if (atEnd || s(i) != '"') fail()
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\' && i + 1 < s.length) {
          s(i + 1) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case '/' => sb.append('/')
            case 'u' if i + 5 < s.length =>
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
              i += 4
            case other => sb.append(other)
          }
          i += 2
        } else { sb.append(s(i)); i += 1 }
      }
      if (atEnd) fail()
      i += 1
      sb.toString
    }
  }

  // -------------------------------------------------------------------
  // modules
  // -------------------------------------------------------------------
  private def builtinModule(interp: Interpreter, name: String): Option[Any] = name match {
    case "@jsh/system" =>
      val m = newObj()
      // memory knobs are no-ops on the JVM (the reference calls Go's
      // debug.FreeOSMemory / runtime.GC — fm_script_test.go:195-217)
      m("free_os_memory") = Native("free_os_memory", 0, (_, _) => JsUndefined)
      m("gc") = Native("gc", 0, (_, _) => JsUndefined)
      m("now") = Native("now", 0, (_, _) => JsDate((interp.host.nowNs / 1000000L).toDouble))
      Some(m)
    case "mathx/spatial" | "@jsh/mathx/spatial" =>
      // jsh/lib/mathx/spatial/spatial.go: haversine + parseGeoJSON
      val m = newObj()
      m("haversine") = Native("haversine", -1, (_, args) => {
        def coord(v: Any): (Double, Double) = v match {
          case a: ArrayBuffer[_] if a.size >= 2 => (toNum(a(0)), toNum(a(1)))
          case _ => throwErr("Error", "haversine invalid coordinates")
        }
        val (c1, c2, radius) = args match {
          case Seq(o: mutable.LinkedHashMap[_, _]) =>
            val om = o.asInstanceOf[mutable.LinkedHashMap[String, Any]]
            val cs = om.get("coordinates") match {
              case Some(a: ArrayBuffer[_]) if a.size >= 2 => a
              case _ => throwErr("Error", "haversine invalid coordinates")
            }
            (coord(cs(0)), coord(cs(1)),
              om.get("radius").map(toNum).getOrElse(0d))
          case Seq(a, b) => (coord(a), coord(b), 0d)
          case _ => throwErr("Error", "haversine invalid arguments")
        }
        val r = if (radius > 0) radius else 6371000.0
        def rad(d: Double) = d * math.Pi / 180.0
        val dPhi = rad(c2._1 - c1._1); val dLam = rad(c2._2 - c1._2)
        val a = math.sin(dPhi / 2) * math.sin(dPhi / 2) +
          math.cos(rad(c1._1)) * math.cos(rad(c2._1)) *
            math.sin(dLam / 2) * math.sin(dLam / 2)
        java.lang.Double.valueOf(
          r * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a)))
      })
      val geoTypes = Set("FeatureCollection", "Feature", "Point", "MultiPoint",
        "LineString", "MultiLineString", "Polygon", "MultiPolygon",
        "GeometryCollection")
      m("parseGeoJSON") = Native("parseGeoJSON", 1, (_, args) => args.head match {
        case o: mutable.LinkedHashMap[_, _] =>
          val om = o.asInstanceOf[mutable.LinkedHashMap[String, Any]]
          val typ = om.get("type").map(display).getOrElse("")
          if (typ.isEmpty) Interp.errObj("Error", "GeoJSONError missing a GeoJSON type")
          else if (geoTypes(typ)) om // validated; value round-trips as-is
          else Interp.errObj("Error", "GeoJSONError unsupported GeoJSON type")
        case _ => Interp.errObj("Error", "GeoJSONError missing a GeoJSON type")
      })
      Some(m)
    case "mathx" | "@jsh/mathx" =>
      val m = newObj()
      // m.fft(times, values) → [[hz, amp], …] (mods/nums/fft.go via FftOp)
      m("fft") = Native("fft", 2, (_, args) => {
        val times = args.head match {
          case a: ArrayBuffer[_] => a
          case _ => throwErr("Error", "fft invalid 0th sample value, but <nil>")
        }
        val values = args(1) match {
          case a: ArrayBuffer[_] => a
          case _ => throwErr("Error", "fft invalid 0th sample value, but <nil>")
        }
        val tsNs = new Array[Long](times.size)
        var i = 0
        while (i < times.size) {
          times(i) match {
            case l: java.lang.Long => tsNs(i) = l
            case d: JsDate => tsNs(i) = (d.ms * 1e6).toLong
            case _ => throwErr("Error", s"fft invalid ${i}th sample value, but <nil>")
          }
          i += 1
        }
        val vs = new Array[Double](values.size)
        i = 0
        while (i < values.size) { vs(i) = toNum(values(i)); i += 1 }
        val spec = graft.operators.FftOp.spectrum(tsNs, vs, 0d, Double.MaxValue)
        val out = ArrayBuffer.empty[Any]
        spec.foreach { case (hz, amp) =>
          out += ArrayBuffer[Any](java.lang.Double.valueOf(hz), java.lang.Double.valueOf(amp))
        }
        out
      })
      Some(m)
    case _ => None
  }
}
