package graft.tql

/** TQL script structure: statement classification, retained comment /
  * pragma statements with absolute positions, and the SRC → MAP* → SINK
  * shape validation (reference mods/tql/script_parser.go:40-150,
  * script_validate.go:5-70, fx_definitions.go:16-61). The runtime
  * compiler (`Compiler`) enforces the same shape operationally; this
  * module exposes the reference's introspection wire contract — kinds,
  * spans, error kinds and message formats — for editors and the
  * /db/tql front door.
  */
object ScriptStructure {
  sealed abstract class Kind(val label: String) { override def toString: String = label }
  object Kind {
    case object Unknown extends Kind("UNKNOWN")
    case object Source extends Kind("SRC")
    case object Map extends Kind("MAP")
    case object Sink extends Kind("SINK")
    case object SourceOrMap extends Kind("SRC|MAP")
    case object SourceOrSink extends Kind("SRC|SINK")
    case object SourceOrMapOrSink extends Kind("SRC|MAP|SINK")
    case object Pragma extends Kind("PRAGMA")
    case object Comment extends Kind("COMMENT")
  }
  import Kind._

  /** fx_definitions.go:16-45 — everything else that parses is a MAP. */
  private val kindTable: scala.collection.immutable.Map[String, Kind] =
    scala.collection.immutable.Map(
      "SQL" -> SourceOrMapOrSink,
      "SQL_SELECT" -> Source, "QUERY" -> Source, "FAKE" -> Source,
      "BYTES" -> Source, "STRING" -> Source, "ARGS" -> Source,
      "SCRIPT" -> SourceOrMap, "HTTP" -> SourceOrMap,
      "CSV" -> SourceOrSink,
      "INSERT" -> Sink, "APPEND" -> Sink, "JSON" -> Sink, "NDJSON" -> Sink,
      "MARKDOWN" -> Sink, "HTML" -> Sink, "TEXT" -> Sink, "BOX" -> Sink,
      "DISCARD" -> Sink, "GEOMAP" -> Sink, "CHART" -> Sink,
      "CHART_LINE" -> Sink, "CHART_BAR" -> Sink, "CHART_SCATTER" -> Sink,
      "CHART_LINE3D" -> Sink, "CHART_BAR3D" -> Sink,
      "CHART_SURFACE3D" -> Sink, "CHART_SCATTER3D" -> Sink)

  /** StatementKindByFunctionName: "CSV()" and "CSV" both resolve; any
    * other non-empty name is a MAP; empty is unknown. */
  def kindByFunctionName(name: String): (Kind, Boolean) = {
    val trimmed = name.stripSuffix("()")
    kindTable.get(trimmed) match {
      case Some(k) => (k, true)
      case None if trimmed.nonEmpty => (Map, true)
      case None => (Unknown, false)
    }
  }

  final case class Pos(offset: Int, line: Int, column: Int)
  final case class Span(start: Pos, end: Pos) {
    def rawFrom(source: String): String =
      source.substring(math.min(start.offset, source.length),
        math.min(end.offset, source.length))
  }

  final case class ParsedStatement(name: String, kind: Kind, text: String,
                                   line: Int, isPragma: Boolean,
                                   isComment: Boolean, span: Span) {
    /** executable statement (not comment/pragma) — Statement.IsCode. */
    def isCode: Boolean = !isPragma && !isComment
  }

  final case class Script(source: String, statements: List[ParsedStatement])

  /** expression.ParseError format:
    * `unexpected token '3' (line=3, column=36, near="3")`. */
  final case class ParseError(message: String, near: String, line: Int, column: Int)
    extends Exception {
    override def getMessage: String =
      s"""$message (line=$line, column=$column, near="$near")"""
  }

  /** script_validate.go ScriptError: kind + positioned message. Extends
    * IllegalArgumentException so compile-surface callers can treat all
    * TQL compile diagnostics uniformly. */
  final case class ScriptError(kind: String, message: String,
                               line: Int, column: Int, statementText: String)
    extends IllegalArgumentException {
    override def getMessage: String = {
      var m = message
      if (line > 0 && column > 0) m = s"line $line, column $column: $m"
      else if (line > 0) m = s"line $line: $m"
      if (statementText.nonEmpty) {
        var snippet = statementText.split("\\s+").mkString(" ")
        if (snippet.length > 120) snippet = snippet.take(117) + "..."
        m = s"$m [statement: $snippet]"
      }
      m
    }
  }

  /** Parse a script into classified statements. Comments (`// …` full
    * lines) and pragmas (`//+ …`) are RETAINED as statements; trailing
    * garbage after a statement's balanced call raises a ParseError at
    * its absolute position. */
  def parse(source: String): Script = {
    val out = List.newBuilder[ParsedStatement]
    var depth = 0
    var inStr: Char = 0
    var stmtStart = -1      // offset of first char of current statement
    var stmtStartLine = -1
    val cur = new StringBuilder
    var line = 1
    var col = 1
    var callEnd = -1        // offset just past the statement's balanced ()
    var i = 0

    def colOf(off: Int): (Int, Int) = { // (line, column) of an offset
      var l = 1; var c = 1; var j = 0
      while (j < off && j < source.length) {
        if (source.charAt(j) == '\n') { l += 1; c = 1 } else c += 1
        j += 1
      }
      (l, c)
    }

    def flush(endOff: Int): Unit = {
      val text = cur.toString.trim
      if (text.nonEmpty) {
        // trailing garbage after the balanced call (…)3 → parse error
        // at the garbage's absolute position (script_parser_test.go)
        if (callEnd >= 0 && callEnd < endOff) {
          val rest = source.substring(callEnd, endOff).trim
          if (rest.nonEmpty && !rest.startsWith("//")) {
            val restOff = source.indexOf(rest.charAt(0), callEnd)
            val (el, ec) = colOf(restOff)
            val near = rest.split("\\s+").head
            throw ParseError(s"unexpected token '$near'", near, el, ec)
          }
        }
        val name = "^\\s*([A-Za-z_][A-Za-z0-9_]*)".r.findFirstMatchIn(text)
          .map(_.group(1) + "()").getOrElse("")
        val (kind, _) = kindByFunctionName(name)
        out += ParsedStatement(name, kind, text, stmtStartLine,
          isPragma = false, isComment = false,
          Span(Pos(stmtStart, stmtStartLine, colOf(stmtStart)._2),
            Pos(endOff, line, col)))
      }
      cur.clear(); stmtStart = -1; callEnd = -1
    }

    while (i <= source.length) {
      val c = if (i < source.length) source.charAt(i) else '\n'
      if (inStr != 0) {
        cur.append(c)
        if (c == '\\' && i + 1 < source.length) { cur.append(source.charAt(i + 1)); i += 1; col += 1 }
        else if (c == inStr) inStr = 0
      } else c match {
        case '/' if i + 1 < source.length && source.charAt(i + 1) == '/' && depth == 0 =>
          if (cur.toString.trim.isEmpty) {
            // full-line comment or pragma — retained as a statement
            val end = source.indexOf('\n', i) match { case -1 => source.length; case e => e }
            val text = source.substring(i, end)
            val isPragma = text.startsWith("//+")
            out += ParsedStatement("", if (isPragma) Pragma else Comment,
              text, line, isPragma = isPragma, isComment = !isPragma,
              Span(Pos(i, line, col), Pos(end, line, col + (end - i))))
            i = end - 1; col += end - i
          } else {
            // trailing comment: skip to end of line
            val end = source.indexOf('\n', i) match { case -1 => source.length; case e => e }
            i = end - 1
          }
        case '#' if depth == 0 && cur.toString.trim.isEmpty =>
          // `#pragma …` full-line form (tql_pragma_test.go TestPragma2)
          val end = source.indexOf('\n', i) match { case -1 => source.length; case e => e }
          val text = source.substring(i, end)
          out += ParsedStatement("", Pragma, text, line, isPragma = true,
            isComment = false, Span(Pos(i, line, col), Pos(end, line, col + (end - i))))
          i = end - 1; col += end - i
        case '\'' | '"' =>
          if (stmtStart < 0) { stmtStart = i; stmtStartLine = line }
          inStr = c; cur.append(c)
        case '(' =>
          if (stmtStart < 0) { stmtStart = i; stmtStartLine = line }
          depth += 1; cur.append(c)
        case ')' =>
          depth -= 1; cur.append(c)
          if (depth == 0 && callEnd < 0) callEnd = i + 1
        case '\n' =>
          if (depth == 0) flush(i) else cur.append('\n')
        case _ =>
          if (stmtStart < 0 && !c.isWhitespace) { stmtStart = i; stmtStartLine = line }
          if (stmtStart >= 0) cur.append(c)
      }
      if (c == '\n') { line += 1; col = 1 } else col += 1
      i += 1
    }
    Script(source, out.result())
  }

  private def applicableForSource(k: Kind) =
    k == Source || k == SourceOrMap || k == SourceOrSink || k == SourceOrMapOrSink
  private def applicableForSink(k: Kind) =
    k == Sink || k == SourceOrSink || k == SourceOrMapOrSink
  private def applicableForMap(k: Kind) =
    k == Map || k == SourceOrMap || k == SourceOrMapOrSink

  /** script_validate.go: SRC → MAP* → SINK over code statements only.
    * Returns the reference's error kinds. */
  def validate(script: Script): Option[ScriptError] = {
    val codes = script.statements.filter(_.isCode)
    if (codes.isEmpty)
      return Some(ScriptError("no_source", "no source exists", 0, 0, ""))
    if (codes.size == 1)
      return Some(ScriptError("no_sink", "no sink exists",
        codes.head.line, codes.head.span.start.column, codes.head.text))
    val head = codes.head
    val tail = codes.last
    if (!applicableForSource(head.kind))
      return Some(ScriptError("invalid_source",
        s""""${head.name}" is not applicable for SRC""",
        head.line, head.span.start.column, head.text))
    if (!applicableForSink(tail.kind))
      return Some(ScriptError("invalid_sink",
        s""""${tail.name}" is not applicable for SINK""",
        tail.line, tail.span.start.column, tail.text))
    codes.slice(1, codes.size - 1).find(s => !applicableForMap(s.kind)).map { s =>
      ScriptError("invalid_map", s""""${s.name}" is not applicable for MAP""",
        s.line, s.span.start.column, s.text)
    }
  }
}
