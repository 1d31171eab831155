package graft.server

/** Markdown → HTML for the console's `markdown.render` JSON-RPC method.
  *
  * Reference behavior reimplemented (not copied):
  *   - `rpcMarkdownRender` — reference mods/server/http_rpc.go:40-68:
  *     `{{ file_root|file_path|file_name|file_dir }}` substitution from the
  *     referer URL (regexes http.go:1097-1100), result wrapped in `<div>`;
  *   - the goldmark conversion pipeline — mods/util/mdconv/mdconv.go —
  *     re-expressed as a CommonMark-subset renderer producing goldmark's
  *     output shape for the constructs the reference's own tests pin
  *     (test_markdown_list.txt, test_markdown_mermaid.txt): ATX headings,
  *     tight lists, paragraphs, strong/em/code/link inlines;
  *   - `mermaid` fences → `<pre class="mermaid">` with Go html.EscapeString
  *     escaping (go.abhg.dev/goldmark/mermaid client render mode);
  *   - `http` fences execute the request through the loopback-only DSL and
  *     render method/path/param/header/status spans —
  *     mods/util/mdconv/httpext/renderer.go:134-262, transformer.go:40-56.
  *
  * Divergence (documented): non-mermaid/http fences render as plain
  * `<pre><code class="language-X">` without chroma syntax highlighting —
  * the highlighted table markup is styling-only.
  */
object Markdown {

  /** JSON-RPC `markdown.render(markdown, darkMode, referer)`. */
  def render(markdown: String, darkMode: Boolean, referer: String): String = {
    var filePath = ""
    var fileName = ""
    var fileDir = ""
    try {
      val u = new java.net.URI(referer)
      if (u.getPath != null && u.getPath.nonEmpty) {
        filePath = u.getPath
        val slash = filePath.lastIndexOf('/')
        fileName = if (slash >= 0) filePath.substring(slash + 1) else filePath
        fileDir = if (slash > 0) filePath.substring(0, slash)
          else if (slash == 0) "/" else "."
      }
    } catch { case _: Exception => () }
    val fileRoot = "/web/api/tql"
    val src = markdown
      .replaceAll("\\{\\{\\s*file_root\\s*\\}\\}", java.util.regex.Matcher.quoteReplacement(fileRoot))
      .replaceAll("\\{\\{\\s*file_path\\s*\\}\\}", java.util.regex.Matcher.quoteReplacement(filePath))
      .replaceAll("\\{\\{\\s*file_name\\s*\\}\\}", java.util.regex.Matcher.quoteReplacement(fileName))
      .replaceAll("\\{\\{\\s*file_dir\\s*\\}\\}", java.util.regex.Matcher.quoteReplacement(fileDir))
    "<div>" + convert(src) + "</div>"
  }

  // ---- block parsing ----------------------------------------------------

  def convert(src: String): String = {
    val lines = src.replace("\r\n", "\n").split("\n", -1)
    val out = new StringBuilder
    var i = 0
    val headingRe = "^(#{1,6})\\s+(.*?)\\s*#*\\s*$".r
    val bulletRe = "^[-*+]\\s+(.*)$".r
    val orderedRe = "^\\d{1,9}[.)]\\s+(.*)$".r
    val fenceRe = "^```\\s*(\\S*)\\s*(.*)$".r
    // goldmark/GFM table extension: a |-row followed by a delimiter row
    // of `:?-+:?` cells whose COLUMN COUNT matches the header row (GFM
    // allows single-dash cells; a count mismatch means "not a table")
    val tableSepRe = "^\\|?\\s*:?-+:?\\s*(\\|\\s*:?-+:?\\s*)*\\|?$".r
    def splitRow(l: String): Seq[String] =
      l.trim.stripPrefix("|").stripSuffix("|").split("\\|", -1).toSeq.map(_.trim)
    def isTableStart(j: Int): Boolean =
      j + 1 < lines.length && lines(j).trim.startsWith("|") &&
        tableSepRe.matches(lines(j + 1).trim) &&
        splitRow(lines(j).trim).size == splitRow(lines(j + 1).trim).size

    while (i < lines.length) {
      val line = lines(i)
      line.trim match {
        case "" => i += 1
        case t if t.startsWith("|") && isTableStart(i) =>
          // pipe table → goldmark's table shape (align attr only when the
          // separator specifies one: :--- left, :--: center, ---: right)
          val headers = splitRow(t)
          val aligns = splitRow(lines(i + 1).trim).map { s =>
            val l = s.startsWith(":"); val r = s.endsWith(":")
            if (l && r) Some("center") else if (r) Some("right")
            else if (l) Some("left") else None
          }
          def alignAttr(c: Int): String =
            aligns.lift(c).flatten.map(a => s""" align="$a"""").getOrElse("")
          i += 2
          out.append("<table>\n<thead>\n<tr>\n")
          headers.zipWithIndex.foreach { case (h, c) =>
            out.append(s"<th${alignAttr(c)}>").append(inline(h)).append("</th>\n")
          }
          out.append("</tr>\n</thead>\n")
          val bodyRows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
          while (i < lines.length && lines(i).trim.startsWith("|")) {
            bodyRows += splitRow(lines(i).trim); i += 1
          }
          if (bodyRows.nonEmpty) {
            out.append("<tbody>\n")
            bodyRows.foreach { cells =>
              out.append("<tr>\n")
              cells.zipWithIndex.foreach { case (cell, c) =>
                out.append(s"<td${alignAttr(c)}>").append(inline(cell)).append("</td>\n")
              }
              out.append("</tr>\n")
            }
            out.append("</tbody>\n")
          }
          out.append("</table>\n")
        case t if t.startsWith(">") =>
          // blockquote: consecutive >-lines form paragraphs; a bare '>'
          // line is a blank separator — goldmark/GFM emits one <p> per
          // segment, not a single merged paragraph
          val body = scala.collection.mutable.ArrayBuffer.empty[String]
          while (i < lines.length && lines(i).trim.startsWith(">")) {
            body += lines(i).trim.stripPrefix(">").stripPrefix(" ")
            i += 1
          }
          out.append("<blockquote>\n")
          var j = 0
          while (j < body.length) {
            while (j < body.length && body(j).isEmpty) j += 1
            if (j < body.length) {
              val para = new StringBuilder
              var first = true
              while (j < body.length && body(j).nonEmpty) {
                if (!first) para.append('\n')
                first = false
                para.append(body(j))
                j += 1
              }
              out.append("<p>").append(inline(para.toString)).append("</p>\n")
            }
          }
          out.append("</blockquote>\n")
        case _ if fenceRe.matches(line.trim) && line.trim.startsWith("```") =>
          val fenceRe(lang, opts) = line.trim
          i += 1
          val body = new StringBuilder
          while (i < lines.length && !lines(i).trim.startsWith("```")) {
            body.append(lines(i)).append('\n'); i += 1
          }
          if (i < lines.length) i += 1 // closing fence
          out.append(renderFence(lang, opts, body.toString))
        case _ if (line.startsWith("\t") || line.startsWith("    ")) &&
          !bulletRe.matches(line.trim) && !orderedRe.matches(line.trim) =>
          // indented code block (mdconv_test.go TestMdCon: a tab-indented
          // line renders <pre><code> with one indent level stripped).
          // The bullet/ordered exclusion guards only the OPENING line
          // (an indented list item is list content, not code); once the
          // block has opened, indented continuation lines stay code even
          // when they look like bullets — CommonMark continuation rules
          val body = new StringBuilder
          while (i < lines.length &&
            (lines(i).startsWith("\t") || lines(i).startsWith("    "))) {
            val l0 = lines(i)
            body.append(if (l0.startsWith("\t")) l0.substring(1)
              else l0.stripPrefix("    ")).append('\n')
            i += 1
          }
          out.append("<pre><code>").append(goldEscape(body.toString))
            .append("</code></pre>\n")
        case t if headingRe.matches(t) =>
          val headingRe(hashes, text) = t
          val n = hashes.length
          out.append(s"<h$n>").append(inline(text)).append(s"</h$n>\n")
          i += 1
        case t if bulletRe.matches(t) =>
          out.append("<ul>\n")
          while (i < lines.length && bulletRe.matches(lines(i).trim)) {
            val bulletRe(item) = lines(i).trim
            out.append("<li>").append(inline(item)).append("</li>\n")
            i += 1
          }
          out.append("</ul>\n")
        case t if orderedRe.matches(t) =>
          out.append("<ol>\n")
          while (i < lines.length && orderedRe.matches(lines(i).trim)) {
            val orderedRe(item) = lines(i).trim
            out.append("<li>").append(inline(item)).append("</li>\n")
            i += 1
          }
          out.append("</ol>\n")
        case _ =>
          val para = new StringBuilder
          var first = true
          while (i < lines.length && lines(i).trim.nonEmpty &&
            !lines(i).trim.startsWith("```") &&
            !lines(i).trim.startsWith(">") &&
            !(lines(i).trim.startsWith("|") && isTableStart(i)) &&
            !headingRe.matches(lines(i).trim) &&
            !bulletRe.matches(lines(i).trim) && !orderedRe.matches(lines(i).trim)) {
            if (!first) para.append('\n')
            first = false
            para.append(lines(i).trim)
            i += 1
          }
          out.append("<p>").append(inline(para.toString)).append("</p>\n")
      }
    }
    out.toString
  }

  private def renderFence(lang: String, opts: String, body: String): String =
    lang match {
      case "mermaid" =>
        // mermaid client-render mode: escaped source in a pre, NO trailing \n
        "<pre class=\"mermaid\">" + goEscape(body) + "</pre>"
      case "d2" =>
        // d2ext envelope (d2ext_test.go:101 pins `<div class="d2">…</div>`);
        // the reference compiles to SVG with the embedded terrastruct d2
        // engine — an external compiler like the echarts assets, so this
        // engine ships the escaped source for client-side rendering
        if (body.trim.isEmpty) """<div class="d2"></div>"""
        else "<div class=\"d2\"><pre>" + goEscape(body) + "</pre></div>"
      case "http" => renderHttpFence(opts, body)
      case "chart" => renderChartFence(opts, body)
      case "geomap" => renderGeomapFence(opts, body)
      // jsh / jsh-run fences ARE javascript (mdconv_test.go
      // TestMdWithJshCodeFence/TestMdWithJshRunCodeFence)
      case "jsh" | "jsh-run" | "js" | "javascript" =>
        "<pre style=\"background-color:#1e1e1e\"><code>" +
          highlightJs(body) + "</code></pre>\n"
      case "" => "<pre><code>" + goldEscape(body) + "</code></pre>\n"
      case l =>
        "<pre><code class=\"language-" + l + "\">" + goldEscape(body) + "</code></pre>\n"
    }

  /** Minimal chroma-style inline highlighting for javascript fences
    * (mdconv.go routes code fences through chroma with inline styles;
    * the tests assert span-style presence, not exact colors). Reuses no
    * parser — a small token walk over keywords/strings/numbers/comments
    * keeps the output deterministic. */
  private[server] def highlightJs(body: String): String = {
    val kw = Set("const", "let", "var", "function", "return", "if", "else",
      "for", "while", "new", "typeof", "try", "catch", "finally", "throw",
      "class", "extends", "import", "export", "true", "false", "null",
      "undefined", "this", "switch", "case", "break", "continue", "do",
      "in", "of", "instanceof", "void", "delete", "yield", "async", "await")
    val sb = new StringBuilder
    var i = 0
    val n = body.length
    def span(color: String, text: String): Unit =
      sb.append("<span style=\"color:").append(color).append("\">")
        .append(goldEscape(text)).append("</span>")
    while (i < n) {
      val c = body.charAt(i)
      if (c == '/' && i + 1 < n && body.charAt(i + 1) == '/') {
        val e = body.indexOf('\n', i)
        val end = if (e < 0) n else e
        span("#608b4e", body.substring(i, end)); i = end
      } else if (c == '\'' || c == '"' || c == '`') {
        val start = i
        i += 1
        while (i < n && body.charAt(i) != c) {
          if (body.charAt(i) == '\\' && i + 1 < n) i += 1
          i += 1
        }
        if (i < n) i += 1
        span("#ce9178", body.substring(start, i))
      } else if (c.isDigit) {
        val start = i
        while (i < n && (body.charAt(i).isLetterOrDigit || body.charAt(i) == '.')) i += 1
        span("#b5cea8", body.substring(start, i))
      } else if (c.isLetter || c == '_' || c == '$') {
        val start = i
        while (i < n && (body.charAt(i).isLetterOrDigit ||
          body.charAt(i) == '_' || body.charAt(i) == '$')) i += 1
        val word = body.substring(start, i)
        if (kw(word)) span("#569cd6", word) else sb.append(goldEscape(word))
      } else { sb.append(goldEscape(c.toString)); i += 1 }
    }
    sb.toString
  }

  /** `{k=v,k=v}` fence options (chartext/geomapext transformer.go). */
  private[server] def fenceOptions(opts: String): Map[String, String] = {
    val t = opts.trim.stripPrefix("{").stripSuffix("}")
    if (t.isEmpty) Map.empty
    else t.split(",").iterator.map(_.trim).filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k.trim -> v.trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap
  }

  private val chartIdSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** ```chart fence → echarts block (mods/util/mdconv/chartext/
    * renderer.go:84-125 structure: div.chartext wrapper, a sized
    * div.chartext-echarts target, and a script that builds the option
    * from the fenced code and runs echarts.init + setOption). The
    * loader indirection (local/CDN script injection) is kept to its
    * observable surface. */
  private def renderChartFence(opts: String, body: String): String = {
    if (body.trim.isEmpty)
      return """<div class="chartext"><div class="chartext-error">Chart code is empty.</div></div>"""
    val o = fenceOptions(opts)
    val width = o.getOrElse("width", "100%")
    val height = o.getOrElse("height", "400px")
    val theme = o.getOrElse("theme", "white") match {
      case "light" => "white"; case t => t
    }
    val renderer = o.getOrElse("renderer", "canvas")
    val id = s"chartext_${chartIdSeq.incrementAndGet()}"
    val code = graft.sinks.GoJs.quote(body)
    s"""<div class="chartext"><div class="chartext-echarts" id="$id" style="width:$width;height:$height"></div>""" +
      s"""<script type="text/javascript">(function() {
    var __dom = document.getElementById("$id");
    if (!__dom) { return; }
    var __option;
    try {
        var __factory = new Function('__ctx', "var option;\\n(function(){\\n" + $code + "\\n}).call(__ctx);\\nif(typeof option!==\\"undefined\\"){return option;}\\nreturn null;");
        __option = __factory({});
    } catch (e) { __dom.innerText = 'Chart code error: ' + e; return; }
    if (!__option) { __dom.innerText = 'Chart option is not defined.'; return; }
    var __chart = echarts.init(__dom, ${graft.sinks.GoJs.quote(theme)}, { renderer: ${graft.sinks.GoJs.quote(renderer)} });
    __chart.setOption(__option);
    window.addEventListener('resize', function() { __chart.resize(); });
})();</script></div>"""
  }

  /** ```geomap fence → leaflet block (mods/util/mdconv/geomapext/
    * renderer.go structure: div.geomapext wrapper, a sized
    * div.geomapext-map target, and a script that creates L.map, adds
    * L.tileLayer and renders the fenced JSON layer list — markers via
    * L.marker, circles via L.circle, like the GEOMAP sink). */
  private def renderGeomapFence(opts: String, body: String): String = {
    if (body.trim.isEmpty)
      return """<div class="geomapext"><div class="geomapext-error">Geomap code is empty.</div></div>"""
    val o = fenceOptions(opts)
    val width = o.getOrElse("width", "100%")
    val height = o.getOrElse("height", "400px")
    val id = s"geomapext_${chartIdSeq.incrementAndGet()}"
    val layers = graft.sinks.GoJs.quote(body)
    s"""<div class="geomapext"><div class="geomapext-map" id="$id" style="width:$width;height:$height"></div>""" +
      s"""<script type="text/javascript">(function() {
    var __dom = document.getElementById("$id");
    if (!__dom) { return; }
    var __map = L.map(__dom, {});
    L.tileLayer('https://tile.openstreetmap.org/{z}/{x}/{y}.png',
        { maxZoom: 19 }).addTo(__map);
    var __layers = [];
    try { __layers = JSON.parse($layers); } catch (e) { __dom.innerText = 'Geomap code error: ' + e; return; }
    var __bounds = [];
    for (var i = 0; i < __layers.length; i++) {
        var l = __layers[i];
        var obj = null;
        if (l.type === 'marker') { obj = L.marker(l.coordinates); }
        else if (l.type === 'circle') { obj = L.circle(l.coordinates, l.properties || {}); }
        else if (l.type === 'circleMarker') { obj = L.circleMarker(l.coordinates, l.properties || {}); }
        else if (l.type === 'polyline') { obj = L.polyline(l.coordinates, l.properties || {}); }
        else if (l.type === 'polygon') { obj = L.polygon(l.coordinates, l.properties || {}); }
        if (!obj) { continue; }
        if (l.properties && l.properties.popup && l.properties.popup.content) {
            obj.bindPopup(l.properties.popup.content);
        }
        obj.addTo(__map);
        if (l.coordinates && typeof l.coordinates[0] === 'number') { __bounds.push(l.coordinates); }
    }
    if (__bounds.length > 0) { __map.fitBounds(__bounds); } else { __map.setView([0, 0], 2); }
})();</script></div>"""
  }

  // ---- http fence (httpext renderer.go/options.go, full option set) -----

  private[server] case class HttpFenceOpts(
      showRequest: Boolean, lineNumbers: Boolean, indentJson: Boolean,
      styles: Map[String, String], warnings: Seq[String])

  /** options.go styleKeyToClassName — the style-<key> override targets. */
  private val httpStyleKeys: Map[String, String] = Map(
    "method" -> "httpext-method", "path" -> "httpext-path",
    "param-name" -> "httpext-param-name", "param-value" -> "httpext-param-value",
    "request-protocol" -> "httpext-request-protocol",
    "header-key" -> "httpext-header-key", "header-value" -> "httpext-header-value",
    "response-protocol" -> "httpext-response-protocol",
    "status-code" -> "httpext-status-code", "status-message" -> "httpext-status-message",
    "body" -> "httpext-body", "json-key" -> "httpext-json-key",
    "json-string" -> "httpext-json-string", "json-number" -> "httpext-json-number",
    "json-boolean" -> "httpext-json-boolean", "json-null" -> "httpext-json-null",
    "json-punct" -> "httpext-json-punct", "csv-delim" -> "httpext-csv-delim")

  /** parseFenceOptions (options.go:37-98): `{k=v, style-x="css", …}` after
    * the fence language; quoted values unwrap, unknown style keys warn. */
  private[server] def parseHttpFenceOpts(opts: String): HttpFenceOpts = {
    var showRequest = true; var lineNumbers = false; var indentJson = true
    val styles = scala.collection.mutable.Map.empty[String, String]
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    val meta = opts.trim
    if (meta.startsWith("{") && meta.endsWith("}")) {
      def unquote(v0: String): String = {
        val v = v0.trim
        if (v.length >= 2 && ((v.head == '"' && v.last == '"') ||
          (v.head == '\'' && v.last == '\''))) v.substring(1, v.length - 1) else v
      }
      // top-level comma split, quote-aware (options.go splitTopLevel)
      val body = meta.substring(1, meta.length - 1)
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      var start = 0; var inS = false; var inD = false; var esc = false
      body.zipWithIndex.foreach { case (c, i) =>
        if (esc) esc = false
        else c match {
          case '\\' => esc = true
          case '\'' if !inD => inS = !inS
          case '"' if !inS => inD = !inD
          case ',' if !inS && !inD => parts += body.substring(start, i); start = i + 1
          case _ =>
        }
      }
      parts += body.substring(start)
      parts.map(_.trim).filter(_.nonEmpty).foreach { entry =>
        val eq = entry.indexOf('=')
        if (eq > 0 && eq < entry.length - 1) {
          val key = entry.take(eq).trim
          val valRaw = entry.drop(eq + 1).trim
          val v = unquote(valRaw).toLowerCase
          key match {
            // truthy = true|1|yes, falsy = false|0|no (httpext/options.go:
            // 75-80 — hide-request/line-numbers test truthy, indent falsy)
            case "hide-request" => showRequest = !Set("true", "1", "yes")(v)
            case "line-numbers" => lineNumbers = Set("true", "1", "yes")(v)
            case "indent" => indentJson = !Set("false", "0", "no")(v)
            case k if k.startsWith("style-") =>
              val styleKey = k.stripPrefix("style-")
              val className = httpStyleKeys.get(styleKey).orElse {
                // csv-col-N targets resolve dynamically (options.go:102-113)
                if (styleKey.startsWith("csv-col-"))
                  styleKey.stripPrefix("csv-col-").toIntOption
                    .filter(n => n >= 0 && n <= 255)
                    .map(n => s"httpext-csv-col-$n")
                else None
              }
              className match {
                case Some(cn) =>
                  val css = unquote(valRaw).trim
                  if (css.nonEmpty) styles(cn) = css
                case None =>
                  warnings += s"""httpext: unknown style key "style-$styleKey""""
              }
            case _ =>
          }
        }
      }
    }
    HttpFenceOpts(showRequest, lineNumbers, indentJson, styles.toMap, warnings.toSeq)
  }

  private def renderHttpFence(opts: String, body: String): String = {
    val fo = parseHttpFenceOpts(opts)
    val styles = fo.styles
    val (reqHtml, rspHtml, gotRequest) =
      try {
        // byte-level response so a gzip body survives to decompression
        val (reqRaw, rspBytes) = HttpLoop.executeDslExchangeBytes(body)
        val rspRaw = new String(rspBytes, "ISO-8859-1")
        (if (fo.showRequest) renderHttpMessage(reqRaw, isRequest = true, styles, fo.indentJson) else "",
          renderHttpMessage(rspRaw, isRequest = false, styles, fo.indentJson, latin1 = true),
          fo.showRequest)
      } catch {
        case e: Exception =>
          ("", goEscape(Option(e.getMessage).getOrElse(e.toString)), false)
      }
    val b = new StringBuilder
    fo.warnings.foreach(w =>
      b.append("<div class=\"httpext-warning\">").append(goEscape(w)).append("</div>"))
    if (fo.lineNumbers) {
      // table layout with line-number cells (renderer.go:156-183)
      b.append("<div class=\"httpext-pre\"><table class=\"httpext-table\"><tbody>")
      var lineNo = 1
      def numbered(html0: String): Unit =
        html0.replace("\r\n", "\n").split("\n", -1).foreach { line =>
          b.append("<tr><td class=\"httpext-lno\">").append(lineNo)
            .append("</td><td class=\"httpext-line\">")
            .append(if (line.isEmpty) "&nbsp;" else line).append("</td></tr>")
          lineNo += 1
        }
      if (gotRequest) {
        numbered(reqHtml)
        b.append("<tr class=\"httpext-divider-row\"><td class=\"httpext-lno\">&nbsp;</td>" +
          "<td class=\"httpext-line\"><div class=\"httpext-divider\"></div></td></tr>")
      }
      numbered(rspHtml)
      b.append("</tbody></table></div>")
    } else {
      b.append("<div class=\"httpext-pre\">")
      if (gotRequest)
        b.append("<div class=\"httpext-line\">").append(reqHtml)
          .append("</div><div class=\"httpext-divider\"></div>")
      b.append("<div class=\"httpext-line\">").append(rspHtml).append("</div></div>")
    }
    b.toString
  }

  private def span(cls: String, value: String,
                   styles: Map[String, String] = Map.empty): String =
    spanWithClasses(Seq(cls), value, styles)

  private def spanWithClasses(classes: Seq[String], value: String,
                              styles: Map[String, String]): String = {
    val styleAttr = classes.collectFirst {
      case c if styles.get(c).exists(_.trim.nonEmpty) =>
        s""" style="${goEscape(styles(c))}""""
    }.getOrElse("")
    s"""<span class="${classes.mkString(" ")}"$styleAttr>${goEscape(value)}</span>"""
  }

  /** test seam: render one raw response the way the fence path does
    * (byte-preserving ISO-8859-1 string in, display HTML out). */
  private[graft] def renderHttpResponseForTest(raw: String): String =
    renderHttpMessage(raw, isRequest = false, Map.empty,
      indentJson = true, latin1 = true)

  private def renderHttpMessage(raw: String, isRequest: Boolean,
                                styles: Map[String, String],
                                indentJson: Boolean,
                                latin1: Boolean = false): String = {
    // split header/body on the RAW text first (\r\n\r\n preferred, like
    // splitHTTPMessage renderer.go:185-193) — normalizing \r\n over the
    // whole message would corrupt 0x0D0A byte pairs inside a gzip body
    val (headerPart0, bodyPart) = {
      val crlf = raw.indexOf("\r\n\r\n")
      if (crlf >= 0) (raw.substring(0, crlf), raw.substring(crlf + 4))
      else raw.indexOf("\n\n") match {
        case -1 => (raw, "")
        case ix => (raw.substring(0, ix), raw.substring(ix + 2))
      }
    }
    val headers = headerPart0.replace("\r\n", "\n").split("\n", -1)
    var contentType = ""
    var contentEncoding = ""
    val b = new StringBuilder
    if (headers.nonEmpty) {
      b.append(if (isRequest) requestLine(headers.head, styles)
               else responseLine(headers.head, styles))
      b.append('\n')
    }
    headers.drop(1).filter(_.nonEmpty).foreach { line =>
      val ix = line.indexOf(':')
      if (ix <= 0) b.append(goEscape(line)).append('\n')
      else {
        val name = line.take(ix).trim
        val value = line.drop(ix + 1).trim
        if (name.equalsIgnoreCase("Content-Type"))
          contentType = value.split(";", 2)(0).trim.toLowerCase
        if (name.equalsIgnoreCase("Content-Encoding"))
          contentEncoding = value.trim.toLowerCase
        b.append(span("httpext-header-key", name, styles)).append(": ")
          .append(span("httpext-header-value", value, styles)).append('\n')
      }
    }
    b.append('\n')
    if (bodyPart.nonEmpty) {
      val display = decodeHttpBody(bodyPart, contentType, contentEncoding, latin1)
      if (isJsonContentType(contentType)) {
        val pretty =
          if (indentJson && contentType != "application/x-ndjson") prettyJson(display)
          else display
        b.append(renderJsonBody(pretty, styles))
      } else if (isCsvContentType(contentType)) {
        b.append(renderCsvBody(display, styles))
      } else b.append(span("httpext-body", display, styles))
    }
    b.toString
  }

  private def isJsonContentType(ct: String): Boolean =
    ct == "application/json" || ct == "application/x-ndjson" || ct.contains("+json")

  private def isCsvContentType(ct: String): Boolean =
    ct == "text/csv" || ct == "application/csv" || ct.contains("csv")

  private def isPrintableContentType(ct: String): Boolean =
    ct.nonEmpty && (ct.startsWith("text/") || isJsonContentType(ct) ||
      ct.contains("+xml") || Set("application/javascript", "application/xml",
      "application/xhtml+xml", "application/x-www-form-urlencoded")(ct))

  /** gzip bodies of printable types decompress for display
    * (renderer.go decodeResponseBody); `latin1` marks a byte-preserving
    * response string that must re-decode as UTF-8 for display. */
  private def decodeHttpBody(body: String, ct: String, ce: String,
                             latin1: Boolean): String = {
    if (!latin1) return body
    val bytes = body.getBytes("ISO-8859-1")
    if (ce == "gzip" && isPrintableContentType(ct)) {
      try {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      } catch { case _: Exception => new String(bytes, "UTF-8") }
    } else new String(bytes, "UTF-8")
  }

  // ---- JSON body tokenization (renderer.go classifyJSONToken) -----------

  /** lex a JSON text into (tokenText, class) pairs; whitespace and
    * unknown runs carry an empty class (escaped, span-less). */
  private def jsonTokens(s: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"') {
        val sb = new StringBuilder("\"")
        i += 1
        while (i < n && s.charAt(i) != '"') {
          if (s.charAt(i) == '\\' && i + 1 < n) { sb.append(s.charAt(i)).append(s.charAt(i + 1)); i += 2 }
          else { sb.append(s.charAt(i)); i += 1 }
        }
        if (i < n) { sb.append('"'); i += 1 }
        out += ((sb.toString, "string")) // key-ness resolved below
      } else if (c == '-' || c.isDigit) {
        val st = i
        while (i < n && (s.charAt(i).isDigit || "+-.eE".indexOf(s.charAt(i)) >= 0)) i += 1
        out += ((s.substring(st, i), "httpext-json-number"))
      } else if ("{}[]:,".indexOf(c) >= 0) {
        out += ((c.toString, "httpext-json-punct")); i += 1
      } else if (c.isWhitespace) {
        val st = i
        while (i < n && s.charAt(i).isWhitespace) i += 1
        out += ((s.substring(st, i), ""))
      } else {
        val st = i
        while (i < n && s.charAt(i).isLetter) i += 1
        if (i == st) i += 1
        val word = s.substring(st, math.max(i, st + 1))
        val cls = word.toLowerCase match {
          case "true" | "false" => "httpext-json-boolean"
          case "null" => "httpext-json-null"
          case _ => "httpext-body"
        }
        out += ((word, cls))
      }
    }
    // a string directly followed (past whitespace) by ':' is a key
    out.zipWithIndex.map { case ((txt, cls), ix) =>
      if (cls != "string") (txt, cls)
      else {
        val isKey = out.drop(ix + 1).find(_._1.trim.nonEmpty)
          .exists(_._1.trim == ":")
        (txt, if (isKey) "httpext-json-key" else "httpext-json-string")
      }
    }.toSeq
  }

  private def renderJsonBody(body: String, styles: Map[String, String]): String =
    jsonTokens(body).map {
      case (txt, "") => goEscape(txt)
      case (txt, cls) => span(cls, txt, styles)
    }.mkString

  /** Go json.Indent with two-space indentation: token-preserving
    * re-layout (numbers/strings verbatim). Invalid JSON passes through. */
  private[graft] def prettyJson(input: String): String = {
    val toks = jsonTokens(input).filter(_._1.trim.nonEmpty)
    // quick validity probe: balanced braces
    val opens = toks.count(t => t._1 == "{" || t._1 == "[")
    val closes = toks.count(t => t._1 == "}" || t._1 == "]")
    if (opens == 0 || opens != closes) return input
    val b = new StringBuilder
    var depth = 0
    def nl(): Unit = { b.append('\n'); b.append("  " * depth) }
    toks.zipWithIndex.foreach { case ((txt, _), ix) =>
      txt match {
        case "{" | "[" =>
          b.append(txt)
          val next = toks.lift(ix + 1).map(_._1)
          if (next.contains("}") || next.contains("]")) () // empty container
          else { depth += 1; nl() }
        case "}" | "]" =>
          val prev = toks.lift(ix - 1).map(_._1)
          if (prev.contains("{") || prev.contains("[")) b.append(txt)
          else { depth -= 1; nl(); b.append(txt) }
        case "," => b.append(','); nl()
        case ":" => b.append(": ")
        case t => b.append(t)
      }
    }
    b.toString
  }

  // ---- CSV body tokenization (renderer.go renderCSVBody) ----------------

  private def renderCsvBody(body: String, styles: Map[String, String]): String = {
    val delim = detectCsvDelimiter(body)
    body.replace("\r\n", "\n").split("\n", -1).map { line =>
      renderCsvLine(line, delim, styles)
    }.mkString("\n")
  }

  private def renderCsvLine(line: String, delim: Char,
                            styles: Map[String, String]): String = {
    val (fields, _) = splitCsvFields(line, delim)
    fields.zipWithIndex.map { case (f, i) =>
      val cell = spanWithClasses(
        Seq(s"httpext-csv-col-$i", s"httpext-csv-col-p${i % 12}"), f, styles)
      if (i < fields.length - 1)
        cell + span("httpext-csv-delim", delim.toString, styles)
      else cell
    }.mkString
  }

  /** quote-aware field split; false when quotes never close. */
  private def splitCsvFields(line: String, delim: Char): (Seq[String], Boolean) = {
    if (line.isEmpty) return (Seq(""), true)
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0; var inQ = false; var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (ch == '"') {
        if (inQ && i + 1 < line.length && line.charAt(i + 1) == '"') i += 1
        else inQ = !inQ
      } else if (ch == delim && !inQ) {
        fields += line.substring(start, i); start = i + 1
      }
      i += 1
    }
    if (inQ) (Seq(line), false)
    else { fields += line.substring(start); (fields.toSeq, true) }
  }

  private[graft] def detectCsvDelimiterForTest(body: String): Char =
    detectCsvDelimiter(body)

  /** score candidate delimiters by column-count consistency
    * (renderer.go detectCSVDelimiter/scoreDelimiter). */
  private def detectCsvDelimiter(body: String): Char = {
    val lines = body.replace("\r\n", "\n").split("\n")
      .filter(_.trim.nonEmpty).take(64)
    if (lines.isEmpty) return ','
    var best = ','
    var bestScore = -1
    Seq(',', '|', ';', '\t').foreach { delim =>
      var totalCols = 0; var valid = 0; var bad = 0
      val freq = scala.collection.mutable.Map.empty[Int, Int]
      lines.foreach { line =>
        val (fields, ok) = splitCsvFields(line, delim)
        if (!ok) bad += 1
        else { valid += 1; totalCols += fields.length
          freq(fields.length) = freq.getOrElse(fields.length, 0) + 1 }
      }
      if (valid > 0) {
        var modeCols = 1; var modeFreq = 0
        freq.foreach { case (cols, count) =>
          if (count > modeFreq || (count == modeFreq && cols > modeCols)) {
            modeCols = cols; modeFreq = count
          }
        }
        if (modeCols > 1) {
          var score = modeFreq * 100 + modeCols * 10 + totalCols / valid - bad * 50
          if (delim == ',') score += 1
          if (score > bestScore) { bestScore = score; best = delim }
        }
      }
    }
    best
  }

  private def requestLine(line: String, styles: Map[String, String]): String = {
    val parts = line.trim.split("\\s+")
    if (parts.length < 2) return goEscape(line)
    val b = new StringBuilder(span("httpext-method", parts(0), styles)).append(' ')
    val target = parts(1)
    val q = target.indexOf('?')
    if (q < 0) b.append(span("httpext-path", target, styles))
    else {
      b.append(span("httpext-path", target.take(q), styles)).append('?')
      target.drop(q + 1).split("&", -1).zipWithIndex.foreach { case (p, ix) =>
        if (ix > 0) b.append('&')
        val kv = p.split("=", 2)
        b.append(span("httpext-param-name", urlDecode(kv(0)), styles))
        if (kv.length > 1)
          b.append('=').append(span("httpext-param-value", urlDecode(kv(1)), styles))
      }
    }
    if (parts.length > 2)
      b.append(' ').append(span("httpext-request-protocol", parts(2), styles))
    b.toString
  }

  private def responseLine(line: String, styles: Map[String, String]): String = {
    val parts = line.trim.split("\\s+")
    if (parts.length < 2) return goEscape(line)
    val b = new StringBuilder(span("httpext-response-protocol", parts(0), styles))
      .append(' ').append(span("httpext-status-code", parts(1), styles))
    if (parts.length > 2)
      b.append(' ').append(span("httpext-status-message", parts.drop(2).mkString(" "), styles))
    b.toString
  }

  private def urlDecode(s: String): String =
    try java.net.URLDecoder.decode(s, "UTF-8") catch { case _: Exception => s }

  // ---- inline rendering -------------------------------------------------

  /** Code spans resolve first (no inline markup inside), then links,
    * strong, em — enough for the pinned reference cases. */
  private[server] def inline(text: String): String = {
    val codeSplit = "`([^`]+)`".r
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var rest = text
    var done = false
    while (!done) codeSplit.findFirstMatchIn(rest) match {
      case Some(m) =>
        parts += emphasis(rest.substring(0, m.start))
        parts += "<code>" + goldEscape(m.group(1)) + "</code>"
        rest = rest.substring(m.end)
      case None =>
        parts += emphasis(rest); done = true
    }
    parts.mkString
  }

  private def emphasis(text: String): String = {
    var s = goldEscape(text)
    // images before links: ![alt](src) → <img/> (mdconv_test.go
    // TestMdWithImage; goldmark's XHTML-mode self-closing tag)
    s = "!\\[([^\\]]*)\\]\\(([^)\\s]*)\\)".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"""<img src="${m.group(2)}" alt="${m.group(1)}" />"""))
    s = "\\[([^\\]]*)\\]\\(([^)\\s]*)\\)".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"""<a href="${m.group(2)}">${m.group(1)}</a>"""))
    s = "\\*\\*([^*]+)\\*\\*".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(s"<strong>${m.group(1)}</strong>"))
    s = "(?<![*\\w])\\*([^*]+)\\*(?![*\\w])".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(s"<em>${m.group(1)}</em>"))
    s = "(?<![_\\w])_([^_]+)_(?![_\\w])".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(s"<em>${m.group(1)}</em>"))
    s
  }

  /** goldmark text escaping: `& < >` (plus `"` as &quot; in code blocks). */
  private def goldEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Go html.EscapeString: `&#34;`/`&#39;` numeric forms (mermaid fences). */
  private def goEscape(s: String): String =
    s.replace("&", "&amp;").replace("'", "&#39;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&#34;")
}
