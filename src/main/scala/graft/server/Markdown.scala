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
        case _ if line.startsWith("\t") || line.startsWith("    ") =>
          // indented code block (mdconv_test.go TestMdCon: a tab-indented
          // line renders <pre><code> with one indent level stripped)
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
      case "http" => renderHttpFence(body)
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

  // ---- http fence (httpext renderer.go, Contains-level parity) ----------

  private def renderHttpFence(body: String): String = {
    val (reqHtml, rspHtml) =
      try {
        val (reqRaw, rspRaw) = HttpLoop.executeDslExchange(body)
        (renderHttpMessage(reqRaw, isRequest = true),
          renderHttpMessage(rspRaw, isRequest = false))
      } catch {
        case e: Exception => ("", goEscape(Option(e.getMessage).getOrElse(e.toString)))
      }
    val b = new StringBuilder("<div class=\"httpext-pre\">")
    if (reqHtml.nonEmpty)
      b.append("<div class=\"httpext-line\">").append(reqHtml)
        .append("</div><div class=\"httpext-divider\"></div>")
    b.append("<div class=\"httpext-line\">").append(rspHtml).append("</div></div>")
    b.toString
  }

  private def span(cls: String, value: String): String =
    s"""<span class="$cls">${goEscape(value)}</span>"""

  private def renderHttpMessage(raw: String, isRequest: Boolean): String = {
    val normalized = raw.replace("\r\n", "\n")
    val (headerPart, bodyPart) = normalized.indexOf("\n\n") match {
      case -1 => (normalized, "")
      case ix => (normalized.substring(0, ix), normalized.substring(ix + 2))
    }
    val headers = headerPart.split("\n", -1)
    val b = new StringBuilder
    if (headers.nonEmpty) {
      b.append(if (isRequest) requestLine(headers.head) else responseLine(headers.head))
      b.append('\n')
    }
    headers.drop(1).filter(_.nonEmpty).foreach { line =>
      val ix = line.indexOf(':')
      if (ix <= 0) b.append(goEscape(line)).append('\n')
      else {
        b.append(span("httpext-header-key", line.take(ix).trim)).append(": ")
          .append(span("httpext-header-value", line.drop(ix + 1).trim)).append('\n')
      }
    }
    b.append('\n')
    if (bodyPart.nonEmpty) b.append(span("httpext-body", bodyPart))
    b.toString
  }

  private def requestLine(line: String): String = {
    val parts = line.trim.split("\\s+")
    if (parts.length < 2) return goEscape(line)
    val b = new StringBuilder(span("httpext-method", parts(0))).append(' ')
    val target = parts(1)
    val q = target.indexOf('?')
    if (q < 0) b.append(span("httpext-path", target))
    else {
      b.append(span("httpext-path", target.take(q))).append('?')
      target.drop(q + 1).split("&", -1).zipWithIndex.foreach { case (p, ix) =>
        if (ix > 0) b.append('&')
        val kv = p.split("=", 2)
        b.append(span("httpext-param-name", urlDecode(kv(0))))
        if (kv.length > 1) b.append('=').append(span("httpext-param-value", urlDecode(kv(1))))
      }
    }
    if (parts.length > 2) b.append(' ').append(span("httpext-request-protocol", parts(2)))
    b.toString
  }

  private def responseLine(line: String): String = {
    val parts = line.trim.split("\\s+")
    if (parts.length < 2) return goEscape(line)
    val b = new StringBuilder(span("httpext-response-protocol", parts(0)))
      .append(' ').append(span("httpext-status-code", parts(1)))
    if (parts.length > 2)
      b.append(' ').append(span("httpext-status-message", parts.drop(2).mkString(" ")))
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
