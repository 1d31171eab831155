package graft

import graft.server.{HttpLoop, Markdown}

/** httpext markdown HTTP-fence battery
  * (mods/util/mdconv/httpext/httpext_test.go) against the loopback
  * `/db/query` door: fence options (hide-request, line-numbers, indent,
  * style overrides + unknown-key warning), JSON body tokenization with
  * Go-json.Indent pretty layout, gzip body decompression, and CSV
  * rainbow columns with delimiter detection. */
class HttpextSpec extends SparkSpec {

  private lazy val port = {
    spark.read.parquet(s"$sf/nation.parquet").createOrReplaceTempView("nation")
    HttpLoop.ensureServer(spark)
  }

  private def render(md: String): String = Markdown.render(md, false, "")

  private def fence(opts: String, q: String): String =
    s"## HTTP\n\n```http$opts\nGET http://127.0.0.1:$port$q\n```\n"

  test("request+response code blocks (TestExtenderRendersRequestAndResponseAsCodeBlocks httpext_test.go:164-194)") {
    val html = render(fence("", "/db/query?q=select n_nationkey from nation limit 1&format=csv"))
    assert(html.contains("""class="httpext-pre""""), html)
    assert("class=\"httpext-pre\"".r.findAllIn(html).size == 1)
    assert(!html.contains("""class="httpext-table""""))
    assert(!html.contains("""class="httpext-lno""""))
    assert(html.contains("""class="httpext-divider""""))
    assert(html.contains("""class="httpext-method">GET</span>"""))
    assert(html.contains("""class="httpext-path">/db/query</span>"""))
    assert(html.contains("""class="httpext-status-code">200</span>"""))
    assert(!html.contains("language-http"))
  }

  test("hide-request option (TestExtenderHideRequestOption httpext_test.go:196-222)") {
    val html = render(fence(" {hide-request=true}",
      "/db/query?q=select n_nationkey from nation limit 1&format=csv"))
    assert(!html.contains("""class="httpext-method""""), html)
    assert(html.contains("""class="httpext-status-code">200</span>"""))
    assert(!html.contains("""class="httpext-lno""""))
    assert(!html.contains("""class="httpext-divider""""))
  }

  test("boolean options accept 1/yes and 0/no forms (httpext/options.go:75-80)") {
    // hide-request=1 hides like =true
    val h1 = render(fence(" {hide-request=1}",
      "/db/query?q=select n_nationkey from nation limit 1&format=csv"))
    assert(!h1.contains("""class="httpext-method""""), h1)
    // hide-request=yes too
    val h2 = render(fence(" {hide-request=yes}",
      "/db/query?q=select n_nationkey from nation limit 1&format=csv"))
    assert(!h2.contains("""class="httpext-method""""), h2)
    // line-numbers=1 enables the numbered table
    val h3 = render(fence(" {line-numbers=1}",
      "/db/query?q=select n_nationkey from nation limit 1&format=csv"))
    assert(h3.contains("""class="httpext-lno">1</td>"""), h3)
    // indent=0 disables JSON pretty layout like =false
    val h4 = render(fence(" {indent=0}",
      "/db/query?q=select n_nationkey from nation limit 1"))
    assert(!h4.contains("httpext-json-indent"), h4)
  }

  test("line-numbers option (TestExtenderLineNumbersOptOut httpext_test.go:288-313)") {
    val html = render(fence(" {line-numbers=true}",
      "/db/query?q=select n_nationkey from nation limit 1&format=csv"))
    assert(html.contains("""class="httpext-table""""), html)
    assert(html.contains("""class="httpext-lno">1</td>"""))
    assert(html.contains("""class="httpext-divider-row""""))
    assert(html.contains("""class="httpext-status-code">200</span>"""))
  }

  test("token classes + style override (TestExtenderTokenClassesAndStyleOverride httpext_test.go:223-260)") {
    val html = render(fence(
      """ {style-method="color:#ff0000", style-json-key="font-weight:700"}""",
      "/db/query?q=select n_nationkey from nation limit 1&name=neo"))
    for (cls <- Seq("httpext-method", "httpext-path", "httpext-param-name",
      "httpext-param-value", "httpext-header-key", "httpext-header-value",
      "httpext-response-protocol", "httpext-status-code",
      "httpext-json-key", "httpext-json-number", "httpext-json-boolean"))
      assert(html.contains(s"""class="$cls""""), s"missing $cls in $html")
    assert(html.contains("""class="httpext-method" style="color:#ff0000""""), html)
    assert(html.contains("""class="httpext-json-key" style="font-weight:700""""), html)
  }

  test("unknown style key warns (TestExtenderUnknownStyleKeyWarning httpext_test.go:261-287)") {
    val html = render(fence(""" {style-bogus="color:red"}""",
      "/db/query?q=select n_nationkey from nation limit 1&format=csv"))
    assert(html.contains(
      """<div class="httpext-warning">httpext: unknown style key &#34;style-bogus&#34;</div>"""), html)
  }

  test("JSON pretty layout default + indent=false token chain (TestExtenderIndentOptOut httpext_test.go:350-376)") {
    // default: two-space Go json.Indent layout
    val pretty = render(fence("", "/db/query?q=select n_nationkey from nation limit 1"))
    assert(pretty.contains("\n  "), pretty)
    assert(pretty.contains("""class="httpext-json-key""""))
    // indent=false keeps the wire body verbatim: the envelope tail is the
    // exact span chain the reference pins for {"success":true,...}
    val flat = render(fence(" {indent=false}",
      "/db/query?q=select n_nationkey from nation limit 1"))
    assert(flat.contains(
      """<span class="httpext-json-key">&#34;success&#34;</span>""" +
      """<span class="httpext-json-punct">:</span>""" +
      """<span class="httpext-json-boolean">true</span>"""), flat)
  }

  test("gzip response body decompresses for display (TestExtenderDecompressesGzipPrintableBody httpext_test.go:315-348)") {
    val html = render(fence("",
      "/db/query?q=select n_nationkey from nation limit 1&compress=gzip"))
    assert(html.contains("""class="httpext-json-key""""), html)
    assert(html.contains("success"), html)
    assert(html.contains("""class="httpext-json-boolean""""), html)
  }

  test("CSV rainbow columns + quoted fields (TestExtenderCSVRainbowColumns httpext_test.go:377-401)") {
    val html = render(fence("",
      "/db/query?q=select n_nationkey, n_name from nation order by n_nationkey limit 2&format=csv"))
    assert(html.contains(
      """<span class="httpext-csv-col-0 httpext-csv-col-p0">n_nationkey</span>""" +
      """<span class="httpext-csv-delim">,</span>""" +
      """<span class="httpext-csv-col-1 httpext-csv-col-p1">n_name</span>"""), html)
    assert(html.contains("""class="httpext-csv-col-0 httpext-csv-col-p0">0</span>"""), html)
  }

  test("csv-col style override (TestExtenderCSVColumnStyleOverride httpext_test.go:402-426)") {
    val html = render(fence(
      """ {style-csv-col-1="font-weight:700", style-csv-delim="opacity:0.5"}""",
      "/db/query?q=select n_nationkey, n_name from nation order by n_nationkey limit 1&format=csv"))
    assert(html.contains(
      """class="httpext-csv-col-1 httpext-csv-col-p1" style="font-weight:700">n_name</span>"""), html)
    assert(html.contains(
      """class="httpext-csv-delim" style="opacity:0.5">,</span>"""), html)
  }

  test("delimiter detection + quote-aware split (detectCSVDelimiter renderer.go:398-448)") {
    // pipes with a quoted pipe inside a field
    // (TestExtenderCSVRainbowColumnsWithPipeDelimiter)
    assert(Markdown.detectCsvDelimiterForTest(
      "id|name|score\n1|alice|97\n2|\"kim|neo\"|88") == '|')
    assert(Markdown.detectCsvDelimiterForTest(
      "id,name,score\n1,alice,97\n2,\"kim,neo\",88") == ',')
    assert(Markdown.detectCsvDelimiterForTest("a;b;c\n1;2;3") == ';')
  }

  test("prettyJson matches Go json.Indent two-space layout") {
    assert(Markdown.prettyJson("""{"success":true,"reason":"ok"}""") ==
      "{\n  \"success\": true,\n  \"reason\": \"ok\"\n}")
    assert(Markdown.prettyJson("""{"a":[1,2],"b":{}}""") ==
      "{\n  \"a\": [\n    1,\n    2\n  ],\n  \"b\": {}\n}")
    // invalid json passes through untouched
    assert(Markdown.prettyJson("not json {") == "not json {")
  }
}
