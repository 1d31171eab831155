package graft

import graft.server.Markdown

/** Body-level mining of `mods/util/mdconv/mdconv_test.go` — the markdown
  * converter's fence extensions (chartext / geomapext / jsh remap /
  * indented code). */
class MdConvSpec extends SparkSpec {

  test("indented code block golden (TestMdCon mdconv_test.go:12-24)") {
    val html = Markdown.convert("# Test\t\n\tContent")
    assert(html == "<h1>Test</h1>\n<pre><code>Content\n</code></pre>\n", html)
  }

  test("d2 fence envelope (d2ext_test.go TestBlockHelpersAndRendererWithEmptyBlock:101)") {
    // empty block → the reference's pinned empty envelope; non-empty
    // blocks carry the escaped source (the d2→SVG compiler is external
    // tooling like the echarts assets — documented divergence)
    val empty = Markdown.convert("```d2\n```\n")
    assert(empty.contains("""<div class="d2"></div>"""), empty)
    val src = Markdown.convert("```d2\na -> b\n```\n")
    assert(src.contains("""<div class="d2"><pre>a -&gt; b"""), src)
    // a non-d2 fence is untouched (TestTransformerReplacesOnlyD2Blocks)
    val go = Markdown.convert("```go\nfmt.Println(\"x\")\n```\n")
    assert(go.contains("language-go"), go)
  }

  test("image line golden (TestMdWithImage :26-41)") {
    val html = Markdown.convert("# Image includes\n![sample](./sample_image.png)")
    assert(html ==
      "<h1>Image includes</h1>\n<p><img src=\"./sample_image.png\" alt=\"sample\" /></p>\n",
      html)
  }

  test("mermaid fence golden (TestMdWithMermaid :43-64)") {
    val html = Markdown.convert(
      "# Mermaid test\n```mermaid\ngraph TD;\nA-->B;\n```")
    assert(html.contains("<h1>Mermaid test</h1>"), html)
    assert(html.contains("<pre class=\"mermaid\">graph TD;\nA--&gt;B;\n</pre>"), html)
  }

  test("jsh / jsh-run fences highlight as javascript (TestMdWithJshCodeFence/TestMdWithJshRunCodeFence :66-105)") {
    val jsh = Markdown.convert(
      "# JSH Code Example\n```jsh\nconst result = db.query('select * from table');\n```")
    assert(!jsh.contains(">jsh<"), jsh)
    assert(jsh.contains("<span style="), jsh)
    assert(jsh.contains(">const</span>"), jsh) // keyword span
    val jshRun = Markdown.convert(
      "# JSH-RUN Code Example\n```jsh-run\nprint('Hello from JSH');\n```")
    assert(!jshRun.contains(">jsh-run<"), jshRun)
    assert(jshRun.contains("<span style="), jshRun)
    assert(jshRun.contains(">'Hello from JSH'</span>"), jshRun) // string span
  }

  test("chart fence renders the echarts block (TestMdWithChartCodeFence :107-128)") {
    val html = Markdown.convert(
      "# Chart test\n```chart {width=600px,height=400px,theme=dark}\n" +
        "function digit_format(v) { return \"DIGIT: \" + v; }\n" +
        "option = {xAxis:{type:'category',data:['Mon']},yAxis:{type:'value'},series:[{type:'line',data:[820]}]};\n```")
    assert(html.contains("class=\"chartext\""), html)
    assert(html.contains("class=\"chartext-echarts\""), html)
    assert(html.contains("echarts.init"), html)
    assert(html.contains("setOption"), html)
    assert(html.contains("width:600px;height:400px"), html)
    assert(html.contains("\"dark\""), html)
    // empty body renders the error div (renderer.go:100-103)
    assert(Markdown.convert("```chart\n```")
      .contains("""<div class="chartext-error">Chart code is empty.</div>"""))
  }

  test("geomap fence renders the leaflet block (TestMdWithGeomapCodeFence :130-151)") {
    val html = Markdown.convert(
      "# Geomap test\n```geomap {width=600px,height=320px,tile=default,fit=auto}\n" +
        """[{"type":"marker","coordinates":[37.49785,127.027756],"properties":{"popup":{"content":"hello"}}}]""" +
        "\n```")
    assert(html.contains("class=\"geomapext\""), html)
    assert(html.contains("class=\"geomapext-map\""), html)
    assert(html.contains("L.map("), html)
    assert(html.contains("L.tileLayer"), html)
    assert(html.contains("L.marker"), html)
    assert(html.contains("width:600px;height:320px"), html)
  }
}
