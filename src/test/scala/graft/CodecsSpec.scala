package graft

import graft.sinks.{Codecs, ResultCache}

class CodecsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")

  test("CSV sink with heading and rownum") {
    val out = Codecs.render(df, "CSV", Codecs.Options(heading = true, rownum = true))
    // the trailing blank line is the encoder-Close newline (csv_encode.go)
    assert(out == "ROWNUM,id,s,v\n1,1,a,1.5\n2,2,b,2.5\n\n")
  }

  test("JSON envelope matches the /db/query wire format") {
    val out = Codecs.render(df, "JSON", Codecs.Options(elapse = Some("0s")))
    assert(out ==
      """{"data":{"columns":["id","s","v"],"types":["int64","string","double"],""" +
      """"rows":[[1,"a",1.5],[2,"b",2.5]]},"success":true,"reason":"success","elapse":"0s"}""")
    // a measured elapse is a Go duration string (json_encode.go:152)
    val measured = Codecs.render(df, "JSON")
    assert(measured.matches(""".*"elapse":"[0-9][0-9.]*(ns|µs|ms|s)"}"""), measured)
  }

  test("JSON rowsArray renders column-keyed objects (TestJsonEncodeRowsArray)") {
    val one = Seq(("car-1", 7L, 12.3400d)).toDF("name", "seq", "value")
    val out = Codecs.render(one, "JSON",
      Codecs.Options(rowsArray = true, elapse = Some("0s")))
    assert(out.contains(""""rows":[{"name":"car-1","seq":7,"value":12.34}]"""), out)
  }

  test("JSON transpose renders column-major cols; rownum ignored (TestJsonEncodeTranspose)") {
    val two = Seq(("car-1", 1.0d), ("car-2", 2.5000d)).toDF("name", "value")
    val out = Codecs.render(two, "JSON",
      Codecs.Options(transpose = true, rownum = true, elapse = Some("0s")))
    assert(out ==
      """{"data":{"columns":["name","value"],"types":["string","double"],""" +
      """"cols":[["car-1","car-2"],[1,2.5]]},"success":true,"reason":"success","elapse":"0s"}""", out)
  }

  test("NDJSON emits one object per row") {
    val out = Codecs.render(df, "NDJSON")
    assert(out == "{\"id\":1,\"s\":\"a\",\"v\":1.5}\n{\"id\":2,\"s\":\"b\",\"v\":2.5}\n\n")
  }

  test("MARKDOWN and BOX render tables") {
    assert(Codecs.render(df, "MARKDOWN").startsWith("|id|s|v|\n|:-----|:-----|:-----|"))
    val box = Codecs.render(df, "BOX")
    assert(box.contains("| 1  | a | 1.5 |") && box.startsWith("+-"))
  }

  test("result cache: fresh hit, expiry recompute, preemptive refresh") {
    var now = 0L
    var computes = 0
    val cache = new ResultCache(() => now)
    def compute: String = { computes += 1; s"v$computes" }
    assert(cache.getOrCompute("k", 100L, 0.5)(compute) == "v1")
    now = 10; assert(cache.getOrCompute("k", 100L, 0.5)(compute) == "v1") // fresh
    now = 150; assert(cache.getOrCompute("k", 100L, 0.5)(compute) == "v2") // expired
    assert(computes == 2)
  }

  test("escape: quotes and newlines survive JSON encoding") {
    val tricky = Seq(("a\"b", "c\nd")).toDF("x", "y")
    val out = Codecs.render(tricky, "NDJSON")
    assert(out == "{\"x\":\"a\\\"b\",\"y\":\"c\\nd\"}\n\n")
  }
}
