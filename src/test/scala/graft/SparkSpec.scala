package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs: one per suite, graft defaults. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(cores = 4)
  lazy val sf: String = "/root/testdata/sf0.001"

  /** Sink output with the encoder-Close blank line trimmed: the CSV and
    * NDJSON encoders terminate the wire body with one extra newline
    * (reference csv_encode.go / ndjson/encode.go Close — the exact wire
    * bytes are pinned in CodecBatterySpec). The goldens in these suites
    * were ported as row text, so they compare the trimmed body. */
  protected def trimClose(s: String): String =
    if (s.endsWith("\n\n")) s.dropRight(1) else if (s == "\n") "" else s

  protected def runTrim(script: String): String =
    trimClose(graft.tql.Tql.run(spark, script))
  protected def runTrim(script: String, nowNs: Long): String =
    trimClose(graft.tql.Tql.run(spark, script, nowNs))
  protected def runTrim(script: String, nowNs: Long,
                        params: Map[String, Seq[String]]): String =
    trimClose(graft.tql.Tql.run(spark, script, nowNs, params))
}
