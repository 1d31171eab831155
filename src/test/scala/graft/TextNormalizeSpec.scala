package graft

import org.apache.spark.sql.functions._
import graft.functions.TextExprs

/** Native unicode_normalize expression: forms, null handling, codegen
  * path, and the cleanText composition. */
class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val nfdE = "e\u0301"    // e + combining acute (NFD)
  private val nfcE = "\u00e9"     // precomposed (NFC)

  test("NFC recomposes combining sequences; NFD decomposes them") {
    val df = Seq(s"caf$nfdE", s"caf$nfcE", "plain").toDF("t")
    val nfc = df.select(TextExprs.unicodeNormalize(spark, col("t"), "NFC"))
      .as[String].collect().toSeq
    assert(nfc == Seq(s"caf$nfcE", s"caf$nfcE", "plain"), nfc)
    val nfd = df.select(TextExprs.unicodeNormalize(spark, col("t"), "NFD"))
      .as[String].collect().toSeq
    assert(nfd == Seq(s"caf$nfdE", s"caf$nfdE", "plain"), nfd)
  }

  test("NFKC folds compatibility forms (ligature, fullwidth, superscript)") {
    val df = Seq("\ufb01le x\u00b2 \uff21BC").toDF("t") // fi-ligature, superscript-2, fullwidth-A
    val got = df.select(TextExprs.unicodeNormalize(spark, col("t"), "NFKC"))
      .as[String].head()
    assert(got == "file x2 ABC", got)
  }

  test("null propagates; char counts shrink under NFC") {
    val df = Seq(Some(s"$nfdE$nfdE"), None).toDF("t")
    val got = df.select(
        TextExprs.unicodeNormalize(spark, col("t"), "NFC").as("n"))
      .select(col("n"), length(col("n")).as("len"))
      .collect()
    assert(got(0).getString(0) == s"$nfcE$nfcE" && got(0).getInt(1) == 2)
    assert(got(1).isNullAt(0))
  }

  test("expression runs inside whole-stage codegen") {
    // a LocalRelation input would constant-fold via ConvertToLocalRelation
    // (no stage at all); range() forces a real codegen'd projection
    val df = spark.range(3)
      .select(concat(lit(s"a$nfdE b "), col("id")).as("t"))
      .select(TextExprs.unicodeNormalize(spark, col("t"), "NFC").as("n"))
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1)"), plan) // codegen stage id marker
    assert(df.as[String].head() == s"a$nfcE b 0")
  }

  test("cleanText: NFC + control strip + whitespace collapse + trim") {
    val dirty = s"  caf$nfdE\u0007\u009f  bar\t\tbaz\nqux  "
    val got = Seq(dirty).toDF("t")
      .select(TextExprs.cleanText(spark, col("t"))).as[String].head()
    assert(got == s"caf$nfcE bar baz\nqux", got)
  }

  test("SQL registration: callable as unicode_normalize from spark.sql") {
    TextExprs.register(spark)
    val got = spark.sql(s"SELECT unicode_normalize('x$nfdE', 'NFC')")
      .as[String].head()
    assert(got == s"x$nfcE", got)
  }
}
