package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-cleaning expressions for corpus curation.
  *
  * Unicode normalization is the first step of every web-scale text
  * pipeline (the same page arrives NFC from one crawler and NFD from
  * another; "é" vs "e"+U+0301 breaks exact dedup, fingerprints, and
  * token counts). Spark ships no normalizer builtin, so this is a
  * custom Catalyst expression — full whole-stage codegen via a static
  * JDK call, no UDF serialization, null-safe.
  */
object TextExprs {

  /** `unicode_normalize(text, form)`: java.text.Normalizer over a string
    * column. `form` is one of NFC/NFD/NFKC/NFKD, fixed at plan time, so
    * codegen embeds the enum constant directly — the hot loop is one
    * static JDK call per row inside the WholeStageCodegen stage. */
  case class UnicodeNormalize(child: Expression, form: java.text.Normalizer.Form)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "unicode_normalize"
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      // already-normalized fast path: isNormalized is a cheap scan and
      // true for the overwhelming majority of real corpus text — skips
      // the allocating normalize pass entirely.
      if (java.text.Normalizer.isNormalized(s, form)) input
      else UTF8String.fromString(java.text.Normalizer.normalize(s, form))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val f = s"java.text.Normalizer.Form.${form.name()}"
      nullSafeCodeGen(ctx, ev, c => {
        val s = ctx.freshName("s")
        s"""
           |String $s = $c.toString();
           |${ev.value} = java.text.Normalizer.isNormalized($s, $f)
           |  ? $c
           |  : org.apache.spark.unsafe.types.UTF8String.fromString(
           |      java.text.Normalizer.normalize($s, $f));
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): UnicodeNormalize =
      copy(child = c)
  }

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = {
    if (registered.contains(spark)) return
    synchronized {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("unicode_normalize", {
        case Seq(text, org.apache.spark.sql.catalyst.expressions.Literal(f, StringType)) =>
          UnicodeNormalize(text, java.text.Normalizer.Form.valueOf(f.toString))
        case _ => throw new IllegalArgumentException(
          "unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD')")
      }, "built-in")
      registered.add(spark)
    }
  }

  def unicodeNormalize(spark: SparkSession, text: Column, form: String): Column = {
    register(spark)
    call_function("unicode_normalize", text, lit(form))
  }

  /** Full cleaning pass: NFC-normalize, strip C0/C1 control characters
    * (keeping \n and \t), collapse horizontal whitespace runs, trim.
    * Everything except the normalizer is builtin codegen'd regexp —
    * stays inside one WholeStageCodegen projection. */
  def cleanText(spark: SparkSession, text: Column): Column = {
    val nfc = unicodeNormalize(spark, text, "NFC")
    val noCtl = regexp_replace(nfc, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]", "")
    trim(regexp_replace(noCtl, "[ \\t]+", " "))
  }
}
