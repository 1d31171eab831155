package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.Curation

/** Streaming corpus intake: the batch curation gates (token bounds,
  * repetition, PII) applied on a Structured Streaming source, plus
  * near-real-time exact dedup.
  *
  * Design for scale:
  *   - the quality gates are pure codegen'd column expressions — they
  *     run inside the stream's stateless projection, no state at all;
  *   - exact dedup keys on the content md5 under a PROCESSING-time
  *     watermark (`dropDuplicatesWithinWatermark`), so state is bounded
  *     by the window and a re-sent historical document is still
  *     admitted once the window has passed — the same arrival-window
  *     model as the tag-ingest duplicate check
  *     ([[Watch.dedupWithin]]);
  *   - downstream is an ordinary append sink; nothing ever collects.
  */
object CuratedStream {

  /** Quality-gate + dedup a streaming document source. Emits the
    * original columns plus `n_tokens`; rejects too-short / too-long /
    * repetition-dominated texts; drops exact-content duplicates that
    * arrive within `dedupWindow` of the first copy. */
  def curate(stream: DataFrame, textCol: String,
             minTokens: Int, maxTokens: Int,
             maxDupWordFrac: Double, dedupWindow: String): DataFrame = {
    val text = col(textCol)
    stream
      .withColumn("n_tokens", Curation.tokenCount(text))
      .filter(col("n_tokens").between(minTokens, maxTokens) &&
        Curation.dupWordFrac(text) <= maxDupWordFrac)
      .withColumn("__content_md5", md5(text))
      .withColumn("__arrival", current_timestamp())
      .withWatermark("__arrival", dedupWindow)
      .dropDuplicatesWithinWatermark("__content_md5")
      .drop("__arrival", "__content_md5")
  }

  /** Curate + scrub: the full intake shape (gates → dedup → PII
    * redaction of the surviving texts). */
  def curateAndScrub(stream: DataFrame, textCol: String,
                     minTokens: Int, maxTokens: Int,
                     maxDupWordFrac: Double, dedupWindow: String): DataFrame =
    curate(stream, textCol, minTokens, maxTokens, maxDupWordFrac, dedupWindow)
      .withColumn(textCol, Curation.scrubPii(col(textCol)))
}
