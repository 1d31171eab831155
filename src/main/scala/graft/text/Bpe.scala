package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer: the real subword step of a training
  * pipeline, not the regex approximation ([[TextOps.regexTokenCount]]).
  *
  * Scale shape (how SentencePiece/GPT-2 trainers actually run): BPE
  * training needs only the WORD HISTOGRAM, not the corpus — so the
  * distributed part is one word-count aggregation (map-side partials,
  * one shuffle), capped to the top `maxWords` types (a long-tail word
  * seen once cannot win a merge against the head at realistic corpus
  * sizes). The merge loop then runs driver-side over that bounded
  * histogram — O(maxWords · numMerges) on thousands of rows, never the
  * corpus. Encoding distributes: the learned merge table broadcasts
  * inside a native expression and every document encodes independently,
  * no shuffle.
  *
  * Determinism: ties in pair frequency break lexicographically, so the
  * same corpus always learns the same merge table — encodings are
  * exactly reproducible (and the gate query's roundtrip/compression
  * verdicts are stable).
  */
object Bpe {
  /** End-of-word marker (GPT-2 uses a leading space; a suffix marker
    * keeps the word-boundary information while staying printable). */
  val Eow = "</w>"

  /** An ordered merge table: rank i holds the pair merged at step i. */
  final case class Model(merges: Seq[(String, String)]) {
    /** rank lookup: (left, right) -> merge priority (lower merges first) */
    @transient lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** word -> encoding memo (every production BPE encoder carries one:
      * natural-language word frequency is Zipfian, so the hit rate is
      * ~99% after a few thousand documents). Bounded; thread-safe for
      * expression instances shared across tasks. */
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

    def encodeWordCached(word: String): Seq[String] = {
      val hit = memo.get(word)
      if (hit != null) return hit
      val enc = encodeWord(word)
      if (memo.size < 262144) memo.put(word, enc)
      enc
    }

    /** Encode one word (no whitespace) into BPE symbols. Classic
      * greedy lowest-rank-first merging over the symbol sequence. */
    def encodeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Nil
      var syms = word.map(_.toString).toVector :+ Eow
      var done = false
      while (!done && syms.length > 1) {
        var bestIdx = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestIdx = i }
          i += 1
        }
        if (bestIdx < 0 || bestRank == Int.MaxValue) done = true
        else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
          syms.drop(bestIdx + 2)
      }
      syms
    }
  }

  /** Learn `numMerges` merges from the corpus word histogram.
    *
    * One distributed aggregation produces (word, count) capped to the
    * `maxWords` most frequent types (deterministic tiebreak on the word
    * itself); the merge loop is driver-side over that histogram. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 50000): Model = {
    require(numMerges >= 1 && maxWords >= 1, s"bad ($numMerges, $maxWords)")
    val hist: Array[(String, Long)] = df
      .select(explode(split(regexp_replace(lower(col(textCol)), "\\s+", " "), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromHistogram(hist, numMerges)
  }

  /** The classic BPE loop over a bounded (word, count) histogram. */
  def trainFromHistogram(hist: Array[(String, Long)], numMerges: Int): Model = {
    // each word as a mutable symbol sequence, weighted by its count
    var words: Array[(Vector[String], Long)] =
      hist.map { case (w, c) => (w.map(_.toString).toVector :+ Eow, c) }
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max by count, ties broken lexicographically — deterministic
        var best: ((String, String), Long) = null
        counts.foreach { case (p, c) =>
          if (best == null || c > best._2 ||
              (c == best._2 && (p._1 + " " + p._2) < (best._1._1 + " " + best._1._2)))
            best = (p, c)
        }
        val (l, r) = best._1
        merges += ((l, r))
        val joined = l + r
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), c)
          }
        }
        step += 1
      }
    }
    Model(merges.result())
  }

  /** `bpe_encode(text)`: BPE symbols of the whitespace-normalized text,
    * one array per document. The merge table ships inside the expression
    * (broadcast with the serialized plan — the standard small-model
    * distribution path); each row encodes independently, no shuffle.
    * CodegenFallback: the merge loop is data-dependent iteration, which
    * whole-stage codegen cannot inline — the cost is the BPE loop
    * itself, not the dispatch. */
  case class BpeEncode(child: Expression, model: Model)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "bpe_encode"
    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val out = Seq.newBuilder[UTF8String]
      words.foreach(w => model.encodeWordCached(w)
        .foreach(s => out += UTF8String.fromString(s)))
      new GenericArrayData(out.result())
    }
    override protected def withNewChildInternal(c: Expression): BpeEncode =
      copy(child = c)
  }

  /** Encoding column for `text` under `model`. The model ships INSIDE
    * the serialized expression, so the Column is built from it directly
    * ([[org.apache.spark.sql.graft.ExprColumn]]) rather than through the
    * session function registry — registry binding is session-shared
    * mutable state, and two concurrently-planned queries with different
    * models under one name would resolve whichever registered last. */
  def encode(spark: SparkSession, text: Column, model: Model): Column =
    org.apache.spark.sql.graft.ExprColumn(
      BpeEncode(org.apache.spark.sql.graft.ExprColumn.expr(text), model))

  /** Decode = concatenate symbols and split words at the EOW marker —
    * the roundtrip invariant `decode(encode(t)) == normalize(t)` is the
    * in-query correctness verdict for the gate. */
  def decode(tokens: Column): Column =
    rtrim(regexp_replace(array_join(tokens, ""), java.util.regex.Pattern.quote(Eow), " "))

  /** Durable tokenizer artifact — train once, load everywhere (the same
    * contract as [[graft.similarity.Ivf.save]]/[[graft.similarity.Pq.save]]):
    * the ordered merge table as (rank, left, right) parquet. */
  def save(model: Model, spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .select("rank", "left", "right").collect()
    require(rows.nonEmpty, s"empty BPE model at $path")
    val byRank = rows.map(r => (r.getInt(0), (r.getString(1), r.getString(2))))
    // ranks must be a dense 0..n-1 permutation — a partially-written
    // artifact is an integrity error, not a silently reordered table
    require(byRank.map(_._1).sorted.sameElements(byRank.indices),
      s"corrupt BPE model at $path: non-dense ranks over ${byRank.length} rows")
    Model(byRank.sortBy(_._1).map(_._2).toSeq)
  }
}
