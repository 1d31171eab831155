package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot array kernels of the dedup /
  * similarity pipeline. The composable `transform`/`aggregate` forms are
  * correct but interpreted per element with closure dispatch; these
  * replace them with single tight JVM loops over the underlying arrays —
  * the preference order from the project brief: custom Expression over
  * UDF over anything else.
  *
  * All are registered as session functions (`ArrayExprs.register`) and
  * invoked via `call_function`, so plans display them by name.
  */
object ArrayExprs {
  private val P = 2147483647L // 2^31-1 Mersenne prime for affine permutations

  /** MinHash signature of a hashed-shingle array: k affine permutations
    * of each element, min per permutation. One pass over the input. */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData].toLongArray()
      val sig = Array.fill(numHashes)(Long.MaxValue)
      val as = new Array[Long](numHashes)
      val bs = new Array[Long](numHashes)
      var j = 0
      while (j < numHashes) {
        as(j) = 1103515245L * (j + 1) % P
        bs(j) = 12345L + 7919L * j
        j += 1
      }
      var i = 0
      while (i < arr.length) {
        val base = java.lang.Math.floorMod(arr(i), P)
        j = 0
        while (j < numHashes) {
          val h = java.lang.Math.floorMod(base * as(j) + bs(j), P)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  /** Sorted-distinct 64-bit hashes of the word-bigram shingles of a text
    * column, in one pass: split, FNV-1a over "wordA wordB", sort, dedupe.
    * Replaces a 5-deep interpreted HOF chain (split → transform → concat
    * → hash → distinct → sort). Output feeds JaccardSorted/MinHashSig. */
  case class BigramHashes(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "bigram_hashes"
    private def fnv1a(acc0: Long, s: String): Long = {
      var acc = acc0
      var i = 0
      while (i < s.length) {
        acc = (acc ^ s.charAt(i)) * 0x100000001b3L
        i += 1
      }
      acc
    }
    override def nullSafeEval(input: Any): Any = {
      val words = input.toString.split(' ')
      if (words.length < 2) return new GenericArrayData(Array.empty[Long])
      val hs = new Array[Long](words.length - 1)
      var i = 0
      while (i < words.length - 1) {
        val h1 = fnv1a(0xcbf29ce484222325L, words(i))
        hs(i) = fnv1a((h1 ^ ' ') * 0x100000001b3L, words(i + 1))
        i += 1
      }
      java.util.Arrays.sort(hs)
      // in-place dedupe of the sorted array
      var w = 0
      i = 0
      while (i < hs.length) {
        if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(hs, w))
    }
    override protected def withNewChildInternal(c: Expression): BigramHashes = copy(child = c)
  }

  /** Jaccard similarity of two SORTED distinct long arrays via merge
    * intersection — O(n+m), no per-call hash set. Full whole-stage
    * codegen (`doGenCode`): the loop runs inline over the UnsafeArrayData
    * without materializing JVM arrays. */
  case class JaccardSorted(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaccard_sorted"
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val (n, m) = (a.numElements(), b.numElements())
      var i = 0; var j = 0; var inter = 0
      while (i < n && j < m) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      val union = n + m - inter
      if (union == 0) 0d else inter.toDouble / union
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val n = ctx.freshName("n"); val m = ctx.freshName("m")
        val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
        int $n = $a.numElements(); int $m = $b.numElements();
        int $i = 0; int $j = 0; int $inter = 0;
        while ($i < $n && $j < $m) {
          long $x = $a.getLong($i); long $y = $b.getLong($j);
          if ($x == $y) { $inter++; $i++; $j++; }
          else if ($x < $y) $i++;
          else $j++;
        }
        int $union = $n + $m - $inter;
        ${ev.value} = ($union == 0) ? 0.0d : ((double) $inter) / $union;
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
      copy(left = l, right = r)
  }

  /** Threshold-aware Jaccard for near-dup filtering: same merge
    * intersection as [[JaccardSorted]] but with two early exits that are
    * safe under a `>= threshold` filter —
    *  1. size-ratio bound: J(A,B) ≤ min(n,m)/max(n,m), so pairs whose
    *     lengths differ too much return 0 before touching the arrays;
    *  2. remaining-elements bound: on each mismatch, if even matching ALL
    *     remaining elements can't reach the threshold, bail out.
    * The result for a pair with true Jaccard ≥ threshold is EXACT (neither
    * exit can fire on it); sub-threshold pairs may return a smaller bound,
    * which the downstream `>= threshold` filter drops either way. Folding
    * the bound into the expression beats a separate size-ratio Filter:
    * no extra predicate evaluation on passing pairs, and the loop itself
    * quits early on the near-misses that dominate blocked self-joins. */
  case class JaccardSortedMin(first: Expression, second: Expression, third: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaccard_sorted_min"
    private lazy val threshold: Double = third.eval() match {
      case d: Double => d
      case other => other.toString.toDouble
    }
    override def nullSafeEval(l: Any, r: Any, t: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val (n, m) = (a.numElements(), b.numElements())
      val thr = threshold
      val lo = math.min(n, m); val hi = math.max(n, m)
      if (lo < thr * hi) return 0d
      var i = 0; var j = 0; var inter = 0
      while (i < n && j < m) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else {
          if (x < y) i += 1 else j += 1
          val interMax = inter + math.min(n - i, m - j)
          if (interMax < thr * (n + m - interMax)) return 0d
        }
      }
      val union = n + m - inter
      if (union == 0) 0d else inter.toDouble / union
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, _) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val n = ctx.freshName("n"); val m = ctx.freshName("m")
        val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        val imax = ctx.freshName("imax"); val done = ctx.freshName("done")
        val thr = threshold
        s"""
        int $n = $a.numElements(); int $m = $b.numElements();
        boolean $done = false;
        ${ev.value} = 0.0d;
        if (java.lang.Math.min($n, $m) < $thr * java.lang.Math.max($n, $m)) $done = true;
        int $i = 0; int $j = 0; int $inter = 0;
        while (!$done && $i < $n && $j < $m) {
          long $x = $a.getLong($i); long $y = $b.getLong($j);
          if ($x == $y) { $inter++; $i++; $j++; }
          else {
            if ($x < $y) $i++; else $j++;
            int $imax = $inter + java.lang.Math.min($n - $i, $m - $j);
            if ($imax < $thr * ($n + $m - $imax)) $done = true;
          }
        }
        if (!$done) {
          int $union = $n + $m - $inter;
          ${ev.value} = ($union == 0) ? 0.0d : ((double) $inter) / $union;
        }
        """
      })
    override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): JaccardSortedMin =
      copy(first = f, second = s, third = t)
  }

  /** Threshold-aware asymmetric containment |A∩B| / |A| over sorted long
    * arrays — the sub-document-duplication kernel. Early exits safe under
    * a `>= threshold` filter:
    *  1. size bound: inter ≤ m, so m < thr·n can never pass;
    *  2. remaining-elements bound: on each mismatch, if matching ALL
    *     remaining elements still lands below thr·n, bail.
    * Exact for passing pairs (neither exit can fire when the true
    * containment is ≥ threshold). */
  case class ContainmentSortedMin(first: Expression, second: Expression, third: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "containment_sorted_min"
    private lazy val threshold: Double = third.eval() match {
      case d: Double => d
      case other => other.toString.toDouble
    }
    override def nullSafeEval(l: Any, r: Any, t: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val (n, m) = (a.numElements(), b.numElements())
      if (n == 0) return 0d
      val thr = threshold
      if (m < thr * n) return 0d
      var i = 0; var j = 0; var inter = 0
      while (i < n && j < m) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else {
          if (x < y) i += 1 else j += 1
          if (inter + math.min(n - i, m - j) < thr * n) return 0d
        }
      }
      inter.toDouble / n
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, _) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val n = ctx.freshName("n"); val m = ctx.freshName("m")
        val inter = ctx.freshName("inter")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        val done = ctx.freshName("done")
        val thr = threshold
        s"""
        int $n = $a.numElements(); int $m = $b.numElements();
        boolean $done = ($n == 0) || ($m < $thr * $n);
        int $i = 0; int $j = 0; int $inter = 0;
        while (!$done && $i < $n && $j < $m) {
          long $x = $a.getLong($i); long $y = $b.getLong($j);
          if ($x == $y) { $inter++; $i++; $j++; }
          else {
            if ($x < $y) $i++; else $j++;
            if ($inter + java.lang.Math.min($n - $i, $m - $j) < $thr * $n) $done = true;
          }
        }
        ${ev.value} = ($done || $n == 0) ? 0.0d : ((double) $inter) / $n;
        """
      })
    override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): ContainmentSortedMin =
      copy(first = f, second = s, third = t)
  }

  /** Cosine similarity of two double arrays in one pass. Accumulation
    * order matches the composed zip_with/aggregate form (index-ascending
    * per accumulator) so oracle-checked results are bit-identical.
    * Generates inline whole-stage code (`doGenCode`). */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_sim"
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0d; var na = 0d; var nb = 0d
      var i = 0
      while (i < n) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0d; double $na = 0.0d; double $nb = 0.0d;
        for (int $i = 0; $i < $n; $i++) {
          double $x = $a.getDouble($i); double $y = $b.getDouble($i);
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
  }

  /** Portable SimHash of a text column in one pass: per word token, one
    * MD5; the token's 64-bit value is the first 8 digest bytes
    * big-endian (== first 16 hex chars), each bit votes ±1, sign packs
    * the output bit. Matches the md5 hex-digit arithmetic an external
    * engine can replay (graft.dedup.Dedup.simhashMd5's oracle). */
  case class SimhashMd5(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_md5"
    override def nullSafeEval(input: Any): Any = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](64)
      for (tok <- input.toString.split(' ')) {
        val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val v = java.nio.ByteBuffer.wrap(d).getLong // first 8 bytes, BE
        var i = 0
        while (i < 64) {
          votes(i) += (if (((v >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      var out = 0L
      var i = 0
      while (i < 64) {
        if (votes(i) > 0) out |= 1L << i
        i += 1
      }
      out
    }
    override protected def withNewChildInternal(c: Expression): SimhashMd5 = copy(child = c)
  }

  @volatile private var registered = Set.empty[SparkSession]

  /** Idempotently register the expressions on a session. */
  def register(spark: SparkSession): Unit = {
    if (registered.contains(spark)) return
    synchronized {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("minhash_sig", exprs => exprs match {
        case Seq(arr, Literal(k: Int, IntegerType)) => MinHashSig(arr, k)
        case _ => throw new IllegalArgumentException("minhash_sig(array<long>, k)")
      }, "built-in")
      reg.createOrReplaceTempFunction("bigram_hashes",
        exprs => BigramHashes(exprs.head), "built-in")
      reg.createOrReplaceTempFunction("jaccard_sorted",
        exprs => JaccardSorted(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("jaccard_sorted_min",
        exprs => JaccardSortedMin(exprs(0), exprs(1), exprs(2)), "built-in")
      reg.createOrReplaceTempFunction("containment_sorted_min",
        exprs => ContainmentSortedMin(exprs(0), exprs(1), exprs(2)), "built-in")
      reg.createOrReplaceTempFunction("cosine_sim",
        exprs => CosineSim(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("simhash_md5",
        exprs => SimhashMd5(exprs.head), "built-in")
      registered += spark
    }
  }

  def bigramHashes(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("bigram_hashes", text)
  }
  def minhashSig(spark: SparkSession, arr: Column, k: Int): Column = {
    register(spark)
    call_function("minhash_sig", arr, org.apache.spark.sql.functions.lit(k))
  }
  def jaccardSorted(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("jaccard_sorted", a, b)
  }
  def jaccardSortedMin(spark: SparkSession, a: Column, b: Column, threshold: Double): Column = {
    register(spark)
    call_function("jaccard_sorted_min", a, b,
      org.apache.spark.sql.functions.lit(threshold))
  }
  def containmentSortedMin(spark: SparkSession, a: Column, b: Column, threshold: Double): Column = {
    register(spark)
    call_function("containment_sorted_min", a, b,
      org.apache.spark.sql.functions.lit(threshold))
  }
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("cosine_sim", a, b)
  }
}
