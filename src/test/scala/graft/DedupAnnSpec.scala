package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.similarity.Ann

class DedupAnnSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps lowest id per content") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "txt")
    val got = Dedup.exact(df, Seq("txt"), "id").orderBy("id")
      .select("id", "n_dups").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("jaccard of identical docs is 1, disjoint is 0") {
    val df = Seq(
      (1L, "blk", "a b c d e f"),
      (2L, "blk", "a b c d e f"),
      (3L, "blk", "q r s t u v")).toDF("doc_id", "source", "text")
    val got = Dedup.jaccardPairs(df, "source", 0.0)
      .orderBy("doc_a", "doc_b")
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(got.length == 3)
    assert(got(0) == ((1L, 2L, 1.0)))
    assert(got(1)._3 == 0.0 && got(2)._3 == 0.0)
  }

  test("jaccard_sorted_min agrees with jaccard_sorted at every threshold") {
    // random sorted-distinct long arrays; the threshold-aware kernel must
    // emit the EXACT jaccard for every pair at-or-above threshold and
    // never let a sub-threshold pair through (early exits return bounds
    // below the threshold by construction)
    val rnd = new scala.util.Random(42)
    val arrs = (0 until 40).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(30))).map(_ => rnd.nextInt(40).toLong)
        .distinct.sorted.toArray)
    }
    val df = arrs.toDF("id", "arr")
    val a = df.select(col("id").as("ia"), col("arr").as("aa"))
    val b = df.select(col("id").as("ib"), col("arr").as("ab"))
    val joined = a.crossJoin(b).filter(col("ia") < col("ib"))
    for (thr <- Seq(0.0, 0.2, 0.5, 0.9)) {
      val both = joined.select(
        graft.functions.ArrayExprs.jaccardSorted(spark, col("aa"), col("ab")).as("exact"),
        graft.functions.ArrayExprs.jaccardSortedMin(spark, col("aa"), col("ab"), thr).as("fast"))
        .as[(Double, Double)].collect()
      both.foreach { case (exact, fast) =>
        if (exact >= thr) assert(fast == exact, s"thr=$thr")
        else assert(fast < thr, s"thr=$thr exact=$exact fast=$fast")
      }
    }
    // interpreted path (no codegen): same contract
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val ga = new GenericArrayData(Array(1L, 2L, 3L, 4L))
    val gb = new GenericArrayData(Array(3L, 4L, 5L, 6L))
    val e = graft.functions.ArrayExprs.JaccardSortedMin(
      Literal.create(ga, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)),
      Literal.create(gb, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)),
      Literal(0.2))
    assert(e.eval(null) == 2.0 / 6.0)
  }

  test("minhash LSH finds the true near-duplicate pair") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val nearDup = base.replace("today", "tonight")
    val other = "completely different content with no overlap whatsoever in any shingle at all"
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val got = Dedup.minhashLshPairs(df, numHashes = 32, bands = 8, verifyThreshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L)))
  }

  test("simhash hamming distance: near-dups close, unrelated far") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val sh = Dedup.simhash(df, $"text").select("doc_id", "simhash").as[(Long, Long)]
      .collect().toMap
    val dNear = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    val dFar = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    assert(dNear < dFar, s"near=$dNear far=$dFar")
  }

  test("simhashMd5 single-pass form matches a JVM recomputation") {
    val df = Seq((1L, "alpha beta gamma delta"),
      (2L, "one two one two one")).toDF("doc_id", "text")
    val got = Dedup.simhashMd5(df, $"text").select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    // reference model: votes over md5-derived bits, duplicates counted
    def jvmSimhash(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](64)
      for (tok <- text.split(" ")) {
        val hex = md.digest(tok.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(16)
        val v = java.lang.Long.parseUnsignedLong(hex, 16)
        for (i <- 0 until 64)
          votes(i) += (if (((v >>> i) & 1L) == 1L) 1 else -1)
      }
      (0 until 64).map(i => if (votes(i) > 0) 1L << i else 0L)
        .foldLeft(0L)(_ | _)
    }
    assert(got(1L) == jvmSimhash("alpha beta gamma delta"))
    assert(got(2L) == jvmSimhash("one two one two one"))
  }

  test("brute-force topK ranks an identical vector first") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0)
    val top = Ann.bruteForceTopK(q, emb, k = 5)
    val rows = top.orderBy("rnk").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Double]("cos_sim")).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("hardNegatives guards its broadcast: replicated NL above the query-count threshold") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter($"vec_id" < 5)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "rnk").collect().toSeq
    // small query set → broadcast (one corpus pass, no shuffle)
    val small = Ann.hardNegatives(q, emb, k = 3, labelCol = "label")
    val smallPlan = small.queryExecution.executedPlan.toString
    assert(smallPlan.contains("BroadcastNestedLoopJoin"), smallPlan)
    // above the guard → shuffle-replicated nested loop: block-pair
    // parallel, neither side on the driver or a single executor heap
    val big = Ann.hardNegatives(q, emb, k = 3, labelCol = "label",
      broadcastMaxBytes = 2)
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(bigPlan.contains("CartesianProduct"), bigPlan)
    assert(!bigPlan.contains("BroadcastNestedLoopJoin"), bigPlan)
    // the row cap is AND-ed with the byte budget, not OR-ed: a query set
    // over the row cap surrenders the broadcast even when its probed
    // bytes fit (64 KiB forces past the ~190 KB plan-stats tier so the
    // probe tier decides: 5 rows × ~540 B pass the bytes, fail the rows)
    val overRows = Ann.hardNegatives(q, emb, k = 3, labelCol = "label",
      broadcastMaxBytes = 64L << 10, broadcastMaxQueries = 2)
    val overRowsPlan = overRows.queryExecution.executedPlan.toString
    assert(overRowsPlan.contains("CartesianProduct"), overRowsPlan)
    assert(!overRowsPlan.contains("BroadcastNestedLoopJoin"), overRowsPlan)
    // plan shape changes, answers don't
    assert(sorted(small) == sorted(big))
    assert(sorted(small) == sorted(overRows))
  }

  test("LSH topK self-bucket recall: query's own bucket contains it") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3)
    val brute = Ann.bruteForceTopK(q, emb, k = 3).select("qid", "eid").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshTopK(q, emb, k = 3, planes = 6).select("qid", "eid").as[(Long, Long)].collect().toSet
    // approximate: require non-trivial overlap with exact top-3
    assert(lsh.nonEmpty && (brute intersect lsh).nonEmpty)
  }

  test("bigramShingles (composed) is set-equivalent to the native bigramHashes") {
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "one two one two one"), // repeats → distinct shingles
      (3L, "single"), (4L, "")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        graft.dedup.Dedup.bigramShingles(col("text")).as("sh"),
        graft.functions.ArrayExprs.bigramHashes(spark, col("text")).as("bh"))
      .as[(Long, Seq[String], Seq[Long])].collect()
    got.foreach { case (id, sh, bh) =>
      assert(sh.distinct.size == sh.size, s"doc $id shingles not distinct")
      assert(sh.size == bh.distinct.size, s"doc $id: ${sh.size} vs ${bh.distinct.size}")
    }
    val m = got.map(g => g._1 -> g._2).toMap
    assert(m(1L) == Seq("the quick", "quick brown", "brown fox", "fox jumps"))
    assert(m(2L).toSet == Set("one two", "two one"))
    assert(m(3L).isEmpty && m(4L).isEmpty)
  }

  test("connectedComponents clusters similarity edges (chains, triangles, singles)") {
    // components: {1,2,3,4} via a chain, {10,11,12} via a triangle, {20,21}
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("doc_a", "doc_b")
    val got = graft.dedup.Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L), got)
  }

  test("connectedComponents: distributed propagation path matches driver union-find") {
    // the ≤driverMaxEdges short-circuit wins at every spec/gate scale, so
    // force the iterative distributed path (driverMaxEdges = 0) and pin
    // it against the driver result on a graph with a long chain (worst
    // case for label propagation: diameter 12 needs several rounds),
    // a clique, bridges, and singles
    val rnd = new scala.util.Random(7)
    val chain = (0 until 12).map(i => (i.toLong, i + 1L))
    val clique = for (a <- 100 to 104; b <- (a + 1) to 104) yield (a.toLong, b.toLong)
    val bridges = Seq((12L, 100L), (200L, 201L), (300L, 301L), (301L, 302L))
    val edges = rnd.shuffle(chain ++ clique ++ bridges).toDF("doc_a", "doc_b")
    val driver = graft.dedup.Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val dist = graft.dedup.Dedup.connectedComponents(edges, driverMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(dist == driver, s"\ndist=$dist\ndriver=$driver")
    // chain+clique merged through the 12->100 bridge, labeled by min id
    assert(driver(104L) == 0L && driver(302L) == 300L && driver(201L) == 200L)
  }

  test("minhashLshPairsAgainst finds the planted delta-vs-corpus near-dup only") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "entirely different content about spark execution plans here")).toDF("doc_id", "text")
    val delta = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today"), // ~dup of 1
      (101L, "unrelated delta document with fresh words only now")).toDF("doc_id", "text")
    val got = Dedup.minhashLshPairsAgainst(delta, corpus,
        numHashes = 32, bands = 8, verifyThreshold = 0.3)
      .select("in_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 1L)), got)
    // and the pair agrees with the self-join kernel run over the union
    val self = Dedup.minhashLshPairs(corpus.union(delta),
        numHashes = 32, bands = 8, verifyThreshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(self.contains((1L, 100L)), self)
  }

  test("semanticDedup: cell-blocked cosine components, min-id keep") {
    // two coarse cells around the axes; ids 0/1/2 near-dup chain on the
    // x-axis (0~1 and 1~2 above threshold, 0~2 below — transitivity must
    // still cluster all three), 10/11 near-dups on y, 20 a singleton
    val vecs = Seq(
      (0L, Array(1.00f, 0.00f)), (1L, Array(0.998f, 0.06f)),
      (2L, Array(0.99f, 0.12f)),
      (10L, Array(0.00f, 1.00f)), (11L, Array(0.05f, 0.999f)),
      (20L, Array(0.72f, 0.69f))).toDF("vec_id", "embedding")
    val idx = graft.similarity.Ivf.Index(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val got = Dedup.semanticDedup(vecs, idx, threshold = 0.995)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got(0L) == ((0L, true)) && got(1L) == ((0L, false)) &&
      got(2L) == ((0L, false)), got)
    assert(got(10L) == ((10L, true)) && got(11L) == ((10L, false)), got)
    assert(got(20L)._2, got) // singleton keeps itself
  }
}
