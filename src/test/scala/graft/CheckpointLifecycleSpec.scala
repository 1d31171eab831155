package graft

import org.apache.spark.sql.functions._

/** Pins the r19 checkpoint-lifecycle optimization (guide §5): kernels
  * that eager-localCheckpoint an INTERMEDIATE relation free its storage
  * blocks at kernel exit instead of leaving them to the ContextCleaner —
  * a 208-query bench JVM otherwise accumulates dead blocks that compete
  * with execution memory. The returned (still-consumable) frame's own
  * blocks stay alive and readable. */
class CheckpointLifecycleSpec extends SparkSpec {

  private def persistedIds(): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** blocks are dropped asynchronously (unpersist(blocking=false)) —
    * poll briefly before judging. */
  private def eventuallyAtMost(n: Int, baseline: Set[Int]): Unit = {
    var tries = 0
    while (persistedIds().diff(baseline).size > n && tries < 50) {
      Thread.sleep(100); tries += 1
    }
    val leaked = persistedIds().diff(baseline)
    assert(leaked.size <= n,
      s"expected <=$n surviving checkpoint RDDs, found ${leaked.size}: $leaked")
  }

  test("trainAndScore frees the feature relation, keeps the scored result readable") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val base = persistedIds()
    val out = graft.text.QualityClassifier.trainAndScore(
      docs, "doc_id", "text", col("lang") === "en")
    // only the returned scored checkpoint may survive
    eventuallyAtMost(1, base)
    assert(out.count() == docs.count()) // result still consumable
  }

  test("connectedComponents frees edge + round checkpoints, keeps labels readable") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val edges = graft.dedup.Dedup.jaccardPairs(docs, "source", 0.05)
    val base = persistedIds()
    val cc = graft.dedup.Dedup.connectedComponents(edges)
    // driver union-find path: everything freed; distributed path: only
    // the final round's labels survive
    eventuallyAtMost(1, base)
    assert(cc.count() >= 0) // result still consumable
  }

  test("Ivf.train frees its Lloyd sample") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = persistedIds()
    val idx = graft.similarity.Ivf.train(emb, k = 4, iters = 2)
    assert(idx.centroids.nonEmpty)
    eventuallyAtMost(0, base)
  }

  test("kmeans fitStats frees the widened base, keeps the k-row stats readable") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = persistedIds()
    val stats = graft.similarity.Kmeans.fitStats(
      emb, "vec_id", "embedding", k = 4, iters = 2)
    eventuallyAtMost(1, base) // only the k-row result checkpoint survives
    assert(stats.count() <= 4)
  }
}
