package graft

import org.apache.spark.sql.functions._

/** DoReMi domain reweighting (text/Doremi): group-DRO multiplicative
  * weights over per-domain excess log-loss — simplex invariants,
  * ordering, determinism across partitionings, and the quota
  * composition. */
class DoremiSpec extends SparkSpec {

  // 3 domains with cleanly separated proxy quality: domain a is
  // well-predicted (p matches y), c is badly predicted, b mixed.
  private lazy val cal = {
    val s = spark
    import s.implicits._
    val rows = (0 until 30).map { i =>
      val d = i % 3 match { case 0 => "a"; case 1 => "b"; case _ => "c" }
      val y = if (i % 2 == 0) 1L else 0L
      val p = d match {
        case "a" => if (y == 1) 0.9 else 0.1       // low loss
        case "b" => 0.5                            // medium loss
        case _   => if (y == 1) 0.2 else 0.8       // high loss
      }
      (i.toLong, d, p, y)
    }
    rows.toDF("doc_id", "source", "p", "label")
  }

  test("weights live on the simplex and follow excess loss") {
    val w = graft.text.Doremi.domainWeights(cal, "source", "p", "label")
      .orderBy("source").collect()
    assert(w.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    val weights = w.map(_.getDouble(3))
    val losses = w.map(_.getDouble(2))
    // simplex: sums to 1 within the 6-dp pins
    assert(math.abs(weights.sum - 1.0) < 1e-4, weights.toSeq)
    // the uniform smoothing floor keeps every domain sampled
    assert(weights.forall(_ >= 0.1 / 3 - 1e-9), weights.toSeq)
    // losses ordered a < b < c; both a and b sit below the weighted
    // mean so their excess hinges at 0 (equal smoothed shares), while
    // the above-average domain takes the excess-loss weight
    assert(losses(0) < losses(1) && losses(1) < losses(2), losses.toSeq)
    assert(weights(0) <= weights(1) && weights(1) < weights(2), weights.toSeq)
    // the worst domain dominates after 5 exponentiated-gradient steps
    assert(weights(2) > 0.5, weights.toSeq)
    assert(w.map(_.getLong(1)).toSeq == Seq(10L, 10L, 10L))
  }

  test("bit-identical across partitionings") {
    val a = graft.text.Doremi.domainWeights(cal.repartition(1), "source", "p", "label")
      .orderBy("source").collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    val b = graft.text.Doremi.domainWeights(cal.repartition(7, col("doc_id")), "source", "p", "label")
      .orderBy("source").collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    assert(a.toSeq == b.toSeq)
  }

  test("resample draws floor(w*budget+0.5) per domain via md5 rank") {
    val picked = graft.text.Doremi.resample(cal, cal, "source", "doc_id",
      "p", "label", budget = 12)
    val w = graft.text.Doremi.domainWeights(cal, "source", "p", "label")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val byDomain = picked.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((d, wd) <- w) {
      val quota = math.floor(wd * 12 + 0.5).toLong
      // each domain has 10 docs; quota may exceed supply
      assert(byDomain.getOrElse(d, 0L) == math.min(quota, 10L), s"$d $quota $byDomain")
    }
    // deterministic selection: same call, same ids
    val ids1 = picked.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val ids2 = graft.text.Doremi.resample(cal, cal, "source", "doc_id",
      "p", "label", budget = 12).orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids1 == ids2)
  }
}
