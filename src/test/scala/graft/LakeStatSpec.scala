package graft

import org.apache.spark.sql.functions._
import graft.operators.{Lake, StatOps}
import graft.functions.{MomentAgg, StatFns}

class LakeStatSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks latest right row at-or-before, null when none") {
    val left = Seq(("k", 5L, "l1"), ("k", 15L, "l2"), ("k", 1L, "l0"))
      .toDF("key", "t", "tag")
    val right = Seq(("k", 2L, 10.0), ("k", 10L, 20.0), ("k", 15L, 30.0))
      .toDF("key", "rt", "rv")
    val got = Lake.asofJoin(left, right, "key", "t", "rt", Seq("rv"))
      .orderBy("t").select("tag", "right_rv").collect()
    assert(got(0).isNullAt(1))                   // t=1: no right ≤ 1
    assert(got(1).getDouble(1) == 10.0)          // t=5 → rt=2
    assert(got(2).getDouble(1) == 30.0)          // t=15 → rt=15 (inclusive)
  }

  test("asofJoinSliced is bit-identical to asofJoin (slice-boundary handoff)") {
    // hot key + empty slices + a key with no right rows: the handoff
    // must carry the last right value across arbitrarily many empty
    // slices and yield null where the unsliced kernel does.
    val rnd = new scala.util.Random(7)
    val left = (1 to 500).map { i =>
      (if (i % 5 == 0) "hot" else if (i % 97 == 0) "orphan" else s"k${i % 7}",
        rnd.nextInt(10000).toLong, i)
    }.toDF("key", "t", "lid")
    val right = (1 to 250).map { i => // i*31: unique right times, no sort ties
      (if (i % 3 == 0) "hot" else s"k${i % 7}", i * 31L, i * 1.5)
    }.toDF("key", "rt", "rv")
    val plain = Lake.asofJoin(left, right, "key", "t", "rt", Seq("rv"))
      .orderBy("key", "t", "lid").collect().map(_.toSeq)
    val sliced = Lake.asofJoinSliced(left, right, "key", "t", "rt", Seq("rv"), 500L)
      .orderBy("key", "t", "lid").collect().map(_.toSeq)
    assert(sliced.toSeq == plain.toSeq)

    // and on the q_asof_join-shaped signup/purchase data from the sf tables
    val e0 = spark.read.parquet(s"$sf/events.parquet")
    val base = e0.select($"event_id", $"user_id",
      graft.queries.Q.tsUs(e0).as("t_us"), $"event_type", $"value")
    val signups = base.filter($"event_type" === "signup")
      .select("event_id", "user_id", "t_us")
    val purchases = base.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"t_us").agg(max($"value").as("value")) // unique times: no sort-tie ambiguity
    val p1 = Lake.asofJoin(signups, purchases, "user_id", "t_us", "t_us", Seq("value"))
      .orderBy("event_id").collect().map(_.toSeq)
    val p2 = Lake.asofJoinSliced(signups, purchases, "user_id", "t_us", "t_us",
      Seq("value"), 86400L * 1000000L)
      .orderBy("event_id").collect().map(_.toSeq)
    assert(p2.toSeq == p1.toSeq)
  }

  test("lastPerTag and tagStat agree with brute force") {
    val e0 = spark.read.parquet(s"$sf/events.parquet")
    val e = e0.select($"user_id",
      graft.queries.Q.tsUs(e0).as("t"), $"value")
    val last = Lake.lastPerTag(e, $"user_id", $"t", $"value")
    val brute = e.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("t").desc)))
      .filter($"rn" === 1).select($"user_id".as("name"), $"value".as("bv"))
    val joined = last.join(brute, "name")
      .filter($"last_value" =!= $"bv").count()
    assert(joined == 0)
  }

  test("histogram bins include empty bins; out-of-range lands in ±Inf edges") {
    val df = Seq(1.0, 2.0, 2.5, 9.9, -5.0, 10.0).toDF("v")
    val h = StatOps.histogram(spark, df, $"v", 0d, 10d, 2.5)
      .select("low", "count").as[(Double, Long)].collect().toSeq
    // -5 → -Inf edge, 10.0 → +Inf edge (low = 10.0); 2.5 lands in bin 1
    assert(h == Seq((Double.NegativeInfinity, 1L), (0.0, 2L), (2.5, 1L),
      (5.0, 0L), (7.5, 1L), (10.0, 1L)))

    // edges are skipped when empty (fm_stat.go:100-115)
    val inRange = Seq(1.0, 6.0).toDF("v")
    val h2 = StatOps.histogram(spark, inRange, $"v", 0d, 10d, 2.5)
      .select("low", "count").as[(Double, Long)].collect().toSeq
    assert(h2 == Seq((0.0, 1L), (2.5, 0L), (5.0, 1L), (7.5, 0L)))
  }

  test("moment aggregator matches two-pass central moment") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 10.0)
    val df = xs.toDF("v")
    val got = df.agg(MomentAgg.moment($"v", 3)).as[Double].head()
    val mu = xs.sum / xs.size
    val want = xs.map(x => math.pow(x - mu, 3)).sum / xs.size
    assert(math.abs(got - want) < 1e-9)
  }

  test("entropy/cdf/rss/rms compose correctly") {
    val df = Seq(0.5, 0.25, 0.25).toDF("v") // a proper distribution
    val e = df.agg(StatFns.entropy($"v")).as[Double].head()
    val want = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
    assert(math.abs(e - want) < 1e-12)
    assert(df.agg(StatFns.cdf($"v", 0.25)).as[Double].head() == 2.0 / 3.0)
    assert(math.abs(df.agg(StatFns.rms($"v")).as[Double].head() -
      math.sqrt((0.25 + 0.0625 + 0.0625) / 3)) < 1e-12)
  }
}
