package graft

import org.apache.spark.sql.functions._
import graft.operators.SeqOps

class SeqOpsSpec extends SparkSpec {
  import spark.implicits._

  private def series = Seq(
    ("a", 1L, 10.0), ("a", 2L, 13.0), ("a", 3L, 12.0), ("a", 4L, 12.0), ("a", 5L, 20.0),
    ("b", 1L, 5.0), ("b", 2L, 4.0)
  ).toDF("name", "t", "v")

  test("mapDiff/absdiff/nonegdiff per-series with null first row") {
    val got = series.select($"name", $"t",
      SeqOps.mapDiff($"v", Seq($"name"), $"t").as("d"),
      SeqOps.mapNonNegDiff($"v", Seq($"name"), $"t").as("nn"))
      .orderBy("name", "t").collect()
    assert(got(0).isNullAt(2)) // first of series a
    assert(got(1).getDouble(2) == 3.0)
    assert(got(2).getDouble(2) == -1.0 && got(2).getDouble(3) == 0.0)
    assert(got(5).isNullAt(2)) // first of series b
    assert(got(6).getDouble(2) == -1.0)
  }

  test("movAvg warms up with nulls unless noWait") {
    val got = series.filter($"name" === "a").select($"t",
      SeqOps.movAvg($"v", Seq(lit(1)), $"t", 3).as("m"),
      SeqOps.movAvg($"v", Seq(lit(1)), $"t", 3, noWait = true).as("mn"))
      .orderBy("t").collect()
    assert(got(0).isNullAt(1) && got(1).isNullAt(1))
    assert(got(2).getDouble(1) == (10.0 + 13.0 + 12.0) / 3)
    assert(got(0).getDouble(2) == 10.0) // noWait emits immediately
    assert(got(1).getDouble(2) == 11.5)
  }

  test("lowpass matches the reference recurrence y=(1-a)y+ax") {
    val got = SeqOps.lowpass(series, "name", "t", "v", 0.5)
      .orderBy("name", "t").select("lowpass").as[Double].collect()
    // series a: 10, 11.5, 11.75, 11.875, 15.9375
    assert(got(0) == 10.0 && got(1) == 11.5 && got(2) == 11.75)
    assert(got(4) == 15.9375)
    // series b restarts state: 5, 4.5
    assert(got(5) == 5.0 && got(6) == 4.5)
  }

  test("kalman converges toward observations and resets per series") {
    val got = SeqOps.kalman(series, "name", "t", "v", 1d, 0.01, 1d)
      .orderBy("name", "t").select("kalman").as[Double].collect()
    assert(got(0) == 10.0)             // first observation passes through
    assert(got(1) > 10.0 && got(1) < 13.0) // filtered between prior and obs
    assert(got(5) == 5.0)              // series b resets
  }

  test("filterChanged keeps first row and changes only") {
    val df = Seq(("a", 1L, "x"), ("a", 2L, "x"), ("a", 3L, "y"), ("a", 4L, "y"), ("a", 5L, "x"))
      .toDF("name", "t", "s")
    val got = SeqOps.filterChanged(df, $"s", Seq($"name"), $"t")
      .orderBy("t").select("t").as[Long].collect()
    assert(got.toSeq == Seq(1L, 3L, 5L))
  }

  test("filterChanged(useFirstWithLast) also emits each run's closing row (fm_monad.go:121-238)") {
    val df = Seq(("a", 1L, "x"), ("a", 2L, "x"), ("a", 3L, "x"),
      ("a", 4L, "y"), ("a", 5L, "x"), ("a", 6L, "x"))
      .toDF("name", "t", "s")
    val got = SeqOps.filterChangedFirstLast(df, $"s", Seq($"name"), $"t")
      .orderBy("t").select("t").as[Long].collect()
    // runs: x[1..3], y[4], x[5..6] → openers 1,4,5 + closers 3,4,6; the
    // single-record y run is both, so it's emitted twice (fm_monad.go
    // pair return; task_test.go duplicated single C record)
    assert(got.toSeq == Seq(1L, 3L, 4L, 4L, 5L, 6L))
  }
}
