package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the BENCH_CANONICAL.json acceptance rule (r17 verdict §3: a
  * pristine-but-SLOWER run must not clobber the faster committed
  * record; r18 adds the total gate). Pure-function spec — no Spark. */
class BenchGateSpec extends AnyFunSuite {
  test("accepts a pristine faster record") {
    assert(Bench.canonAccept(drift = 1.00, sfMatches = true,
      prevTotal = Some(150.0), total = 120.0))
  }
  test("accepts within the 2% tolerance") {
    assert(Bench.canonAccept(1.02, sfMatches = true, Some(100.0), 101.9))
  }
  test("rejects a pristine but slower record (the r17 hole)") {
    assert(!Bench.canonAccept(0.97, sfMatches = true, Some(149.67), 156.0))
  }
  test("rejects drifted runs regardless of speed") {
    assert(!Bench.canonAccept(1.20, sfMatches = true, Some(150.0), 100.0))
    assert(!Bench.canonAccept(0.80, sfMatches = true, Some(150.0), 100.0))
  }
  test("rejects an sf mismatch even when fast and quiet") {
    assert(!Bench.canonAccept(1.00, sfMatches = false, Some(150.0), 10.0))
  }
  test("no existing canonical: pristineness alone gates") {
    assert(Bench.canonAccept(1.00, sfMatches = true, None, 999.0))
    assert(!Bench.canonAccept(1.30, sfMatches = true, None, 1.0))
  }
}
