package graft

import org.apache.spark.sql.functions._
import graft.operators.FftOp
import graft.sources.Fake

class FftSpec extends SparkSpec {

  test("oscillator 1Hz+2Hz+3Hz spectrum peaks at those frequencies") {
    // mirrors the reference's fft2d golden fixture: 3 components, 16Hz+ sampling
    val osc = Fake.oscillator(spark,
      Seq(Fake.Freq(1.0, 1.0), Fake.Freq(2.0, 2.0), Fake.Freq(3.0, 3.0)),
      fromNs = 0L, durNs = 4L * 1000000000L, periodNs = 1000000000L / 64)
      .withColumn("key", lit("osc"))
    val spec = FftOp.perKey(osc, "key", "time", "value", 0.1, 10.0)
      .orderBy(col("amp").desc).select("hz", "amp")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val top3 = spec.take(3).sortBy(_._1)
    assert(math.abs(top3(0)._1 - 1.0) < 0.3, s"got ${top3.toSeq}")
    assert(math.abs(top3(1)._1 - 2.0) < 0.3)
    assert(math.abs(top3(2)._1 - 3.0) < 0.3)
    // amplitudes recovered within ~5% (power-of-two length, integral cycles)
    assert(math.abs(top3(0)._2 - 1.0) < 0.1)
    assert(math.abs(top3(1)._2 - 2.0) < 0.1)
    assert(math.abs(top3(2)._2 - 3.0) < 0.1)
  }

  test("series shorter than 16 samples yields no spectrum (reference rule)") {
    val short = Fake.oscillator(spark, Seq(Fake.Freq(1.0, 1.0)),
      0L, 10L * 62500000L, 62500000L).withColumn("key", lit("s"))
    assert(FftOp.perKey(short, "key", "time", "value").count() == 0)
  }

  test("radix-2 fft matches a direct DFT") {
    val n = 32
    val xs = Array.tabulate(n)(i => math.sin(2 * math.Pi * 3 * i / n) + 0.5 * math.cos(2 * math.Pi * 5 * i / n))
    val re = xs.clone(); val im = new Array[Double](n)
    FftOp.fft(re, im)
    var k = 0
    while (k < n) {
      var dr = 0d; var di = 0d
      var i = 0
      while (i < n) {
        val a = -2 * math.Pi * k * i / n
        dr += xs(i) * math.cos(a); di += xs(i) * math.sin(a)
        i += 1
      }
      assert(math.abs(re(k) - dr) < 1e-9 && math.abs(im(k) - di) < 1e-9, s"bin $k")
      k += 1
    }
  }
}
