package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FFT over (time, value) series (reference: mods/tql/fm_fourier.go:23-101,
  * amplitude spectrum via gonum FFT in mods/nums/fft/fft.go).
  *
  * Semantics mirrored from the reference: requires ≥16 samples; sample
  * interval = (t_last - t_first)/(n-1); emits (hz, amplitude) for bins
  * 1..n/2 with amplitude = 2·|X_k|/n, optionally clipped to
  * [minHz, maxHz].
  *
  * Scale design: each series is collected *per group* (collect_list under
  * a hash agg — one shuffle), transformed by an executor-side FFT UDF.
  * One series must fit in an executor task (same constraint any FFT has);
  * different series parallelize freely across the cluster.
  */
object FftOp {
  /** Iterative in-place radix-2 Cooley–Tukey; input padded to a power of
    * two with zeros (standard public-domain formulation). */
  private[graft] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, "fft length must be a power of two")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2d * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1d
        var ci = 0d
        var k = 0
        while (k < len / 2) {
          val er = re(base + k); val ei = im(base + k)
          val or_ = re(base + k + len / 2); val oi = im(base + k + len / 2)
          val pr = or_ * cr - oi * ci
          val pi = or_ * ci + oi * cr
          re(base + k) = er + pr; im(base + k) = ei + pi
          re(base + k + len / 2) = er - pr; im(base + k + len / 2) = ei - pi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Amplitude spectrum of one series sampled at tsSec (seconds).
    * Returns (hz, amp) pairs for bins 1..n/2. */
  private[graft] def spectrum(ts: Array[Double], vs: Array[Double],
                                  minHz: Double, maxHz: Double): Array[(Double, Double)] = {
    val n = vs.length
    if (n < 16) return Array.empty
    val dt = (ts(n - 1) - ts(0)) / (n - 1)
    if (dt <= 0) return Array.empty
    var m = 1
    while (m < n) m <<= 1
    val re = new Array[Double](m)
    val im = new Array[Double](m)
    System.arraycopy(vs, 0, re, 0, n)
    fft(re, im)
    val out = Array.newBuilder[(Double, Double)]
    var k = 1
    while (k <= n / 2) {
      val hz = k.toDouble / (m * dt)
      if (hz >= minHz && hz <= maxHz) {
        val amp = 2d * math.hypot(re(k), im(k)) / n
        out += ((hz, amp))
      }
      k += 1
    }
    out.result()
  }

  /** Per-key FFT: df(keyCol, timeNsCol, valueCol) → (key, hz, amp). */
  def perKey(df: DataFrame, keyCol: String, timeNsCol: String, valueCol: String,
             minHz: Double = 0d, maxHz: Double = Double.MaxValue): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fftUdf = udf { (ts: Seq[Double], vs: Seq[Double]) =>
      spectrum(ts.toArray, vs.toArray, minHz, maxHz)
        .map { case (h, a) => (h, a) }
    }
    df.groupBy(col(keyCol).as("key"))
      .agg(sort_array(collect_list(struct(col(timeNsCol).as("t"), col(valueCol).as("v")))).as("pts"))
      .select(col("key"),
        explode(fftUdf(
          expr("transform(pts, p -> cast(p.t as double) / 1e9)"),
          expr("transform(pts, p -> p.v)"))).as("bin"))
      .select(col("key"), col("bin._1").as("hz"), col("bin._2").as("amp"))
  }
}
