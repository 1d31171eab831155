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

  /** Arbitrary-length DFT via Bluestein's chirp-z algorithm (public
    * formulation, L. Bluestein 1970): X_k = c_k · (a ⊛ b)_k with
    * a_j = x_j·e^{-iπj²/n}, b_j = e^{+iπj²/n}, convolved through a
    * power-of-two FFT. Needed because the reference's spectra are
    * computed at the exact sample count (gonum fourier), not padded. */
  private[graft] def dft(xRe: Array[Double], xIm: Array[Double]): (Array[Double], Array[Double]) = {
    val n = xRe.length
    if ((n & (n - 1)) == 0) { // power of two: direct radix-2
      val re = xRe.clone(); val im = xIm.clone()
      fft(re, im)
      return (re, im)
    }
    var m = 1
    while (m < 2 * n - 1) m <<= 1
    // chirp c_j = e^{-iπ j²/n}; j² taken mod 2n to keep the angle exact
    val cRe = new Array[Double](n)
    val cIm = new Array[Double](n)
    var j = 0
    while (j < n) {
      val q = (j.toLong * j) % (2L * n)
      val ang = -math.Pi * q / n
      cRe(j) = math.cos(ang); cIm(j) = math.sin(ang)
      j += 1
    }
    val aRe = new Array[Double](m); val aIm = new Array[Double](m)
    val bRe = new Array[Double](m); val bIm = new Array[Double](m)
    j = 0
    while (j < n) {
      // a = x·c ; b = conj(chirp) arranged circularly for indices ±j
      aRe(j) = xRe(j) * cRe(j) - xIm(j) * cIm(j)
      aIm(j) = xRe(j) * cIm(j) + xIm(j) * cRe(j)
      bRe(j) = cRe(j); bIm(j) = -cIm(j)
      if (j != 0) { bRe(m - j) = cRe(j); bIm(m - j) = -cIm(j) }
      j += 1
    }
    fft(aRe, aIm); fft(bRe, bIm)
    var i = 0
    while (i < m) {
      val r = aRe(i) * bRe(i) - aIm(i) * bIm(i)
      val im2 = aRe(i) * bIm(i) + aIm(i) * bRe(i)
      aRe(i) = r; aIm(i) = im2
      i += 1
    }
    // inverse FFT via conjugation
    i = 0
    while (i < m) { aIm(i) = -aIm(i); i += 1 }
    fft(aRe, aIm)
    i = 0
    while (i < m) { aRe(i) /= m; aIm(i) = -aIm(i) / m; i += 1 }
    val outRe = new Array[Double](n)
    val outIm = new Array[Double](n)
    var k = 0
    while (k < n) {
      outRe(k) = aRe(k) * cRe(k) - aIm(k) * cIm(k)
      outIm(k) = aRe(k) * cIm(k) + aIm(k) * cRe(k)
      k += 1
    }
    (outRe, outIm)
  }

  /** Amplitude spectrum of one series with the reference's conventions
    * (mods/nums/fft/fft.go): exact-N DFT; period = n / (duration_ns/1e9);
    * hz_i = (i/n)·period; amplitude = 2·|X_i|/n; bin 0 skipped;
    * [minHz, maxHz] inclusive; ≥16 samples. Duration is measured in
    * int64 ns (exact) — float subtraction of epoch seconds would lose
    * the last µs digits to cancellation. */
  private[graft] def spectrum(tsNs: Array[Long], vs: Array[Double],
                              minHz: Double, maxHz: Double): Array[(Double, Double)] = {
    val n = vs.length
    if (n < 16) return Array.empty
    val durNs = tsNs(n - 1) - tsNs(0)
    if (durNs <= 0) return Array.empty
    val durSec = durNs.toDouble / 1e9
    val period = n.toDouble / durSec
    val (re, im) = dft(vs, new Array[Double](n))
    val out = Array.newBuilder[(Double, Double)]
    var k = 1
    while (k <= n / 2) {
      val hz = k.toDouble / n * period
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
    val fftUdf = udf { (ts: Seq[Long], vs: Seq[Double]) =>
      spectrum(ts.toArray, vs.toArray, minHz, maxHz)
        .map { case (h, a) => (h, a) }
    }
    df.groupBy(col(keyCol).as("key"))
      .agg(sort_array(collect_list(struct(col(timeNsCol).as("t"), col(valueCol).as("v")))).as("pts"))
      .select(col("key"),
        explode(fftUdf(
          expr("transform(pts, p -> cast(p.t as bigint))"),
          expr("transform(pts, p -> p.v)"))).as("bin"))
      .select(col("key"), col("bin._1").as("hz"), col("bin._2").as("amp"))
  }
}
