package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, MathContext, RoundingMode}

/** Bit-exact reimplementation of Go's `math.Sin` (the routine the
  * reference uses to generate oscillator samples — fm_fake.go:486-503 →
  * Go stdlib). Go's sine is Cephes-derived (published coefficients,
  * Moshier's cmath) with an exact Payne–Hanek argument reduction against
  * 4/π for large inputs; the JVM's Math.sin/StrictMath.sin are fdlibm
  * lineage and differ from it by 1 ulp on large arguments, which shows in
  * JSON precision(16) goldens. The 4/π fixed-point table is COMPUTED here
  * at class-init from a Machin-formula π (no table copied), and the
  * polynomial kernel uses the published Cephes coefficients.
  */
object GoMath {
  // Cephes sin/cos polynomial coefficients (Moshier, public)
  private val S = Array(
    1.58962301576546568060e-10, -2.50507477628578072866e-8,
    2.75573136213857245213e-6, -1.98412698295895385996e-4,
    8.33333333332211858878e-3, -1.66666666666666307295e-1)
  private val C = Array(
    -1.13585365213876817300e-11, 2.08757008419747316778e-9,
    -2.75573141792967388112e-7, 2.48015872888517179954e-5,
    -1.38888888888730564116e-3, 4.16666666666665929218e-2)
  // π/4 split into three parts for extended-precision modular arithmetic
  private val PI4A = 7.85398125648498535156e-1
  private val PI4B = 3.77489470793079817668e-8
  private val PI4C = 2.69515142907905952645e-15
  private val ReduceThreshold = (1L << 29).toDouble

  /** π to ~800 decimal digits via Machin: π = 16·atan(1/5) − 4·atan(1/239). */
  private def bigPi(digits: Int): JBigDecimal = {
    val mc = new MathContext(digits + 10, RoundingMode.HALF_EVEN)
    def atanInv(n: Int): JBigDecimal = {
      // atan(1/n) = Σ (-1)^k / ((2k+1) n^(2k+1))
      val nSq = JBigDecimal.valueOf(n.toLong * n)
      var term = JBigDecimal.ONE.divide(JBigDecimal.valueOf(n), mc)
      var sum = term
      var k = 1
      val eps = JBigDecimal.ONE.movePointLeft(digits + 8)
      while (term.abs.compareTo(eps) > 0) {
        term = term.divide(nSq, mc)
        val add = term.divide(JBigDecimal.valueOf(2L * k + 1), mc)
        sum = if (k % 2 == 1) sum.subtract(add, mc) else sum.add(add, mc)
        k += 1
      }
      sum
    }
    atanInv(5).multiply(JBigDecimal.valueOf(16))
      .subtract(atanInv(239).multiply(JBigDecimal.valueOf(4)))
      .round(new MathContext(digits, RoundingMode.HALF_EVEN))
  }

  /** 4/π as fixed-point 64-bit words: word(i) = ⌊(4/π)·2^(64i)⌋ mod 2^64. */
  private val MPi4: Array[Long] = {
    val words = 40 // covers digit+3 for every finite double exponent
    val bits = words * 64
    val pi = bigPi(math.ceil(bits * math.log10(2.0)).toInt + 30)
    val mc = new MathContext(850, RoundingMode.HALF_EVEN)
    val fourOverPi = JBigDecimal.valueOf(4).divide(pi, mc)
    val scaled = fourOverPi.multiply(new JBigDecimal(BigInteger.ONE.shiftLeft(bits - 64)))
      .toBigInteger // = floor(4/π · 2^(64·(words-1)))
    val out = new Array[Long](words)
    val low64 = BigInteger.ONE.shiftLeft(64).subtract(BigInteger.ONE)
    var rest = scaled
    var i = words - 1
    while (i >= 0) {
      out(i) = rest.and(low64).longValue()
      rest = rest.shiftRight(64)
      i -= 1
    }
    out
  }

  private final val Shift = 52
  private final val Mask = 0x7ffL
  private final val Bias = 1023

  private def unsignedMulHi(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    hi + (if (a < 0) b else 0L) + (if (b < 0) a else 0L)
  }

  /** Payne–Hanek reduction: x ≥ ReduceThreshold → (octant j, reduced z). */
  private def trigReduce(x: Double): (Long, Double) = {
    val PI4 = math.Pi / 4
    if (x < PI4) return (0L, x)
    var ix = java.lang.Double.doubleToLongBits(x)
    val exp = ((ix >>> Shift) & Mask).toInt - Bias - Shift
    ix &= ~(Mask << Shift)
    ix |= 1L << Shift
    // align so the product's leading digit lands at exponent -61
    val digit = ((exp + 61) / 64).toInt
    val bitshift = (exp + 61) % 64
    val (z0, z1, z2) =
      if (bitshift == 0)
        (MPi4(digit), MPi4(digit + 1), MPi4(digit + 2))
      else
        ((MPi4(digit) << bitshift) | (MPi4(digit + 1) >>> (64 - bitshift)),
         (MPi4(digit + 1) << bitshift) | (MPi4(digit + 2) >>> (64 - bitshift)),
         (MPi4(digit + 2) << bitshift) | (MPi4(digit + 3) >>> (64 - bitshift)))
    val z2hi = unsignedMulHi(z2, ix)
    val z1hi = unsignedMulHi(z1, ix)
    val z1lo = z1 * ix
    val z0lo = z0 * ix
    val lo = z1lo + z2hi
    val c = if (java.lang.Long.compareUnsigned(lo, z1lo) < 0) 1L else 0L
    val hi0 = z0lo + z1hi + c
    var j = hi0 >>> 61
    var hi = (hi0 << 3) | (lo >>> 61)
    val lz = java.lang.Long.numberOfLeadingZeros(hi)
    val e = (Bias - (lz + 1)).toLong
    // clear the implicit mantissa bit and shift into place (JVM shifts are
    // mod-64, unlike Go's saturating shifts — guard the lz=63 case)
    hi =
      if (lz + 1 >= 64) lo << 3
      else (hi << (lz + 1)) | ((lo << 3) >>> (64 - (lz + 1)))
    hi >>>= 64 - Shift
    hi |= e << Shift
    var z = java.lang.Double.longBitsToDouble(hi) // the FRACTION in [0,1)
    if ((j & 1L) == 1L) {
      j += 1
      j &= 7
      z -= 1d // map zeros to origin in fraction space
    }
    (j, z * PI4)
  }

  /** Go math.Sin. */
  def sin(x0: Double): Double = {
    if (x0 == 0d || x0.isNaN) return x0
    if (x0.isInfinite) return Double.NaN
    var x = x0
    var sign = false
    if (x < 0) { x = -x; sign = true }
    var j = 0L
    var y = 0d
    var z = 0d
    if (x >= ReduceThreshold) {
      val r = trigReduce(x)
      j = r._1; z = r._2
    } else {
      j = (x * (4 / math.Pi)).toLong
      y = j.toDouble
      if ((j & 1L) == 1L) { j += 1; y += 1 }
      j &= 7
      z = ((x - y * PI4A) - y * PI4B) - y * PI4C
    }
    if (j > 3) { sign = !sign; j -= 4 }
    val zz = z * z
    y =
      if (j == 1 || j == 2)
        1.0 - 0.5 * zz + zz * zz *
          ((((((C(0) * zz) + C(1)) * zz + C(2)) * zz + C(3)) * zz + C(4)) * zz + C(5))
      else
        z + z * zz *
          ((((((S(0) * zz) + S(1)) * zz + S(2)) * zz + S(3)) * zz + S(4)) * zz + S(5))
    if (sign) -y else y
  }

  /** Go math.Cos (same kernel, shifted octant). */
  def cos(x0: Double): Double = {
    if (x0.isNaN) return Double.NaN
    if (x0.isInfinite) return Double.NaN
    var x = math.abs(x0)
    var sign = false
    var j = 0L
    var y = 0d
    var z = 0d
    if (x >= ReduceThreshold) {
      val r = trigReduce(x)
      j = r._1; z = r._2
    } else {
      j = (x * (4 / math.Pi)).toLong
      y = j.toDouble
      if ((j & 1L) == 1L) { j += 1; y += 1 }
      j &= 7
      z = ((x - y * PI4A) - y * PI4B) - y * PI4C
    }
    if (j > 3) { j -= 4; sign = !sign }
    if (j > 1) sign = !sign
    val zz = z * z
    y =
      if (j == 1 || j == 2)
        z + z * zz *
          ((((((S(0) * zz) + S(1)) * zz + S(2)) * zz + S(3)) * zz + S(4)) * zz + S(5))
      else
        1.0 - 0.5 * zz + zz * zz *
          ((((((C(0) * zz) + C(1)) * zz + C(2)) * zz + C(3)) * zz + C(4)) * zz + C(5))
    if (sign) -y else y
  }
}
