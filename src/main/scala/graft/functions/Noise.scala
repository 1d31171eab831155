package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Seeded OpenSimplex noise (Kurt Spencer's public-domain algorithm,
  * "OpenSimplex noise", 2014 — the same algorithm behind the reference's
  * FAKE simplex generator, reference mods/nums/opensimplex). 2-D
  * evaluation; the 1-D form samples the diagonal Eval2(x, x) like the
  * reference's 1-argument dispatch.
  */
object Noise {
  private val Stretch2D = -0.211324865405187 // (1/sqrt(2+1)-1)/2
  private val Squish2D = 0.366025403784439 // (sqrt(2+1)-1)/2
  private val Norm2D = 47d
  private val Grad2: Array[Byte] = Array(
    5, 2, 2, 5, -5, 2, -2, 5, 5, -2, 2, -5, -5, -2, -2, -5)

  private val permCache = new java.util.concurrent.ConcurrentHashMap[Long, Array[Short]]()

  /** Fisher–Yates driven by the LCG the Java reference uses (three warmup
    * steps, then one step per swap with (seed+31) mod (i+1)). */
  private def permTable(seed0: Long): Array[Short] =
    permCache.computeIfAbsent(seed0, { seed1 =>
      val perm = new Array[Short](256)
      val source = Array.tabulate[Short](256)(_.toShort)
      var seed = seed1
      def step(): Unit = { seed = seed * 6364136223846793005L + 1442695040888963407L }
      step(); step(); step()
      var i = 255
      while (i >= 0) {
        step()
        var r = ((seed + 31) % (i + 1)).toInt
        if (r < 0) r += i + 1
        perm(i) = source(r)
        source(r) = source(i)
        i -= 1
      }
      perm
    })

  private def extrapolate(perm: Array[Short], xsb: Int, ysb: Int,
                          dx: Double, dy: Double): Double = {
    val index = perm(((perm(xsb & 0xFF) + ysb) & 0xFF)) & 0x0E
    Grad2(index) * dx + Grad2(index + 1) * dy
  }

  /** 2-D OpenSimplex in ≈[-0.87, 0.87] (raw / 47, like the reference's
    * un-normalized Eval). */
  def simplex2(seed: Long, x: Double, y: Double): Double = {
    val perm = permTable(seed)
    val stretchOffset = (x + y) * Stretch2D
    val xs = x + stretchOffset
    val ys = y + stretchOffset
    var xsb = math.floor(xs).toInt
    var ysb = math.floor(ys).toInt
    val squishOffset = (xsb + ysb).toDouble * Squish2D
    val xb = xsb + squishOffset
    val yb = ysb + squishOffset
    val xins = xs - xsb
    val yins = ys - ysb
    val inSum = xins + yins
    var dx0 = x - xb
    var dy0 = y - yb
    var value = 0d

    // contribution (1,0)
    val dx1 = dx0 - 1 - Squish2D
    val dy1 = dy0 - 0 - Squish2D
    var attn1 = 2 - dx1 * dx1 - dy1 * dy1
    if (attn1 > 0) {
      attn1 *= attn1
      value += attn1 * attn1 * extrapolate(perm, xsb + 1, ysb, dx1, dy1)
    }
    // contribution (0,1)
    val dx2 = dx0 - 0 - Squish2D
    val dy2 = dy0 - 1 - Squish2D
    var attn2 = 2 - dx2 * dx2 - dy2 * dy2
    if (attn2 > 0) {
      attn2 *= attn2
      value += attn2 * attn2 * extrapolate(perm, xsb, ysb + 1, dx2, dy2)
    }

    var dxExt = 0d; var dyExt = 0d
    var xsvExt = 0; var ysvExt = 0
    if (inSum <= 1) { // inside the (0,0) simplex
      val zins = 1 - inSum
      if (zins > xins || zins > yins) {
        if (xins > yins) {
          xsvExt = xsb + 1; ysvExt = ysb - 1
          dxExt = dx0 - 1; dyExt = dy0 + 1
        } else {
          xsvExt = xsb - 1; ysvExt = ysb + 1
          dxExt = dx0 + 1; dyExt = dy0 - 1
        }
      } else {
        xsvExt = xsb + 1; ysvExt = ysb + 1
        dxExt = dx0 - 1 - 2 * Squish2D
        dyExt = dy0 - 1 - 2 * Squish2D
      }
    } else { // inside the (1,1) simplex
      val zins = 2 - inSum
      if (zins < xins || zins < yins) {
        if (xins > yins) {
          xsvExt = xsb + 2; ysvExt = ysb
          dxExt = dx0 - 2 - 2 * Squish2D
          dyExt = dy0 + 0 - 2 * Squish2D
        } else {
          xsvExt = xsb; ysvExt = ysb + 2
          dxExt = dx0 + 0 - 2 * Squish2D
          dyExt = dy0 - 2 - 2 * Squish2D
        }
      } else {
        dxExt = dx0; dyExt = dy0
        xsvExt = xsb; ysvExt = ysb
      }
      xsb += 1; ysb += 1
      dx0 = dx0 - 1 - 2 * Squish2D
      dy0 = dy0 - 1 - 2 * Squish2D
    }

    // contribution (0,0) or (1,1)
    var attn0 = 2 - dx0 * dx0 - dy0 * dy0
    if (attn0 > 0) {
      attn0 *= attn0
      value += attn0 * attn0 * extrapolate(perm, xsb, ysb, dx0, dy0)
    }
    // extra vertex
    var attnExt = 2 - dxExt * dxExt - dyExt * dyExt
    if (attnExt > 0) {
      attnExt *= attnExt
      value += attnExt * attnExt * extrapolate(perm, xsvExt, ysvExt, dxExt, dyExt)
    }
    value / Norm2D
  }

  /** 1-D form: the diagonal of the 2-D field (reference Eval dispatch). */
  def simplex1(seed: Long, x: Double): Double = simplex2(seed, x, x)

  private val simplex1Udf = udf((seed: Long, x: Double) => simplex1(seed, x))
  private val simplex2Udf = udf((seed: Long, x: Double, y: Double) => simplex2(seed, x, y))

  def simplex1(seed: Column, x: Column): Column = simplex1Udf(seed, x)
  def simplex2(seed: Column, x: Column, y: Column): Column = simplex2Udf(seed, x, y)
}
