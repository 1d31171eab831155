package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Seeded simplex noise (public-domain formulation: Stefan Gustavson,
  * "Simplex noise demystified", 2005 — the same family the reference's
  * FAKE(simplex(seed,…)) generator uses, fm_fake.go:265-280).
  * Deterministic: the permutation table is seeded with an LCG shuffle.
  */
object Noise {
  private val permCache = new java.util.concurrent.ConcurrentHashMap[Long, Array[Int]]()

  private def permTable(seed: Long): Array[Int] =
    permCache.computeIfAbsent(seed, buildPerm)

  private def buildPerm(seed: Long): Array[Int] = {
    val p = Array.tabulate(256)(identity)
    // splitmix64 scramble so adjacent seeds give unrelated tables
    var s = seed
    s = (s ^ (s >>> 30)) * 0xBF58476D1CE4E5B9L
    s = (s ^ (s >>> 27)) * 0x94D049BB133111EBL
    s = s ^ (s >>> 31)
    var i = 255
    while (i > 0) {
      s = (s * 6364136223846793005L + 1442695040888963407L)
      val j = ((s >>> 33) % (i + 1)).toInt
      val t = p(i); p(i) = p(j); p(j) = t
      i -= 1
    }
    val out = new Array[Int](512)
    i = 0
    while (i < 512) { out(i) = p(i & 255); i += 1 }
    out
  }

  private val grad2 = Array(
    (1d, 1d), (-1d, 1d), (1d, -1d), (-1d, -1d),
    (1d, 0d), (-1d, 0d), (0d, 1d), (0d, -1d))

  /** 2-D simplex noise in [-1, 1]. */
  def simplex2(seed: Long, xin: Double, yin: Double): Double = {
    val perm = permTable(seed)
    val F2 = 0.5 * (math.sqrt(3.0) - 1.0)
    val G2 = (3.0 - math.sqrt(3.0)) / 6.0
    val s = (xin + yin) * F2
    val i = math.floor(xin + s).toInt
    val j = math.floor(yin + s).toInt
    val t = (i + j) * G2
    val x0 = xin - (i - t)
    val y0 = yin - (j - t)
    val (i1, j1) = if (x0 > y0) (1, 0) else (0, 1)
    val x1 = x0 - i1 + G2
    val y1 = y0 - j1 + G2
    val x2 = x0 - 1.0 + 2.0 * G2
    val y2 = y0 - 1.0 + 2.0 * G2
    val ii = i & 255
    val jj = j & 255
    def corner(x: Double, y: Double, gi: Int): Double = {
      val tt = 0.5 - x * x - y * y
      if (tt < 0) 0d
      else {
        val g = grad2(gi % 8)
        val t2 = tt * tt
        t2 * t2 * (g._1 * x + g._2 * y)
      }
    }
    val n0 = corner(x0, y0, perm(ii + perm(jj)))
    val n1 = corner(x1, y1, perm(ii + i1 + perm(jj + j1)))
    val n2 = corner(x2, y2, perm(ii + 1 + perm(jj + 1)))
    70.0 * (n0 + n1 + n2)
  }

  /** 1-D simplex (2-D sampled along y=0). */
  def simplex1(seed: Long, x: Double): Double = simplex2(seed, x, 0d)

  private val simplex1Udf = udf((seed: Long, x: Double) => simplex1(seed, x))
  private val simplex2Udf = udf((seed: Long, x: Double, y: Double) => simplex2(seed, x, y))

  def simplex1(seed: Column, x: Column): Column = simplex1Udf(seed, x)
  def simplex2(seed: Column, x: Column, y: Column): Column = simplex2Udf(seed, x, y)
}
