package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** k-th central moment E[(x-μ)^k] in a single distributed pass.
  *
  * The reference computes this by buffering all values and calling gonum
  * `stat.Moment` at EOF (reference: mods/tql/fm_monad.go:1265-1307). On a
  * cluster we cannot buffer a group's values; instead we accumulate raw
  * power sums S_i = Σx^i for i ≤ k (which merge associatively across
  * partitions — map-side combine works) and expand the binomial at
  * finalization:  E[(x-μ)^k] = Σ_{i=0..k} C(k,i)·(S_i/n)·(-μ)^{k-i}.
  */
case class MomentBuf(n: Long, sums: Array[Double])

class MomentAgg(k: Int) extends Aggregator[Double, MomentBuf, Double] {
  require(k >= 1 && k <= 8, "moment order must be in [1,8]")

  def zero: MomentBuf = MomentBuf(0L, Array.fill(k + 1)(0d))

  def reduce(b: MomentBuf, x: Double): MomentBuf = {
    var p = 1d
    var i = 0
    while (i <= k) { b.sums(i) += p; p *= x; i += 1 }
    MomentBuf(b.n + 1, b.sums)
  }

  def merge(a: MomentBuf, b: MomentBuf): MomentBuf = {
    var i = 0
    while (i <= k) { a.sums(i) += b.sums(i); i += 1 }
    MomentBuf(a.n + b.n, a.sums)
  }

  def finish(b: MomentBuf): Double = {
    if (b.n == 0) return Double.NaN
    val n = b.n.toDouble
    val mu = b.sums(1) / n
    var acc = 0d
    var i = 0
    while (i <= k) {
      acc += choose(k, i) * (b.sums(i) / n) * math.pow(-mu, (k - i).toDouble)
      i += 1
    }
    acc
  }

  private def choose(n: Int, r: Int): Double = {
    var acc = 1d
    var i = 0
    while (i < r) { acc = acc * (n - i) / (i + 1); i += 1 }
    acc
  }

  def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Weighted k-th central moment E_w[(x−μ_w)^k] = ΣC(k,i)(S_i/W)(−μ_w)^{k−i}
  * over weighted power sums S_i = Σw·x^i, W = Σw (gonum stat.Moment with
  * weights — the reference's GroupColumnMoment wv path). */
class WeightedMomentAgg(k: Int) extends Aggregator[(Double, Double), MomentBuf, Double] {
  require(k >= 1 && k <= 8, "moment order must be in [1,8]")

  def zero: MomentBuf = MomentBuf(0L, Array.fill(k + 1)(0d))

  def reduce(b: MomentBuf, xw: (Double, Double)): MomentBuf = {
    val (x, w) = xw
    var p = w
    var i = 0
    while (i <= k) { b.sums(i) += p; p *= x; i += 1 }
    MomentBuf(b.n + 1, b.sums)
  }

  def merge(a: MomentBuf, b: MomentBuf): MomentBuf = {
    var i = 0
    while (i <= k) { a.sums(i) += b.sums(i); i += 1 }
    MomentBuf(a.n + b.n, a.sums)
  }

  def finish(b: MomentBuf): Double = {
    if (b.n == 0) return Double.NaN
    val sw = b.sums(0)
    val mu = b.sums(1) / sw
    var acc = 0d
    var i = 0
    while (i <= k) {
      var c = 1d; var j = 0
      while (j < i) { c = c * (k - j) / (j + 1); j += 1 }
      acc += c * (b.sums(i) / sw) * math.pow(-mu, (k - i).toDouble)
      i += 1
    }
    acc
  }

  def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object MomentAgg {
  /** Column form: `moment(col, 3)`. */
  def moment(x: Column, k: Int): Column = udaf(new MomentAgg(k)).apply(x)

  /** Weighted column form: `moment(col, k, weight(w))`. */
  def weightedMoment(x: Column, w: Column, k: Int): Column =
    udaf(new WeightedMomentAgg(k)).apply(x, w)
}
