package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Second-moment buffer for a d-dim vector stream: count, per-dim sums,
  * and the UPPER TRIANGLE of the raw outer-product sum (row-major
  * `prods(i*(i+1)/2 + j)` for i ≥ j) — d(d+1)/2 doubles instead of d². */
case class CovMoments(n: Long, sums: Array[Double], prods: Array[Double])

/** Distributed covariance accumulation as a typed Aggregator: the merge
  * is elementwise addition (lossless under any merge tree), so 1000
  * executors each fold their partition and ship ONE ~17 KB buffer
  * (d = 64) to the driver — never the vectors. The d²/2 multiply-adds
  * per row are the accepted PCA-training cost; at 100 TB the standard
  * practice this mirrors is to train on a sample and project the full
  * corpus (the projection is the map-only part).
  *
  * Covariance is assembled driver-side from the moments:
  * C = E[xxᵀ] − μμᵀ. Float-sum order varies with partitioning (doubles
  * commute only approximately), so consumers must treat C as exact to
  * ~1e-12 relative — q121's verdicts carry 1e-6 margins. */
class Covariance(val d: Int)
    extends Aggregator[Seq[Float], CovMoments, CovMoments] {

  def zero: CovMoments =
    CovMoments(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))

  def reduce(b: CovMoments, x: Seq[Float]): CovMoments = {
    require(x.length == d, s"expected $d dims, got ${x.length}")
    val xa = new Array[Double](d)
    var i = 0
    while (i < d) { xa(i) = x(i).toDouble; i = i + 1 }
    i = 0
    while (i < d) {
      b.sums(i) += xa(i)
      val base = i * (i + 1) / 2
      var j = 0
      while (j <= i) { b.prods(base + j) += xa(i) * xa(j); j = j + 1 }
      i = i + 1
    }
    b.copy(n = b.n + 1)
  }

  def merge(a: CovMoments, b: CovMoments): CovMoments = {
    var i = 0
    while (i < d) { a.sums(i) += b.sums(i); i = i + 1 }
    i = 0
    while (i < a.prods.length) { a.prods(i) += b.prods(i); i = i + 1 }
    a.copy(n = a.n + b.n)
  }

  def finish(r: CovMoments): CovMoments = r
  def bufferEncoder: Encoder[CovMoments] = Encoders.product[CovMoments]
  def outputEncoder: Encoder[CovMoments] = Encoders.product[CovMoments]
}
