package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min buffer: depth×width counters flattened row-major, plus the
  * stream length n. */
case class CmsSketch(counts: Array[Long], n: Long)

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary", J. Algorithms 2005) as a typed `Aggregator` — the
  * point-frequency member of the sketch family (q18 HLL: cardinality;
  * q43 Misra–Gries: heavy hitters; this: est(x) for any x).
  *
  * Unlike the MG/Space-Saving family, the MERGE IS LOSSLESS: counter
  * arrays add elementwise, so the merged sketch is bit-identical to a
  * single-pass sketch of the concatenated stream under ANY merge tree or
  * partitioning — no bound degradation to reason about (CountMinSpec
  * pins this). Estimates never undercount: est(x) = min_d counts[d][
  * h_d(x)] ≥ true(x) always; overcount per row d is the colliding mass,
  * expected (n − true)/width.
  *
  * Hashing is the repo's portable md5 convention: row d reads hex chars
  * [8d+1, 8d+8] of md5(item) — one digest per item carved into `depth`
  * 32-bit chunks — taken mod width. A DuckDB oracle can therefore
  * recompute the ENTIRE sketch, and estimates are exact functions of the
  * data multiset (partitioning-invariant), so q87 gets a value-level
  * oracle rather than a verdict-level one.
  *
  * Scale: constant 8·(depth·width+1) bytes per group; the shuffle moves
  * sketches, never items. */
class CountMin(val depth: Int, val width: Int)
    extends Aggregator[String, CmsSketch, CmsSketch] {
  require(depth >= 1 && depth <= 4, "one md5 carries four 32-bit chunks")

  def zero: CmsSketch = CmsSketch(new Array[Long](depth * width), 0L)

  /** Row-d bucket of an item: unsigned big-endian int from md5 digest
    * bytes [4d, 4d+4) — the byte form of hex chars [8d+1, 8d+8] — mod
    * width. */
  def bucket(item: String, d: Int): Int = {
    val dig = MessageDigest.getInstance("MD5")
      .digest(item.getBytes("UTF-8"))
    val u = ((dig(4 * d) & 0xffL) << 24) | ((dig(4 * d + 1) & 0xffL) << 16) |
      ((dig(4 * d + 2) & 0xffL) << 8) | (dig(4 * d + 3) & 0xffL)
    (u % width).toInt
  }

  def reduce(b: CmsSketch, item: String): CmsSketch = {
    val dig = MessageDigest.getInstance("MD5")
      .digest(item.getBytes("UTF-8"))
    var d = 0
    while (d < depth) {
      val u = ((dig(4 * d) & 0xffL) << 24) | ((dig(4 * d + 1) & 0xffL) << 16) |
        ((dig(4 * d + 2) & 0xffL) << 8) | (dig(4 * d + 3) & 0xffL)
      b.counts(d * width + (u % width).toInt) += 1L
      d += 1
    }
    CmsSketch(b.counts, b.n + 1L)
  }

  def merge(a: CmsSketch, b: CmsSketch): CmsSketch = {
    var i = 0
    while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
    CmsSketch(a.counts, a.n + b.n)
  }

  def finish(b: CmsSketch): CmsSketch = b

  def bufferEncoder: Encoder[CmsSketch] = Encoders.product[CmsSketch]
  def outputEncoder: Encoder[CmsSketch] = Encoders.product[CmsSketch]
}
