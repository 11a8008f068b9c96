package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded weighted-reservoir buffer: at most k (ticket, id) pairs,
  * ascending by (ticket, id). */
case class WrsBuf(items: List[(Long, Long)])

/** Weighted reservoir sampling (without replacement) as a mergeable
  * typed Aggregator — the Efraimidis–Spirakis A-ES scheme ("Weighted
  * random sampling with a reservoir", IPL 2006) in an integer "ticket"
  * determinization. A-ES keeps the k items with the largest
  * u_i^(1/w_i) (u_i uniform); equivalently, give item i w_i
  * independent uniform tickets and keep the k items with the SMALLEST
  * minimum ticket — min of w uniforms plays the same pairwise race
  * (P(item i beats j) = w_i/(w_i+w_j)). Tickets here are the 60-bit
  * md5 prefixes of "id:j" for j = 1..w_i: deterministic, uniform by
  * md5's avalanche, and engine-portable, so the DuckDB oracle
  * recomputes the sample VALUE-exactly — no PRNG, no float pow whose
  * last-ulp differences could flip a rank across engines. (A-ExpJ's
  * exponential jumps only skip items a SEQUENTIAL reservoir would not
  * key; a distributed fold touches every row regardless, so the jump
  * optimization has nothing to skip — the bounded buffer is the part
  * that matters at scale.)
  *
  * Mergeability (the SpaceSaving-style proof obligation, pinned by
  * SketchSpec): the result is min-k over (ticket, id) pairs, and min-k
  * is an associative, commutative fold with
  * min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)), so ANY merge tree —
  * Spark's partial aggregation with arbitrary combine order included —
  * yields exactly the k global winners. Memory is O(k) per group at
  * every stage; the shuffle moves only k-pair buffers.
  *
  * Input rows are (id, weight), weight ≥ 1; ticket cost is w md5 calls
  * per row, so weights are expected to be SMALL integers (quota tiers,
  * duplication counts) — quantize a continuous weight before sampling.
  */
class WeightedReservoir(k: Int)
    extends Aggregator[(Long, Int), WrsBuf, Seq[(Long, Long)]] {

  /** min over j=1..w of the 60-bit md5 prefix of "id:j" — exactly the
    * value DuckDB's hex-polynomial parse of md5 computes (q101Sql). */
  private def ticket(id: Long, w: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var best = Long.MaxValue
    var j = 1
    while (j <= w) {
      val d = md.digest(s"$id:$j".getBytes("UTF-8"))
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v = (v << 4) | ((d(7) & 0xf0L) >> 4)
      if (v < best) best = v
      j += 1
    }
    best
  }

  def zero: WrsBuf = WrsBuf(Nil)

  def reduce(b: WrsBuf, row: (Long, Int)): WrsBuf = {
    val (id, w) = row
    require(w >= 1, s"weight must be >= 1, got $w for id $id")
    val e = (ticket(id, w), id)
    // fast path: a full buffer whose worst entry beats the new ticket is
    // unchanged — the common case once the reservoir warms up, avoiding
    // the per-row sort
    if (b.items.lengthCompare(k) >= 0 &&
        implicitly[Ordering[(Long, Long)]].lteq(b.items.last, e)) b
    else WrsBuf((e :: b.items).sorted.take(k))
  }

  def merge(a: WrsBuf, b: WrsBuf): WrsBuf =
    WrsBuf((a.items ++ b.items).sorted.take(k))

  /** Output: (id, ticket) ascending by (ticket, id) — position is the
    * sample rank. */
  def finish(b: WrsBuf): Seq[(Long, Long)] =
    b.items.map { case (t, id) => (id, t) }

  def bufferEncoder: Encoder[WrsBuf] = Encoders.kryo[WrsBuf]
  def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
