package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Heavy-hitters sketch buffer: bounded counter map + the total decrement
  * mass `dec` applied so far (the sketch-wide error bound). */
case class MgSketch(counts: mutable.Map[String, Long], dec: Long)

/** Mergeable heavy-hitters sketch as a typed `Aggregator` (the
  * UDAF/sketch slot) — the Misra–Gries counter form ("Finding repeated
  * elements", Sci. Comput. Program. 1982) with the mergeable-summary
  * combine of Agarwal et al. ("Mergeable Summaries", PODS 2012 §3):
  * counter-wise add, subtract the (capacity+1)-th largest counter value
  * from every counter, drop non-positives.
  *
  * Misra–Gries is the subtract formulation of the same summary family as
  * Space-Saving (Metwally et al., ICDT 2005) — Agarwal et al. show the
  * two are isomorphic — but MG is the form whose MERGE carries a proof.
  * Round 5 shipped a Space-Saving-style merge (counter-wise sum, evicted
  * mass absorbed by a survivor) whose documented overestimate bound does
  * NOT survive merging: a key evicted from one partition's sketch loses
  * its mass there, so the merged estimate can undercount and a
  * globally-heavy-but-locally-light key can be pruned. The MG merge's
  * guarantee holds under ANY merge tree — exactly what Spark's partial
  * aggregation (per-partition reduce, arbitrary-order combine) needs:
  *
  *   est(k) ≤ true(k) ≤ est(k) + dec,   with dec ≤ N/(capacity+1),
  *
  * so every item with true frequency > N/(capacity+1) has est > 0 and is
  * in the sketch. `finish` emits (item, est, dec) — `dec` is sketch-wide,
  * the same bound for every row.
  *
  * Scale: constant memory per group regardless of stream length; the
  * shuffle moves only capacity-sized maps.
  */
class SpaceSaving(capacity: Int)
    extends Aggregator[String, MgSketch, Seq[(String, Long, Long)]] {

  def zero: MgSketch = MgSketch(mutable.Map.empty, 0L)

  def reduce(b: MgSketch, item: String): MgSketch = {
    val m = b.counts
    if (m.contains(item)) { m(item) += 1L; b }
    else if (m.size < capacity) { m(item) = 1L; b }
    else {
      // decrement-all: the new item and every counter lose 1 (the item's
      // single occurrence cancels against the decrement, so it is not
      // inserted); amortized O(1) per stream item
      m.mapValuesInPlace((_, v) => v - 1L)
      m.filterInPlace((_, v) => v > 0L)
      MgSketch(m, b.dec + 1L)
    }
  }

  def merge(a: MgSketch, b: MgSketch): MgSketch = {
    val m = a.counts
    b.counts.foreach { case (k, v) => m(k) = m.getOrElse(k, 0L) + v }
    var dec = a.dec + b.dec
    if (m.size > capacity) {
      // subtract the (capacity+1)-th largest value: at most `capacity`
      // counters are strictly above it, so the survivor set fits
      val vs = m.values.toArray
      java.util.Arrays.sort(vs)
      val pivot = vs(vs.length - capacity - 1)
      m.mapValuesInPlace((_, v) => v - pivot)
      m.filterInPlace((_, v) => v > 0L)
      dec += pivot
    }
    MgSketch(m, dec)
  }

  /** Output: (item, estimated_count, error_bound), by estimate desc.
    * The estimate UNDERCOUNTS: est ≤ true ≤ est + error_bound. */
  def finish(b: MgSketch): Seq[(String, Long, Long)] =
    b.counts.toSeq.sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) => (k, c, b.dec) }

  def bufferEncoder: Encoder[MgSketch] = Encoders.kryo[MgSketch]
  def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
