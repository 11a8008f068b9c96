package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy-hitters sketch as a typed `Aggregator` (the
  * UDAF/sketch slot — Metwally et al., "Efficient computation of frequent
  * and top-k elements in data streams", ICDT 2005).
  *
  * Tracks at most `capacity` counters; when full, an unseen item replaces
  * the minimum counter and inherits its count (stored as `error`). The
  * guarantee: any item with true frequency > N/capacity is in the sketch,
  * and estimate - error <= true <= estimate.
  *
  * Scale: constant memory per group regardless of stream length; merge is
  * associative/commutative (counter-wise sum + re-prune), so Spark's
  * partial aggregation applies — each partition sketches locally, the
  * shuffle moves only capacity-sized maps.
  */
case class SSCounter(count: Long, error: Long)

class SpaceSaving(capacity: Int)
    extends Aggregator[String, mutable.Map[String, SSCounter], Seq[(String, Long, Long)]] {

  def zero: mutable.Map[String, SSCounter] = mutable.Map.empty

  def reduce(b: mutable.Map[String, SSCounter], item: String): mutable.Map[String, SSCounter] = {
    b.get(item) match {
      case Some(c) => b(item) = c.copy(count = c.count + 1)
      case None if b.size < capacity => b(item) = SSCounter(1, 0)
      case None =>
        val (minK, minC) = b.minBy { case (k, c) => (c.count, k) }
        b.remove(minK)
        b(item) = SSCounter(minC.count + 1, minC.count)
    }
    b
  }

  def merge(a: mutable.Map[String, SSCounter], b: mutable.Map[String, SSCounter]): mutable.Map[String, SSCounter] = {
    // counter-wise sum (errors add), then keep the top `capacity` counters
    b.foreach { case (k, c) =>
      a.get(k) match {
        case Some(ac) => a(k) = SSCounter(ac.count + c.count, ac.error + c.error)
        case None => a(k) = c
      }
    }
    if (a.size <= capacity) a
    else {
      // evicted mass is absorbed as error by the survivors' minimum,
      // preserving the overestimate invariant
      val sorted = a.toSeq.sortBy { case (k, c) => (-c.count, k) }
      val kept = mutable.Map(sorted.take(capacity): _*)
      val evictedMax = sorted.drop(capacity).map(_._2.count).foldLeft(0L)(math.max)
      val (minK, minC) = kept.minBy { case (k, c) => (c.count, k) }
      kept(minK) = minC.copy(count = minC.count + evictedMax, error = minC.error + evictedMax)
      kept
    }
  }

  /** Output: (item, estimated_count, max_error), by estimate desc. */
  def finish(b: mutable.Map[String, SSCounter]): Seq[(String, Long, Long)] =
    b.toSeq.sortBy { case (k, c) => (-c.count, k) }
      .map { case (k, c) => (k, c.count, c.error) }

  def bufferEncoder: Encoder[mutable.Map[String, SSCounter]] =
    Encoders.kryo[mutable.Map[String, SSCounter]]
  def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
