package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** IVF correctness properties.
  *
  * Note on GLOBAL recall: IVF assumes the bucket assignment is a trained
  * quantizer of the similarity space. In this synthetic corpus the
  * `label` column is deliberately orthogonal to cosine structure (0 of
  * the 25 true top-5 neighbors share their query's label), so
  * single-probe global recall is near zero BY CONSTRUCTION of the data —
  * brute force (q30) is the honest search there. What IVF must still
  * guarantee, and what this spec pins: the probe returns the EXACT
  * top-k within the probed bucket.
  */
class IvfRecallSpec extends SparkSuite {
  import spark.implicits._

  test("IVF returns the exact top-5 of the probed bucket") {
    val ivf = SimilarityQueries.q32IvfAnn(spark, sf0001)
      .select($"query_id", $"bucket", $"neighbor_id", $"rn").collect()
    assert(ivf.nonEmpty)
    val emb = Tables.embeddings(spark, sf0001)
    val byQuery = ivf.groupBy(_.getLong(0))
    byQuery.foreach { case (qid, rows) =>
      val bucket = rows.head.getInt(1)
      // independent in-bucket exact top-5 via a driver-side computation
      val qe = emb.where($"vec_id" === qid).select($"embedding")
        .as[Seq[Float]].head().map(_.toDouble).toArray
      val inBucket = emb.where($"label" === bucket && $"vec_id" =!= qid)
        .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      def cos(v: Seq[Float]): Double = {
        val a = v.map(_.toDouble).toArray
        val dot = a.zip(qe).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(qe.map(x => x * x).sum))
      }
      val expect = inBucket
        .map { case (id, v) => (id, BigDecimal(cos(v)).setScale(6, BigDecimal.RoundingMode.HALF_UP)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
      val got = rows.sortBy(_.getInt(3)).map(_.getLong(2)).toSeq
      assert(got == expect, s"query $qid bucket $bucket: $got vs $expect")
    }
  }
}
