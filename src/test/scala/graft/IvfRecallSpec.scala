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

  test("multiprobe: recall@5 vs brute force is monotone in nprobe; nprobe=all == q30") {
    val bf = SimilarityQueries.q30KnnBruteForce(spark, sf0001)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val nBuckets = Tables.embeddings(spark, sf0001)
      .select($"label").distinct().count().toInt

    def recallAt(nprobe: Int): Double = {
      val ivf = SimilarityQueries.ivfAnn(spark, sf0001, nprobe)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
      val rs = bf.map { case (q, truth) =>
        ivf.get(q).map(got => (got & truth).size.toDouble / truth.size).getOrElse(0.0) }
      rs.sum / rs.size
    }

    val recalls = Seq(1, 2, 4, nBuckets).map(np => np -> recallAt(np))
    info(s"recall@5 by nprobe: ${recalls.map { case (n, r) => s"$n -> ${"%.2f".format(r)}" }.mkString(", ")}")
    // monotone non-decreasing in nprobe
    recalls.sliding(2).foreach { case Seq((n1, r1), (n2, r2)) =>
      assert(r2 >= r1 - 1e-9, s"recall must not drop: nprobe $n1=$r1 vs $n2=$r2") }
    // probing every bucket IS brute force — recall exactly 1
    assert(recalls.last._2 == 1.0,
      s"nprobe=$nBuckets (all buckets) must reproduce q30, got ${recalls.last._2}")
  }
}
