package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** q117 learned-k SemDeDup: the k = ⌈√n⌉ contract is computed by the
  * engine, not read from a fixture column (VERDICT r10 item 2). */
class SemDedupLearnedSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sf0001

  test("learned labels: at most ceil(sqrt(n)) clusters, every vector labeled") {
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val n = emb.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toLong
    val labels = SimilarityQueries.learnedLabels(spark, emb).cache()
    try {
      assert(labels.count() === n) // total function: every vector assigned
      val distinct = labels.select($"label").distinct().count()
      assert(distinct <= k, s"learned $distinct clusters > k=$k")
      // seeds are the first-k ids, so labels live in [0, k)
      val range = labels.agg(min($"label"), max($"label")).head()
      assert(range.getLong(0) >= 0L && range.getLong(1) < k)
    } finally labels.unpersist()
  }

  test("k grows as sqrt(n): 4x-replicated corpus doubles k") {
    val base = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val n = base.count()
    val rep4 = (0 until 4).map(i =>
      base.select(($"vec_id" + lit(i * 10000000L)).as("vec_id"), $"embedding"))
      .reduce(_ unionByName _)
    val k1 = math.ceil(math.sqrt(n.toDouble)).toLong
    val k4 = math.ceil(math.sqrt(4.0 * n)).toLong
    assert(k4 === 2 * k1 || k4 === 2 * k1 - 1) // ceil rounding slack
    val labels4 = SimilarityQueries.learnedLabels(spark, rep4)
    assert(labels4.select($"label").distinct().count() <= k4)
  }

  test("verdict: exactly one keeper per duplicate group, deterministic rerun") {
    val out = SimilarityQueries.q117SemDedupLearnedK(spark, dir).cache()
    try {
      val perGroup = out.groupBy($"cluster_id")
        .agg(sum($"keep".cast("int")).as("keepers"), count(lit(1)).as("m"),
          max($"n_comp").as("n_comp"))
      assert(perGroup.where($"keepers" =!= 1).isEmpty) // one rep per group
      assert(perGroup.where($"m" =!= $"n_comp").isEmpty) // n_comp is the group size
      // the keeper is the member FARTHEST from its centroid (keep-the-outlier)
      val viol = out.as("a").join(out.as("b"),
          col("a.cluster_id") === col("b.cluster_id") &&
          col("a.keep") && !col("b.keep") &&
          col("a.cos_cent") > col("b.cos_cent"))
      assert(viol.isEmpty)
      val rerun = SimilarityQueries.q117SemDedupLearnedK(spark, dir)
      assert(rerun.exceptAll(out).isEmpty && out.exceptAll(rerun).isEmpty)
    } finally out.unpersist()
  }
}
