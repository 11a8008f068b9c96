package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** q128: binary sign-quantized ANN — packed-bit encoding invariants,
  * the exactness bound at corpus-sized over-fetch, and MEASURED recall
  * of the Hamming shortlist vs the q30 exact truth. */
class BinaryAnnSpec extends SparkSuite {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf0001)
    .select($"vec_id", $"embedding")

  test("q128 encode: half-words stay in [0, 2^32) and are non-degenerate") {
    val stats = SimilarityQueries.sq8Stats(emb)
    val words = SimilarityQueries.binEncode(emb, stats).collect()
    assert(words.nonEmpty)
    words.foreach { r =>
      val (w0, w1) = (r.getLong(1), r.getLong(2))
      assert(w0 >= 0L && w0 < (1L << 32), s"w0 out of range: $w0")
      assert(w1 >= 0L && w1 < (1L << 32), s"w1 out of range: $w1")
    }
    // midpoint thresholding must not collapse the corpus to one signature
    assert(words.map(r => (r.getLong(1), r.getLong(2))).distinct.length > 1)
    // each dim's bit column splits the corpus (midpoint of min/max lies
    // strictly inside every non-constant dim), so per-dim popcount is
    // neither 0 nor n for at least most dims
    val n = words.length
    val perDimSet = (0 until 64).map { d =>
      val (idx, off) = if (d < 32) (1, d) else (2, d - 32)
      words.count(r => ((r.getLong(idx) >> off) & 1L) == 1L)
    }
    assert(perDimSet.count(c => c > 0 && c < n) > 48,
      s"expected most dims informative, got ${perDimSet.count(c => c > 0 && c < n)}")
  }

  test("q128: corpus-wide shortlist degenerates to the exact brute force") {
    val n = emb.count().toInt
    val full = SimilarityQueries.binCore(spark, emb, n)
      .select($"query_id", $"neighbor_id", $"sim", $"rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val brute = SimilarityQueries.q30KnnBruteForce(spark, sf0001)
      .select($"query_id", $"neighbor_id", $"sim", $"rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(full == brute)
  }

  test("q128: measured recall@5 of the 8x Hamming shortlist vs exact truth") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ids(SimilarityQueries.q30KnnBruteForce(spark, sf0001))
    val bin = ids(SimilarityQueries.q128BinaryAnn(spark, sf0001))
    val recall = bin.count(exact.contains).toDouble / exact.size
    info(f"q128 recall@5 vs exact: $recall%.3f")
    // 1 bit/dim over 64 dims with 8x over-fetch: coarse but far better
    // than chance (5 random of ~60 would land ~0.08); the shape, not the
    // constant, is the contract — the refine stage bounds the damage
    assert(recall > 0.3, s"binary shortlist recall too low: $recall")
    assert(bin.groupBy(_._1).forall(_._2.size == SimilarityQueries.TopK))
  }
}
