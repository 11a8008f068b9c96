package graft

import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries

/** Blocking honesty for q76 (entity resolution): blocking is a recall
  * trade, and the trade must be MEASURED, not assumed — the same
  * discipline LshSkewSpec applies to the banded MinHash join.
  *
  * Three pins:
  *  1. skew — the largest block of EACH pass (head noun, first token)
  *     stays a small fraction of the dictionary, so the in-block
  *     quadratic term is bounded (the whole point of blocking);
  *  2. recall — the fraction of TRUE matches (full-quadratic ground
  *     truth over the distinct dictionary) found by the multi-pass
  *     union is measured and high: single-pass head-noun blocking lost
  *     16 of 96 true pairs here (83% — pairs like "blue bolt" ≈ "blue
  *     belt" differ in the blocking token itself); the first-token
  *     second pass recovers them, because a ≤3-edit pair rarely
  *     disagrees on BOTH end tokens. Multi-pass blocking is the
  *     standard recall repair, each pass individually skew-bounded;
  *  3. control — each single pass alone measurably loses pairs, so the
  *     union is doing real work (not a vacuous second pass). */
class FuzzyBlockingSpec extends SparkSuite {
  import spark.implicits._

  private def dict = Tables.part(spark, sf0001)
    .select($"p_name").distinct()
    .withColumn("noun", element_at(split($"p_name", " "), -1))
    .withColumn("head", element_at(split($"p_name", " "), 1))

  test("largest block of each pass is a bounded fraction of the dictionary") {
    val names = dict.cache()
    val total = names.count()
    for (key <- Seq("noun", "head")) {
      val maxBlock = names.groupBy(col(key)).count()
        .agg(max($"count")).as[Long].head()
      // blocks must stay far from degenerate (one block = all-pairs
      // again); the quadratic term is (maxBlock)² per block
      assert(maxBlock * 4 <= total, s"hot $key block $maxBlock of $total names")
    }
  }

  test("multi-pass recall >= 0.95 against full-quadratic ground truth") {
    val names = dict.cache()
    // ground truth: full quadratic over the DISTINCT dictionary — exactly
    // what blocking avoids at scale, affordable here because the
    // dictionary is ~64 names at sf0.001
    val truth = names.as("a").select(col("p_name").as("na"))
      .crossJoin(names.as("b").select(col("p_name").as("nb")))
      .where($"na" < $"nb" &&
        levenshtein($"na", $"nb") <= RelationalQueries.FuzzyMaxDist)
      .count()
    val blocked = RelationalQueries.q76FuzzyMatch(spark, sf0001).count()
    assert(truth > 0 && blocked <= truth)
    val recall = blocked.toDouble / truth
    assert(recall >= 0.95, f"blocking recall $recall%.3f (missed ${truth - blocked} of $truth)")

    // honesty control: each single pass ALONE loses pairs — the union is
    // a real repair, not a vacuous second key
    def singlePass(key: String) = names.as("a")
      .join(names.as("b"),
        col(s"a.$key") === col(s"b.$key") && col("a.p_name") < col("b.p_name"))
      .where(levenshtein(col("a.p_name"), col("b.p_name")) <= RelationalQueries.FuzzyMaxDist)
      .count()
    assert(singlePass("noun") < truth, "head-noun pass lost no pairs — retighten")
    assert(singlePass("head") < blocked, "first-token pass alone matches the union — retighten")
  }
}
