package graft

import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** Dedup semantics on CONSTRUCTED inputs (the testdata corpus has no
  * exact duplicates, so these properties are invisible to the oracle). */
class DedupSemanticsSpec extends SparkSuite {
  import spark.implicits._

  test("exact dedup: duplicates collapse to the min-id keeper") {
    val docs = Seq(
      (10L, "alpha beta gamma"), (7L, "alpha beta gamma"), // dup pair, keeper 7
      (3L, "delta epsilon zeta"),
      (20L, "alpha beta gamma")) // third copy
      .toDF("doc_id", "text")
    val out = docs.groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keeper_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((3L, 1L), (7L, 3L)))
  }

  test("minhash: identical texts get identical signatures; disjoint texts do not") {
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "q r s t u v w x"))
      .toDF("doc_id", "text")
      .select($"doc_id", DedupQueries.shingles($"text").as("shingles"))
    val sig = DedupQueries.minhashSignatures(docs).orderBy("doc_id").collect()
    val s1 = sig(0).toSeq.drop(1)
    val s2 = sig(1).toSeq.drop(1)
    val s3 = sig(2).toSeq.drop(1)
    assert(s1 == s2)       // identical docs → identical signature
    assert(s1 != s3)       // disjoint shingles → different signature
  }

  test("simhash: near-identical docs are close in hamming distance, disjoint docs far") {
    val dir = tmpDir("simhash_sem")
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en", "s", 1L),
      (2L, "the quick brown fox jumps over the lazy cat again and again", "en", "s", 1L),
      (3L, "zeta eta theta iota kappa lambda mu nu xi omicron pi rho", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fp = DedupQueries.q27Simhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val near = ham(fp(1L), fp(2L))
    val far = ham(fp(1L), fp(3L))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 12, s"near-identical docs too distant: $near")
  }

  test("stratified sampling (sampleBy): seeded per-stratum fractions (X1 extension)") {
    val ev = Tables.events(spark, sf0001)
    val fractions = Map("purchase" -> 0.5, "error" -> 0.1)
    val sampled = ev.stat.sampleBy("event_type", fractions, 42L)
    val counts = sampled.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(fractions.keySet)) // unlisted strata dropped
    // deterministic given the seed
    val again = ev.stat.sampleBy("event_type", fractions, 42L).count()
    assert(again == sampled.count())
  }
}
