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

  test("q99 keeper tie-break is exact for doc_id ≥ 1e9 (struct order, not packed key)") {
    // Same canonical URL requires equal residues mod lcm(2,3,4,5,6,7,11,13)
    // = 60060 and the same source. The larger doc carries MORE chars, so it
    // must win; the old packed key n_chars·1e9 − doc_id would hand the win
    // to the small doc once doc_id crosses ~1e9 (ADVICE r8 boundary).
    val a = 41L                         // n_chars 10
    val b = 41L + 60060L * 41625L       // ≈ 2.5e9, same residues; n_chars 11
    val docs = Seq((a, "feed", 10L), (b, "feed", 11L))
      .toDF("doc_id", "source", "n_chars")
    val out = DedupQueries.urlDedupCore(spark, docs).collect()
    assert(out.length == 1, "both docs must collapse to one canonical URL")
    assert(out(0).getAs[Long]("n_copies") == 2L)
    assert(out(0).getAs[Long]("keeper_id") == b,
      "keeper must be the longer doc regardless of doc_id magnitude")
    assert(out(0).getAs[Long]("keeper_chars") == 11L)
  }

  test("q106 first-occurrence rank survives doc_id past the packed-key overflow bound") {
    // doc_id·100000 overflows Long for doc_id > 92233720368547, flipping
    // the old packed rank negative — the later doc would steal keeper.
    // Struct-ordered (doc_id, seg_pos) min has no bound.
    val seg = "x1 x2 x3 x4 x5 x6 x7 x8"
    val huge = 92233720368548L
    val docs = Seq((1L, seg), (huge, seg)).toDF("doc_id", "text")
    val out = DedupQueries.segmentDedupCore(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_kept")).toMap
    assert(out(1L) == 1L, "the genuinely-first doc keeps its segment")
    assert(out(huge) == 0L, "the later doc's duplicate segment is removed")
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
