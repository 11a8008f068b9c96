package graft

import org.apache.spark.sql.functions._

import graft.queries.DedupQueries
import graft.queries.DedupQueries._

/** Skew hardening for the LSH band self-join (q26's shape).
  *
  * A corpus with a 1,000-copy duplicate cluster puts all 1,000 docs in
  * the SAME bucket of every band — the classic hot key that hangs one
  * reducer at 100 TB. The salted variant must (a) return the identical
  * pair set and (b) demonstrably split the hot bucket across reducers.
  */
class LshSkewSpec extends SparkSuite {
  import spark.implicits._

  private val Copies = 1000
  private val Salts = 8

  // 1,000 exact copies + 2 planted near-dups + unrelated docs
  private lazy val docs = {
    val hot = (0 until Copies).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
    val nearA = Seq(
      (2000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"))
    val distinctDocs = (3000 until 3050).map(i =>
      (i.toLong, s"unique document number $i with words w${i}a w${i}b w${i}c w${i}d"))
    (hot ++ nearA ++ distinctDocs).toDF("doc_id", "text")
      .select($"doc_id", shingles($"text").as("shingles"))
  }

  test("salted band join returns the identical pair set on a 1k-copy hot cluster") {
    val plain = minhashPairsOn(docs)
    val salted = minhashPairsOn(docs, salts = Salts)
    // at least the C(1000,2) intra-cluster pairs (identical docs collide
    // in every band by construction; the planted near-dup pair is
    // probabilistic in the banding and not load-bearing here)
    val intra = Copies.toLong * (Copies - 1) / 2
    val n = plain.count()
    assert(n >= intra, s"hot cluster must yield all $intra pairs, got $n")
    assert(salted.count() == n)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("auto-salt (the q163 loop on the band-bucket key): the audit " +
      "diagnoses the 1k-copy hot bucket, the cap bounds the fan-out, and " +
      "the pair set is identical") {
    val bl = bandLabels(minhashSignatures(docs))
    val raw = graft.operators.SkewAudit.recommendedSalt(
      bl.select(concat_ws(":", $"band_id", $"bh").as("bucket")), "bucket")
    // the hot bucket IS the skew: ⌈max·keys/rows⌉ lands near the copy
    // count (most other buckets are singletons)
    assert(raw > Salts, s"the 1k-copy fixture must audit far above a " +
      s"hand salt, got $raw")
    val auto = DedupQueries.minhashPairsAutoSalted(docs)
    val plain = minhashPairsOn(docs)
    assert(plain.exceptAll(auto).isEmpty && auto.exceptAll(plain).isEmpty)
  }

  test("salting splits the hot band bucket across reducers") {
    val bl = bandLabels(minhashSignatures(docs))
    // unsalted: the hot cluster is ONE join key of size 1000 per band
    val unsaltedMax = bl.groupBy($"band_id", $"bh").count()
      .agg(max($"count")).as[Long].head()
    assert(unsaltedMax == Copies.toLong,
      s"fixture must produce a hot band bucket, got max=$unsaltedMax")
    // salted A side: the same bucket becomes `Salts` keys of ~1000/Salts
    val saltedMax = bl
      .withColumn("salt", pmod($"doc_id", lit(Salts)).cast("int"))
      .groupBy($"band_id", $"bh", $"salt").count()
      .agg(max($"count")).as[Long].head()
    assert(saltedMax <= (Copies / Salts) + 1,
      s"hot bucket must split ~evenly: max salted key size $saltedMax")
  }

  test("AQE skew-join backstop stays enabled in bench/verify sessions") {
    // the default path relies on AQE splitting moderately skewed partitions;
    // pin that the session configuration the engine recommends keeps it on
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }
}
