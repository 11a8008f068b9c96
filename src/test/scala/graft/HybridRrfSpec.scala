package graft

import org.apache.spark.sql.functions._

import graft.queries.{ComposeQueries, TextQueries}

/** q126 hybrid RRF fusion + q127 BPE encode semantics. */
class HybridRrfSpec extends SparkSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  // ---- q126: reciprocal-rank fusion ----

  test("q126 fusion arithmetic: rrf_r is exactly the two-leg reciprocal sum") {
    val rows = ComposeQueries.q126HybridRrf(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= ComposeQueries.HybridTopK)
    var prev = Double.MaxValue
    rows.foreach { r =>
      val rs = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val rd = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(rs.isDefined || rd.isDefined, "a fused row must come from a leg")
      val expect = BigDecimal(
        rs.map(v => 1.0 / (ComposeQueries.RrfK + v)).getOrElse(0.0) +
          rd.map(v => 1.0 / (ComposeQueries.RrfK + v)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expect) < 1e-9,
        s"row $r: expected rrf $expect")
      assert(r.getDouble(3) <= prev, "rrf_r must be non-increasing")
      prev = r.getDouble(3)
    }
  }

  test("q126 both-leg dominance: equal single-leg ranks lose to a dual-leg doc") {
    // any doc in BOTH legs at ranks (rs, rd) outscores any doc whose only
    // leg rank is min(rs, rd) — the monotonicity RRF is chosen for
    val rows = ComposeQueries.q126HybridRrf(spark, sfDir).collect()
    val dual = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = rows.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    for (d <- dual; s <- single) {
      val dMin = math.min(d.getInt(1), d.getInt(2))
      val sRank = if (s.isNullAt(1)) s.getInt(2) else s.getInt(1)
      if (sRank >= dMin) assert(d.getDouble(3) > s.getDouble(3))
    }
  }

  // ---- q127: BPE encode ----

  test("q127 hand-computed: full merges collapse repeated words to one token") {
    // vocab: ab×4, cd×1 → merge1 = (a,b), merge2 = (c,d), then exhausted
    val docs = Seq((1L, "ab ab ab"), (2L, "ab cd")).toDF("doc_id", "text")
    val byId = TextQueries.bpeEncodeCore(spark, docs, 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byId(1L) == ((3L, 3L)), s"doc1: 3 words, 3 fully-merged tokens: $byId")
    assert(byId(2L) == ((2L, 2L)), s"doc2: 2 words, 2 fully-merged tokens: $byId")
  }

  test("q127 word-boundary safety: a learned merge never fires across words") {
    // merge (a,b) is learned from 'ab'; the document 'b a' must stay 2 tokens
    val docs = Seq((1L, "ab ab ab b a")).toDF("doc_id", "text")
    val byId = TextQueries.bpeEncodeCore(spark, docs, 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 3×'ab' → 1 token each after the (a,b) merge; 'b' and 'a' stay 1 each
    assert(byId(1L) == ((5L, 5L)), s"got $byId")
  }

  test("q127 zero merges: token count equals character count of the words") {
    val docs = Seq((1L, "abc de"), (2L, "")).toDF("doc_id", "text")
    val byId = TextQueries.bpeEncodeCore(spark, docs, 0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byId(1L) == ((2L, 5L)), s"2 words, 5 chars = 5 tokens: $byId")
    assert(byId(2L) == ((0L, 0L)), s"empty doc: 0 words, 0 tokens: $byId")
  }

  test("q127 invariants on real data: n_words <= n_tokens <= word chars") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextQueries.bpeEncodeCore(spark, docs, TextQueries.BpeMerges)
    val chars = docs.select($"doc_id",
      aggregate(filter(split($"text", " "), w => w =!= ""),
        lit(0), (acc, w) => acc + length(w)).as("wc"))
    val bad = out.join(chars, Seq("doc_id"))
      .where($"n_tokens" < $"n_words" || $"n_tokens" > $"wc")
      .count()
    assert(bad == 0L)
  }
}
