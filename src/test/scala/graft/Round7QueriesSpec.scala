package graft

import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, EtlQueries, SimilarityQueries, TextQueries}

/** Value semantics of the round-7 queries (q92–q98) — the invariants
  * the DuckDB oracle can't state directly. */
class Round7QueriesSpec extends SparkSuite {
  import spark.implicits._

  // ---- q92: Bloom-filter semi-join ----

  test("q92 bloom admits every true match and actually filters") {
    val out = EtlQueries.q92BloomJoin(spark, sf0001).cache()
    // a Bloom filter may over-admit, never under-admit
    assert(out.where(!$"no_fn_ok").isEmpty, "bloom dropped a true match")
    assert(out.where($"n_pass" < $"n_true").isEmpty)
    val t = out.agg(sum($"n_probed"), sum($"n_pass"), sum($"n_true"), sum($"n_fp")).head()
    val (probed, pass, tru, fp) =
      (t.getLong(0), t.getLong(1), t.getLong(2), t.getLong(3))
    // the filter is load-bearing: most non-matching probes are discarded
    assert(pass < probed, "bloom passed every probe — not filtering")
    assert(fp == pass - tru, "fp accounting inconsistent")
    // fp-rate sanity: m=8192 bits, k=3, |dim| keys at sf0.001 ⇒ expected
    // fp well under 1%; 5% is a safe flake-proof ceiling
    val nonMatching = probed - tru
    assert(fp.toDouble <= 0.05 * nonMatching, s"fp=$fp of $nonMatching non-matching")
    out.unpersist()
  }

  test("q92 membership is exact for the dimension's own keys") {
    // probing ONLY true matches must pass every probe: with the fact
    // side restricted to the exact semi-join, n_pass == n_true ==
    // n_probed and zero false positives, in every group
    val dim = Tables.customer(spark, sf0001)
      .where($"c_acctbal" > 9000).select($"c_custkey".as("k"))
    val restricted = Tables.orders(spark, sf0001)
      .join(dim, $"o_custkey" === $"k", "left_semi")
      .select($"o_custkey", $"o_orderpriority")
    if (restricted.isEmpty) cancel("no matching orders at sf0.001")
    val out = EtlQueries.bloomAuditCore(dim, restricted).cache()
    try {
      assert(out.agg(sum($"n_probed")).head().getLong(0) > 0)
      assert(out.where($"n_pass" =!= $"n_probed" || $"n_true" =!= $"n_probed" ||
        $"n_fp" =!= 0L || !$"no_fn_ok").isEmpty,
        "a true match failed the bloom probe (impossible for a Bloom filter)")
    } finally out.unpersist()
  }

  // ---- q93: approx-quantile sketch with rank-error verdict ----

  test("q93 verdicts hold and exact discrete quantiles match a local sort") {
    val out = EtlQueries.q93QuantileSketch(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("p50_ok"), s"p50 rank bound violated for ${r.get(0)}")
      assert(r.getAs[Boolean]("p95_ok"), s"p95 rank bound violated for ${r.get(0)}")
      assert(r.getAs[Double]("p50_exact") <= r.getAs[Double]("p95_exact"))
    }
    val groups = Tables.lineitem(spark, sf0001)
      .select($"l_returnflag", $"l_extendedprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted)
    out.foreach { r =>
      val xs = groups(r.getString(0))
      val n = xs.length.toLong
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("p50_exact") == xs(((n * 50 + 99) / 100 - 1).toInt))
      assert(r.getAs[Double]("p95_exact") == xs(((n * 95 + 99) / 100 - 1).toInt))
    }
  }

  // ---- q97: sliding-window chunking ----

  test("q97 chunks tile every document: full coverage, exact geometry, overlap") {
    val out = TextQueries.q97ChunkOverlap(spark, sf0001).cache()
    val nToks = Tables.documents(spark, sf0001)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = out.collect().groupBy(_.getLong(0))
    assert(byDoc.keySet == nToks.keySet, "every document chunked")
    byDoc.foreach { case (doc, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_idx"))
      // starts step by exactly the stride from token 1
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("start_tok") == 1L + i * TextQueries.ChunkStride)
        assert(c.getAs[Long]("n_tokens") ==
          math.min(TextQueries.ChunkSize, nToks(doc) - c.getAs[Long]("start_tok") + 1))
        // chunk text carries exactly n_tokens tokens
        assert(c.getAs[String]("chunk_text").split(" ").length ==
          c.getAs[Long]("n_tokens"))
      }
      // the last chunk reaches the final token — no tail is dropped
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_tokens") - 1
        == nToks(doc), s"doc $doc tail not covered")
      // and no chunk is redundant: its PREDECESSOR must not already
      // reach the end (the start lattice stops at the first window that
      // covers the tail)
      if (sorted.length > 1) {
        val prev = sorted(sorted.length - 2)
        assert(prev.getAs[Long]("start_tok") + prev.getAs[Long]("n_tokens") - 1
          < nToks(doc), s"doc $doc emitted a fully-contained trailing chunk")
      }
      // a FULL first chunk overlaps the next by ChunkSize - ChunkStride
      // tokens (with ChunkSize=32/stride=24 the start lattice gives one
      // chunk up to 32 tokens; docs of 33..56 tokens chunk twice)
      if (sorted.length > 1 && nToks(doc) >= TextQueries.ChunkSize)
        assert(sorted.head.getAs[Long]("n_tokens") - TextQueries.ChunkStride
          == TextQueries.ChunkSize - TextQueries.ChunkStride)
    }
    out.unpersist()
  }

  // ---- q98: encoding-quality filter ----

  test("q98 flags replacement chars and control-char floods, passes clean text") {
    val dir = tmpDir("q98docs")
    Seq(
      (1L, "a perfectly clean document with ordinary words"),
      (2L, "decode damage here � and the rest is fine"),
      (3L, "ctrl flood" + "\u0001\u0002\u0003" + " short"),      // 3 ctrl / 23 chars
      (4L, ("x " * 600).trim + "\u0007")                          // 1 ctrl / 1200 chars
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.q98EncodingFilter(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_repl"), r.getAs[Long]("n_ctrl"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) == ((0L, 0L, true)))
    assert(out(2L) == ((1L, 0L, false)), "replacement char must drop the doc")
    assert(out(3L)._2 == 3L && !out(3L)._3, "3 ctrl chars in 23 exceeds 1 per mille")
    assert(out(4L)._2 == 1L && out(4L)._3,
      "1 ctrl char in 1200 is within the per-mille cap")
  }

  // ---- q96: HLL distinct-content rollup ----

  test("q96 rollup lattice is consistent: bounds hold, subtotals bracket children") {
    val out = EtlQueries.q96RollupDistinct(spark, sf0001).cache()
    assert(out.where(!$"within_bound").isEmpty, "HLL bound violated on a rollup row")
    val rows = out.collect()
    // lattice level comes from the grouping FLAGS, not the 'ALL'
    // sentinel — the round-7 ADVICE disambiguation this spec now pins
    def lvl(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("src_rollup"), r.getAs[Long]("lang_rollup"))
    val leaf = rows.filter(r => lvl(r) == ((0L, 0L)))
    val bySource = rows.filter(r => lvl(r) == ((0L, 1L)))
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("exact_distinct"))).toMap
    val grand = rows.filter(r => lvl(r) == ((1L, 1L)))
    assert(grand.length == 1, "exactly one grand-total row")
    // distinct is subadditive and monotone up the lattice: a source
    // subtotal is bounded by [max child, sum of children]; n_docs is
    // exactly additive
    leaf.groupBy(_.getString(0)).foreach { case (src, children) =>
      val (nDocs, exact) = bySource(src)
      assert(nDocs == children.map(_.getAs[Long]("n_docs")).sum)
      assert(exact <= children.map(_.getAs[Long]("exact_distinct")).sum)
      assert(exact >= children.map(_.getAs[Long]("exact_distinct")).max)
    }
    assert(grand.head.getAs[Long]("n_docs") ==
      Tables.documents(spark, sf0001).count())
    out.unpersist()
  }

  // ---- q95: SQ8 scalar-quantized ANN ----

  test("q95 quantized top-k recalls the exact float-L2 top-k") {
    val k = SimilarityQueries.TopK
    val got = SimilarityQueries.q95Sq8Ann(spark, sf0001).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    // exact float-L2 truth, locally (500 vecs at sf0.001)
    val vecs = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val recalls = got.map { case (q, approx) =>
      val truth = (vecs - q).toSeq
        .map { case (id, v) => (l2(vecs(q), v), id) }
        .sortBy(identity).take(k).map(_._2).toSet
      approx.intersect(truth).size.toDouble / k
    }
    assert(got.keySet == (0L until SimilarityQueries.NumQueries).toSet)
    assert(got.values.forall(_.size == k))
    val mean = recalls.sum / recalls.size
    // 8-bit quantization distortion is tiny relative to inter-vector
    // gaps; demand near-perfect recall, not a token bound
    assert(mean >= 0.8, s"mean recall@$k = $mean")
  }

  test("q95 integer distances are symmetric-exact: idist 0 iff identical codes") {
    val out = SimilarityQueries.q95Sq8Ann(spark, sf0001)
    // ranking sanity: per query, idist non-decreasing in rank
    val bad = out.select($"query_id", $"rn", $"idist").collect()
      .groupBy(_.getLong(0)).values.flatMap { rows =>
        val sorted = rows.sortBy(_.getInt(1))
        sorted.zip(sorted.tail).filter { case (a, b) =>
          a.getLong(2) > b.getLong(2) }
      }
    assert(bad.isEmpty, "idist not monotone in rank")
  }

  // ---- q94: longest duplicated-gram run ----

  /** Fixture corpus with hand-computable runs (gram width = DupGramN = 5). */
  private def runFixture(): String = {
    val dir = tmpDir("q94docs")
    def toks(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val common = "a b c d e f g" // 7 shared tokens ⇒ 3 consecutive shared 5-grams
    Seq(
      (1L, s"${toks("u", 5)} $common ${toks("v", 5)}"),   // 17 toks, 13 grams
      (2L, s"${toks("w", 3)} $common ${toks("x", 8)}"),   // 18 toks, 14 grams
      (3L, toks("q", 12)),                                 // all unique: 8 grams
      (4L, toks("p", 10)),                                 // exact copy pair:
      (5L, toks("p", 10)),                                 //   6 grams, all dup
      (6L, s"${toks("m", 5)} ${toks("m", 5)} z1 z2")       // within-doc repeat
    ).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q94 pins hand-computed runs: cross-doc, exact-copy, within-doc") {
    val out = DedupQueries.q94DupRunLength(spark, runFixture()).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("max_run"), r.getAs[Long]("n_runs")))
      .toMap
    // docs 1/2 share exactly the 3 grams inside "a b c d e f g"
    assert(out(1L) == ((13L, 3L, 1L)))
    assert(out(2L) == ((14L, 3L, 1L)))
    // all-unique doc: no duplicated gram anywhere
    assert(out(3L) == ((8L, 0L, 0L)))
    // exact copies: every gram duplicated ⇒ one full-length run
    assert(out(4L) == ((6L, 6L, 1L)))
    assert(out(5L) == ((6L, 6L, 1L)))
    // within-doc repeat: "m1..m5" occurs at positions 1 and 6 ⇒ two
    // isolated duplicated positions, runs of length 1 (below RunMin).
    // q83's document-frequency notion would NOT flag these (df = 1 doc);
    // q94's corpus-occurrence notion must.
    assert(out(6L) == ((8L, 1L, 0L)))
  }

  test("q94 agrees with q83 on gram totals and flags exact copies as one full run") {
    val runs = DedupQueries.q94DupRunLength(spark, sf0001).cache()
    // internal consistency
    assert(runs.where($"max_run" > $"n_grams" || $"n_runs" > $"n_grams").isEmpty)
    assert(runs.where($"keep" =!= ($"max_run" <= DedupQueries.RunDropMax)).isEmpty)
    // same positional-gram universe as q83
    val frac = DedupQueries.q83DupGramFraction(spark, sf0001)
      .select($"doc_id", $"n_grams".as("n_grams83"))
    assert(runs.join(frac, "doc_id").where($"n_grams" =!= $"n_grams83").isEmpty)
    // a doc with an exact copy elsewhere is one uninterrupted run
    val copied = Tables.documents(spark, sf0001)
      .groupBy(md5($"text").as("h")).agg(collect_list($"doc_id").as("ids"))
      .where(size($"ids") > 1)
      .select(explode($"ids").as("doc_id"))
    assert(runs.join(copied, "doc_id").where($"max_run" =!= $"n_grams").isEmpty,
      "an exact-duplicate doc's grams did not form one full-length run")
    runs.unpersist()
  }
}
