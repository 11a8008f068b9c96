package graft

import org.apache.spark.sql.functions._

import graft.queries.{ComposeQueries, DedupQueries, TextQueries}

/** Round-8 additions: q99 URL-canonicalization dedup and the q100
  * end-to-end pipeline-verdict composition. */
class Round8QueriesSpec extends SparkSuite {
  import spark.implicits._

  // ---- q99: URL canonicalization ----

  test("q99 canonicalUrl applies each rule; path case is preserved") {
    val cases = Seq(
      // scheme/www/port/fragment dropped, host lowered, tracking params
      // filtered, trailing slash stripped — all at once
      ("https://WWW.Example.COM:443/A/b/?utm_source=x&id=2#frag", "example.com/A/b?id=2"),
      // the same page over plain http canonicalizes identically
      ("http://example.com/A/b?id=2", "example.com/A/b?id=2"),
      ("http://www.example.com:80/path", "example.com/path"),
      ("https://example.com/path/", "example.com/path"),
      // host case folds, PATH case does not
      ("https://EXAMPLE.com/CaseSensitive", "example.com/CaseSensitive"),
      // all-tracking query vanishes entirely (no dangling '?')
      ("https://example.com/p?gclid=1&fbclid=2&ref=3&utm_campaign=z", "example.com/p"),
      // surviving params are sorted so param order can't split a group
      ("https://example.com/p?b=2&a=1", "example.com/p?a=1&b=2"))
    val got = cases.map(_._1).toDF("url")
      .select($"url", DedupQueries.canonicalUrl($"url").as("c")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (u, want) => assert(got(u) == want, s"canonical($u)") }
  }

  test("q99 groups partition the corpus and keepers are group maxima") {
    val out = DedupQueries.q99UrlDedup(spark, sf0001).collect()
    val n = Tables.documents(spark, sf0001).count()
    assert(out.map(_.getAs[Long]("n_copies")).sum == n,
      "every document must land in exactly one canonical group")
    assert(out.exists(_.getAs[Long]("n_copies") > 1), "fixture mods must collide")
    val chars = Tables.documents(spark, sf0001)
      .select($"doc_id", $"n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(chars(r.getAs[Long]("keeper_id")) == r.getAs[Long]("keeper_chars"),
        "keeper_chars must be the keeper's own length (and the group max)")
    }
  }

  // ---- q100: pipeline verdict composition ----

  /** Crafted corpus exercising every reason code — including the two the
    * synthetic testdata never produces (bad_encoding, exact_dup) — and
    * the sequential rule that a stage only sees prior survivors. */
  private def pipelineFixture(): String = {
    val dir = tmpDir("q100docs")
    def toks(prefix: String, n: Int): String =
      (1 to n).map(i => s"${prefix}w$i").mkString(" ")
    val dupText = toks("e", 30)
    val nearBase = (1 to 40).map(i => s"nw$i").mkString(" ")
    val quota = (11 to 22).map(i => (i.toLong, "qsrc", toks(s"q$i", 30)))
    (Seq(
      // doc 0: benchmark member (0 % 97 == 0); its shingles contaminate
      (0L, "s0", "alpha beta gamma delta epsilon zeta eta"),
      (1L, "s1", toks("a", 30)),                       // kept
      (2L, "s2", toks("b", 30) + " �"),           // bad_encoding
      (3L, "s3", "tiny"),                              // low_quality
      (4L, "s4", dupText),                             // exact keeper → kept
      (5L, "s5", dupText),                             // exact_dup
      (8L, "s8", nearBase),                            // near-dup keeper → kept
      (9L, "s9", nearBase + " extraZ"),                // near_dup (J = 38/39)
      (10L, "s10", toks("c", 27) + " alpha beta gamma") // contaminated
    ) ++ quota).toDF("doc_id", "source", "text")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q100 emits every reason code with sequential stage semantics") {
    val out = ComposeQueries.q100PipelineVerdict(spark, pipelineFixture())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "benchmark")
    assert(out(1L) == "kept")
    assert(out(2L) == "bad_encoding")
    assert(out(3L) == "low_quality")
    // sequential: doc 5 dies at EXACT dedup, so the near-dup stage sees
    // doc 4 as a singleton — keeper survives, no spurious near_dup
    assert(out(4L) == "kept")
    assert(out(5L) == "exact_dup")
    assert(out(8L) == "kept")
    assert(out(9L) == "near_dup")
    assert(out(10L) == "contaminated")
    // 12 clean docs share one source: exactly SourceQuota survive
    val quotaGroup = (11L to 22L).map(out)
    assert(quotaGroup.count(_ == "kept") == TextQueries.SourceQuota)
    assert(quotaGroup.count(_ == "quota") == 12 - TextQueries.SourceQuota)
  }

  test("q100 on testdata: verdicts partition the corpus and agree with the gates") {
    val out = ComposeQueries.q100PipelineVerdict(spark, sf0001).cache()
    try {
      assert(out.count() == Tables.documents(spark, sf0001).count(),
        "one verdict per document")
      // the first two stages must agree row-for-row with the standalone
      // constituent queries (composition cannot drift from the parts)
      val enc = TextQueries.q98EncodingFilter(spark, sf0001)
        .select($"doc_id", $"keep".as("enc_ok"))
      val bad = out.join(enc, "doc_id")
        .where(($"verdict" === "bad_encoding") =!=
          (!$"enc_ok" && $"doc_id" % DedupQueries.DecontamMod =!= 0))
      assert(bad.isEmpty, "bad_encoding verdicts must match q98's gate exactly")
      val qual = TextQueries.q21TextQuality(spark, sf0001)
        .select($"doc_id", $"quality_ok")
      val badQ = out.join(enc, "doc_id").join(qual, "doc_id")
        .where(($"verdict" === "low_quality") =!=
          ($"enc_ok" && !$"quality_ok" && $"doc_id" % DedupQueries.DecontamMod =!= 0))
      assert(badQ.isEmpty, "low_quality verdicts must match q21's gate among encoding survivors")
    } finally out.unpersist()
  }
}
