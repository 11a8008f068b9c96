package graft

import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, SimilarityQueries, TextQueries}

/** Round-11 additions: q119 winnowed exact-substring dedup and q120
  * metadata-filtered ANN (pre-filter vs post-filter strategies). */
class Round11QueriesSpec extends SparkSuite {
  import spark.implicits._

  private val K = DedupQueries.WinnowK // 40
  private val W = DedupQueries.WinnowW // 20

  /** Deterministic filler with no 40-char repeats across seeds (seeded
    * JVM LCG — the spec'd java.util.Random sequence, stable everywhere). */
  private def filler(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }

  // ---- q119: winnowing detection guarantee ----

  test("q119 guarantee: a shared run of K+W-1 chars is detected at ANY alignment") {
    // shared is exactly K+W-1 = 59 chars — the theoretical minimum
    val shared = filler(99, K + W - 1)
    val docs = Seq(
      (1L, filler(1, 80) + shared + filler(2, 80)),
      (2L, filler(3, 37) + shared + filler(4, 123)), // different offsets
      (3L, filler(5, 200))                           // control: no shared run
    ).toDF("doc_id", "text")
    val pairs = DedupQueries.substringDedupCore(spark, docs).collect()
    assert(pairs.length == 1, s"exactly the (1,2) pair, got ${pairs.toSeq}")
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    // the sample gram must be a verbatim substring of BOTH documents
    val g = pairs(0).getAs[String]("sample_gram")
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts(1L).contains(g) && texts(2L).contains(g))
  }

  test("q119 alignment-robustness: shingle family misses what winnowing catches") {
    // the shared run has NO space alignment with the surrounding text —
    // token 3-shingles differ between the two docs, but q119 pairs them
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    assert(shared.length >= K + W - 1)
    val docs = Seq(
      (1L, "prefixword " + shared + " suffixone"),
      (2L, "a completely different beginning here x" + shared + "y distinct end")
    ).toDF("doc_id", "text")
    val pairs = DedupQueries.substringDedupCore(spark, docs).collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == 1L)
    // the 3-token-shingle view of doc 2 glues 'x' onto the run's first
    // token, so the shingle sets share nothing at the junction tokens
    val sh = docs.select($"doc_id", DedupQueries.shingles($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(!sh(1L).subsetOf(sh(2L)))
  }

  test("q119 negative: runs shorter than K chars can never pair") {
    val shared = filler(50, K - 1) // 39 chars < K
    val docs = Seq(
      (1L, filler(6, 100) + shared + filler(7, 100)),
      (2L, filler(8, 100) + shared + filler(9, 100))
    ).toDF("doc_id", "text")
    assert(DedupQueries.substringDedupCore(spark, docs).count() == 0)
  }

  test("q119 density: selection keeps ~2/(W+1) of positions, never all") {
    val docs = Tables.documents(spark, sf0001)
    val nPos = docs.where(length($"text") >= K)
      .agg(sum(length($"text") - K + 1)).as[Long].head()
    // distinct-per-doc dedup only shrinks, so this bounds raw selection
    val nSel = DedupQueries.winnowedFingerprints(spark, docs).count()
    val density = nSel.toDouble / nPos
    assert(density > 1.0 / (W + 1), s"winnow must select every window: $density")
    assert(density < 4.0 / (W + 1), s"selection should be sparse: $density")
  }

  test("q119 boilerplate cap: grams hotter than WinnowDfCap never pair") {
    // identical docs ⇒ identical winnowed gram sets ⇒ every gram's df is
    // exactly the copy count. Above the cap, pairing is suppressed (the
    // corpus-wide-boilerplate guard — exact mass duplication is q24's
    // job); at or below it, all pairs survive.
    val text = filler(77, 200)
    val hot = (1 to DedupQueries.WinnowDfCap + 4).map(i => (i.toLong, text))
      .toDF("doc_id", "text")
    assert(DedupQueries.substringDedupCore(spark, hot).count() == 0,
      "df > cap must suppress pairing, not explode quadratically")
    val warm = (1 to DedupQueries.WinnowDfCap).map(i => (i.toLong, text))
      .toDF("doc_id", "text")
    val n = DedupQueries.WinnowDfCap.toLong
    assert(DedupQueries.substringDedupCore(spark, warm).count() == n * (n - 1) / 2,
      "df = cap is inclusive — all pairs emitted")
  }

  // ---- q120: filtered ANN ----

  test("q120 pre-filter: neighbors satisfy the predicate, k rows per query") {
    val out = SimilarityQueries.q120FilteredAnn(spark, sf0001)
      .collect()
    val en = Tables.documents(spark, sf0001).where($"lang" === "en")
      .select($"doc_id").as[Long].collect().toSet
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(en.contains(r.getAs[Long]("neighbor_id")),
        s"neighbor ${r.getAs[Long]("neighbor_id")} must be an 'en' doc")
    }
    val perQuery = out.groupBy(_.getAs[Long]("query_id")).map(_._2.length)
    assert(perQuery.forall(_ == SimilarityQueries.TopK))
  }

  test("q120 post-filter: exact at unbounded over-fetch, lossy at k") {
    val exact = SimilarityQueries.q120FilteredAnn(spark, sf0001)
      .select($"query_id", $"neighbor_id", $"rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // over-fetch ≥ corpus ⇒ post-filter degenerates to pre-filter exactly
    val full = SimilarityQueries.q120PostFilter(spark, sf0001, 1000)
      .select($"query_id", $"neighbor_id", $"rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == exact, "unbounded over-fetch must equal the pre-filter result")
    // over-fetch 1 keeps only k unfiltered candidates — recall suffers
    val tight = SimilarityQueries.q120PostFilter(spark, sf0001, 1)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactIds = exact.map(t => (t._1, t._2))
    val recall = tight.count(exactIds.contains).toDouble / exactIds.size
    assert(recall < 1.0,
      s"bounded over-fetch must demonstrate the miss mode (recall=$recall)")
  }

  test("q156 auto chooser: crossover pinned either side of the threshold; " +
      "post+fallback branch is EXACT even when starved into the fallback; " +
      "the named query equals the pre-filter ground truth") {
    import SimilarityQueries.FilteredAnnSelThreshold
    // the decision, either side of the crossover
    assert(SimilarityQueries.filteredAnnChoose(FilteredAnnSelThreshold - 0.01) == "pre")
    assert(SimilarityQueries.filteredAnnChoose(FilteredAnnSelThreshold + 0.01) == "post")
    assert(SimilarityQueries.filteredAnnChoose(FilteredAnnSelThreshold) == "post")
    val exact = SimilarityQueries.q120FilteredAnn(spark, sf0001)
      .select($"query_id", $"neighbor_id", $"sim", $"rn").collect()
      .map(_.toSeq).toSet
    // over-fetch 1: many queries lack TopK matching rows in a k-row
    // shortlist, so the deficiency fallback carries real weight — the
    // result must STILL be exact (q120PostFilter at the same over-fetch
    // is measurably lossy, pinned above)
    val starved = SimilarityQueries.postFilterExact(spark, sf0001, 1)
      .select($"query_id", $"neighbor_id", $"sim", $"rn").collect()
      .map(_.toSeq).toSet
    assert(starved == exact, "post+fallback must be exact under starvation")
    val normal = SimilarityQueries.postFilterExact(spark, sf0001,
      SimilarityQueries.FilteredAnnOverFetch)
      .select($"query_id", $"neighbor_id", $"sim", $"rn").collect()
      .map(_.toSeq).toSet
    assert(normal == exact)
    // the registered entry (whichever branch the corpus selectivity picks)
    val auto = SimilarityQueries.q156FilteredAnnAuto(spark, sf0001)
      .select($"query_id", $"neighbor_id", $"sim", $"rn").collect()
      .map(_.toSeq).toSet
    assert(auto == exact)
  }

  test("q119 native winnow_grams == HOF formulation on the corpus") {
    // the VecSpec pattern: the codegen'd expression must select the
    // IDENTICAL (doc_id, gram) set as the declarative chain the DuckDB
    // oracle mirrors — on real documents plus the synthetic edge shapes
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .unionByName(Seq(
        (9001L, filler(11, K)),          // exactly one gram
        (9002L, filler(12, K + W - 1)),  // exactly one full window
        (9003L, "x" * 200)               // all-identical hashes (ties)
      ).toDF("doc_id", "text"))
    val native = DedupQueries.winnowedFingerprints(spark, docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val hof = DedupQueries.winnowedFingerprintsHof(spark, docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(native == hof)
    assert(native.nonEmpty)
  }

  test("q119 winnow_grams on the SQL surface") {
    val n = spark.sql(
      s"SELECT size(winnow_grams('${"ab" * 60}', $K, $W)) AS n")
      .head().getInt(0)
    assert(n >= 1)
  }

  test("q119 plan: the df window exchange is reused by both pairing sides") {
    // expected exchanges: gram window (1, REUSED by the self-join's two
    // sides), pair groupBy (1), presentation sort (1). A 4th exchange
    // would mean the self-join re-shuffles a side the window already
    // hash-partitioned on gram.
    val n = countShuffles(
      DedupQueries.q119SubstringDedup(spark, sf0001))
    assert(n <= 3, s"pairing must reuse the gram-partitioned exchange, got $n")
  }

  // ---- q121: PCA (Jacobi eigensolver + projection) ----

  test("q121 jacobi: known 2x2 eigensystem with sign convention") {
    val (vals, vecs) = graft.functions.Eigen.jacobi(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val s2 = 1.0 / math.sqrt(2.0)
    // sign convention: largest-|component| positive (ties → lowest index)
    assert(vecs(0).zip(Array(s2, s2)).forall(t => math.abs(t._1 - t._2) < 1e-12))
    assert(vecs(1).zip(Array(s2, -s2)).forall(t => math.abs(t._1 - t._2) < 1e-12))
  }

  test("q121 jacobi: random symmetric matrix — residual, orthonormality, determinism") {
    val r = new scala.util.Random(7)
    val d = 16
    val m = Array.fill(d, d)(r.nextGaussian())
    val sym = Array.tabulate(d, d)((i, j) => (m(i)(j) + m(j)(i)) / 2)
    val (vals, vecs) = graft.functions.Eigen.jacobi(sym)
    // A v = λ v
    for (k <- 0 until d) {
      val av = sym.map(row => row.zip(vecs(k)).map(t => t._1 * t._2).sum)
      val resid = av.zip(vecs(k).map(_ * vals(k)))
        .map(t => math.abs(t._1 - t._2)).max
      assert(resid < 1e-9, s"eigenpair $k residual $resid")
    }
    // orthonormal rows
    for (a <- 0 until d; b <- a until d) {
      val dot = vecs(a).zip(vecs(b)).map(t => t._1 * t._2).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-10)
    }
    // bit-identical re-run
    val (vals2, vecs2) = graft.functions.Eigen.jacobi(sym)
    assert(vals.sameElements(vals2) && vecs.zip(vecs2).forall(t => t._1.sameElements(t._2)))
  }

  test("q121 model: basis orthonormal; top-R beats both trace share and axis projection") {
    val (vals, vecs, _) = SimilarityQueries.pcaModel(spark, sf0001)
    val d = vals.length
    val R = SimilarityQueries.PcaComponents
    for (a <- 0 until R; b <- a until R) {
      val dot = vecs(a).zip(vecs(b)).map(t => t._1 * t._2).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9)
    }
    val trace = vals.sum
    val topR = vals.take(R).sum
    assert(topR >= trace * R / d - 1e-9,
      "top-R eigenvalues must capture at least the mean share of variance")
    // PCA-optimality probe: the captured variance must beat projecting
    // onto ANY R coordinate axes — in particular the R highest-variance
    // coordinates (axis variance = covariance diagonal)
    val emb = Tables.embeddings(spark, sf0001)
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = emb.length.toDouble
    val mu = emb.transpose.map(_.sum / n)
    val diag = emb.transpose.zip(mu).map { case (xs, m) =>
      xs.map(x => (x - m) * (x - m)).sum / n }
    assert(topR >= diag.sorted.reverse.take(R).sum - 1e-9)
  }

  test("q121 rotation: cosine ranking invariant; PQ recall does not degrade") {
    val emb = Tables.embeddings(spark, sf0001).select($"vec_id", $"embedding")
    val model = SimilarityQueries.pcaModelFrame(spark, emb)
    val rotated = SimilarityQueries.pcaRotate(spark, emb, model)
      .localCheckpoint(true)
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ids(SimilarityQueries.q30KnnBruteForce(spark, sf0001))
    // orthonormal (full-basis, centered) rotation preserves the exact
    // cosine top-k — the correctness contract OPQ relies on. The shift
    // by -mu changes norms, so compare the rotation WITHOUT centering:
    // use uncentered basis projection for the invariance check
    val uncentered = SimilarityQueries.pcaRotate(spark, emb,
      (model._1, model._2, Array.fill(model._3.length)(0.0)))
      .localCheckpoint(true)
    def brute(frame: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      import org.apache.spark.sql.expressions.Window
      val en = frame.withColumn("en2", SimilarityQueries.norm2($"embedding"))
      val qs = en.where($"vec_id" < SimilarityQueries.NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"en2".as("qn2"))
      val sim6 = round(SimilarityQueries.cosinePre($"qe", $"embedding", $"qn2", $"en2"), 6)
      val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
      ids(en.join(broadcast(qs), $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"), sim6.as("sim"))
        .withColumn("rn", row_number().over(w))
        .where($"rn" <= SimilarityQueries.TopK))
    }
    assert(brute(uncentered) == exact,
      "orthonormal rotation must preserve the exact cosine top-k")
    // and the point of rotating: PQ recall must not degrade (it jumps
    // 0.16 → 0.36 at sf0.1 — SCALE.md; fixture asserts the weak side)
    val adcRaw = ids(SimilarityQueries.pqAdcCore(spark, emb))
    val adcRot = ids(SimilarityQueries.pqAdcCore(spark, rotated))
    val (rRaw, rRot) = (adcRaw.count(exact.contains), adcRot.count(exact.contains))
    assert(rRot >= rRaw, s"rotated ADC recall $rRot/${exact.size} must be >= raw $rRaw/${exact.size}")
  }

  test("q121 verdicts: Bessel residual non-negative for every vector") {
    val out = SimilarityQueries.q121PcaProject(spark, sf0001).collect()
    assert(out.length == Tables.embeddings(spark, sf0001).count())
    assert(out.forall(_.getAs[Boolean]("resid_nonneg")))
  }

  // ---- q124/q125: incremental winnow + cluster decision ----

  test("q124 incremental: sides partition correctly and grams are verbatim in both docs") {
    val out = DedupQueries.q124IncrementalWinnow(spark, sf0001).collect()
    assert(out.nonEmpty)
    val texts = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val (b, c, g) = (r.getLong(0), r.getLong(1), r.getAs[String]("sample_gram"))
      assert(b % DedupQueries.IncBatchMod == 0 && c % DedupQueries.IncBatchMod != 0)
      assert(texts(b).contains(g) && texts(c).contains(g),
        s"gram must be verbatim in batch doc $b and corpus doc $c")
    }
  }

  test("q125 clusters: star CC matches min-label CC on the q119 pair graph; keeper is longest") {
    val pairs = DedupQueries.substringDedupCore(spark,
        Tables.documents(spark, sf0001))
      .select($"doc_a", $"doc_b").localCheckpoint(true)
    val star = graft.operators.ConnectedComponents
      .componentsStar(pairs, "doc_a", "doc_b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val label = graft.operators.ConnectedComponents
      .components(pairs, "doc_a", "doc_b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == label, "both CC algorithms must agree on the corpus pair graph")
    val out = DedupQueries.q125WinnowClusters(spark, sf0001).collect()
    val chars = Tables.documents(spark, sf0001)
      .select($"doc_id", $"n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (_, rows) =>
      assert(rows.count(_.getAs[Boolean]("keep")) == 1)
      val keeper = rows.find(_.getAs[Boolean]("keep")).get.getAs[Long]("doc_id")
      val maxChars = rows.map(r => chars(r.getAs[Long]("doc_id"))).max
      assert(chars(keeper) == maxChars, "keeper must be a longest member")
      assert(rows.forall(_.getAs[Long]("n_members") == rows.length))
    }
  }

  // ---- q123: ADC shortlist → exact refine ----

  test("q123 refine: corpus-wide shortlist degenerates to the exact brute force") {
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding")
    val n = emb.count().toInt
    val full = SimilarityQueries.refineCore(spark, emb, n)
      .select($"query_id", $"neighbor_id", $"sim", $"rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val brute = SimilarityQueries.q30KnnBruteForce(spark, sf0001)
      .select($"query_id", $"neighbor_id", $"sim", $"rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(full == brute)
  }

  test("q123 refine: exact re-ranking recovers at least the raw ADC recall") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ids(SimilarityQueries.q30KnnBruteForce(spark, sf0001))
    val adc = ids(SimilarityQueries.q111PqAdcAnn(spark, sf0001))
    val refined = ids(SimilarityQueries.q123RefineAnn(spark, sf0001))
    val rAdc = adc.count(exact.contains).toDouble / exact.size
    val rRef = refined.count(exact.contains).toDouble / exact.size
    assert(rRef >= rAdc,
      s"refined recall $rRef must not fall below raw ADC recall $rAdc")
    assert(rRef > 0.5, s"over-fetch 4 should recover most true neighbors: $rRef")
  }

  // ---- q122: BPE merge learning ----

  private def bpe(n: Int, texts: String*): Seq[(Int, String, String, Long)] =
    TextQueries.bpeMergesCore(spark, texts.toDF("text"), n).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("q122 merge order: frequency first, then lexicographic tie-break") {
    // (a,b) appears 3×, (a,c) once → rank 1 = (a,b,3), rank 2 = (a,c,1)
    assert(bpe(2, "ab ab ab ac") ==
      Seq((1, "a", "b", 3L), (2, "a", "c", 1L)))
  }

  test("q122 overlap: left-to-right non-overlapping merge inside a word") {
    // 'aaa' counts pair (a,a) twice but merges only the LEFT occurrence:
    // [a,a,a] → [aa,a], so round 2 learns (aa,a), never (a,aa)
    assert(bpe(2, "aaa") == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("q122 boundary: a merge never fires inside a multi-char symbol") {
    // round 1 merges (b,c) everywhere → 'abc' becomes [a,bc]; round 2's
    // (a,b) must NOT match [a,bc] (the symbol 'bc' merely STARTS with b);
    // round 3 then sees the intact (a,bc) pair. A boundary bug would
    // collapse 'abc' at round 2 and erase the rank-3 row.
    assert(bpe(3, "bc bc bc bc ab ab ab abc") ==
      Seq((1, "b", "c", 5L), (2, "a", "b", 3L), (3, "a", "bc", 1L)))
  }

  test("q122 exhaustion: stops early when no pairs remain") {
    assert(bpe(5, "ab") == Seq((1, "a", "b", 1L)))
  }

  test("q120 plan: predicate semi-join broadcasts; no vector shuffle before scoring") {
    val plan = SimilarityQueries.q120FilteredAnn(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"metadata predicate must reach the corpus as a broadcast join:\n$plan")
    // two shuffles: the per-query top-k window + the final presentation
    // orderBy (pins that neither the semi-join nor the scoring join
    // exchanges the embedding rows)
    val n = countShuffles(SimilarityQueries.q120FilteredAnn(spark, sf0001))
    assert(n == 2, s"expected top-k + orderBy exchanges only, got $n")
  }
}
