package graft

import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, SimilarityQueries, TextQueries}

/** Round-13 operator pins: q151 streaming-gate batch dual, q153
  * continuous-score GK gate. */
class Round13QueriesSpec extends SparkSuite {
  import spark.implicits._

  test("q151: hits bounded by NumBands; matches precede; q26 pairs flagged") {
    val out = DedupQueries.q151AdmissionGate(spark, sf0001).collect()
    val byId = out.map(r => r.getLong(0) ->
      ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out.nonEmpty)
    byId.foreach { case (id, (hits, m, cand)) =>
      assert(hits >= 0 && hits <= DedupQueries.NumBands)
      assert(cand == (hits > 0))
      if (hits > 0) assert(m >= 0 && m < id,
        s"first_match must be an earlier doc: doc=$id match=$m")
    }
    // every q26 VERIFIED pair shares a band, so the later member is
    // gated (banding recall 1.0 on caught pairs — the stream contract)
    val pairs = DedupQueries.q26MinhashPairs(spark, sf0001).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val later = math.max(r.getLong(0), r.getLong(1))
      assert(byId(later)._3, s"pair later member $later must be a candidate")
    }
  }

  test("q154: gate stage composes sequentially — earlier verdicts unchanged " +
      "from q100, gated docs come only from q100's gate-or-later stages, " +
      "and >= 75% of each source's gate entrants survive") {
    import graft.queries.ComposeQueries
    val v100 = ComposeQueries.q100PipelineVerdict(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = ComposeQueries.q154PipelineGated(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val v154 = out.toMap
    assert(v154.values.count(_ == "source_gate") > 0, "gate must not be vacuous")
    val late = Set("source_gate", "quota", "kept")
    v154.foreach { case (id, v) =>
      if (!late(v)) assert(v100(id) == v,
        s"pre-gate stage verdict must match q100: doc=$id q154=$v q100=${v100(id)}")
      else assert(late(v100(id)),
        s"gate entrants are exactly q100's post-contam survivors: doc=$id " +
          s"q154=$v q100=${v100(id)}")
    }
    // per-source survival: ties-kept exact rank semantics guarantee
    // >= 1 - 1/GateDen of the entrants pass the gate
    val src = Tables.documents(spark, sf0001).select($"doc_id", $"source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(d => late(d._2)).groupBy(d => src(d._1)).foreach {
      case (source, ds) =>
        val n = ds.length.toLong
        val gated = ds.count(_._2 == "source_gate").toLong
        assert((n - gated) * graft.queries.TextQueries.GateDen >=
          n * (graft.queries.TextQueries.GateDen - 1),
          s"$source: $gated of $n entrants gated — exceeds the quantile cut")
    }
  }

  test("q155: stored rotated codes reproduce the in-plan ranking (stored_ok " +
      "uniformly true); the search stage itself reads no float column") {
    val S = SimilarityQueries
    val out = S.q155RotCodesAnn(spark, sf0001).collect()
    assert(out.length == S.NumQueries * S.TopK)
    out.foreach { r =>
      assert(r.getBoolean(3), s"stored_ok failed: $r")
      assert(r.getBoolean(4), s"mono_ok failed: $r")
    }
    // production read path: pin the actual READ SCHEMAS (the vacuous
    // form — "no embedding column in a plan over a table that has
    // none" — could never fail; round-13 review finding). The neighbor
    // side must be pruned to exactly (vec_id, pq) and the query-LUT
    // side to (vec_id, codes): column pruning is q118's byte argument.
    val R = graft.jobs.RotIngest
    val (codesT, cbT) = R.ingest(spark, sf0001)
    val schemas = graft.queries.SimilarityQueries
      .pqCodesScan(spark, spark.table(codesT), spark.table(cbT))
      .queryExecution.sparkPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.requiredSchema.fieldNames.toSet
      }
    assert(schemas.exists(_ == Set("vec_id", "pq")),
      s"neighbor scan must prune to (vec_id, pq): $schemas")
    assert(schemas.exists(_ == Set("vec_id", "codes")),
      s"query-LUT scan must prune to (vec_id, codes): $schemas")
    assert(schemas.forall(!_.contains("embedding")), schemas.toString)
  }

  test("q153 divergence fixture: low-accuracy sketch threshold diverges from " +
      "the exact quantile yet stays within its rank guarantee") {
    // 1000 distinct float scores per source — the unbounded-domain case
    // q149's exact machinery cannot aggregate; deterministic spread
    val rows = for {
      src <- Seq("a", "b"); i <- 1 to 1000
    } yield (src, i.toDouble + (if (src == "a") 0.25 else 0.5) + i * 1e-4)
    val scored = rows.toDF("source", "score")
    val acc = 10 // rank error up to n/10 — forces visible divergence
    val out = TextQueries.gkGateCore(spark, scored, acc)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.keySet == Set("a", "b"))
    out.foreach { case (src, (n, p25, kept, ok)) =>
      assert(n == 1000L)
      // exact rank-250 value of this source's sorted scores
      val sorted = rows.filter(_._1 == src).map(_._2).sorted
      assert(p25 == sorted(249), s"$src: exact quantile must be rank ⌈n/4⌉")
      assert(kept == 751L) // all distinct => n − 249 keep
      assert(ok, s"$src: GK rank guarantee must hold at acc=$acc")
    }
    // the sketch threshold itself must DIVERGE from exact somewhere at
    // this accuracy on at least one source (else the fixture is vacuous)
    val thrs = scored.localCheckpoint(false).groupBy($"source")
      .agg(percentile_approx($"score", lit(0.25), lit(acc)).as("t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Map(
      "a" -> rows.filter(_._1 == "a").map(_._2).sorted.apply(249),
      "b" -> rows.filter(_._1 == "b").map(_._2).sorted.apply(249))
    assert(thrs.exists { case (s0, t) => t != exact(s0) },
      s"fixture must exhibit sketch-vs-exact divergence: $thrs vs $exact")
  }

  test("q152 anisotropic fixture: learned-rotation ADC recall beats the " +
      "Hadamard baseline; verdicts hold") {
    val S = SimilarityQueries
    // anisotropic, NON-axis-aligned corpus: latent coords with strongly
    // decaying scales mixed through a fixed dense rotation-ish matrix —
    // the regime where OPQ-P (PCA rotation) pays and a structured
    // energy-spreading rotation cannot (it decorrelates nothing)
    val rnd = new scala.util.Random(13)
    val d = S.EmbDim
    val mix = Array.fill(d, d)(rnd.nextGaussian())
    val scales = Array.tabulate(d)(j => if (j < 6) 40.0 * math.pow(0.7, j) else 0.05)
    // unit-normalized (the embedding-model convention): cosine and L2
    // rankings coincide, so the ADC (an L2 estimator) is measured on
    // rotation quality, not on the norm-variation mismatch
    val vecs = (0L until 256L).map { id =>
      val z = Array.tabulate(d)(j => rnd.nextGaussian() * scales(j))
      val x = Array.tabulate(d)(i =>
        (0 until d).map(j => mix(i)(j) * z(j)).sum / d)
      val nrm = math.sqrt(x.map(v => v * v).sum)
      (id, x.map(v => (v / nrm).toFloat).toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding").localCheckpoint(true)
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact float-cosine truth (the q30 shape over the fixture)
    val en = emb.withColumn("en2", S.norm2($"embedding"))
    val qs = en.where($"vec_id" < S.NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"en2".as("qn2"))
    val sim6 = round(S.cosinePre($"qe", $"embedding", $"qn2", $"en2"), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    val exact = ids(en.join(broadcast(qs), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), sim6.as("sim"))
      .withColumn("rn", row_number().over(w)).where($"rn" <= S.TopK))
    val hadamard = ids(S.opqAdcCore(spark, emb))
    val learned = ids(S.learnedAdcFromRotated(spark,
      S.pcaRotate(spark, emb, S.opqLearnedModel(spark, emb))))
    val (rH, rL) = (hadamard.count(exact.contains), learned.count(exact.contains))
    assert(rL > rH,
      s"learned rotation must beat Hadamard on anisotropic data: " +
        s"learned=$rL hadamard=$rH of ${exact.size}")
    // the quantizer scale is load-bearing: PER-DIM SQ8 after the learned
    // rotation re-normalizes away the variance structure (noise dims
    // re-inflated to signal scale) and the chain collapses
    val perDim = ids(S.pqAdcCore(spark,
      S.pcaRotate(spark, emb, S.opqLearnedModel(spark, emb))))
    assert(rL > perDim.count(exact.contains),
      s"global-scale SQ8 must beat per-dim after rotation " +
        s"(perDim=${perDim.count(exact.contains)})")
    // and the named query's verdict columns on the fixture
    val out = S.learnedOpqCore(spark, emb).collect()
    assert(out.length == S.NumQueries * S.TopK)
    out.foreach { r =>
      assert(r.getBoolean(3), s"dist_ok failed: $r")
      assert(r.getBoolean(4), s"mono_ok failed: $r")
      assert(r.getBoolean(5), s"basis_ok failed: $r")
    }
  }

  test("q152 named query: full grid, verdicts uniformly true on the corpus") {
    val out = SimilarityQueries.q152LearnedOpqAnn(spark, sf0001).collect()
    assert(out.length ==
      SimilarityQueries.NumQueries * SimilarityQueries.TopK)
    out.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5),
        s"verdict failed: $r")
    }
  }

  test("q153 named query: verdicts uniformly true on the corpus; " +
      "keep fraction is at least 1 - q/100 per source") {
    val out = TextQueries.q153GkGate(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, kept, ok) = (r.getLong(1), r.getLong(3), r.getBoolean(4))
      assert(ok, s"${r.getString(0)}: rank guarantee failed")
      // exact-threshold keep: ties at the threshold are kept, so at
      // least (100 - GkGateQ)% of every source survives
      assert(kept * 100L >= n * (100L - TextQueries.GkGateQ),
        s"${r.getString(0)}: kept=$kept of $n")
    }
  }
}
