package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.{ComposeQueries, DedupQueries, EtlQueries, RelationalQueries, SimilarityQueries, TextQueries}

/** Ad-hoc stage profiler for the dedup pipeline (dev tool). */
object Profile {
  def time(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[profile] ${(System.nanoTime() - t0) / 1e9}%8.2f  $name")
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()


  /** q144's shape over any events frame (window lag + tiny-domain agg). */
  private def transitionsOn(spark: SparkSession, ev: DataFrame): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val steps = ev.select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("from_type", lag($"event_type", 1).over(w))
      .where($"from_type".isNotNull)
      .select($"from_type", $"event_type".as("to_type"))
    steps.groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n_trans"))
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // edge probe: a doc with <3 tokens must survive the exploded
    // signature path with a null signature (explode_outer + left join)
    val tiny = Seq((1L, "only two"), (2L, "a b c d e")).toDF("doc_id", "text")
      .select($"doc_id", DedupQueries.shingles($"text").as("shingles"))
    val tinySig = DedupQueries.minhashSignatures(tiny)
    println(s"[profile] empty-shingle probe rows=${tinySig.count()} " +
      s"nullsig=${tinySig.where($"mh_0".isNull).count()}")

    val docs = Tables.documents(spark, dir)
      .select($"doc_id", DedupQueries.shingles($"text").as("shingles"))

    time("shingle arrays only")(noop(docs))
    time("shingle arrays x2")(noop(docs.unionAll(docs)))
    val occ = docs.select($"doc_id", explode($"shingles").as("sh"))
    time("explode occurrences")(noop(occ))
    println(s"[profile] occurrences=${occ.count()} distinct=${occ.select("sh").distinct().count()}")
    val hashCols = (0 until DedupQueries.NumHashes).map(j =>
      DedupQueries.h60(spark, concat(lit(s"$j:"), $"sh")).as(s"h_$j"))
    val shHash = occ.select($"sh").distinct().select($"sh" +: hashCols: _*)
    time("distinct shingle hashes")(noop(shHash))
    val minCols = (0 until DedupQueries.NumHashes).map(j => min(col(s"h_$j")).as(s"mh_$j"))
    val sig = occ.join(shHash, "sh").groupBy($"doc_id").agg(minCols.head, minCols.tail: _*)
    time("sig (join+groupBy)")(noop(sig))
    time("exploded sig (current q25)")(noop(graft.queries.DedupQueries.q25MinhashSig(spark, dir)))
    // candidate: map-only per-row sig — all 16 minhashes inside ONE bind
    // lambda, emitted as a single array column (HOFs are CodegenFallback:
    // no CSE, so the array must be materialized in its own projection)
    val mhArr = graft.functions.Cols.bind(DedupQueries.shingles($"text")) { sh =>
      array((0 until DedupQueries.NumHashes).map { j =>
        array_min(transform(sh, t =>
          DedupQueries.h60(spark, concat(lit(s"$j:"), t))))
      }: _*)
    }
    val perRow = Tables.documents(spark, dir)
      .select($"doc_id", mhArr.as("mhs"))
    val extracted = perRow.select(($"doc_id" +:
      (0 until DedupQueries.NumHashes).map(j => element_at($"mhs", j + 1).as(s"mh_$j"))): _*)
    time("per-row bind-array sig")(noop(extracted))
    time("full q26")(noop(DedupQueries.q26MinhashPairs(spark, dir)))

    // scaling experiment: 10x-unioned corpus (distinct doc_ids) through
    // the signature pipeline — measures how the dedup path scales with
    // corpus size at fixed distinct-shingle vocabulary
    val base = Tables.documents(spark, dir)
    val x10 = (0 until 10).map(i =>
      base.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"), $"text"))
      .reduce(_ unionByName _)
      .select($"doc_id", DedupQueries.shingles($"text").as("shingles"))
    time("sig pipeline on 10x corpus")(noop(DedupQueries.minhashSignatures(x10)))
    val mhArr10 = graft.functions.Cols.bind($"shingles") { sh =>
      array((0 until DedupQueries.NumHashes).map { j =>
        array_min(transform(sh, t =>
          DedupQueries.h60(spark, concat(lit(s"$j:"), t))))
      }: _*)
    }
    time("per-row sig on 10x corpus")(noop(
      x10.select($"doc_id", mhArr10.as("mhs"))
        .select(($"doc_id" +: (0 until DedupQueries.NumHashes)
          .map(j => element_at($"mhs", j + 1).as(s"mh_$j"))): _*)))

    // round-6 scaling: the corpus-dup-gram filter (q83 shape) on a 10x
    // corpus — linear pipeline, so the expectation is ~linear time
    def dupGramOn(docs10: DataFrame): DataFrame = {
      val gw = DedupQueries.DupGramN // derive, so the probe tracks the real q83 shape
      val gramsCol = graft.functions.Cols.bind(split($"text", " ")) { t =>
        val n = size(t)
        val gs = transform(sequence(lit(1), n - (gw - 1)), i =>
          concat_ws(" ", (0 until gw).map(k => element_at(t, i + k)): _*))
        when(n >= gw, gs).otherwise(array().cast("array<string>"))
      }
      val occ10 = docs10.select($"doc_id", explode(gramsCol).as("g_raw"))
        .select($"doc_id", DedupQueries.h60(spark, $"g_raw").as("g"))
      occ10.groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt"))
        .withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy($"g")))
        .groupBy($"doc_id")
        .agg(sum($"cnt").as("n_grams"),
          sum(when($"df" >= 2, $"cnt").otherwise(0L)).as("n_dup"))
    }
    time("dup-gram (q83 shape) on 1x")(noop(dupGramOn(base)))
    val base10 = (0 until 10).map(i =>
      base.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"), $"text"))
      .reduce(_ unionByName _)
    time("dup-gram (q83 shape) on 10x")(noop(dupGramOn(base10)))

    // simhash Hamming-LSH (q86 shape) on a 3x corpus with per-replica
    // token salt (distinct-ish docs): candidate volume is Σ|bucket|², so
    // 3x buckets → ~9x candidates — the documented quadratic term
    def simPairsOn(docs3: DataFrame): DataFrame = {
      // derive band geometry from the real q86 constants
      val bandBits = DedupQueries.SimBits / DedupQueries.NumSimBands
      val mask = (1L << bandBits) - 1
      val bands3 = docs3.select($"doc_id",
        DedupQueries.simhashBits(DedupQueries.h60(spark, _),
          DedupQueries.SimBits)($"text").as("sim"))
        .select($"doc_id", $"sim",
          posexplode(array((0 until DedupQueries.NumSimBands).map(i =>
            shiftright($"sim", i * bandBits).bitwiseAND(lit(mask))): _*))
            .as(Seq("band_idx", "band_val")))
        .localCheckpoint()
      bands3.as("a").join(bands3.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_val") === col("b.band_val") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
        .distinct()
        .select($"doc_a", $"doc_b",
          expr("bit_count(sim_a ^ sim_b)").cast("long").as("hamming"))
        .where($"hamming" <= DedupQueries.HamMax)
    }
    time("simhash pairs (q86 shape) on 1x")(noop(simPairsOn(base)))
    val base3 = (0 until 3).map(i =>
      base.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"),
        concat($"text", lit(s" r$i")).as("text")))
      .reduce(_ unionByName _)
    time("simhash pairs (q86 shape) on 3x")(noop(simPairsOn(base3)))

    // round-7 scaling: the REAL q94 and q95 bodies (shared cores, so the
    // probe can never drift from the measured query) on replicated
    // corpora. q94 is three linear shuffles — expectation ~linear; the
    // q95 scan is queries × corpus map-side — ~linear at fixed queries.
    // round-8: q88 composition stage breakdown (single-scan form)
    {
      val occAll = DedupQueries.q88TaggedOcc(spark, dir).localCheckpoint(false)
      time("q88: tagged occ checkpoint")(occAll.count())
      val shOcc = occAll.where($"kind" === 0).select($"doc_id", $"h")
      val sig = DedupQueries.minhashFromHashedOcc(shOcc)
      time("q88: minhash sig")(noop(sig))
      val cand = DedupQueries.lshCandidates(DedupQueries.bandLabels(sig))
        .localCheckpoint(false)
      time("q88: lsh candidates")(cand.count())
      val candIds = cand.select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
      val candSh = shOcc.join(broadcast(candIds), Seq("doc_id"), "left_semi")
        .groupBy($"doc_id").agg(collect_list($"h").as("shingles"))
      val pairs = DedupQueries.jaccardVerify(cand, candSh).select($"doc_a", $"doc_b")
      time("q88: verified pairs")(noop(pairs))
      time("q88: connected components")(noop(
        graft.operators.ConnectedComponents.components(pairs, "doc_a", "doc_b")))
      time("q88: dup-frac quality")(noop(DedupQueries.dupGramFromOcc(
        occAll.where($"kind" === 1).select($"doc_id", $"h".as("g")))))
      time("q88: full query")(noop(DedupQueries.q88ClusterKeeper(spark, dir)))
    }

    time("dup-run (q94 core) on 1x")(noop(DedupQueries.dupRunCore(spark, base)))
    time("dup-run (q94 core) on 10x")(noop(DedupQueries.dupRunCore(spark, base10)))
    // q147 rides q94's islands + a map-only rebuild — expectation: q94's
    // ~linear curve plus a constant per-row HOF factor
    time("span-scrub (q147 core) on 1x")(noop(DedupQueries.spanScrubCore(spark, base)))
    time("span-scrub (q147 core) on 10x")(noop(DedupQueries.spanScrubCore(spark, base10)))
    // q149/q150: work is domain-sized after the first map-only agg —
    // replicas share the score domain, so expect near-flat curves
    val scoredQ = Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"n_chars".cast("long").as("score"))
    val scoredQ10 = (0 until 10).map(i =>
      scoredQ.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"), $"source", $"score"))
      .reduce(_ unionByName _)
    time("adaptive gate (q149 core) on 1x")(noop(TextQueries.adaptiveGateCore(spark, scoredQ)))
    time("adaptive gate (q149 core) on 10x")(noop(TextQueries.adaptiveGateCore(spark, scoredQ10)))
    time("mad outliers (q150 core) on 1x")(noop(TextQueries.madOutliersCore(spark, scoredQ)))
    time("mad outliers (q150 core) on 10x")(noop(TextQueries.madOutliersCore(spark, scoredQ10)))
    // q153: the sketch pass is one map-side-combinable percentile_approx
    // over the (source, score) rows (state O(Acc·log n)/source); the
    // exact audit adds the source-keyed sort — expect both ~linear in
    // rows, with the sketch term the production-relevant one. Float
    // scores = the unbounded domain q149 cannot aggregate.
    val scoredF = scoredQ.select($"source",
      ($"score".cast("double") / 7.0).as("score"))
    val scoredF10 = scoredQ10.select($"source",
      (($"score" + ($"doc_id" % 13)).cast("double") / 7.0).as("score"))
    time("gk gate (q153 core) on 1x")(noop(TextQueries.gkGateCore(spark, scoredF)))
    time("gk gate (q153 core) on 10x")(noop(TextQueries.gkGateCore(spark, scoredF10)))
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    time("sq8 ann (q95 core) on 1x")(noop(SimilarityQueries.sq8Core(spark, emb)))
    val emb10 = (0 until 10).map(i =>
      emb.select(($"vec_id" + lit(i * 10000000L)).as("vec_id"), $"embedding"))
      .reduce(_ unionByName _)
    time("sq8 ann (q95 core) on 10x")(noop(SimilarityQueries.sq8Core(spark, emb10)))

    // round-8 scaling: the remaining round-7 cores (q92/q93/q96/q97/q98)
    // and the q100 composition, all through the REAL query bodies.
    // Expected ~linear: q97/q98 are map-only, q92's fact side is map-only
    // probes against a fixed KB bitset, q93 adds one group-keyed sort,
    // q96 one sketch exchange + the exact dual's distinct expand. The
    // 10x corpus replicates FULL rows (ids shifted), so q100's exact-
    // dedup stage sees every doc with 9 copies — the dedup stages then
    // run on the ~1x keeper set, the shape a duplicated crawl produces.
    val full10 = (0 until 10).map(i =>
      base.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"),
        $"text", $"source", $"lang", $"n_chars"))
      .reduce(_ unionByName _)
    val li1 = Tables.lineitem(spark, dir)
      .select($"l_returnflag".as("flag"), $"l_extendedprice".as("x"))
    val li10 = (0 until 10).map(_ => li1).reduce(_ unionByName _)
    time("q93 quantile (core) on 1x")(noop(EtlQueries.quantileCore(spark, li1)))
    time("q93 quantile (core) on 10x")(noop(EtlQueries.quantileCore(spark, li10)))
    val dim92 = Tables.customer(spark, dir)
      .where($"c_acctbal" > 9000).select($"c_custkey".as("k"))
    val fact92 = Tables.orders(spark, dir).select($"o_custkey", $"o_orderpriority")
    val fact92x10 = (0 until 10).map(_ => fact92).reduce(_ unionByName _)
    time("q92 bloom (core) on 1x")(noop(EtlQueries.bloomAuditCore(dim92, fact92)))
    time("q92 bloom (core) on 10x facts")(noop(EtlQueries.bloomAuditCore(dim92, fact92x10)))
    time("q96 rollup (core) on 1x")(noop(EtlQueries.rollupDistinctCore(spark, base)))
    time("q96 rollup (core) on 10x")(noop(EtlQueries.rollupDistinctCore(spark, full10)))
    time("q97 chunk (core) on 1x")(noop(TextQueries.chunkCore(spark, base)))
    time("q97 chunk (core) on 10x")(noop(TextQueries.chunkCore(spark, full10)))
    time("q98 encoding (core) on 1x")(noop(TextQueries.encodingCore(spark, base)))
    time("q98 encoding (core) on 10x")(noop(TextQueries.encodingCore(spark, full10)))
    time("q100 pipeline (core) on 1x")(noop(ComposeQueries.pipelineCore(spark, base)))
    time("q100 pipeline (core) on 10x")(noop(ComposeQueries.pipelineCore(spark, full10)))
    // q154: q100 plus one domain-sized aggregation + broadcast-back on
    // the id-level survivor frame — the delta over q100 should be noise
    time("q154 gated pipeline (core) on 1x")(
      noop(ComposeQueries.pipelineCore(spark, base, sourceGate = true)))
    time("q154 gated pipeline (core) on 10x")(
      noop(ComposeQueries.pipelineCore(spark, full10, sourceGate = true)))
    // q151: signature mint (the family cost center, memoized in the
    // named query) + map-only banding + one (band,bh)-keyed partial agg
    // + the re-keyed hit join — expect the q25/q26 ~linear shape
    time("q151 admission gate (core) on 1x")(
      noop(DedupQueries.admissionGateCore(spark, base)))
    time("q151 admission gate (core) on 10x")(
      noop(DedupQueries.admissionGateCore(spark, full10)))
    // q99 map-only canonicalization + one agg; q103 map-only; q104's
    // occurrence frame is distinct (source, shingle-hash) — replication-
    // INVARIANT, so 10x docs should cost ~the extra scan only
    time("q99 url dedup (core) on 1x")(noop(DedupQueries.urlDedupCore(spark, base)))
    time("q99 url dedup (core) on 10x")(noop(DedupQueries.urlDedupCore(spark, full10)))
    time("q103 symbol gate (core) on 1x")(noop(TextQueries.symbolFilterCore(spark, base)))
    time("q103 symbol gate (core) on 10x")(noop(TextQueries.symbolFilterCore(spark, full10)))
    time("q104 source sim (core) on 1x")(noop(DedupQueries.sourceSimilarityCore(spark, base)))
    time("q104 source sim (core) on 10x")(noop(DedupQueries.sourceSimilarityCore(spark, full10)))

    // q106 moves ~2x corpus text through two shuffles (hash-bucket
    // window + doc rebuild) — expect ~linear; on the full10 corpus every
    // segment has 10 copies, so kept counts collapse to ~1x while the
    // shuffle volume is 10x. q107 is map-only (expect scan-bound
    // linear). q108/q109 are one PrefixSumPlan range-sort each over
    // KB-sized rows — expect ~linear with small constants.
    time("q106 segment dedup (core) on 1x")(noop(DedupQueries.segmentDedupCore(spark, base)))
    time("q106 segment dedup (core) on 10x")(noop(DedupQueries.segmentDedupCore(spark, full10)))
    time("q107 classifier (core) on 1x")(noop(TextQueries.classifierCore(spark, base)))
    time("q107 classifier (core) on 10x")(noop(TextQueries.classifierCore(spark, full10)))
    time("q108 shard manifest (core) on 1x")(noop(EtlQueries.shardManifestCore(spark, base)))
    time("q108 shard manifest (core) on 10x")(noop(EtlQueries.shardManifestCore(spark, full10)))
    time("q109 budget select (core) on 1x")(noop(TextQueries.budgetSelectCore(spark, base)))
    time("q109 budget select (core) on 10x")(noop(TextQueries.budgetSelectCore(spark, full10)))

    // q110 over a 10x-replicated embedding corpus: cluster sizes grow
    // 10x, so the within-cluster pair term grows ~100x — this probe
    // measures the quadratic-in-cluster-size reality the SemDeDup paper
    // controls via k ∝ √n (at fixed k, 10x data MUST look superlinear;
    // production re-clusters, keeping cluster size bounded)
    val embBase = Tables.embeddings(spark, dir)
    val embL10 = (0 until 10).map(i =>
      embBase.select(($"vec_id" + lit(i * 10000000L)).as("vec_id"),
        $"embedding", $"label")).reduce(_ unionByName _)
    time("q110 semdedup (core) on 1x")(noop(SimilarityQueries.semDedupCore(spark, embBase)))
    time("q110 semdedup (core) on 10x")(noop(SimilarityQueries.semDedupCore(spark, embL10)))

    // q117 = the same SemDeDup verdict but with k = ceil(sqrt(n)) LEARNED
    // in-engine: at 10x rows k grows ~3.2x, so expected cluster size grows
    // only ~3.2x (vs 10x at fixed labels) and the within-cluster pair term
    // grows ~10x (n^1.5), not ~100x (n^2/k) — the flattening the SemDeDup
    // paper's k ∝ √n contract buys, now measurable against q110 above.
    time("q117 semdedup learned-k on 1x")(
      noop(SimilarityQueries.semDedupLearnedCore(spark, embBase.select($"vec_id", $"embedding"))))
    time("q117 semdedup learned-k on 10x")(
      noop(SimilarityQueries.semDedupLearnedCore(spark, embL10.select($"vec_id", $"embedding"))))

    // q111 over the same 10x embedding corpus: training assign, PQ
    // encode, and the ADC scan are each ONE linear corpus pass against
    // broadcast KB-sized state (codebook / per-query LUTs) — expect
    // ~linear, in contrast to q110's within-cluster quadratic term.
    // (Replicated seed duplicates just co-assign; the codebook stays
    // dense, and sparse codebooks are handled by the keyed LUT anyway.)
    val embCols = embBase.select($"vec_id", $"embedding")
    val embCols10 = embL10.select($"vec_id", $"embedding")
    time("q111 pq-adc (core) on 1x")(noop(SimilarityQueries.pqAdcCore(spark, embCols)))
    time("q111 pq-adc (core) on 10x")(noop(SimilarityQueries.pqAdcCore(spark, embCols10)))
    // q148 = q111 + one O(d log d) integer butterfly per row (map-only):
    // expect q111's curve shifted by a constant per-row factor
    time("q148 opq-adc (core) on 1x")(noop(SimilarityQueries.opqAdcCore(spark, embCols)))
    time("q148 opq-adc (core) on 10x")(noop(SimilarityQueries.opqAdcCore(spark, embCols10)))

    // Event-time operators over a 10x-replicated event stream. USERS are
    // replicated (user_id shifted), so per-user event density — the
    // per-key window length for q112/q113 and the per-(user, half-hour)
    // join fan-in for q114 — stays CONSTANT: the contract these plans
    // scale on. Expect ~linear, dominated by the one user_id shuffle.
    import graft.queries.RelationalQueries
    val evBase = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", $"value",
        org.apache.spark.sql.functions.unix_micros($"ts").as("tus"))
    val evL10 = (0 until 10).map(i =>
      evBase.select(($"user_id" + lit(i * 10000000L)).as("user_id"),
        ($"event_id" + lit(i * 100000000L)).as("event_id"),
        $"event_type", $"value", $"tus")).reduce(_ unionByName _)
    time("q112 skew audit (core) on 1x")(
      noop(RelationalQueries.skewCore(spark, evBase.select($"user_id", $"event_id", $"tus"))))
    time("q112 skew audit (core) on 10x")(
      noop(RelationalQueries.skewCore(spark, evL10.select($"user_id", $"event_id", $"tus"))))
    time("q113 asof join (core) on 1x")(noop(RelationalQueries.asofCore(spark, evBase)))
    time("q113 asof join (core) on 10x")(noop(RelationalQueries.asofCore(spark, evL10)))
    time("q114 interval join (core) on 1x")(noop(RelationalQueries.intervalCore(spark, evBase)))
    time("q114 interval join (core) on 10x")(noop(RelationalQueries.intervalCore(spark, evL10)))

    // q115 over 10x-replicated USER SETS (same 5 types, 10x members):
    // sketches stay K rows/type regardless, so only the distinct
    // occurrence pass should grow — expect ~flat beyond the scan.
    // (The exact audit columns DO grow with set size; production drops
    // them — measured here with audits included.)
    val users1 = evBase.select($"event_type", $"user_id").distinct()
    val users10 = evL10.select($"event_type", $"user_id").distinct()
    time("q115 theta sketch (core) on 1x")(noop(EtlQueries.thetaCore(spark, users1)))
    time("q115 theta sketch (core) on 10x")(noop(EtlQueries.thetaCore(spark, users10)))

    // Round-11 additions at 1x/10x. q119's copies are char-TRANSLATED
    // (distinct gram content per copy, duplicate structure preserved
    // within each copy) so pair volume scales ~linearly — plain
    // replication would push every gram's df over the boilerplate cap
    // and measure the suppression path instead of the pairing path.
    val docsBase = graft.Tables.documents(spark, dir).select($"doc_id", $"text")
    val rot = "abcdefghijklmnopqrstuvwxyz"
    val docs10t = (0 until 10).map(i =>
      docsBase.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"),
        translate($"text", rot, rot.drop(i) + rot.take(i)).as("text")))
      .reduce(_ unionByName _)
    time("q119 winnow dedup (core) on 1x")(
      noop(DedupQueries.substringDedupCore(spark, docsBase)))
    time("q119 winnow dedup (core) on 10x")(
      noop(DedupQueries.substringDedupCore(spark, docs10t)))
    // q122: 10x replication multiplies word FREQUENCIES, not the
    // vocabulary — per-round pair counts aggregate the same vocab-sized
    // table, so expect ~flat beyond the one corpus word-count scan.
    time("q122 bpe merges (core, 20 rounds) on 1x")(
      noop(graft.queries.TextQueries.bpeMergesCore(spark, docsBase, 20)))
    time("q122 bpe merges (core, 20 rounds) on 10x")(
      noop(graft.queries.TextQueries.bpeMergesCore(spark, docs10t, 20)))
    // q132: segmentation runs once per word TYPE (vocabulary-sized, the
    // q122 argument); the corpus pays one explode + one agg shuffle —
    // expect ~flat training term + ~linear rollup term.
    time("q132 wordpiece encode (core) on 1x")(
      noop(graft.queries.TextQueries.wordpieceCore(spark, docsBase, 20)))
    time("q132 wordpiece encode (core) on 10x")(
      noop(graft.queries.TextQueries.wordpieceCore(spark, docs10t, 20)))
    // q121: the distributed side is one covariance fold (17 KB buffers);
    // the eigensolve is fixed d³ driver work — expect ~linear in the fold.
    time("q121 pca model (frame) on 1x") {
      SimilarityQueries.pcaModelFrame(spark, embCols); ()
    }
    time("q121 pca model (frame) on 10x") {
      SimilarityQueries.pcaModelFrame(spark, embCols10); ()
    }

    // q128: stats are one row, packing map-only, and the Hamming scan is
    // two XOR+POPCNT pairs per (query, vector) — expect ~linear in the
    // corpus, with the refine stage fixed at q·k·overfetch rows.
    time("q128 binary ann (core) on 1x")(
      noop(SimilarityQueries.binCore(spark, embCols, SimilarityQueries.BinOverFetch)))
    time("q128 binary ann (core) on 10x")(
      noop(SimilarityQueries.binCore(spark, embCols10, SimilarityQueries.BinOverFetch)))
    // q129: member cosines are map-side against the broadcast query
    // vectors; the single aggregation reduces members straight to
    // per-position maxima — expect ~linear in corpus members.
    time("q129 maxsim (core) on 1x")(
      noop(SimilarityQueries.maxSimCore(spark, embCols)))
    time("q129 maxsim (core) on 10x")(
      noop(SimilarityQueries.maxSimCore(spark, embCols10)))
    // q131: the coarse member shortlist is fixed-size per query member,
    // so the float-scoring stage stays candidate-sized as the corpus
    // grows — the growing term is the packed-bit member scan.
    time("q131 maxsim 2-stage (core) on 1x")(
      noop(SimilarityQueries.plaidCore(spark, embCols, SimilarityQueries.MaxSimShortlist)))
    time("q131 maxsim 2-stage (core) on 10x")(
      noop(SimilarityQueries.plaidCore(spark, embCols10, SimilarityQueries.MaxSimShortlist)))

    // OPQ-lite probe: product quantization assumes the subspaces carry
    // comparable energy; a PCA rotation (q121's basis is orthonormal, so
    // cosine ranking is invariant) redistributes variance across the 8
    // PQ subspaces. Measured question: does rotating before encoding
    // change ADC recall@k vs the exact float top-k? (Reported, not
    // asserted — the answer guides whether an OPQ stage is worth a
    // training pass at 100 TB.)
    {
      val model = SimilarityQueries.pcaModelFrame(spark, embCols)
      val rotated = SimilarityQueries.pcaRotate(spark, embCols, model)
        .localCheckpoint(true)
      def ids(df: DataFrame): Set[(Long, Long)] =
        df.select($"query_id", $"neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = ids(SimilarityQueries.q30KnnBruteForce(spark, dir))
      val adcRaw = ids(SimilarityQueries.pqAdcCore(spark, embCols))
      val adcRot = ids(SimilarityQueries.pqAdcCore(spark, rotated))
      def recall(s: Set[(Long, Long)]): Double =
        s.count(exact.contains).toDouble / exact.size
      println(f"[profile] OPQ-lite: ADC recall@5 raw=${recall(adcRaw)}%.3f " +
        f"rotated=${recall(adcRot)}%.3f (exact=${exact.size} pairs)")
      // q152 production form (allocation + global-scale SQ8) vs the
      // q148 Hadamard baseline on the SAME exact truth — the recall
      // comparison the learned rotation exists for (reported; the
      // anisotropic-fixture assertion lives in Round13QueriesSpec)
      val adcHad = ids(SimilarityQueries.opqAdcCore(spark, embCols))
      val adcLearned = ids(SimilarityQueries.learnedAdcFromRotated(spark,
        SimilarityQueries.pcaRotate(spark, embCols,
          SimilarityQueries.opqLearnedModel(spark, embCols)).localCheckpoint(true)))
      println(f"[profile] q152: ADC recall@5 hadamard=${recall(adcHad)}%.3f " +
        f"learned=${recall(adcLearned)}%.3f (exact=${exact.size} pairs)")
    }
    // q152 scaling: covariance fold is one corpus pass to a ~17 KB
    // driver buffer; rotation map-only literals; downstream is q111's
    // chain — expect the q111/q148 ~linear shape plus the fold.
    time("q152 learned-opq (core) on 1x")(noop(SimilarityQueries.learnedOpqCore(spark, embCols)))
    time("q152 learned-opq (core) on 10x")(noop(SimilarityQueries.learnedOpqCore(spark, embCols10)))

    // round-11b scaling: q135-q138 cores on 1x vs 10x-replicated inputs.
    // Expected ~linear: q135 is map-only (one linear scan per doc);
    // q136's encode is explode + broadcast join + one agg (vocab frozen
    // from the 1x corpus — the production train-once shape); q137 is one
    // user-partitioned window pass + rollup; q138 is two KB-sized
    // summary shuffles + bucket-partitioned windows.
    {
      val docs1 = Tables.documents(spark, dir)
      val docs10 = (0 until 10).map(i =>
        docs1.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"),
          $"text", $"source", $"lang", $"n_chars"))
        .reduce(_ unionByName _)
      time("html extract (q135 core) on 1x")(noop(TextQueries.htmlExtractCore(spark, docs1)))
      time("html extract (q135 core) on 10x")(noop(TextQueries.htmlExtractCore(spark, docs10)))
      val vocabF = {
        val chars = ('a' to 'z').map(_.toString)
        (chars ++ Seq("th", "the", "in", "ing", "er", "ta", "tab"))
          .map(p => (p, (p.length * 37 + p(0).toInt).toLong))
      }
      time("unigram encode (q136 core) on 1x")(noop(TextQueries.unigramEncode(spark, docs1, vocabF)))
      time("unigram encode (q136 core) on 10x")(noop(TextQueries.unigramEncode(spark, docs10, vocabF)))
      val ev1 = Tables.events(spark, dir)
      val ev10 = (0 until 10).map(i =>
        ev1.select(($"event_id" + lit(i * 100000000L)).as("event_id"), $"ts",
          ($"user_id" + lit(i * 10000000L)).as("user_id"),
          $"event_type", $"value", $"props"))
        .reduce(_ unionByName _)
      time("ewma anomaly (q137 core) on 1x")(noop(RelationalQueries.ewmaAnomalyCore(spark, ev1)))
      time("ewma anomaly (q137 core) on 10x")(noop(RelationalQueries.ewmaAnomalyCore(spark, ev10)))
      time("pareto frontier (q138 core) on 1x")(noop(EtlQueries.paretoFrontierCore(spark, docs1)))
      time("pareto frontier (q138 core) on 10x")(noop(EtlQueries.paretoFrontierCore(spark, docs10)))
      // q139: replicated docs multiply per-(source,word) counts, not the
      // vocabulary — the shared-word join frame is replication-invariant,
      // so expect near-flat (the sparse form's scale story)
      time("source drift (q139 core) on 1x")(noop(TextQueries.sourceDriftCore(spark, docs1)))
      time("source drift (q139 core) on 10x")(noop(TextQueries.sourceDriftCore(spark, docs10)))
      // q140: 10 disjoint shifted copies of the co-purchase graph — node
      // AND edge count scale 10x, community structure replicates; per
      // round only the node-sized label vector exchanges
      val e1 = graft.queries.GraphQueries.copurchaseEdgesPartitioned(spark, dir)
      // the union of shifted copies loses e1's HashPartitioning(u) — at
      // warehouse scale the graph lives as a u-bucketed table, so the
      // probe re-materializes the layout the contract assumes (without
      // it the first probe run re-shuffled the EDGES every round: 43s)
      val e10 = graft.operators.Materialize.checkpointPartitioned(
        (0 until 10).map(i =>
          e1.select(($"u" + lit(i * 10000000L)).as("u"),
            ($"v" + lit(i * 10000000L)).as("v")))
          .reduce(_ unionByName _).repartition($"u"))
      time("lpa 3 rounds (q140 core) on 1x")(noop(
        graft.queries.GraphQueries.lpaCore(e1, 3)))
      time("lpa 3 rounds (q140 core) on 10x")(noop(
        graft.queries.GraphQueries.lpaCore(e10, 3)))
      // q143: same disjoint-copy graphs with unit-ish weights derived
      // from the ids — per round only the distance vector exchanges
      def weighted(e: DataFrame) =
        e.select($"u", $"v", (pmod($"u" + $"v", lit(7L)) + 1L).as("w"))
      time("weighted paths (q143 core) on 1x")(noop(
        graft.queries.GraphQueries.weightedPathsCore(weighted(e1), 10L, 4)))
      time("weighted paths (q143 core) on 10x")(noop(
        graft.queries.GraphQueries.weightedPathsCore(weighted(e10), 10L, 4)))
      // q145: disjoint copies replicate the community structure, so each
      // copy follows the 1x label trajectory and the CHECKED stop round
      // is identical — expect near-linear time, same n_rounds
      time("lpa converge (q145 core) on 1x")(noop(
        graft.queries.GraphQueries.lpaConvergeCore(e1)))
      time("lpa converge (q145 core) on 10x")(noop(
        graft.queries.GraphQueries.lpaConvergeCore(e10)))
      // q146: the (u+v)%7 batch selector lands on a different slice per
      // shifted copy (2i·10⁷ mod 7 varies), which is the point — churn
      // volume scales with the graph, and so should the incremental work
      time("lpa edge churn (q146 core) on 1x")(noop(
        graft.queries.GraphQueries.lpaChurnCore(e1,
          (col("u") + col("v")) % lit(7L) === 0L)))
      time("lpa edge churn (q146 core) on 10x")(noop(
        graft.queries.GraphQueries.lpaChurnCore(e10,
          (col("u") + col("v")) % lit(7L) === 0L)))
      // q142: map-only shingle+window df machinery; quotes double the corpus
      time("containment (q142 core) on 1x")(noop(
        graft.queries.DedupQueries.containmentCore(spark,
          graft.queries.DedupQueries.withQuotes(docs1))))
      time("containment (q142 core) on 10x")(noop(
        graft.queries.DedupQueries.containmentCore(spark,
          graft.queries.DedupQueries.withQuotes(docs10))))
      // q144: one window pass + tiny-domain agg over replicated events
      time("transitions (q144 shape) on 1x")(noop(transitionsOn(spark, ev1)))
      time("transitions (q144 shape) on 10x")(noop(transitionsOn(spark, ev10)))
    }

    // Streaming throughput probe: the corpus staged as an 8-file drop
    // dir (maxFilesPerTrigger=1 → 8 micro-batches), driven through the
    // watermarked daily rollup — the stateful-operator rows/s number
    // the batch bench can't show.
    val evRows = graft.Tables.events(spark, dir).count()
    val sdirPath = java.nio.file.Files.createTempDirectory("stream_probe")
    val sdir = sdirPath.toString
    try {
      graft.Tables.events(spark, dir).repartition(8)
        .write.mode("overwrite").parquet(s"$sdir/in")
      val t0s = System.nanoTime()
      graft.streaming.EventStream.runBounded(spark,
        s"$sdir/in/part-*.parquet", "profile_rollup")
      val dts = (System.nanoTime() - t0s) / 1e9
      println(f"[profile] streaming rollup: $evRows rows / 8 micro-batches " +
        f"in $dts%.2f s = ${evRows / dts}%.0f rows/s")
    } finally {
      // repeated profiling runs must not accumulate disk or driver state
      // (ADVICE r10): drop the memory-sink table and the staged corpus copy
      spark.catalog.dropTempView("profile_rollup")
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(sdirPath)
      try walk.iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close() // the walk stream holds directory handles
    }
    // ---- round-14 probes ----
    // q157 batch dual (the ORACLE face of GateStream): per-source prefix
    // census via a (source-equi, doc_id ≤) self-join — quadratic in
    // per-source rows BY DESIGN (it exists to be SQL-replayable; the
    // stream's per-source score-domain state is the scale face, q149 the
    // batch-calibrated form). Measure the quadratic growth honestly.
    val docs157 = Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"n_chars".cast("long").as("score"))
    time("q157 dual 1x")(noop(TextQueries.gateStreamDualCore(spark, docs157)))
    val docs157x10 = (0 until 10).map(i =>
      docs157.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"),
        $"source", $"score")).reduce(_ unionByName _)
    time("q157 dual 10x")(noop(TextQueries.gateStreamDualCore(spark, docs157x10)))
    // q156: the auto-chosen filtered ANN and its post-filter-exact
    // branch (shortlist window + survivor census + deficiency fallback)
    time("q156 auto (named)")(noop(
      SimilarityQueries.q156FilteredAnnAuto(spark, dir)))
    time("q156 postFilterExact branch")(noop(
      SimilarityQueries.postFilterExact(spark, dir,
        SimilarityQueries.FilteredAnnOverFetch)))
    spark.stop()
  }
}
