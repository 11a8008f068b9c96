package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (Array[Float], 64-dim).
  *
  * Engine-portability: cosine is computed with one explicit formula —
  * dot/(sqrt(na)*sqrt(nb)) — in BOTH the Spark HOF chain and the oracle
  * SQL, over double-cast elements, accumulated in array order. The ranking
  * key is the cosine ROUNDED to 6 decimals with a vec_id tie-break, so an
  * ulp-level disagreement between engines cannot flip ranks; float inputs
  * make the true gap between distinct cosines >> 1e-6.
  *
  * Scale design:
  *  - Brute-force top-k: the query set is broadcast; the corpus is scanned
  *    map-side only (one shuffle for the per-query top-k). k rows per
  *    query survive the partial Window — with TopKPerGroup at 1000
  *    executors this is a per-partition heap + single merge.
  *  - IVF: centroids from the `label` column (k-means assignment stand-in);
  *    probe only the nearest bucket → corpus-scan cost / n_buckets.
  *  - Near-dup: blocked on `label` so the quadratic term is bounded per
  *    block; at 100 TB blocks come from LSH/IVF assignment, same shape.
  */
object SimilarityQueries {

  type Q = (SparkSession, String) => DataFrame

  val TopK = 5
  val NumQueries = 5       // vec_id < 5 are the query vectors
  /** The synthetic embeddings have max within-cluster cosine ~0.47, so the
    * "near-dup" cut sits at 0.35 to exercise a non-trivial result set. */
  val NearDupThreshold = 0.35

  // ---- Spark-side vector primitives ----
  // Native codegen Expressions (graft.functions.Vec), not HOFs: the
  // aggregate(zip_with(...)) chain is CodegenFallback — interpreted per
  // element per row, the dominant cost of q31 in round 1 (4.8s at sf0.1).
  // Values are bit-identical (same left-to-right double fold), so every
  // oracle hash is unchanged. HOF mirrors are pinned equal in VecSpec.

  def dot(a: Column, b: Column): Column =
    graft.functions.Vec.dotCol(SparkSession.active, a, b)

  def norm2(a: Column): Column =
    graft.functions.Vec.norm2Col(SparkSession.active, a)

  /** The round-1 HOF formulations, kept as the equivalence oracle for
    * VecSpec (and as documentation of the portable semantics). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2Hof(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Cosine with PRE-COMPUTED squared norms: in a pairwise join each
    * side's norm is computed once per input row instead of once per pair
    * (n+m norms instead of n×m). Numerically identical to `cosine`. */
  def cosinePre(a: Column, b: Column, na2: Column, nb2: Column): Column =
    dot(a, b) / (sqrt(na2) * sqrt(nb2))

  // ---- oracle-side mirrors ----

  private def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
  private def sqlNorm2(a: String): String =
    s"list_sum(list_transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
  private[queries] def sqlCosine(a: String, b: String): String =
    s"(${sqlDot(a, b)} / (sqrt(${sqlNorm2(a)}) * sqrt(${sqlNorm2(b)})))"

  /** q30: brute-force cosine top-k for a broadcast query set (the exact
    * baseline every ANN variant is measured against). */
  def q30KnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
      .withColumn("en2", norm2($"embedding"))
    val queries = emb.where($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"en2".as("qn2"))
    val sim6 = round(cosinePre($"qe", $"embedding", $"qn2", $"en2"), 6)
    val scored = emb.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), sim6.as("sim"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    scored.withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK)
      .orderBy($"query_id", $"rn")
  }

  val q30Sql: String = {
    val cos = sqlCosine("q.embedding", "e.embedding")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id, round($cos, 6) AS sim
       |  FROM embeddings e JOIN q ON e.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, sim, rn FROM (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
       |  FROM scored)
       |WHERE rn <= $TopK
       |ORDER BY query_id, rn""".stripMargin
  }

  /** q31: embedding-cosine near-duplicate pairs, blocked by cluster label
    * (bounded quadratic per block), over a deterministic 1/4 audit sample
    * of each side (X1 sampling shape) so the pairwise term stays bounded
    * as the corpus scales. */
  def q31EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
      .where($"vec_id" % 4 === 0)
      .select($"vec_id", $"label", $"embedding", norm2($"embedding").as("n2"))
    emb.as("a").join(emb.as("b"),
        $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select($"a.label".as("label"), $"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        round(cosinePre($"a.embedding", $"b.embedding", $"a.n2", $"b.n2"), 6).as("sim"))
      .where($"sim" >= NearDupThreshold)
      .orderBy($"vec_a", $"vec_b")
  }

  val q31Sql: String = {
    val cos = sqlCosine("a.embedding", "b.embedding")
    s"""SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round($cos, 6) AS sim
       |FROM embeddings a JOIN embeddings b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE a.vec_id % 4 = 0 AND b.vec_id % 4 = 0
       |  AND round($cos, 6) >= $NearDupThreshold
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** IVF-style ANN, multiprobe: elementwise-mean centroid per label
    * bucket, probe the `nprobe` nearest buckets per query, exact search
    * inside the probed buckets, global top-k across them. Scan cost ∝
    * nprobe/n_buckets of the corpus; recall is tunable — at nprobe =
    * n_buckets this provably equals the q30 brute force (IvfRecallSpec
    * pins both ends). */
  /** Elementwise-mean centroid per `label`: per-position partial sums +
    * count in ONE shuffle, k×dim cells out (shared by q32 IVF and the q59
    * Lloyd step). Column names: (c_label, centroid).
    *
    * Round-19: the per-dim fan of 64 `sum(element_at(...))` aggregates
    * became ONE [[graft.functions.VecAggSumDouble]] — same float→double
    * widening, same partial/merge tree, same per-element `sum/cnt`
    * division, so centroid values are unchanged; the PLAN shrinks from
    * 65 aggregate expressions to 2 (guide §7.3 plan-size cost — this
    * subtree is re-optimized per AQE stage in every consumer loop). */
  def labelCentroids(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    emb.groupBy(col("label"))
      .agg(graft.functions.VecAgg.sumDCol(s, col("embedding")).as("ssum"),
        count(lit(1)).as("s_cnt"))
      .select(col("label").as("c_label"),
        transform(col("ssum"), v => v / col("s_cnt")).as("centroid"))
  }

  def ivfAnn(s: SparkSession, dir: String, nprobe: Int): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val cents = labelCentroids(emb)
    val queries = emb.where($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    // nprobe nearest centroids per query (centroids are tiny: broadcast)
    val wq = Window.partitionBy($"query_id")
      .orderBy(round(cosine($"qe", $"centroid"), 6).desc, $"c_label".asc)
    val probe = queries.join(broadcast(cents), lit(true))
      .withColumn("crn", row_number().over(wq)).where($"crn" <= nprobe)
      .select($"query_id", $"qe", $"c_label".as("bucket"))
    // exact search within the probed buckets only; one global top-k merge
    val sim6 = round(cosine($"qe", $"embedding"), 6)
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    Tables.embeddings(s, dir).join(broadcast(probe),
        $"label" === $"bucket" && $"vec_id" =!= $"query_id")
      .select($"query_id", $"bucket", $"vec_id".as("neighbor_id"), sim6.as("sim"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK)
      .orderBy($"query_id", $"rn")
  }

  /** q32: the oracle-checked IVF entry at nprobe=1 (the SQL mirror probes
    * a single bucket; multiprobe recall lives in IvfRecallSpec). */
  def q32IvfAnn(s: SparkSession, dir: String): DataFrame =
    ivfAnn(s, dir, nprobe = 1)

  val q32Sql: String = {
    val cosQC = sqlCosine("q.qe", "c.centroid")
    val cosQE = sqlCosine("p.qe", "e.embedding")
    s"""WITH pos AS (
       |  SELECT label, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
       |  FROM embeddings),
       |cents AS (
       |  SELECT label AS c_label, list(CAST(sv AS DOUBLE) ORDER BY i) AS centroid
       |  FROM (SELECT label, i, SUM(CAST(v AS DOUBLE)) / COUNT(*) AS sv
       |        FROM pos GROUP BY label, i)
       |  GROUP BY label),
       |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < $NumQueries),
       |probe AS (
       |  SELECT query_id, qe, c_label AS bucket FROM (
       |    SELECT q.query_id, q.qe, c.c_label,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY round($cosQC, 6) DESC, c.c_label ASC) AS crn
       |    FROM q CROSS JOIN cents c)
       |  WHERE crn = 1)
       |SELECT query_id, bucket, neighbor_id, sim, rn FROM (
       |  SELECT p.query_id, p.bucket, e.vec_id AS neighbor_id,
       |    round($cosQE, 6) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY round($cosQE, 6) DESC, e.vec_id ASC) AS rn
       |  FROM embeddings e JOIN probe p ON e.label = p.bucket AND e.vec_id <> p.query_id)
       |WHERE rn <= $TopK
       |ORDER BY query_id, rn""".stripMargin
  }

  // ---- q59: k-means Lloyd assignment step ----

  /** q59: one Lloyd iteration over the embedding corpus — recompute the
    * elementwise-mean centroid of every current `label` bucket, then
    * reassign EVERY vector to its nearest centroid by cosine. This is the
    * clustering step a data-curation pipeline iterates to build the IVF
    * buckets q32 probes (and the taar_similarity donor-clustering shape).
    *
    * Scale design: centroids are ONE shuffle (per-position partial sums,
    * k×dim cells); the assignment is a broadcast cross join (k centroids ×
    * corpus, map-side) with a row_number top-1 that WindowGroupLimit
    * collapses to a per-partition argmax — the corpus never reshuffles.
    * Determinism: ranking and output use round(cosine, 6) with a label
    * tie-break; raw float sums never surface (the q30-q32 recipe).
    * `moved` marks vectors whose assignment changed — SUM(moved) is the
    * convergence metric a driver loop would watch. */
  def q59KmeansAssign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val cents = labelCentroids(emb)
    val w = Window.partitionBy($"vec_id")
      .orderBy(round(cosine($"embedding", $"centroid"), 6).desc, $"c_label".asc)
    emb.join(broadcast(cents), lit(true))
      .withColumn("crn", row_number().over(w)).where($"crn" === 1)
      .select($"vec_id", $"label",
        $"c_label".as("new_label"),
        round(cosine($"embedding", $"centroid"), 6).as("sim"),
        ($"c_label" =!= $"label").cast("int").as("moved"))
      .orderBy($"vec_id")
  }

  val q59Sql: String = {
    val cos = sqlCosine("e.embedding", "c.centroid")
    s"""WITH pos AS (
       |  SELECT label, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
       |  FROM embeddings),
       |cents AS (
       |  SELECT label AS c_label, list(CAST(sv AS DOUBLE) ORDER BY i) AS centroid
       |  FROM (SELECT label, i, SUM(CAST(v AS DOUBLE)) / COUNT(*) AS sv
       |        FROM pos GROUP BY label, i)
       |  GROUP BY label)
       |SELECT vec_id, label, new_label, sim, moved FROM (
       |  SELECT e.vec_id, e.label, c.c_label AS new_label,
       |    round($cos, 6) AS sim,
       |    CAST(c.c_label <> e.label AS INT) AS moved,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY round($cos, 6) DESC, c.c_label ASC) AS crn
       |  FROM embeddings e CROSS JOIN cents c)
       |WHERE crn = 1
       |ORDER BY vec_id""".stripMargin
  }

  // ---- q90: semantic decontamination (embedding-space benchmark overlap) ----

  /** Holdout membership for the semantic check: every this-many-th
    * vector plays the benchmark set (the q61 convention). */
  val SemDecontamMod = 97

  /** Contamination cut: NearDupThreshold — the corpus's own "these are
    * semantically the same item" line (max within-cluster cosine ~0.47). */
  val SemDecontamThreshold: Double = NearDupThreshold

  /** q90: SEMANTIC decontamination — flag every training vector whose
    * max cosine against the benchmark/holdout set crosses the
    * contamination cut. This is the embedding-space complement of q61's
    * n-gram decontamination: paraphrased or re-tokenized benchmark items
    * share no shingles but still sit next to their source in embedding
    * space, which is why modern pipelines run BOTH checks.
    *
    * Scale design (the q61/q30 shape): the benchmark is ~1/
    * [[SemDecontamMod]] of the corpus, deduplicated and BROADCAST; the
    * training side is scanned map-side (norms precomputed per row, not
    * per pair; native vec_dot codegen) with one vec-keyed aggregate for
    * the per-vector max. No corpus-sized shuffle; a benchmark too large
    * to broadcast degrades to IVF-bucketed probing (q32's path).
    * Cosines are ROUNDED to 6 decimals before the max so an ulp-level
    * engine disagreement cannot flip the verdict (the q30 discipline). */
  def q90SemanticDecontam(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding", norm2($"embedding").as("n2"))
    val bench = emb.where($"vec_id" % SemDecontamMod === 0)
      .select($"vec_id".as("b_id"), $"embedding".as("b_emb"), $"n2".as("b_n2"))
    val sim = round(cosinePre($"embedding", $"b_emb", $"n2", $"b_n2"), 6)
    emb.where($"vec_id" % SemDecontamMod =!= 0)
      .join(broadcast(bench))
      .groupBy($"vec_id")
      .agg(max(sim).as("max_sim"))
      .select($"vec_id", $"max_sim",
        ($"max_sim" >= SemDecontamThreshold).as("contaminated"))
      .orderBy($"vec_id")
  }

  val q90Sql: String = {
    val cos = sqlCosine("t.embedding", "b.embedding")
    s"""WITH b AS (SELECT vec_id, embedding FROM embeddings
       |           WHERE vec_id % $SemDecontamMod = 0),
       |t AS (SELECT vec_id, embedding FROM embeddings
       |      WHERE vec_id % $SemDecontamMod <> 0)
       |SELECT t.vec_id, MAX(round($cos, 6)) AS max_sim,
       |  MAX(round($cos, 6)) >= $SemDecontamThreshold AS contaminated
       |FROM t CROSS JOIN b
       |GROUP BY t.vec_id
       |ORDER BY t.vec_id""".stripMargin
  }

  // ---- q95: SQ8 scalar-quantized ANN (compressed-domain search) ----

  /** Quantization levels − 1: codes span 0..255 (one byte per dim). */
  val Sq8Levels = 255

  /** Embedding dimensionality of the `embeddings` table. */
  val EmbDim = 64

  /** q95: scalar-quantized (SQ8) nearest-neighbor search — the
    * compressed-domain member of the ANN family (q30 exact brute force,
    * q31 blocked near-dup, q32 IVF). Each dimension is affinely mapped to
    * an 8-bit code by the corpus per-dim min/max (the FAISS
    * ScalarQuantizer recipe), and search ranks by the INTEGER sum of
    * squared code differences — the asymmetric-distance scan runs on 64
    * bytes/vector instead of 256, which at 100 TB is the difference
    * between a memory-resident scan and a disk-bound one.
    *
    * Engine-exactness: min/max are exact (no accumulation); the affine
    * map floor((x−lo)/(hi−lo)·255) is the same correctly-rounded IEEE
    * op sequence on both engines (the q85 principle), so the CODES —
    * and therefore the integer distances and the full top-k ranking
    * (vec_id tie-break) — hash-match DuckDB exactly: a VALUE-level
    * oracle for an ANN index, like q92's bitset. Quantization recall vs
    * the exact float-L2 truth is measured in Round7QueriesSpec, not
    * assumed.
    *
    * Scale: pass 1 (per-dim min/max) partial-aggregates to ONE row —
    * map-only; pass 2 encodes map-only against the broadcast stats; the
    * scan is query-codes-broadcast × corpus map-side with one k-row-per-
    * query top-k shuffle (the q30 shape, on ¼ the bytes). In production
    * the codes are a materialized column written at ingest; both corpus
    * passes here exist because the query builds its own index. */
  def q95Sq8Ann(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sq8Core(s, Tables.embeddings(s, dir).select($"vec_id", $"embedding"))
  }

  /** One row: per-dim corpus lo/hi (exact — min/max of float-cast-double).
    * Callers localCheckpoint it when more than one encode consumes it. */
  /** Round-19: 128 per-dim min/max aggregates → 2 elementwise array
    * aggregates ([[graft.functions.VecAggMin]]/[[VecAggMax]] — exact,
    * order-independent; float→double widening is the same cast). This
    * 1-row frame sits under every SQ8/PQ/OPQ training chain, so the fan
    * was re-planned once per AQE stage per consumer loop (guide §7.3). */
  private[graft] def sq8Stats(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    emb.agg(
      graft.functions.VecAgg.minCol(s, col("embedding")).as("lo"),
      graft.functions.VecAgg.maxCol(s, col("embedding")).as("hi"))
  }

  /** Affine per-dim 8-bit encode against broadcast corpus stats:
    * floor((x−lo)/(hi−lo)·255), constant-dim dims → code 0. The same
    * correctly-rounded IEEE op sequence as the DuckDB mirror, so codes are
    * engine-exact integers (the q95 scaladoc argument). */
  private[graft] def sq8Encode(df: DataFrame, stats: DataFrame): DataFrame = df
    .crossJoin(broadcast(stats))
    .select(col("vec_id"), transform(col("embedding"), (x, i) => {
      val lo = element_at(col("lo"), i + 1)
      val hi = element_at(col("hi"), i + 1)
      when(hi > lo, floor((x.cast("double") - lo) / (hi - lo) * Sq8Levels))
        .otherwise(lit(0L)).cast("long")
    }).as("codes"))

  /** q95 body over an arbitrary (vec_id, embedding) frame (Profile
    * probes it on replicated corpora; the named query binds the table). */
  private[graft] def sq8Core(s: SparkSession, emb: DataFrame): DataFrame = {
    import s.implicits._
    val stats = sq8Stats(emb)
      .localCheckpoint(false) // 1 row, two encode consumers (§9 note)
    val corpus = sq8Encode(emb, stats)
    // query-side scan prunes to the 5 query rows at the parquet scan
    val queries = sq8Encode(emb.where($"vec_id" < NumQueries), stats)
      .select($"vec_id".as("query_id"), $"codes".as("qcodes"))
    // native codegen expression — identical long fold order to the HOF
    // chain (hash-preserving), one static call per pair instead of 64
    // interpreted lambda applications (VecSpec pins the equivalence)
    val idist = graft.functions.Vec.isqdCol(s, $"qcodes", $"codes")
    val w = Window.partitionBy($"query_id").orderBy($"idist".asc, $"neighbor_id".asc)
    corpus.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), idist.as("idist"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK)
      .orderBy($"query_id", $"rn")
  }

  val q95Sql: String =
    s"""WITH e AS (SELECT vec_id, unnest(embedding) AS x,
       |             unnest(generate_series(1, len(embedding))) AS d
       |           FROM embeddings),
       |st AS (SELECT d, MIN(CAST(x AS DOUBLE)) AS lo, MAX(CAST(x AS DOUBLE)) AS hi
       |       FROM e GROUP BY d),
       |c AS (SELECT e.vec_id, e.d,
       |        CASE WHEN st.hi > st.lo
       |          THEN CAST(floor((CAST(e.x AS DOUBLE) - st.lo) / (st.hi - st.lo) * $Sq8Levels) AS BIGINT)
       |          ELSE 0 END AS code
       |      FROM e JOIN st USING (d)),
       |q AS (SELECT vec_id AS query_id, d, code FROM c WHERE vec_id < $NumQueries),
       |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |         CAST(SUM((q.code - c.code) * (q.code - c.code)) AS BIGINT) AS idist
       |       FROM c JOIN q ON c.d = q.d AND c.vec_id <> q.query_id
       |       GROUP BY 1, 2)
       |SELECT query_id, neighbor_id, idist, rn FROM (
       |  SELECT query_id, neighbor_id, idist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY idist ASC, neighbor_id ASC) AS rn
       |  FROM sc)
       |WHERE rn <= $TopK
       |ORDER BY query_id, rn""".stripMargin

  // ---- q111: product-quantization (PQ) ADC ANN ----

  /** Subspaces per vector; each sub-vector is [[PqSubDim]] dims. */
  val PqM = 8
  val PqSubDim: Int = EmbDim / PqM
  /** Centroids per subspace codebook — codes are 4 bits, 8 codes = 4 B/vec
    * logical (stored as one tiny int per subspace here). */
  val PqK = 16

  /** q111: product-quantized ANN with asymmetric-distance (ADC) scan —
    * the FAISS IVFADC recipe (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011) and the capstone of the ANN
    * family: q30 exact floats (256 B/vec) → q95 SQ8 (64 B/vec) → q111 PQ
    * (8 codes/vec). The corpus is SQ8-encoded, each code vector is split
    * into [[PqM]] sub-vectors, and a per-subspace [[PqK]]-centroid
    * codebook is TRAINED in-plan: seeds = the sub-codes of the first
    * [[PqK]] vectors, then one Lloyd step (integer floor-mean update) —
    * the q59 iteration specialized to the subspace. Search never touches
    * the corpus floats: each query precomputes a [[PqM]]×[[PqK]] table of
    * integer distances from its OWN (un-quantized) sub-codes to every
    * centroid, and a neighbor's approximate distance is [[PqM]] table
    * lookups summed — the classic ADC estimator.
    *
    * Engine-exactness: every quantity after the q95 SQ8 encode is
    * INTEGER arithmetic — seed distances, floor-mean centroids (floor of
    * a ≤2^25 sum over an exact double divide), encode argmins (k-asc tie
    * break), LUT cells, ADC sums — so codes, distances, and the full
    * ranking hash-match DuckDB exactly: a value-level oracle for a
    * trained quantizer. PQ recall vs the uncompressed SQ8 ranking is
    * measured in PqAdcSpec, not assumed.
    *
    * Scale: training touches the corpus once (sub-codes are checkpointed
    * — three consumers, §9 rule), the codebook is M·K rows (KB) and
    * broadcast everywhere it appears; PQ-encode is one argmin pass; the
    * ADC scan is map-only over 8-int code rows against a broadcast
    * NumQueries×M×K LUT with the q30 k-rows-per-query top-k exchange. At
    * 100 TB the codes column is written at ingest and the scan reads
    * 32× fewer bytes than the float corpus — the difference between a
    * cached scan and a cold one. */
  def q111PqAdcAnn(s: SparkSession, dir: String): DataFrame =
    pqAdcCore(s, Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))

  /** q111 body over an arbitrary (vec_id, embedding) frame (Profile
    * probes it on replicated corpora). Composes the training/encode/scan
    * pieces below — which the codes-at-ingest path (q118 /
    * [[graft.jobs.CodesIngest]]) reuses with a bucketed table between
    * encode and scan. */
  private[graft] def pqAdcCore(s: SparkSession, emb: DataFrame): DataFrame =
    adcFromSubcodes(s, pqSubcodes(s, emb))

  /** The shared train/encode/LUT/scan orchestration over any subspace
    * view — ONE definition so q111 and q148 cannot drift (review
    * finding r12). */
  private def adcFromSubcodes(s: SparkSession, subcodesIn: DataFrame): DataFrame = {
    import s.implicits._
    // checkpointed once: consumed by seed-assign, PQ-encode, and the LUT
    val subcodes = subcodesIn.localCheckpoint(false)
    val cents = pqTrainCodebook(s, subcodes)
      .localCheckpoint(false) // ≤ M·K rows; encode + LUT consumers
    val pqcodes = pqEncodeCodes(s, subcodes, cents)
    val luts = pqQueryLuts(s, subcodes.where($"vec_id" < NumQueries), cents)
    pqAdcScan(s, pqcodes, luts)
  }

  /** (vec_id, m, sub[PqSubDim]) — the per-subspace view of the SQ8 codes. */
  private[graft] def pqSubcodes(s: SparkSession, emb: DataFrame): DataFrame = {
    import s.implicits._
    val stats = sq8Stats(emb).localCheckpoint(false) // 1 row, shared encode input
    subcodeView(s, sq8Encode(emb, stats))
  }

  /** Explode a (vec_id, codes[EmbDim]) frame into the per-subspace view —
    * pure slicing, no floats: the ingest read path reuses it on the
    * STORED codes column. */
  private[graft] def subcodeView(s: SparkSession, codes: DataFrame): DataFrame = {
    import s.implicits._
    val subStructs = array((0 until PqM).map(m =>
      struct(lit(m).as("m"),
        slice($"codes", m * PqSubDim + 1, PqSubDim).as("sub"))): _*)
    codes.select($"vec_id", explode(subStructs).as("e"))
      .select($"vec_id", $"e.m".as("m"), $"e.sub".as("sub"))
  }

  // native codegen integer sq-distance (same fold order as the HOF
  // chain — hash-preserving; VecSpec pins the equivalence)
  private def isqd(s: SparkSession, a: Column, b: Column): Column =
    graft.functions.Vec.isqdCol(s, a, b)

  // nearest codebook entry per (vector, subspace): integer distance,
  // k-asc tie break; WindowGroupLimit collapses rn=1 to a partial argmin
  private def pqNearest(s: SparkSession, subcodes: DataFrame, cb: DataFrame): DataFrame = {
    import s.implicits._
    val wArgmin = Window.partitionBy($"vec_id", $"m").orderBy($"d".asc, $"k".asc)
    subcodes
      .join(broadcast(cb), Seq("m"))
      .select($"vec_id", $"m", $"sub", $"k", isqd(s, $"sub", $"cent").as("d"))
      .withColumn("rn", row_number().over(wArgmin)).where($"rn" === 1)
  }

  /** Codebook training: seeds from the first [[PqK]] vectors, one integer
    * Lloyd step (floor-mean update over each seed's assigned sub-codes).
    * Empty centroids DROP — consumers key lookups by (m,k), never by
    * position. Returns (m, k, cent[PqSubDim]). */
  private[graft] def pqTrainCodebook(s: SparkSession, subcodes: DataFrame): DataFrame = {
    import s.implicits._
    val seeds = subcodes.where($"vec_id" < PqK)
      .select($"m", $"vec_id".cast("int").as("k"), $"sub".as("cent"))
    // round-19: per-dim floor-mean fan → one elementwise long-sum
    // aggregate + a transform over the PqSubDim cells (same long sums —
    // associative-exact — same double division and floor per element)
    pqNearest(s, subcodes, seeds)
      .groupBy($"m", $"k")
      .agg(graft.functions.VecAgg.sumLCol(s, $"sub").as("ssum"),
        count(lit(1)).as("cnt"))
      .select($"m", $"k",
        transform($"ssum", v => floor(v / $"cnt").cast("long")).as("cent"))
  }

  /** PQ-encode: (vec_id, pq[PqM]) with pq[m] = trained-centroid argmin,
    * packed in m order. */
  private[graft] def pqEncodeCodes(s: SparkSession, subcodes: DataFrame,
      cents: DataFrame): DataFrame = {
    import s.implicits._
    pqNearest(s, subcodes, cents).groupBy($"vec_id")
      .agg(transform(array_sort(collect_list(struct($"m", $"k"))),
        e => e.getField("k")).as("pq"))
  }

  /** Per-query ADC table, KEYED by m·K + k — not a positional flatten: a
    * centroid that received zero assignments (possible when two of the
    * first PqK vectors share a sub-code) drops its (m,k) row from `cents`,
    * and positional indexing would silently shift every later cell. The
    * keyed lookup stays correct on a sparse codebook, matching the
    * (m,k)-joined oracle; PQ codes only ever reference surviving
    * centroids, so every lookup hits (a miss would surface as NULL adist,
    * not a wrong ranking). */
  private[graft] def pqQueryLuts(s: SparkSession, querySubcodes: DataFrame,
      cents: DataFrame): DataFrame = {
    import s.implicits._
    querySubcodes
      .join(broadcast(cents), Seq("m"))
      .select($"vec_id".as("query_id"), $"m", $"k", isqd(s, $"sub", $"cent").as("d"))
      .groupBy($"query_id")
      .agg(map_from_entries(collect_list(
        struct(($"m" * PqK + $"k").cast("int").as("key"), $"d".as("value")))).as("lut"))
  }

  /** ADC scan: broadcast LUTs × (vec_id, pq) code rows, [[PqM]] map
    * lookups per pair, `keep`-rows-per-query top-k exchange. */
  private[graft] def pqAdcScan(s: SparkSession, pqcodes: DataFrame,
      luts: DataFrame, keep: Int = TopK): DataFrame = {
    import s.implicits._
    val adist = aggregate(sequence(lit(0), lit(PqM - 1)), lit(0L),
      (acc, m) => acc + element_at($"lut",
        m * PqK + element_at($"pq", m + 1).cast("int")))
    val w = Window.partitionBy($"query_id").orderBy($"adist".asc, $"neighbor_id".asc)
    pqcodes.join(broadcast(luts), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), adist.as("adist"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= keep)
      .orderBy($"query_id", $"rn")
  }

  /** SQ8 per-dim code CTEs e/st/c — shared by the PQ (q111/q123) and
    * OPQ-rotated (q148) oracle chains. */
  private val sq8CodeCtes: String =
    s"""e AS (SELECT vec_id, unnest(embedding) AS x,
       |             unnest(generate_series(1, len(embedding))) AS d
       |           FROM embeddings),
       |st AS (SELECT d, MIN(CAST(x AS DOUBLE)) AS lo, MAX(CAST(x AS DOUBLE)) AS hi
       |       FROM e GROUP BY d),
       |c AS (SELECT e.vec_id, e.d,
       |        CASE WHEN st.hi > st.lo
       |          THEN CAST(floor((CAST(e.x AS DOUBLE) - st.lo) / (st.hi - st.lo) * $Sq8Levels) AS BIGINT)
       |          ELSE 0 END AS code
       |      FROM e JOIN st USING (d))""".stripMargin

  /** The seeds→sc chain (train / encode / LUT / per-pair ADC distances)
    * over whatever `sub` view precedes it — shared verbatim by q111,
    * q123's refine oracle, and q148, so all three stay hash-identical
    * in the trained-quantizer stages. */
  private val pqTrainScanCtes: String =
    s"""seeds AS (SELECT m, CAST(vec_id AS INT) AS k, j, code AS cent
       |          FROM sub WHERE vec_id < $PqK),
       |ad AS (SELECT s.vec_id, s.m, sd.k,
       |         SUM((s.code - sd.cent) * (s.code - sd.cent)) AS dd
       |       FROM sub s JOIN seeds sd ON s.m = sd.m AND s.j = sd.j
       |       GROUP BY 1, 2, 3),
       |assign AS (SELECT vec_id, m, k FROM (
       |    SELECT vec_id, m, k, ROW_NUMBER() OVER (PARTITION BY vec_id, m
       |      ORDER BY dd ASC, k ASC) AS rn FROM ad) WHERE rn = 1),
       |cents AS (SELECT s.m, a.k, s.j,
       |            CAST(floor(SUM(s.code) / COUNT(*)) AS BIGINT) AS cent
       |          FROM sub s JOIN assign a ON s.vec_id = a.vec_id AND s.m = a.m
       |          GROUP BY s.m, a.k, s.j),
       |ed AS (SELECT s.vec_id, s.m, c.k,
       |         SUM((s.code - c.cent) * (s.code - c.cent)) AS dd
       |       FROM sub s JOIN cents c ON s.m = c.m AND s.j = c.j
       |       GROUP BY 1, 2, 3),
       |pq AS (SELECT vec_id, m, k FROM (
       |    SELECT vec_id, m, k, ROW_NUMBER() OVER (PARTITION BY vec_id, m
       |      ORDER BY dd ASC, k ASC) AS rn FROM ed) WHERE rn = 1),
       |lut AS (SELECT s.vec_id AS query_id, s.m, c.k,
       |          SUM((s.code - c.cent) * (s.code - c.cent)) AS dd
       |        FROM sub s JOIN cents c ON s.m = c.m AND s.j = c.j
       |        WHERE s.vec_id < $NumQueries
       |        GROUP BY 1, 2, 3),
       |sc AS (SELECT l.query_id, p.vec_id AS neighbor_id,
       |         CAST(SUM(l.dd) AS BIGINT) AS adist
       |       FROM pq p JOIN lut l ON p.m = l.m AND p.k = l.k
       |         AND p.vec_id <> l.query_id
       |       GROUP BY 1, 2)""".stripMargin

  /** The q111 CTE chain up to `sc` (per-pair ADC distances). */
  private val pqScCtes: String =
    s"""WITH $sq8CodeCtes,
       |sub AS (SELECT vec_id, (d - 1) // $PqSubDim AS m, (d - 1) % $PqSubDim AS j, code
       |        FROM c),
       |$pqTrainScanCtes""".stripMargin

  /** Final top-k ranking SELECT over `sc` — shared by q111 and q148. */
  private val pqRankSelect: String =
    s"""SELECT query_id, neighbor_id, adist, rn FROM (
       |  SELECT query_id, neighbor_id, adist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adist ASC, neighbor_id ASC) AS rn
       |  FROM sc)
       |WHERE rn <= $TopK
       |ORDER BY query_id, rn""".stripMargin

  val q111Sql: String =
    s"""$pqScCtes
       |$pqRankSelect""".stripMargin

  /** q118: q111's ADC search run against the INGESTED codes table
    * ([[graft.jobs.CodesIngest]]) instead of in-plan training+encoding —
    * the production shape the q111 scaladoc promises ("codes written at
    * ingest, the scan reads 32× fewer bytes"). Ingest materializes
    * (vec_id, codes, pq) bucketed by vec_id plus the trained codebook;
    * the SEARCH plan then never touches the float corpus: the float
    * `embedding` column appears in no scan (PlanSpec pins the read
    * schemas), the neighbor side reads only (vec_id, pq) — 8 small ints
    * per row via parquet column pruning — and the query-side LUT reads
    * the stored SQ8 codes pruned to the [[NumQueries]] rows by a pushed
    * vec_id filter. Oracle = q111's SQL verbatim: the stored codes
    * reproduce the in-plan ranking integer-for-integer, a value-level
    * oracle on a MATERIALIZED index. */
  def q118PqCodesAnn(s: SparkSession, dir: String): DataFrame = {
    val (codesT, cbT) = graft.jobs.CodesIngest.ingest(s, dir)
    pqCodesScan(s, s.table(codesT), s.table(cbT))
  }

  /** Search-time plan over a stored (vec_id, codes, pq) table + codebook
    * — no training, no floats. */
  private[graft] def pqCodesScan(s: SparkSession, codesTable: DataFrame,
      cents: DataFrame): DataFrame = {
    import s.implicits._
    val qsubs = subcodeView(s, codesTable.where($"vec_id" < NumQueries)
      .select($"vec_id", $"codes"))
    pqAdcScan(s, codesTable.select($"vec_id", $"pq"),
      pqQueryLuts(s, qsubs, cents))
  }

  // ---- q148: OPQ-lite structured-rotation PQ ADC ANN ----

  /** q148: PQ-ADC search over a SIGNED-HADAMARD-rotated code space — the
    * OPQ idea (Ge et al., "Optimized Product Quantization", CVPR 2013:
    * rotate before splitting into subspaces so each carries comparable
    * energy) realized with a STRUCTURED rotation, the fast-JL/FALCONN
    * HD construction FAISS ships as OPQ's random-rotation baseline. The
    * signed Hadamard keeps the WHOLE pipeline in integers: rotate the
    * SQ8 codes by out[j] = Σᵢ(−1)^popcount(j&i)·D[i]·codes[i] (D a
    * fixed pseudo-random ±1 diagonal), then train / encode / ADC-scan
    * EXACTLY as q111 on the rotated ints. Because (HD)(HD)ᵀ = 64·I,
    * true squared distances scale by exactly 64 — rankings invariant —
    * while every input dimension's energy spreads uniformly over all 64
    * outputs, so the 8 subspaces see balanced variance by construction
    * (both properties integer-exact, pinned in Round12QueriesSpec /
    * VecSpec). Every stage stays integer (rotated values |v| ≤ 64·255,
    * ADC sums ≪ 2⁶³), so codes, codebook, and the full ranking
    * hash-match DuckDB — a value-level oracle for a trained quantizer
    * over a rotated space, which a LEARNED rotation cannot give (a
    * float eigenbasis is not SQL-replayable; that variant lives as the
    * Profile OPQ probe, where the PCA rotation lifts recall@5
    * 0.16 → 0.36 at sf0.1 — SCALE.md).
    *
    * Measured honestly: on THIS corpus — synthetic, near-isotropic —
    * the structured rotation is recall-NEUTRAL (±1–3 hits of 25 across
    * sf0.001/0.01/0.1, recorded in SCALE.md), matching the OPQ
    * literature where a non-learned rotation pays only on anisotropic
    * data; the spec pins the exact invariants and a no-collapse floor,
    * not a lift. The operator is the production knob (at-ingest rotated
    * codes, verifiable end to end), with PCA the measured upgrade path.
    *
    * Scale: the rotation is one O(d log d) integer butterfly per row
    * (native codegen expression [[graft.functions.SignedHadamard]]),
    * map-only, fused into the encode pass — at ingest it is a stored
    * column exactly like q118's codes. Everything downstream is q111's
    * argument unchanged: KB codebook broadcast, map-side ADC, one
    * k-rows-per-query exchange. */
  def q148OpqAnn(s: SparkSession, dir: String): DataFrame =
    opqAdcCore(s, Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))

  /** q148 body over an arbitrary (vec_id, embedding) frame — q111's
    * shared orchestration over the rotated subspace view. */
  private[graft] def opqAdcCore(s: SparkSession, emb: DataFrame): DataFrame =
    adcFromSubcodes(s, opqSubcodes(s, emb))

  /** (vec_id, m, sub) subspace view of the ROTATED SQ8 codes — [[pqSubcodes]]
    * with the signed-Hadamard rotation fused between encode and split. */
  private[graft] def opqSubcodes(s: SparkSession, emb: DataFrame): DataFrame = {
    import s.implicits._
    val stats = sq8Stats(emb).localCheckpoint(false) // 1 row, shared encode input
    val rotated = sq8Encode(emb, stats)
      .select($"vec_id", graft.functions.Vec.hadamardCol(s, $"codes").as("codes"))
    subcodeView(s, rotated)
  }

  /** Oracle: the shared SQ8 CTEs, the Hadamard weight matrix as a
    * generate_series cross product (bit_count is the popcount dual of
    * the butterfly), one rotation aggregation, then the SHARED
    * train/encode/LUT/scan chain verbatim. */
  val q148Sql: String =
    s"""WITH $sq8CodeCtes,
       |had AS (SELECT jj.j AS j, ii.i AS i,
       |          (CASE WHEN bit_count(CAST(jj.j AS BIGINT) & CAST(ii.i AS BIGINT)) % 2 = 0
       |                THEN 1 ELSE -1 END)
       |        * (CASE WHEN bit_count(CAST(ii.i AS BIGINT) * 2654435761) % 2 = 0
       |                THEN 1 ELSE -1 END) AS w
       |        FROM (SELECT unnest(generate_series(0, ${EmbDim - 1})) AS j) jj
       |        CROSS JOIN (SELECT unnest(generate_series(0, ${EmbDim - 1})) AS i) ii),
       |r AS (SELECT c.vec_id, h.j + 1 AS d, CAST(SUM(h.w * c.code) AS BIGINT) AS code
       |      FROM c JOIN had h ON c.d - 1 = h.i
       |      GROUP BY c.vec_id, h.j),
       |sub AS (SELECT vec_id, (d - 1) // $PqSubDim AS m, (d - 1) % $PqSubDim AS j, code
       |        FROM r),
       |$pqTrainScanCtes
       |$pqRankSelect""".stripMargin

  // ---- q152: learned-rotation OPQ (PCA basis + PQ ADC) ----

  /** Distance-preservation tolerance for the q152 verdict: the rotated
    * pair distance may differ from the original by rotation round-off
    * plus float32 storage quantization of the rotated coordinates —
    * relative O(2⁻²⁴·d), far below 1e-3; a NON-orthonormal basis
    * distorts distances at O(1) relative scale, so the verdict has a
    * six-order-of-magnitude separation between pass and fail. */
  val OpqDistTol = 1e-3

  /** Basis orthonormality bound: max |VVᵀ − I| entry of the learned
    * eigenbasis (driver-side d×d check; Jacobi converges to ~1e-12). */
  val OpqBasisTol = 1e-8

  /** q152: the LEARNED-rotation OPQ the q148 scaladoc names as the real
    * upgrade (Ge et al. 2013, the OPQ-P "parametric" variant: rotate by
    * the PCA eigenbasis before splitting into subspaces). q148's signed
    * Hadamard spreads energy uniformly but cannot DECORRELATE — on
    * anisotropic data the principal directions still straddle subspace
    * boundaries and PQ pays the cross-covariance as quantization error.
    * Here the rotation is learned from the corpus: q121's one-pass
    * [[graft.functions.Covariance]] fold + driver-side Jacobi eigensolve
    * (64×64, microseconds), components PERMUTED by the paper's
    * eigenvalue allocation ([[opqEigenAllocation]] — balanced variance
    * per subspace, the step that makes PCA help PQ instead of sabotage
    * it), the resulting orthonormal basis entering the plan as LITERALS
    * ([[pcaRotate]]), then SQ8-encode + the q111 train/encode/ADC-scan
    * chain unchanged over the rotated floats.
    * Recall vs the Hadamard baseline is MEASURED, not assumed:
    * Round13QueriesSpec pins learned > Hadamard on an anisotropic
    * fixture, and the isotropic-corpus numbers live in SCALE.md (the
    * q148 honesty record's follow-through).
    *
    * Oracle shape (the q121 verdict pattern — a float eigenbasis is not
    * SQL-replayable, so the oracle checks structure + invariants, each
    * independently falsifiable):
    *  - the full (query_id, rn ≤ [[TopK]]) grid — a dropped query,
    *    duplicate rank, or short result breaks the row hash;
    *  - `q_norm2` — engine-recomputable anchor value (q121's);
    *  - `dist_ok` — the ORIGINAL-space and ROTATED-space squared L2
    *    distances of each returned (query, neighbor) pair agree within
    *    [[OpqDistTol]]: TRUE iff the learned rotation is an isometry
    *    (a non-orthonormal basis flips it — the q121 Bessel argument,
    *    here checked pairwise on the actual search output);
    *  - `mono_ok` — ADC distances non-decreasing in rank (a broken
    *    ranking or LUT flips it);
    *  - `basis_ok` — max |VVᵀ − I| ≤ [[OpqBasisTol]], the driver-side
    *    orthonormality residual of the learned matrix itself.
    *
    * Scale: one corpus covariance fold (ONE ~17 KB buffer to the
    * driver), map-only rotation (literals), then q111's argument
    * unchanged — KB codebook broadcast, map-side ADC, one k-row-per-
    * query exchange; the verdict joins touch only the k·|queries| result
    * rows against broadcast query/neighbor vectors. At ingest the
    * rotated codes are a stored column exactly like q118's. */
  def q152LearnedOpqAnn(s: SparkSession, dir: String): DataFrame =
    learnedOpqCore(s, Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))

  /** Eigenvalue allocation (Ge et al. 2013 §OPQ-P): assign principal
    * components to the [[PqM]] subspaces so each carries BALANCED
    * variance — greedy, largest eigenvalue first, into the non-full
    * subspace with the smallest variance SUM. A naive eigenvalue-order
    * rotation is anti-OPQ: it PILES the corpus variance into subspace 0,
    * which [[PqK]] centroids cannot carry (measured recall 1/25 on the
    * anisotropic fixture vs 21/25 allocated — Round13QueriesSpec).
    *
    * The paper balances the variance PRODUCT (log-sum); that criterion
    * is degenerate on a low-rank spectrum: once any eigenvalue < 1
    * lands in a subspace its log-load goes NEGATIVE and the greedy
    * piles every remaining signal component into the same subspace
    * (measured: subspaces 1–7 carried constant codes on the normalized
    * fixture). Sum-balancing spreads the r dominant components one per
    * subspace — the behavior the product rule intends on a full-rank
    * spectrum — and is what the recall measurement rewards. Returns the
    * component index laid out at each output position (positions
    * m·[[PqSubDim]]+… fill subspace m). */
  private[graft] def opqEigenAllocation(vals: Array[Double]): Array[Int] = {
    val d = vals.length
    // the whole PQ family assumes equal subspace widths (subcodeView
    // splits codes into PqM contiguous PqSubDim slices); with d % PqM
    // != 0 the greedy below would also empty its candidate filter once
    // all subspaces fill and throw from minBy — fail with the real
    // constraint instead (round-13 advice)
    require(d % PqM == 0,
      s"eigenvalue allocation needs dim divisible by PqM: d=$d, PqM=$PqM")
    val perSub = d / PqM
    val load = Array.fill(PqM)(0.0)
    val count = Array.fill(PqM)(0)
    val slots = Array.fill(PqM)(Array.newBuilder[Int])
    // components arrive eigenvalue-descending (jacobi sorts); ties in
    // load break by lowest subspace id — deterministic
    (0 until d).foreach { c =>
      val m = (0 until PqM).filter(count(_) < perSub).minBy(m => (load(m), m))
      load(m) += vals(c); count(m) += 1; slots(m) += c
    }
    slots.flatMap(_.result())
  }

  /** The learned OPQ model of a corpus: PCA eigenbasis with rows
    * permuted by [[opqEigenAllocation]] (orthonormality is permutation-
    * invariant; eigenvalues returned in the permuted order). */
  private[graft] def opqLearnedModel(s: SparkSession, emb: DataFrame)
      : (Array[Double], Array[Array[Double]], Array[Double]) = {
    val (vals, vecs, mu) = pcaModelFrame(s, emb)
    val order = opqEigenAllocation(vals)
    (order.map(vals(_)), order.map(vecs(_)), mu)
  }

  /** GLOBAL-scale SQ8 stats: one (lo, hi) over ALL dims. The per-dim
    * [[sq8Stats]] map is the right quantizer for RAW embeddings (each
    * dim uses its own dynamic range) but is anti-OPQ after a learned
    * rotation: per-dim normalization re-inflates the low-variance
    * rotated dims to the same code range as the principal ones, so
    * code-space L2 weights noise equal to signal and the rotation's
    * variance structure is erased (measured: recall 1/25 per-dim vs
    * 21/25 global on the anisotropic fixture). One shared affine map
    * keeps code-space L2 proportional to true L2 — an isometric
    * quantizer, the property OPQ's distance estimator assumes. */
  private[graft] def sq8GlobalStats(emb: DataFrame): DataFrame =
    emb.agg(
      min(array_min(col("embedding")).cast("double")).as("glo"),
      max(array_max(col("embedding")).cast("double")).as("ghi"))

  /** Affine 8-bit encode with ONE global (lo, hi) for every dim. */
  private[graft] def sq8EncodeGlobal(df: DataFrame, stats: DataFrame): DataFrame = df
    .crossJoin(broadcast(stats))
    .select(col("vec_id"), transform(col("embedding"), x =>
      when(col("ghi") > col("glo"),
        floor((x.cast("double") - col("glo")) / (col("ghi") - col("glo")) * Sq8Levels))
        .otherwise(lit(0L)).cast("long")).as("codes"))

  /** The learned-OPQ ADC chain over an ALREADY-ROTATED corpus frame:
    * global-scale SQ8 encode, subspace split, q111's shared
    * train/encode/LUT/scan orchestration. */
  private[graft] def learnedAdcFromRotated(s: SparkSession, rotated: DataFrame): DataFrame = {
    val stats = sq8GlobalStats(rotated).localCheckpoint(false) // 1 row
    adcFromSubcodes(s, subcodeView(s, sq8EncodeGlobal(rotated, stats)))
  }

  /** q152 body over an arbitrary (vec_id, embedding) frame. */
  private[graft] def learnedOpqCore(s: SparkSession, embIn: DataFrame): DataFrame = {
    import s.implicits._
    // consumed by the covariance fold, the rotation, and both verdict
    // vector joins (§9 rule)
    val emb = embIn.localCheckpoint(false)
    val model = opqLearnedModel(s, emb)
    val basis = model._2
    val d = basis.length
    val basisResid = (0 until d).flatMap(i => (0 until d).map { j =>
      val g = (0 until d).map(k => basis(i)(k) * basis(j)(k)).sum
      math.abs(g - (if (i == j) 1.0 else 0.0))
    }).max
    // rotated corpus: consumed by the whole ADC chain and the verdict
    val rotated = pcaRotate(s, emb, model).localCheckpoint(false)
    val adc = learnedAdcFromRotated(s, rotated)
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b,
          (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
    val qO = emb.where($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_o"))
    val qR = rotated.where($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_r"))
    // neighbor sides: corpus frames pruned by the k·|queries|-row result
    val nO = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("n_o"))
    val nR = rotated.select($"vec_id".as("neighbor_id"), $"embedding".as("n_r"))
    val wq = Window.partitionBy($"query_id").orderBy($"rn".asc)
    adc
      .join(broadcast(qO), Seq("query_id"))
      .join(broadcast(qR), Seq("query_id"))
      .join(nO, Seq("neighbor_id"))
      .join(nR, Seq("neighbor_id"))
      .select($"query_id", $"rn", $"adist",
        round(norm2($"q_o"), 6).as("q_norm2"),
        (abs(d2($"q_o", $"n_o") - d2($"q_r", $"n_r"))
          <= lit(OpqDistTol) * (lit(1.0) + d2($"q_o", $"n_o"))).as("dist_ok"))
      .withColumn("mono_ok",
        $"adist" >= coalesce(lag($"adist", 1).over(wq), lit(Long.MinValue)))
      .select($"query_id", $"rn", $"q_norm2", $"dist_ok", $"mono_ok",
        lit(basisResid <= OpqBasisTol).as("basis_ok"))
      .orderBy($"query_id", $"rn")
  }

  /** Oracle: the (query, rank) grid with the recomputable norm anchor
    * and the three verdicts asserted TRUE (q121's verdict-oracle
    * pattern — the learned basis itself is checked by `dist_ok` /
    * `basis_ok` on the Spark side, where a wrong eigensolve flips the
    * hashed booleans). */
  val q152Sql: String =
    s"""SELECT e.vec_id AS query_id, r.rn,
       |  round(${sqlNorm2("e.embedding")}, 6) AS q_norm2,
       |  TRUE AS dist_ok, TRUE AS mono_ok, TRUE AS basis_ok
       |FROM embeddings e
       |CROSS JOIN (SELECT unnest(generate_series(1, $TopK)) AS rn) r
       |WHERE e.vec_id < $NumQueries
       |ORDER BY query_id, rn""".stripMargin

  // ---- q155: learned-rotation codes at ingest ----

  /** q155: q152's search over an INGESTED rotated-codes table
    * ([[graft.jobs.RotIngest]]) — the q118 production pattern on the
    * learned-rotation tier, closing q152's "at ingest the rotated codes
    * are a stored column" promise. Ingest materializes (vec_id, codes,
    * pq) bucketed by vec_id (codes = global-scale SQ8 of the rotated
    * floats), the trained codebook, AND the learned rotation model
    * itself; the search plan then reads only code columns — pq for the
    * scan, the pushed-filter query rows' codes for LUTs — never the
    * float corpus.
    *
    * Verdict oracle (a learned basis is not SQL-replayable — the q152
    * argument): the (query, rank) grid, the recomputable q_norm2
    * anchor, `mono_ok`, and the audit that gives the stored index
    * teeth: `stored_ok` — re-ENCODING the corpus in-plan from the
    * STORED frozen state (rotate with the stored basis → global-SQ8
    * against the stored range, drift-clamped exactly as
    * [[graft.jobs.RotIngest.appendBatch]] encodes → assign against the
    * STORED codebook → ADC; integer arithmetic end to end, so
    * bit-reproducible from the same model) must reproduce the stored
    * ranking neighbor-for-neighbor and distance-for-distance. Any
    * drift/corruption in the stored codes, codebook, or model flips it.
    * The audit deliberately does NOT re-TRAIN the codebook (round-14
    * review: the trainer is fixed at build time — an audit that
    * re-learns would spuriously fail the moment a legitimate
    * appendBatch grows the corpus past the training set, turning the
    * production increment path and the audit into mutually exclusive
    * features; the frozen re-encode stays green across increments as
    * long as the corpus dir carries the appended vectors — the
    * daily-growth model all three ingest families share). The audit
    * reads floats; production drops it (q93's audit precedent) and
    * ships the code-only scan. */
  def q155RotCodesAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val R = graft.jobs.RotIngest
    val (codesT, cbT) = R.ingest(s, dir)
    val stored = pqCodesScan(s, s.table(codesT), s.table(cbT))
      .select($"query_id", $"rn", $"neighbor_id", $"adist")
    // audit: the stored model drives a full in-plan FROZEN re-encode
    val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
      .localCheckpoint(false)
    val rotated = pcaRotate(s, emb, R.readModel(s, dir)).localCheckpoint(false)
    val codesIn = sq8EncodeGlobal(rotated,
        s.table(R.statsTable(dir)).select($"glo", $"ghi"))
      .select($"vec_id", transform($"codes", c =>
        least(greatest(c, lit(0L)), lit(Sq8Levels.toLong))).as("codes"))
      .localCheckpoint(false) // LUT side + pq-assign side
    val pqIn = pqEncodeCodes(s, subcodeView(s, codesIn), s.table(cbT))
    val inPlan = pqCodesScan(s,
        codesIn.join(pqIn, Seq("vec_id")).select($"vec_id", $"codes", $"pq"),
        s.table(cbT))
      .select($"query_id", $"rn", $"neighbor_id".as("n2"), $"adist".as("a2"))
    val qn = emb.where($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), round(norm2($"embedding"), 6).as("q_norm2"))
    val wq = Window.partitionBy($"query_id").orderBy($"rn".asc)
    stored
      .join(inPlan, Seq("query_id", "rn"), "left")
      .join(broadcast(qn), Seq("query_id"))
      .withColumn("mono_ok",
        $"adist" >= coalesce(lag($"adist", 1).over(wq), lit(Long.MinValue)))
      .select($"query_id", $"rn", $"q_norm2",
        ($"n2" <=> $"neighbor_id" && $"a2" <=> $"adist").as("stored_ok"),
        $"mono_ok")
      .orderBy($"query_id", $"rn")
  }

  /** Oracle: grid + anchor + TRUE verdicts (the q152 shape). */
  val q155Sql: String =
    s"""SELECT e.vec_id AS query_id, r.rn,
       |  round(${sqlNorm2("e.embedding")}, 6) AS q_norm2,
       |  TRUE AS stored_ok, TRUE AS mono_ok
       |FROM embeddings e
       |CROSS JOIN (SELECT unnest(generate_series(1, $TopK)) AS rn) r
       |WHERE e.vec_id < $NumQueries
       |ORDER BY query_id, rn""".stripMargin

  /** q102: hard-negative mining for contrastive training — for each
    * query vector, the [[TopK]] most-similar vectors carrying a
    * DIFFERENT class label. Random negatives are easy (far away) and
    * teach nothing; the negatives that sit closest to the anchor while
    * being wrong-class are the ones a contrastive loss (InfoNCE/triplet)
    * learns from, and mining them is a standard corpus-prep pass for
    * embedding-model training. Same plan shape as q30 — broadcast query
    * set, map-side scoring with precomputed norms, rounded-sim ranking
    * with id tie-break — plus the label-inequality predicate evaluated
    * at the scan, so wrong-class candidates never reach the top-k
    * shuffle. At 100 TB this is the q30 argument unchanged: the only
    * exchange carries k rows per query.
    *
    * In production the label column is any supervision signal (source
    * domain, dedup cluster, topic); the synthetic table's `label` plays
    * that role here. */
  def q102HardNegatives(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir).withColumn("en2", norm2($"embedding"))
    val queries = emb.where($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"label".as("qlabel"),
        $"embedding".as("qe"), $"en2".as("qn2"))
    val sim6 = round(cosinePre($"qe", $"embedding", $"qn2", $"en2"), 6)
    val scored = emb.join(broadcast(queries), $"label" =!= $"qlabel")
      .select($"query_id", $"vec_id".as("negative_id"),
        $"label".cast("long").as("neg_label"), sim6.as("sim"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"negative_id".asc)
    scored.withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK)
      .orderBy($"query_id", $"rn")
  }

  val q102Sql: String = {
    val cos = sqlCosine("q.embedding", "e.embedding")
    s"""WITH q AS (SELECT vec_id AS query_id, label, embedding
       |           FROM embeddings WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS negative_id,
       |    CAST(e.label AS BIGINT) AS neg_label, round($cos, 6) AS sim
       |  FROM embeddings e JOIN q ON e.label <> q.label)
       |SELECT query_id, negative_id, neg_label, sim, rn FROM (
       |  SELECT query_id, negative_id, neg_label, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, negative_id ASC) AS rn
       |  FROM scored)
       |WHERE rn <= $TopK
       |ORDER BY query_id, rn""".stripMargin
  }

  // ---- q110: SemDeDup (cluster-blocked semantic dedup verdict) ----

  /** q110: SemDeDup (Abbas et al. 2023) — semantic deduplication over
    * embeddings: block by cluster, form duplicate GROUPS from the
    * within-cluster cosine-threshold graph (connected components, not
    * just pairs — A≈B≈C collapses to one group even when A~C alone is
    * sub-threshold), and keep ONE representative per group: the member
    * with the LOWEST cosine to its cluster centroid (the paper's
    * keep-the-outlier rule — prototypical copies carry the least new
    * information), vec_id as the deterministic tie-break. q31 emits the
    * pair LIST; this emits the per-vector keep/drop DECISION a pipeline
    * actually applies. Cluster structure = the label column (the corpus
    * convention shared with q31/q32/q59; with learned k-means
    * assignments the plan is unchanged).
    *
    * Scale: the SemDeDup trick IS the blocking — pairwise work is
    * quadratic only within a cluster (k-means with k ∝ √n bounds it),
    * never corpus-wide. Centroids are one broadcast KB; the scored frame
    * is checkpointed once and feeds both sides of the pair join and the
    * output (no triple re-derivation); components run on the tiny
    * thresholded edge set; the verdict is two same-key window passes
    * over one cluster-keyed shuffle. */
  def q110SemDedup(s: SparkSession, dir: String): DataFrame =
    semDedupCore(s, Tables.embeddings(s, dir))

  /** q110 body over an arbitrary embeddings frame (Profile probes it on
    * replicated corpora). */
  private[graft] def semDedupCore(s: SparkSession, embIn: DataFrame): DataFrame = {
    import s.implicits._
    val cents = labelCentroids(embIn)
    val scored = embIn
      .select($"vec_id", $"label", $"embedding", norm2($"embedding").as("n2"))
      .join(broadcast(cents), $"label" === $"c_label")
      .select($"vec_id", $"label", $"embedding", $"n2",
        round(cosine($"embedding", $"centroid"), 6).as("cos_cent"))
      .localCheckpoint(false)
    val pairs = scored.as("a").join(scored.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .where(round(cosinePre(col("a.embedding"), col("b.embedding"),
        col("a.n2"), col("b.n2")), 6) >= NearDupThreshold)
      .select(col("a.vec_id").as("u"), col("b.vec_id").as("v"))
    val comps = graft.operators.ConnectedComponents.components(pairs, "u", "v")
      .withColumnRenamed("id", "vec_id")
    val wc = Window.partitionBy($"cluster_id")
    scored
      .join(comps, Seq("vec_id"), "left")
      .withColumn("cluster_id", coalesce($"comp", $"vec_id"))
      .withColumn("rn", row_number().over(wc.orderBy($"cos_cent".asc, $"vec_id".asc)))
      .withColumn("n_comp", count(lit(1)).over(wc))
      .select($"vec_id", $"label", $"cluster_id", $"cos_cent",
        ($"rn" === 1).as("keep"), $"n_comp")
      .orderBy($"vec_id")
  }

  val q110Sql: String = {
    val cosCent = sqlCosine("e.embedding", "c.centroid")
    val cosPair = sqlCosine("a.embedding", "b.embedding")
    s"""WITH RECURSIVE pos AS (
       |  SELECT label, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
       |  FROM embeddings),
       |cents AS (
       |  SELECT label AS c_label, list(CAST(sv AS DOUBLE) ORDER BY i) AS centroid
       |  FROM (SELECT label, i, SUM(CAST(v AS DOUBLE)) / COUNT(*) AS sv
       |        FROM pos GROUP BY label, i)
       |  GROUP BY label),
       |sc AS (
       |  SELECT e.vec_id, e.label, e.embedding, round($cosCent, 6) AS cos_cent
       |  FROM embeddings e JOIN cents c ON e.label = c.c_label),
       |pr AS (
       |  SELECT a.vec_id AS u, b.vec_id AS v
       |  FROM sc a JOIN sc b ON a.label = b.label AND a.vec_id < b.vec_id
       |  WHERE round($cosPair, 6) >= $NearDupThreshold),
       |edges AS (SELECT u, v FROM pr UNION SELECT v AS u, u AS v FROM pr),
       |walk(u, r) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
       |  UNION
       |  SELECT e.u, w.r FROM edges e JOIN walk w ON e.v = w.u),
       |comp AS (SELECT u AS vec_id, MIN(r) AS comp FROM walk GROUP BY u),
       |j AS (
       |  SELECT sc.vec_id, sc.label, sc.cos_cent,
       |    COALESCE(comp.comp, sc.vec_id) AS cluster_id
       |  FROM sc LEFT JOIN comp ON sc.vec_id = comp.vec_id)
       |SELECT vec_id, label, cluster_id, cos_cent,
       |  ROW_NUMBER() OVER (PARTITION BY cluster_id
       |    ORDER BY cos_cent ASC, vec_id ASC) = 1 AS keep,
       |  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_comp
       |FROM j ORDER BY vec_id""".stripMargin
  }

  // ---- q117: SemDeDup with a LEARNED k = ⌈√n⌉ clustering ----

  /** Assignment passes of the seeded integer k-means: seed-assign, one
    * floor-mean update, final assign — the q111 training recipe. */
  val LearnedKmPasses = 2

  /** q117: SemDeDup with the paper's k ∝ √n contract ENFORCED IN-ENGINE.
    * q110 trusts the corpus `label` column for its cluster blocking; this
    * variant derives the blocking itself: k = ⌈√n⌉ (n read at plan-build
    * time — one columnar count, the runtime-stats read AQE would do),
    * seeds = the SQ8 code vectors of the first k ids, then
    * [[LearnedKmPasses]] Lloyd assignment passes over the INTEGER codes
    * (native integer sq-distance argmin with k-asc tie-break, floor-mean
    * centroid update — q111's codebook training on the full 64-dim code
    * vector instead of subspaces). Every trained quantity is integer
    * arithmetic, so the learned partition — and therefore the entire
    * downstream SemDeDup verdict — is engine-exact against the DuckDB
    * oracle: a value-level oracle for a LEARNED clustering.
    *
    * Scale: this is what makes SemDeDup 100 TB-safe — with k grown as
    * √n, expected cluster size stays √n, so the within-cluster pair term
    * is n^1.5 rather than the n²/k of a FIXED labeling (q110's Profile
    * probe shows ~100× at 10×; this one flattens — SCALE.md row).
    * Assignment is a broadcast of k·64 longs (≈16 MB at n=10⁹) against a
    * map-side scan of the checkpointed codes with a WindowGroupLimit
    * argmin; the only corpus-sized exchanges are the vec_id label join
    * and the cluster-keyed pair stage SemDeDup needs anyway. */
  def q117SemDedupLearnedK(s: SparkSession, dir: String): DataFrame =
    semDedupLearnedCore(s,
      Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))

  /** Learned ⌈√n⌉-means labels for an (vec_id, embedding) frame:
    * (vec_id, label) with label = final centroid id. */
  private[graft] def learnedLabels(s: SparkSession, emb: DataFrame): DataFrame = {
    import s.implicits._
    val n = emb.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toLong
    val stats = sq8Stats(emb).localCheckpoint(false) // 1 row
    val codes = sq8Encode(emb, stats).localCheckpoint(false) // ≥2 consumers
    def isqd(a: Column, b: Column): Column = graft.functions.Vec.isqdCol(s, a, b)
    val wArgmin = Window.partitionBy($"vec_id").orderBy($"dd".asc, $"k".asc)
    def assign(cb: DataFrame): DataFrame = codes
      .join(broadcast(cb), lit(true))
      .select($"vec_id", $"codes", $"k", isqd($"codes", $"cent").as("dd"))
      .withColumn("rn", row_number().over(wArgmin)).where($"rn" === 1)
      .select($"vec_id", $"codes", $"k")
    var asg = assign(
      codes.where($"vec_id" < k).select($"vec_id".as("k"), $"codes".as("cent")))
    for (_ <- 2 to LearnedKmPasses) {
      // empty centroids DROP from the codebook (q111's sparse-codebook
      // rule). Round-19: the 64-col floor-mean fan → one elementwise
      // long-sum aggregate (pqTrainCodebook's rewrite; values unchanged)
      val cb = asg.groupBy($"k")
        .agg(graft.functions.VecAgg.sumLCol(s, $"codes").as("ssum"),
          count(lit(1)).as("cnt"))
        .select($"k", transform($"ssum", v => floor(v / $"cnt").cast("long")).as("cent"))
      asg = assign(cb)
    }
    asg.select($"vec_id", $"k".cast("long").as("label"))
  }

  /** q117 body over an arbitrary (vec_id, embedding) frame (Profile
    * probes it on replicated corpora, where k grows as √10 ≈ 3.2×). */
  private[graft] def semDedupLearnedCore(s: SparkSession, emb: DataFrame): DataFrame =
    semDedupCore(s, emb.join(learnedLabels(s, emb), Seq("vec_id"))
      .select(col("vec_id"), col("label"), col("embedding")))

  val q117Sql: String = {
    val cosCent = sqlCosine("e.embedding", "c.centroid")
    val cosPair = sqlCosine("a.embedding", "b.embedding")
    s"""WITH RECURSIVE ex AS (
       |  SELECT vec_id, unnest(embedding) AS x,
       |    unnest(generate_series(1, len(embedding))) AS d
       |  FROM embeddings),
       |st AS (SELECT d, MIN(CAST(x AS DOUBLE)) AS lo, MAX(CAST(x AS DOUBLE)) AS hi
       |       FROM ex GROUP BY d),
       |c AS (SELECT ex.vec_id, ex.d,
       |        CASE WHEN st.hi > st.lo
       |          THEN CAST(floor((CAST(ex.x AS DOUBLE) - st.lo) / (st.hi - st.lo) * $Sq8Levels) AS BIGINT)
       |          ELSE 0 END AS code
       |      FROM ex JOIN st USING (d)),
       |kk AS (SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS k
       |       FROM embeddings),
       |s0 AS (SELECT vec_id AS k, d, code AS cent FROM c
       |       WHERE vec_id < (SELECT k FROM kk)),
       |d0 AS (SELECT c.vec_id, s.k, SUM((c.code - s.cent) * (c.code - s.cent)) AS dd
       |       FROM c JOIN s0 s ON c.d = s.d GROUP BY 1, 2),
       |a0 AS (SELECT vec_id, k FROM (
       |    SELECT vec_id, k, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY dd ASC, k ASC) AS rn FROM d0) WHERE rn = 1),
       |c1 AS (SELECT a.k, c.d, CAST(floor(SUM(c.code) / COUNT(*)) AS BIGINT) AS cent
       |       FROM c JOIN a0 a ON c.vec_id = a.vec_id GROUP BY 1, 2),
       |d1 AS (SELECT c.vec_id, s.k, SUM((c.code - s.cent) * (c.code - s.cent)) AS dd
       |       FROM c JOIN c1 s ON c.d = s.d GROUP BY 1, 2),
       |a1 AS (SELECT vec_id, k AS label FROM (
       |    SELECT vec_id, k, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY dd ASC, k ASC) AS rn FROM d1) WHERE rn = 1),
       |lab AS (SELECT emb.vec_id, a1.label, emb.embedding
       |        FROM embeddings emb JOIN a1 ON emb.vec_id = a1.vec_id),
       |pos AS (SELECT label, generate_subscripts(embedding, 1) AS i,
       |          unnest(embedding) AS v FROM lab),
       |cents AS (
       |  SELECT label AS c_label, list(CAST(sv AS DOUBLE) ORDER BY i) AS centroid
       |  FROM (SELECT label, i, SUM(CAST(v AS DOUBLE)) / COUNT(*) AS sv
       |        FROM pos GROUP BY label, i)
       |  GROUP BY label),
       |sc AS (
       |  SELECT e.vec_id, e.label, e.embedding, round($cosCent, 6) AS cos_cent
       |  FROM lab e JOIN cents c ON e.label = c.c_label),
       |pr AS (
       |  SELECT a.vec_id AS u, b.vec_id AS v
       |  FROM sc a JOIN sc b ON a.label = b.label AND a.vec_id < b.vec_id
       |  WHERE round($cosPair, 6) >= $NearDupThreshold),
       |edges AS (SELECT u, v FROM pr UNION SELECT v AS u, u AS v FROM pr),
       |walk(u, r) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
       |  UNION
       |  SELECT e.u, w.r FROM edges e JOIN walk w ON e.v = w.u),
       |comp AS (SELECT u AS vec_id, MIN(r) AS comp FROM walk GROUP BY u),
       |j AS (
       |  SELECT sc.vec_id, sc.label, sc.cos_cent,
       |    COALESCE(comp.comp, sc.vec_id) AS cluster_id
       |  FROM sc LEFT JOIN comp ON sc.vec_id = comp.vec_id)
       |SELECT vec_id, label, cluster_id, cos_cent,
       |  ROW_NUMBER() OVER (PARTITION BY cluster_id
       |    ORDER BY cos_cent ASC, vec_id ASC) = 1 AS keep,
       |  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_comp
       |FROM j ORDER BY vec_id""".stripMargin
  }

  // ---- q120: metadata-filtered ANN (pre-filter strategy) ----

  /** q120: top-k cosine search restricted by a METADATA predicate from a
    * different table — the "filtered vector search" shape every
    * retrieval pipeline needs (per-language / per-license / per-source
    * corpora over one shared index). Strategy implemented here is
    * PRE-FILTER: resolve the predicate first (documents.lang = 'en',
    * broadcast semi-join on vec_id = doc_id), then score only the
    * surviving corpus — exact by construction, and the right plan
    * whenever the predicate is selective enough to pay for itself.
    * The alternative POST-FILTER strategy (over-fetch k·c unfiltered
    * candidates, then apply the predicate) is implemented in
    * [[q120PostFilter]] and pinned against this exact result in
    * FilteredAnnSpec: with bounded over-fetch it can MISS neighbors (its
    * recall on the fixture is measured there), which is why the
    * registered, oracle-checked entry is the pre-filter form.
    *
    * Scale: the predicate resolves on the (cheap) metadata table and
    * reaches the filtered side as a broadcast semi-join — the embedding
    * scan prunes to the qualifying rows without shuffling the vectors;
    * scoring is then the q30 broadcast map-side shape, one exchange for
    * the per-query top-k. At 100 TB with a low-selectivity predicate the
    * same query flips to post-filter over the IVF index (q32) — the
    * planner choice the two implementations document. */
  def q120FilteredAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val en = Tables.documents(s, dir).where($"lang" === "en").select($"doc_id")
    val emb = Tables.embeddings(s, dir).withColumn("en2", norm2($"embedding"))
    val qs = emb.where($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"en2".as("qn2"))
    val corpus = emb.join(broadcast(en), $"vec_id" === $"doc_id", "left_semi")
    val sim6 = round(cosinePre($"qe", $"embedding", $"qn2", $"en2"), 6)
    val scored = corpus.join(broadcast(qs), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), sim6.as("sim"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    scored.withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK)
      .orderBy($"query_id", $"rn")
  }

  /** Post-filter strategy for the same query: top-(k·overFetch) WITHOUT
    * the predicate, then filter and re-rank. Not oracle-registered —
    * with bounded over-fetch it is approximate (a query whose unfiltered
    * neighborhood is dominated by non-matching rows exhausts the buffer
    * before k matches survive). FilteredAnnSpec measures its recall
    * against [[q120FilteredAnn]]. */
  def q120PostFilter(s: SparkSession, dir: String, overFetch: Int): DataFrame = {
    import s.implicits._
    val en = Tables.documents(s, dir).where($"lang" === "en").select($"doc_id")
    val emb = Tables.embeddings(s, dir).withColumn("en2", norm2($"embedding"))
    val qs = emb.where($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"en2".as("qn2"))
    val sim6 = round(cosinePre($"qe", $"embedding", $"qn2", $"en2"), 6)
    val scored = emb.join(broadcast(qs), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), sim6.as("sim"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    val shortlist = scored.withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK * overFetch)
    shortlist.join(broadcast(en), $"neighbor_id" === $"doc_id", "left_semi")
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK)
      .orderBy($"query_id", $"rn")
  }

  /** Selectivity crossover for [[q156FilteredAnnAuto]]: below it the
    * predicate is worth resolving first (pre-filter); at/above it most
    * of the corpus qualifies, so the unfiltered shortlist is nearly a
    * filtered one and post-filtering avoids the second predicate-
    * shaped corpus scan pattern at 100 TB (where "corpus" is an index
    * and the shortlist comes from it, not a brute scan). */
  val FilteredAnnSelThreshold = 0.5

  /** Shortlist over-fetch for the post-filter branch. */
  val FilteredAnnOverFetch = 4

  /** The planner decision the q120 scaladoc deferred (VERDICT r13 item
    * 4), factored pure so the crossover is spec-pinnable. */
  private[graft] def filteredAnnChoose(selectivity: Double): String =
    if (selectivity < FilteredAnnSelThreshold) "pre" else "post"

  /** q156: q120 with the strategy CHOSEN — estimate the predicate's
    * selectivity from the metadata table (ONE count aggregate over the
    * cheap documents side; a 1-row driver read) and dispatch:
    * pre-filter below [[FilteredAnnSelThreshold]] (selective predicate
    * → resolve it first, score only survivors), post-filter with exact
    * fallback at/above it (permissive predicate → the unfiltered
    * shortlist already contains the answer for almost every query).
    *
    * Both branches are EXACT, so the chooser is a pure plan decision:
    * the post branch keeps a query's shortlist answer only when ≥
    * [[TopK]] matches survive inside it — in the (sim DESC, id ASC)
    * total order every out-of-shortlist match ranks below every
    * shortlist row, so ≥ k in-shortlist matches ⇒ they ARE the exact
    * top-k — and re-scores the deficient remainder through the
    * pre-filter shape restricted to those query ids (a KB frame in the
    * regime this branch is chosen for). FilteredAnnSpec pins the
    * crossover on selectivities either side of the threshold and the
    * post+fallback ≡ pre equality under an over-fetch starved enough
    * to force the fallback. Oracle: q120's SQL — strategy must be
    * value-invisible. */
  def q156FilteredAnnAuto(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sel = Tables.documents(s, dir)
      .agg(avg(when($"lang" === "en", 1.0).otherwise(0.0))).head().getDouble(0)
    if (filteredAnnChoose(sel) == "pre") q120FilteredAnn(s, dir)
    else postFilterExact(s, dir, FilteredAnnOverFetch)
  }

  /** The post-filter branch with the exactness fallback — q156's body
    * when the predicate is permissive. */
  private[graft] def postFilterExact(s: SparkSession, dir: String,
      overFetch: Int): DataFrame = {
    import s.implicits._
    val en = Tables.documents(s, dir).where($"lang" === "en").select($"doc_id")
    val emb = Tables.embeddings(s, dir).withColumn("en2", norm2($"embedding"))
    val qs = emb.where($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"en2".as("qn2"))
    val sim6 = round(cosinePre($"qe", $"embedding", $"qn2", $"en2"), 6)
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    // unfiltered global shortlist (k·c rows/query) — consumed twice
    // (survivor cut + deficiency census), so checkpointed
    val shortlist = emb.join(broadcast(qs), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), sim6.as("sim"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK * overFetch)
      .localCheckpoint(false)
    val surv = shortlist.join(broadcast(en), $"neighbor_id" === $"doc_id", "left_semi")
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK)
      .localCheckpoint(false)
    // exactly-TopK survivors ⇔ the shortlist answer is provably exact
    val okIds = surv.groupBy($"query_id").agg(count(lit(1)).as("n"))
      .where($"n" === TopK).select($"query_id")
    val exactPart = surv.join(broadcast(okIds), Seq("query_id"), "left_semi")
    // deficient queries (KB set in this branch's regime): exact
    // pre-filter scoring restricted to them
    val qsDef = qs.join(broadcast(okIds), Seq("query_id"), "left_anti")
    val corpusEn = emb.join(broadcast(en), $"vec_id" === $"doc_id", "left_semi")
    val fallback = corpusEn.join(broadcast(qsDef), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), sim6.as("sim"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK)
    exactPart.select($"query_id", $"neighbor_id", $"sim", $"rn")
      .unionByName(fallback.select($"query_id", $"neighbor_id", $"sim", $"rn"))
      .orderBy($"query_id", $"rn")
  }

  val q120Sql: String = {
    val cos = sqlCosine("q.embedding", "e.embedding")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < $NumQueries),
       |en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id, round($cos, 6) AS sim
       |  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
       |  WHERE e.vec_id IN (SELECT doc_id FROM en))
       |SELECT query_id, neighbor_id, sim, rn FROM (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
       |  FROM scored)
       |WHERE rn <= $TopK
       |ORDER BY query_id, rn""".stripMargin
  }

  // ---- q123: ADC shortlist → exact refine (two-stage retrieval) ----

  /** Shortlist over-fetch factor: the ADC stage keeps
    * TopK·[[RefineOverFetch]] candidates per query for exact re-ranking. */
  val RefineOverFetch = 4

  /** q123: the FAISS-style production search endpoint — the COMPRESSED
    * first stage (q111's integer ADC scan over PQ codes) keeps a
    * k·[[RefineOverFetch]] shortlist, then ONLY those rows are re-ranked
    * with exact float cosine (the "refine" step). The expensive exact
    * math runs on queries×k·c rows instead of the corpus, and the
    * shortlist is broadcast back against the float table — floats never
    * shuffle, and with the q118 codes-at-ingest layout the first stage
    * never reads them at all.
    *
    * ADC ranking can misorder true neighbors (quantization error);
    * refining a small over-fetch recovers most of them — RefineSpec
    * measures recall@k vs the q30 exact brute force: refined ≥ raw ADC,
    * and == brute force when the shortlist covers the corpus. Oracle:
    * q111's CTE chain (shared text — hash-identical ADC distances)
    * + the q30 cosine recipe on the shortlist, value-level end to end. */
  def q123RefineAnn(s: SparkSession, dir: String): DataFrame =
    refineCore(s, Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
      RefineOverFetch)

  /** q123 body over any (vec_id, embedding) frame with a configurable
    * over-fetch (spec uses corpus-sized over-fetch for the exactness
    * bound). */
  private[graft] def refineCore(s: SparkSession, emb: DataFrame,
      overFetch: Int): DataFrame = {
    import s.implicits._
    val subcodes = pqSubcodes(s, emb).localCheckpoint(false)
    val cents = pqTrainCodebook(s, subcodes).localCheckpoint(false)
    val pqcodes = pqEncodeCodes(s, subcodes, cents)
    val luts = pqQueryLuts(s, subcodes.where($"vec_id" < NumQueries), cents)
    val shortlist = pqAdcScan(s, pqcodes, luts, TopK * overFetch)
      .select($"query_id", $"neighbor_id")
    val en = emb.withColumn("en2", norm2($"embedding"))
    val qs = en.where($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"en2".as("qn2"))
    val sim6 = round(cosinePre($"qe", $"embedding", $"qn2", $"en2"), 6)
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    en.join(broadcast(shortlist), $"vec_id" === $"neighbor_id")
      .join(broadcast(qs), Seq("query_id"))
      .select($"query_id", $"neighbor_id", sim6.as("sim"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK)
      .orderBy($"query_id", $"rn")
  }

  val q123Sql: String = {
    val cos = sqlCosine("q.embedding", "e.embedding")
    s"""$pqScCtes,
       |shortlist AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY adist ASC, neighbor_id ASC) AS srn
       |    FROM sc)
       |  WHERE srn <= ${TopK * RefineOverFetch}),
       |q2 AS (SELECT vec_id AS query_id, embedding FROM embeddings
       |       WHERE vec_id < $NumQueries)
       |SELECT query_id, neighbor_id, sim, rn FROM (
       |  SELECT s.query_id, s.neighbor_id, round($cos, 6) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY s.query_id
       |      ORDER BY round($cos, 6) DESC, s.neighbor_id ASC) AS rn
       |  FROM shortlist s
       |  JOIN embeddings e ON e.vec_id = s.neighbor_id
       |  JOIN q2 q ON q.query_id = s.query_id)
       |WHERE rn <= $TopK
       |ORDER BY query_id, rn""".stripMargin
  }

  // ---- q121: PCA projection (distributed moments + driver eigensolve) ----

  /** Projection rank for q121 (64-dim embeddings → 8 components). */
  val PcaComponents = 8

  /** PCA model of `dir`'s embeddings: (eigenvalues desc, eigenvector
    * rows, mean). The DISTRIBUTED part is one pass through the
    * [[graft.functions.Covariance]] aggregator (per-partition fold,
    * lossless elementwise merge, ONE ~17 KB buffer to the driver); the
    * d×d eigensolve is [[graft.functions.Eigen.jacobi]] on the driver —
    * 64×64 is microseconds, and shipping it beats shipping vectors. */
  def pcaModel(s: SparkSession, dir: String)
      : (Array[Double], Array[Array[Double]], Array[Double]) =
    pcaModelFrame(s, Tables.embeddings(s, dir))

  /** [[pcaModel]] over any frame with an `embedding` column — probe/spec
    * entry point. */
  def pcaModelFrame(s: SparkSession, embIn: DataFrame)
      : (Array[Double], Array[Array[Double]], Array[Double]) = {
    import s.implicits._
    val emb = embIn.select($"embedding").as[Seq[Float]]
    // EmbDim is the corpus contract (q111/q95 share it); a per-row
    // mismatch fails loudly in the aggregator. Probing the dimension
    // with head() cost a second corpus-touching job (review finding).
    val d = EmbDim
    val m = emb.select(new graft.functions.Covariance(d).toColumn).head()
    val n = m.n.toDouble
    val mu = m.sums.map(_ / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val raw = if (i >= j) m.prods(i * (i + 1) / 2 + j)
                else m.prods(j * (j + 1) / 2 + i)
      raw / n - mu(i) * mu(j)
    }
    val (vals, vecs) = graft.functions.Eigen.jacobi(cov)
    (vals, vecs, mu)
  }

  /** q121: project every embedding onto the top-[[PcaComponents]]
    * principal components — the dimensionality-reduction stage a vector
    * pipeline runs before coarse quantization (and the rotation OPQ
    * applies before PQ). Training is the one-pass moments fold above;
    * projection is MAP-ONLY: the eigenvector matrix and mean enter the
    * plan as literals, each component is a per-row left-to-right HOF
    * fold, and no shuffle touches the corpus.
    *
    * Oracle shape: per-row VALUES the oracle engine can recompute
    * (`orig_norm2`, the uncentered squared norm — a deterministic
    * per-row fold) plus the Bessel VERDICT `resid_nonneg`:
    * ‖x−μ‖² − Σⱼ pⱼ² ≥ −1e-6, which holds iff the projection basis is
    * orthonormal — a non-orthogonal V inflates Σpⱼ² past the centered
    * norm and flips the verdict, so hash-matching TRUE is a real check
    * on the learned basis, tolerant only to the ~1e-12 partition-order
    * jitter in the covariance fold (the q43 verdict-oracle pattern). */
  def q121PcaProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (_, vecs, mu) = pcaModel(s, dir)
    val R = PcaComponents
    def dotLit(w: Array[Double]): Column =
      aggregate(zip_with($"embedding", typedLit(w.toSeq),
          (x, c) => x.cast("double") * c),
        lit(0.0), (acc, t) => acc + t)
    val shifts = vecs.take(R).map(vj => vj.zip(mu).map { case (a, b) => a * b }.sum)
    val projs = (0 until R).map(j => (dotLit(vecs(j)) - lit(shifts(j))).as(s"p$j"))
    val cn2 = aggregate(zip_with($"embedding", typedLit(mu.toSeq),
        (x, m) => (x.cast("double") - m) * (x.cast("double") - m)),
      lit(0.0), (a, b) => a + b).as("cn2")
    val pn2 = (0 until R).map(j => col(s"p$j") * col(s"p$j")).reduce(_ + _)
    Tables.embeddings(s, dir)
      .select(Seq($"vec_id", round(norm2($"embedding"), 6).as("orig_norm2"),
        cn2) ++ projs: _*)
      .select($"vec_id", lit(R).as("n_components"), $"orig_norm2",
        ($"cn2" - pn2 >= -1e-6).as("resid_nonneg"))
      .orderBy($"vec_id")
  }

  /** Rotate a (vec_id, embedding) frame into the full PCA basis of
    * `model` (centered, all d components — an ORTHONORMAL rotation, so
    * cosine/L2 rankings are invariant). This is the OPQ-lite preprocess
    * for the PQ family: rotating before [[pqAdcCore]]/CodesIngest
    * balances variance across the 8 subspaces and measurably lifts ADC
    * recall (0.16 → 0.36 @5 at sf0.1 — SCALE.md; OpqRotationSpec pins
    * the improvement on the fixture). Map-only: the basis enters the
    * plan as literals. */
  def pcaRotate(s: SparkSession, emb: DataFrame,
      model: (Array[Double], Array[Array[Double]], Array[Double])): DataFrame = {
    import s.implicits._
    val (_, basis, mu) = model
    val shifts = basis.map(vj => vj.zip(mu).map { case (a, b) => a * b }.sum)
    def dotLit(w: Array[Double]): Column =
      aggregate(zip_with($"embedding", typedLit(w.toSeq),
          (x, c) => x.cast("double") * c),
        lit(0.0), (acc, t) => acc + t)
    val rotCols = basis.indices.map(j =>
      (dotLit(basis(j)) - lit(shifts(j))).cast("float"))
    emb.select($"vec_id", array(rotCols: _*).as("embedding"))
  }

  val q121Sql: String =
    s"""SELECT vec_id, $PcaComponents AS n_components,
       |  round(${sqlNorm2("embedding")}, 6) AS orig_norm2,
       |  TRUE AS resid_nonneg
       |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---- q128: binary-quantized ANN (Hamming shortlist → exact refine) ----

  /** Bits per packed half-word: 64 dims split into two 32-bit halves so
    * every packed value stays far below the BIGINT sign bit on both
    * engines (a 64-bit pack would need bit 63 and make the word sign
    * itself engine-visible). */
  val BinHalf = 32

  /** Hamming shortlist over-fetch: the binary stage keeps
    * TopK·[[BinOverFetch]] candidates per query for exact re-ranking —
    * wider than q123's ADC over-fetch because 1 bit/dim ranks coarser
    * than 4 bits/subspace. */
  val BinOverFetch = 8

  /** q128: binary sign-quantized ANN — the MOST compressed tier of the
    * family (q30 exact floats 256 B/vec → q95 SQ8 64 B → q111 PQ 8 B →
    * here 8 B as two packed bit-words, with a two-instruction distance).
    * Each dimension becomes one bit: x > (lo+hi)/2, the exact per-dim
    * midpoint of the corpus min/max (q95's stats pass — exact IEEE ops,
    * so the BITS are engine-identical). Bits pack into two 32-bit
    * half-words; candidate ranking is the Hamming distance
    * `bit_count(xor)` — the same codegen'd primitive q86's SimHash
    * banding uses — and the shortlist is re-ranked by exact float cosine
    * (the q123 refine recipe), so the final answer is value-level exact
    * against DuckDB end to end.
    *
    * Scale: stats are ONE row broadcast; packing is map-only; the scan
    * reads 16 bytes/vector (with q118's codes-at-ingest layout, a stored
    * column) and the distance is two XOR+POPCNT pairs — memory-bandwidth
    * bound, ~16× less of it than the SQ8 scan; one k·c-row-per-query
    * top-k shuffle; the float table is touched only for the broadcast
    * shortlist join. Recall vs the q30 exact truth is MEASURED in
    * BinaryAnnSpec (and == brute force at corpus-sized over-fetch), not
    * assumed. */
  def q128BinaryAnn(s: SparkSession, dir: String): DataFrame =
    binCore(s, Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
      BinOverFetch)

  /** Per-dim midpoint threshold bits packed into (w0, w1) — 32 dims per
    * half-word, bit j-1 of w0 = dim j above midpoint. Map-only against
    * the broadcast 1-row stats (q95's sq8Stats). */
  private[graft] def binEncode(df: DataFrame, stats: DataFrame): DataFrame = {
    def half(offset: Int): Column =
      (1 to BinHalf).map { j =>
        val d = offset + j
        val mid = (element_at(col("lo"), d) + element_at(col("hi"), d)) / lit(2.0)
        when(element_at(col("embedding"), d).cast("double") > mid,
          lit(1L << (j - 1))).otherwise(lit(0L))
      }.reduce(_ + _)
    df.crossJoin(broadcast(stats))
      .select(col("vec_id"), half(0).as("w0"), half(BinHalf).as("w1"))
  }

  /** q128 body over any (vec_id, embedding) frame with a configurable
    * over-fetch (BinaryAnnSpec uses corpus-sized over-fetch for the
    * exactness bound): encode in-plan, then search. */
  private[graft] def binCore(s: SparkSession, emb: DataFrame,
      overFetch: Int): DataFrame = {
    val stats = sq8Stats(emb)
      .localCheckpoint(false) // 1 row, consumed by one encode pass
    binSearch(s, binEncode(emb, stats), emb, overFetch)
  }

  /** Search over an already-packed (vec_id, w0, w1) frame — the shared
    * body of q128 (in-plan encode) and q130 (stored words): Hamming
    * shortlist from the words alone, exact-cosine refine against the
    * float frame. The query-side words prune from the same words frame
    * (vec_id < NumQueries — a pushed filter on the stored table). */
  private[graft] def binSearch(s: SparkSession, words: DataFrame,
      emb: DataFrame, overFetch: Int): DataFrame = {
    import s.implicits._
    val corpus = words.select($"vec_id", $"w0", $"w1")
    val qwords = corpus.where($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"w0".as("qw0"), $"w1".as("qw1"))
    // two XOR+POPCNT pairs — codegen'd builtins, no UDF, no HOF
    val ham = (expr("bit_count(w0 ^ qw0)") + expr("bit_count(w1 ^ qw1)"))
      .cast("long")
    val ws = Window.partitionBy($"query_id")
      .orderBy($"hamming".asc, $"neighbor_id".asc)
    val shortlist = corpus.join(broadcast(qwords), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), ham.as("hamming"))
      .withColumn("srn", row_number().over(ws))
      .where($"srn" <= TopK * overFetch)
      .select($"query_id", $"neighbor_id")
    // exact refine on the shortlist only (the q123 recipe)
    val en = emb.withColumn("en2", norm2($"embedding"))
    val qs = en.where($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"en2".as("qn2"))
    val sim6 = round(cosinePre($"qe", $"embedding", $"qn2", $"en2"), 6)
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    en.join(broadcast(shortlist), $"vec_id" === $"neighbor_id")
      .join(broadcast(qs), Seq("query_id"))
      .select($"query_id", $"neighbor_id", sim6.as("sim"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK)
      .orderBy($"query_id", $"rn")
  }

  val q128Sql: String = {
    val cos = sqlCosine("q.embedding", "e.embedding")
    s"""WITH e AS (SELECT vec_id, unnest(embedding) AS x,
       |             unnest(generate_series(1, len(embedding))) AS d
       |           FROM embeddings),
       |st AS (SELECT d, (MIN(CAST(x AS DOUBLE)) + MAX(CAST(x AS DOUBLE))) / 2.0 AS mid
       |       FROM e GROUP BY d),
       |wv AS (SELECT e.vec_id,
       |         CAST(SUM(CASE WHEN e.d <= $BinHalf AND CAST(e.x AS DOUBLE) > st.mid
       |           THEN CAST(1 AS BIGINT) << (e.d - 1) ELSE 0 END) AS BIGINT) AS w0,
       |         CAST(SUM(CASE WHEN e.d > $BinHalf AND CAST(e.x AS DOUBLE) > st.mid
       |           THEN CAST(1 AS BIGINT) << (e.d - ${BinHalf + 1}) ELSE 0 END) AS BIGINT) AS w1
       |       FROM e JOIN st USING (d) GROUP BY 1),
       |qw AS (SELECT vec_id AS query_id, w0 AS qw0, w1 AS qw1 FROM wv
       |       WHERE vec_id < $NumQueries),
       |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |         CAST(bit_count(xor(c.w0, q.qw0))
       |            + bit_count(xor(c.w1, q.qw1)) AS BIGINT) AS hamming
       |       FROM wv c JOIN qw q ON c.vec_id <> q.query_id),
       |shortlist AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY hamming ASC, neighbor_id ASC) AS srn
       |    FROM sc)
       |  WHERE srn <= ${TopK * BinOverFetch}),
       |q2 AS (SELECT vec_id AS query_id, embedding FROM embeddings
       |       WHERE vec_id < $NumQueries)
       |SELECT query_id, neighbor_id, sim, rn FROM (
       |  SELECT s.query_id, s.neighbor_id, round($cos, 6) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY s.query_id
       |      ORDER BY round($cos, 6) DESC, s.neighbor_id ASC) AS rn
       |  FROM shortlist s
       |  JOIN embeddings e ON e.vec_id = s.neighbor_id
       |  JOIN q2 q ON q.query_id = s.query_id)
       |WHERE rn <= $TopK
       |ORDER BY query_id, rn""".stripMargin
  }

  /** q130: q128's binary search run against the INGESTED packed words
    * ([[graft.jobs.CodesIngest]] stores w0/w1 next to the SQ8/PQ codes)
    * — the q118 pattern applied to the cheapest tier: the COARSE stage
    * reads ONLY (vec_id, w0, w1) — 16 bytes/vector via parquet column
    * pruning, the float `embedding` column absent from the codes-table
    * scan (PlanSpec pins the read schema) — and the query-side words
    * prune to the [[NumQueries]] rows by a pushed vec_id filter. Floats
    * are read exactly once, by the broadcast refine join. Oracle =
    * q128's SQL verbatim: the stored words reproduce the in-plan
    * packing bit for bit (they are exact integers), so the ranking is
    * value-level identical — an oracle on a MATERIALIZED binary index. */
  def q130BinCodesAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (codesT, _) = graft.jobs.CodesIngest.ingest(s, dir)
    binSearch(s, s.table(codesT).select($"vec_id", $"w0", $"w1"),
      Tables.embeddings(s, dir).select($"vec_id", $"embedding"), BinOverFetch)
  }

  // ---- q129: MaxSim late-interaction retrieval (multi-vector docs) ----

  /** Vectors per pseudo-passage: consecutive vec_ids group into
    * multi-vector documents (the ColBERT layout — one embedding per
    * token/span, many per document). */
  val MaxSimM = 4
  /** Multi-vector query documents: pseudo-docs 0..2 (vec_id < 12). */
  val MaxSimQDocs = 3

  /** q129: late-interaction (MaxSim) retrieval — the MULTI-VECTOR
    * retrieval semantic the single-vector family (q30..q128) cannot
    * express: a document is a SET of vectors, and its score against a
    * multi-vector query is Σ over query positions of the MAX member
    * cosine — each query vector independently finds its best-matching
    * span, so a passage matching all facets of the query beats one
    * matching a single facet strongly.
    *
    * Engine-exactness: member cosines are rounded to 6 dp BEFORE the max
    * (selection over exact values — an ulp disagreement can never flip
    * the argmax result value), and the per-position maxima are added in
    * FIXED positional order m0+m1+m2+m3 (both engines run the identical
    * left-associated IEEE double chain), so the scores — and the full
    * ranking with doc-id tie-break — are value-level exact vs DuckDB.
    *
    * Scale: the query side is [[MaxSimQDocs]]·[[MaxSimM]] vectors —
    * broadcast; the corpus is scanned ONCE map-side (|corpus|·|qvecs|
    * codegen'd cosines), and ONE aggregation shuffle on (query_doc,
    * doc) reduces member rows straight to the per-position maxima via
    * max(CASE) — no intermediate per-position exchange, no all-pairs
    * doc×doc term anywhere. At 100 TB the shortlist trick composes: run
    * q128/q111 per member vector first and MaxSim only the candidate
    * union, the PLAID two-stage shape. */
  def q129MaxSim(s: SparkSession, dir: String): DataFrame =
    maxSimCore(s, Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))

  private[graft] def maxSimCore(s: SparkSession, emb: DataFrame): DataFrame =
    maxSimScore(s, emb, cands = None)

  /** The MaxSim scoring tail, optionally restricted to a (query_doc,
    * doc) candidate frame — q129 scores every pair (cands = None), q131
    * only the shortlisted ones. */
  private[graft] def maxSimScore(s: SparkSession, emb: DataFrame,
      cands: Option[DataFrame]): DataFrame = {
    import s.implicits._
    val vecs = emb.select(expr(s"vec_id div $MaxSimM").as("doc"),
        ($"vec_id" % MaxSimM).as("pos"), $"embedding",
        norm2($"embedding").as("n2"))
    val qs = vecs.where($"doc" < MaxSimQDocs)
      .select($"doc".as("query_doc"), $"pos".as("qpos"),
        $"embedding".as("qe"), $"n2".as("qn2"))
    val scored = cands match {
      case None => vecs.join(broadcast(qs), $"doc" =!= $"query_doc")
      case Some(c) => vecs.join(broadcast(c), Seq("doc"))
        .join(broadcast(qs), Seq("query_doc"))
    }
    val c6 = round(cosinePre($"qe", $"embedding", $"qn2", $"n2"), 6)
    def m(i: Int): Column = max(when($"qpos" === i, $"c")).as(s"m$i")
    val w = Window.partitionBy($"query_doc").orderBy($"score".desc, $"doc".asc)
    scored
      .select($"query_doc", $"qpos", $"doc", c6.as("c"))
      .groupBy($"query_doc", $"doc")
      .agg(m(0), m(1), m(2), m(3))
      .select($"query_doc", $"doc",
        round($"m0" + $"m1" + $"m2" + $"m3", 6).as("score"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK)
      .orderBy($"query_doc", $"rn")
  }

  // ---- q131: two-stage MaxSim (binary member shortlist → exact) ----

  /** Per-query-member Hamming shortlist size for the coarse stage. */
  val MaxSimShortlist = 40

  /** q131: the PLAID two-stage shape q129's scaladoc promises — the
    * exact MaxSim runs only on CANDIDATE documents, where a candidate is
    * any doc owning a member vector in some query member's Hamming
    * top-[[MaxSimShortlist]] (q128's packed-bit distance over the same
    * corpus stats). The coarse stage touches 16 bytes/member; the
    * expensive float scoring then runs on |queries|·|candidates| pairs
    * instead of the whole corpus — at 100 TB the difference between a
    * full float scan per query batch and a bounded candidate set.
    *
    * Exactness structure: the shortlist is integer Hamming with vec_id
    * tie-break (engine-exact), and stage 2 is q129's value-level-exact
    * scoring verbatim, so the oracle composes the two CTE chains
    * directly. Recall vs single-stage q129 is MEASURED in MaxSimSpec
    * (== q129 when the shortlist covers the corpus). */
  def q131MaxSimPruned(s: SparkSession, dir: String): DataFrame =
    plaidCore(s, Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
      MaxSimShortlist)

  private[graft] def plaidCore(s: SparkSession, emb: DataFrame,
      shortlistK: Int): DataFrame = {
    import s.implicits._
    val stats = sq8Stats(emb).localCheckpoint(false)
    val words = binEncode(emb, stats)
    val corpusW = words.select($"vec_id", expr(s"vec_id div $MaxSimM").as("doc"),
      $"w0", $"w1")
    val qw = corpusW.where($"doc" < MaxSimQDocs)
      .select($"doc".as("query_doc"), $"vec_id".as("q_vec"),
        $"w0".as("qw0"), $"w1".as("qw1"))
    val ham = (expr("bit_count(w0 ^ qw0)") + expr("bit_count(w1 ^ qw1)"))
      .cast("long")
    val wq = Window.partitionBy($"q_vec").orderBy($"hamming".asc, $"vec_id".asc)
    val cands = corpusW.join(broadcast(qw), $"doc" =!= $"query_doc")
      .select($"query_doc", $"q_vec", $"vec_id", $"doc", ham.as("hamming"))
      .withColumn("srn", row_number().over(wq))
      .where($"srn" <= shortlistK)
      .select($"query_doc", $"doc").distinct()
    maxSimScore(s, emb, Some(cands))
  }

  val q131Sql: String = {
    val cos = sqlCosine("q.embedding", "v.embedding")
    s"""WITH e AS (SELECT vec_id, unnest(embedding) AS x,
       |             unnest(generate_series(1, len(embedding))) AS d
       |           FROM embeddings),
       |st AS (SELECT d, (MIN(CAST(x AS DOUBLE)) + MAX(CAST(x AS DOUBLE))) / 2.0 AS mid
       |       FROM e GROUP BY d),
       |wv AS (SELECT e.vec_id, e.vec_id // $MaxSimM AS doc,
       |         CAST(SUM(CASE WHEN e.d <= $BinHalf AND CAST(e.x AS DOUBLE) > st.mid
       |           THEN CAST(1 AS BIGINT) << (e.d - 1) ELSE 0 END) AS BIGINT) AS w0,
       |         CAST(SUM(CASE WHEN e.d > $BinHalf AND CAST(e.x AS DOUBLE) > st.mid
       |           THEN CAST(1 AS BIGINT) << (e.d - ${BinHalf + 1}) ELSE 0 END) AS BIGINT) AS w1
       |       FROM e JOIN st USING (d) GROUP BY 1, 2),
       |qwv AS (SELECT doc AS query_doc, vec_id AS q_vec, w0 AS qw0, w1 AS qw1
       |        FROM wv WHERE doc < $MaxSimQDocs),
       |hsc AS (SELECT q.query_doc, q.q_vec, c.vec_id, c.doc,
       |          CAST(bit_count(xor(c.w0, q.qw0))
       |             + bit_count(xor(c.w1, q.qw1)) AS BIGINT) AS hamming
       |        FROM wv c JOIN qwv q ON c.doc <> q.query_doc),
       |cand AS (SELECT DISTINCT query_doc, doc FROM (
       |    SELECT query_doc, doc,
       |      ROW_NUMBER() OVER (PARTITION BY q_vec
       |        ORDER BY hamming ASC, vec_id ASC) AS srn
       |    FROM hsc)
       |  WHERE srn <= $MaxSimShortlist),
       |vecs AS (SELECT vec_id // $MaxSimM AS doc, vec_id % $MaxSimM AS pos,
       |           embedding FROM embeddings),
       |q AS (SELECT doc AS query_doc, pos AS qpos, embedding FROM vecs
       |      WHERE doc < $MaxSimQDocs),
       |pairs AS (SELECT cd.query_doc, q.qpos, v.doc, round($cos, 6) AS c
       |          FROM cand cd
       |          JOIN vecs v ON v.doc = cd.doc
       |          JOIN q ON q.query_doc = cd.query_doc),
       |sc AS (SELECT query_doc, doc,
       |         round(MAX(CASE WHEN qpos = 0 THEN c END)
       |             + MAX(CASE WHEN qpos = 1 THEN c END)
       |             + MAX(CASE WHEN qpos = 2 THEN c END)
       |             + MAX(CASE WHEN qpos = 3 THEN c END), 6) AS score
       |       FROM pairs GROUP BY 1, 2)
       |SELECT query_doc, doc, score, rn FROM (
       |  SELECT query_doc, doc, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_doc
       |      ORDER BY score DESC, doc ASC) AS rn
       |  FROM sc)
       |WHERE rn <= $TopK
       |ORDER BY query_doc, rn""".stripMargin
  }

  val q129Sql: String = {
    val cos = sqlCosine("q.embedding", "v.embedding")
    s"""WITH vecs AS (SELECT vec_id // $MaxSimM AS doc, vec_id % $MaxSimM AS pos,
       |                embedding FROM embeddings),
       |q AS (SELECT doc AS query_doc, pos AS qpos, embedding FROM vecs
       |      WHERE doc < $MaxSimQDocs),
       |pairs AS (SELECT q.query_doc, q.qpos, v.doc, round($cos, 6) AS c
       |          FROM vecs v JOIN q ON v.doc <> q.query_doc),
       |sc AS (SELECT query_doc, doc,
       |         round(MAX(CASE WHEN qpos = 0 THEN c END)
       |             + MAX(CASE WHEN qpos = 1 THEN c END)
       |             + MAX(CASE WHEN qpos = 2 THEN c END)
       |             + MAX(CASE WHEN qpos = 3 THEN c END), 6) AS score
       |       FROM pairs GROUP BY 1, 2)
       |SELECT query_doc, doc, score, rn FROM (
       |  SELECT query_doc, doc, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_doc
       |      ORDER BY score DESC, doc ASC) AS rn
       |  FROM sc)
       |WHERE rn <= $TopK
       |ORDER BY query_doc, rn""".stripMargin
  }

  // ---- q133: mean-pooled document vectors (the single-vector dual) ----

  /** q133: MEAN-POOLING — collapse each multi-vector passage to one
    * vector (the elementwise mean of its [[MaxSimM]] members, the
    * sentence-transformers default) and rank by pooled cosine: the
    * single-vector baseline every late-interaction system (q129/q131)
    * is measured against, and the POOLING operator a corpus prep
    * pipeline runs before writing a one-vector-per-doc index.
    *
    * Engine-exactness: the pooled vector sums members in FIXED position
    * order (m0+m1)+m2)+m3 per dimension — both engines run the same
    * left-associated IEEE chain — and /4 is exact; ranking reuses q30's
    * rounded-cosine recipe. Incomplete trailing passages are excluded
    * (member count pinned = M) so the mean is well-defined.
    *
    * Scale: pooling is ONE aggregation (members → doc, fixed-width
    * state via max(CASE) per position), the pooled table is 1/M the
    * rows, and search is q30's broadcast/map-side shape on it. MaxSim
    * overlap vs this baseline is measured in MaxSimSpec, not assumed. */
  def q133MeanPool(s: SparkSession, dir: String): DataFrame =
    meanPoolCore(s, Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))

  private[graft] def pooledDocs(s: SparkSession, emb: DataFrame): DataFrame = {
    import s.implicits._
    def memb(i: Int): Column =
      max(when($"pos" === i, $"embedding")).as(s"e$i")
    val mean = transform($"e0", (x, i) =>
      (((x.cast("double") + element_at($"e1", i + 1).cast("double"))
        + element_at($"e2", i + 1).cast("double"))
        + element_at($"e3", i + 1).cast("double")) / lit(4.0))
    emb.select(expr(s"vec_id div $MaxSimM").as("doc"),
        ($"vec_id" % MaxSimM).as("pos"), $"embedding")
      .groupBy($"doc")
      .agg(memb(0), memb(1), memb(2), memb(3), count(lit(1)).as("nm"))
      .where($"nm" === MaxSimM) // incomplete trailing passage excluded
      .select($"doc", mean.as("pooled"))
  }

  private[graft] def meanPoolCore(s: SparkSession, emb: DataFrame): DataFrame = {
    import s.implicits._
    val docs = pooledDocs(s, emb).withColumn("n2", norm2($"pooled"))
    val qs = docs.where($"doc" < MaxSimQDocs)
      .select($"doc".as("query_doc"), $"pooled".as("qe"), $"n2".as("qn2"))
    val sim6 = round(cosinePre($"qe", $"pooled", $"qn2", $"n2"), 6)
    val w = Window.partitionBy($"query_doc").orderBy($"sim".desc, $"doc".asc)
    docs.join(broadcast(qs), $"doc" =!= $"query_doc")
      .select($"query_doc", $"doc", sim6.as("sim"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= TopK)
      .orderBy($"query_doc", $"rn")
  }

  val q133Sql: String = {
    val cos = sqlCosine("q.pooled", "c.pooled")
    s"""WITH e AS (SELECT vec_id // $MaxSimM AS doc, vec_id % $MaxSimM AS pos,
       |             unnest(embedding) AS x,
       |             unnest(generate_series(1, len(embedding))) AS d
       |           FROM embeddings),
       |dims AS (SELECT doc, d,
       |           (((MAX(CASE WHEN pos = 0 THEN CAST(x AS DOUBLE) END)
       |            + MAX(CASE WHEN pos = 1 THEN CAST(x AS DOUBLE) END))
       |            + MAX(CASE WHEN pos = 2 THEN CAST(x AS DOUBLE) END))
       |            + MAX(CASE WHEN pos = 3 THEN CAST(x AS DOUBLE) END)) / 4.0 AS m,
       |           COUNT(DISTINCT pos) AS nm
       |         FROM e GROUP BY 1, 2),
       |pool AS (SELECT doc, list(m ORDER BY d) AS pooled
       |         FROM dims WHERE nm = $MaxSimM GROUP BY doc),
       |q2 AS (SELECT doc AS query_doc, pooled FROM pool WHERE doc < $MaxSimQDocs)
       |SELECT query_doc, doc, sim, rn FROM (
       |  SELECT q.query_doc, c.doc, round($cos, 6) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.query_doc
       |      ORDER BY round($cos, 6) DESC, c.doc ASC) AS rn
       |  FROM pool c JOIN q2 q ON c.doc <> q.query_doc)
       |WHERE rn <= $TopK
       |ORDER BY query_doc, rn""".stripMargin
  }

  /** sortShared allowlist entry (OPTIMIZATION_r19.md): final-stage reuse
    * under the deterministic output sort, applied ONLY where a paired
    * 32-core A/B measured a win. */
  private def shared(fn: Q): Q = graft.operators.Materialize.sortSharedQuery(fn)

  val queries: Map[String, Q] = Map(
    "q133_meanpool_ann"     -> (q133MeanPool _),
    "q131_maxsim_pruned"    -> (q131MaxSimPruned _),
    "q130_bin_codes_ann"    -> (q130BinCodesAnn _),
    "q129_maxsim"           -> (q129MaxSim _),
    "q128_binary_ann"       -> (q128BinaryAnn _),
    "q123_refine_ann"       -> (q123RefineAnn _),
    "q121_pca_project"      -> (q121PcaProject _),
    "q120_filtered_ann"     -> (q120FilteredAnn _),
    "q156_filtered_ann_auto" -> (q156FilteredAnnAuto _),
    "q117_semdedup_learned" -> (q117SemDedupLearnedK _),
    "q110_semdedup"         -> (q110SemDedup _),
    "q102_hard_negatives"   -> (q102HardNegatives _),
    "q90_semantic_decontam" -> (q90SemanticDecontam _),
    "q30_knn_bruteforce"    -> shared(q30KnnBruteForce _),
    "q31_embedding_neardup" -> (q31EmbeddingNearDup _),
    "q32_ivf_ann"           -> shared(q32IvfAnn _),
    "q59_kmeans_assign"     -> shared(q59KmeansAssign _),
    "q95_sq8_ann"           -> (q95Sq8Ann _),
    "q111_pq_adc_ann"       -> (q111PqAdcAnn _),
    "q148_opq_ann"          -> (q148OpqAnn _),
    "q152_learned_opq"      -> (q152LearnedOpqAnn _),
    "q155_rot_codes_ann"    -> (q155RotCodesAnn _),
    "q118_pq_codes_ann"     -> (q118PqCodesAnn _),
  )

  val oracleSql: Map[String, String] = Map(
    "q133_meanpool_ann"     -> q133Sql,
    "q131_maxsim_pruned"    -> q131Sql,
    "q130_bin_codes_ann"    -> q128Sql, // identical ranking from stored words
    "q129_maxsim"           -> q129Sql,
    "q128_binary_ann"       -> q128Sql,
    "q123_refine_ann"       -> q123Sql,
    "q121_pca_project"      -> q121Sql,
    "q120_filtered_ann"     -> q120Sql,
    "q156_filtered_ann_auto" -> q120Sql, // strategy must be value-invisible
    "q117_semdedup_learned" -> q117Sql,
    "q110_semdedup"         -> q110Sql,
    "q102_hard_negatives"   -> q102Sql,
    "q90_semantic_decontam" -> q90Sql,
    "q30_knn_bruteforce"    -> q30Sql,
    "q31_embedding_neardup" -> q31Sql,
    "q32_ivf_ann"           -> q32Sql,
    "q59_kmeans_assign"     -> q59Sql,
    "q95_sq8_ann"           -> q95Sql,
    "q111_pq_adc_ann"       -> q111Sql,
    "q148_opq_ann"          -> q148Sql,
    "q152_learned_opq"      -> q152Sql,
    "q155_rot_codes_ann"    -> q155Sql,
    "q118_pq_codes_ann"     -> q111Sql, // identical ranking from stored codes
  )
}
