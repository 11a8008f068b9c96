package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.io.KvSink
import graft.operators.Multimodal

/** Operators whose raw output is not SQL-reproducible (PRNG samples,
  * compressed payloads, codec internals), surfaced through the
  * correctness gate as VERDICT queries: the output carries only
  * engine-portable columns plus Spark-computed booleans asserting the
  * operator's provable guarantee, and the oracle recomputes the portable
  * side and asserts every verdict TRUE (the q18 pattern). Value-level
  * codec semantics stay pinned by ScalaTests. */
object EtlQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q40 — X1/F2: seeded Bernoulli sample (the profile pipeline's
    * RAND() < rate at the scan, taar_profile_bigtable.py:90).
    *
    * Oracle-checked since round 6 (the q18/q43 verdict pattern): the
    * sampled row-set itself is engine-specific (PRNGs differ, and
    * Spark's per-partition gap sampler is partitioning-dependent), so
    * the output is the sample's STATISTICAL verdict instead — n_total
    * and the 6σ binomial CI bounds for rate 0.1 (both recomputable by
    * DuckDB from the same table; the bound arithmetic is IEEE-identical
    * across engines — correctly-rounded sqrt and floor/ceil of doubles),
    * plus Spark-computed booleans: the sample size lands inside the CI
    * (P(violation) ≈ 2·10⁻⁹ for a correct Bernoulli sampler) and every
    * sampled row is a real table row (anti-join audit). The oracle
    * recomputes the counts/bounds and asserts the verdicts TRUE. */
  def q40BernoulliSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val samp = ev.sample(withReplacement = false, 0.1, seed = 42L)
      .select($"event_id")
    val audited = ev.agg(count(lit(1)).as("n_total"))
      .crossJoin(samp.agg(count(lit(1)).as("n_sampled")))
      .crossJoin(samp.join(ev.select($"event_id"), Seq("event_id"), "left_anti")
        .agg(count(lit(1)).as("n_stray")))
      .select($"n_total", $"n_sampled", $"n_stray",
        floor(lit(0.1) * $"n_total" - lit(6.0) * sqrt(lit(0.09) * $"n_total"))
          .cast("long").as("ci_lo"),
        ceil(lit(0.1) * $"n_total" + lit(6.0) * sqrt(lit(0.09) * $"n_total"))
          .cast("long").as("ci_hi"))
    audited.select($"n_total", $"ci_lo", $"ci_hi",
      ($"n_sampled" >= $"ci_lo" && $"n_sampled" <= $"ci_hi").as("ci_ok"),
      ($"n_stray" === 0L).as("subset_ok"))
  }

  val q40Sql: String =
    """WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM events)
      |SELECT n_total,
      |       CAST(floor(0.1e0 * n_total - 6e0 * sqrt(0.09e0 * n_total)) AS BIGINT) AS ci_lo,
      |       CAST(ceil(0.1e0 * n_total + 6e0 * sqrt(0.09e0 * n_total)) AS BIGINT) AS ci_hi,
      |       TRUE AS ci_ok, TRUE AS subset_ok
      |FROM t""".stripMargin

  /** q41 — K4/P5/P6: the KV-store projection (sha256 key + zlib(JSON)
    * payload) over the customer table, verified as a FULL ROUNDTRIP:
    * encode (sha2 key + to_json + zlib) then decode (inflate + from_json)
    * back to typed columns. DuckDB can't run zlib, but it CAN check the
    * composition — sha256 parity on the key plus every column value
    * surviving compress→decompress→parse — which pins the payload
    * byte-stream as a faithful JSON encoding without comparing
    * engine-specific compressed bytes or JSON text formatting (double
    * roundtrip is exact: Jackson emits round-trip-precise literals). */
  def q41KvEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val cust = Tables.customer(s, dir)
    val kv = KvSink.toKv(s, cust, "c_custkey")
    // the payload stores the HASHED id (pseudonymization invariant)
    val schema = StructType(cust.schema.fields.map {
      case f if f.name == "c_custkey" => StructField("c_custkey", StringType)
      case f => f
    })
    KvSink.decodePayload(s, kv)
      .select($"key", from_json($"json", schema).as("r"))
      .select(col("key") +: schema.fieldNames.toSeq.map(n => col(s"r.$n").as(n)): _*)
      .orderBy($"key")
  }

  val q41Sql: String =
    """SELECT sha256(CAST(c_custkey AS VARCHAR)) AS key,
      |       sha256(CAST(c_custkey AS VARCHAR)) AS c_custkey,
      |       c_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer ORDER BY key""".stripMargin

  /** q42 — multimodal: binary payload + metadata + partition-wise
    * type-dispatched decode (REAL JDK codecs for image/audio; the
    * synthetic corpus is text so these rows take the text branch —
    * MultimodalSpec exercises the image/audio branches on generated
    * PNG/WAV bytes).
    *
    * Oracle-checked since round 6 (the q18/q43 verdict pattern): the
    * output carries only DuckDB-recomputable columns — payload byte
    * length, the hex magic-number prefix of the payload, a type tag
    * derived from that magic, declared char length — plus verdict
    * booleans computed Spark-side from the REAL decode (kind dispatch
    * agreed with metadata; decode did not degrade to corrupt; the
    * decoder's n_bytes equals the payload's true byte length). The
    * oracle recomputes the byte/magic columns from the same table and
    * asserts every verdict TRUE. Codec-only fields (image dims, sample
    * rate) stay spec-pinned in MultimodalSpec, which drives them on
    * real PNG/WAV bytes. */
  def q42MultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val feats = Multimodal.mediaFeatures(s, docs)
    val media = Multimodal.toMediaTable(docs)
      .select($"media_id", $"payload", $"meta.declared_len".as("n_chars"))
    media.join(feats, Seq("media_id"))
      .select($"media_id",
        length($"payload").cast("long").as("payload_bytes"),
        substring(hex($"payload"), 1, 8).as("magic_hex"),
        when(substring(hex($"payload"), 1, 8) === "89504E47", "image/png")
          .when(substring(hex($"payload"), 1, 8) === "52494646", "riff")
          .otherwise("untyped").as("magic_kind"),
        $"n_chars",
        ($"kind" === "text").as("kind_ok"),
        ($"format" =!= "corrupt").as("decode_ok"),
        ($"n_bytes" === length($"payload").cast("long")).as("len_ok"))
      .orderBy($"media_id")
  }

  val q42Sql: String =
    """SELECT doc_id AS media_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
      |       substring(hex(encode(text)), 1, 8) AS magic_hex,
      |       CASE WHEN substring(hex(encode(text)), 1, 8) = '89504E47' THEN 'image/png'
      |            WHEN substring(hex(encode(text)), 1, 8) = '52494646' THEN 'riff'
      |            ELSE 'untyped' END AS magic_kind,
      |       n_chars,
      |       TRUE AS kind_ok, TRUE AS decode_ok, TRUE AS len_ok
      |FROM documents ORDER BY media_id""".stripMargin

  /** q43 — heavy-hitter tokens via the mergeable Misra–Gries sketch
    * (typed Aggregator): constant memory per group, partial-agg
    * friendly, and — since round 6 — carrying the merge-proof bound of
    * Agarwal et al. ("Mergeable Summaries", PODS 2012): under ANY merge
    * tree, est ≤ true ≤ est + dec with dec ≤ N/(capacity+1), so every
    * token with true count > N/capacity (capacity = 64 here, and
    * N/64 > N/65) must be in the sketch. The oracle checks that
    * guarantee against its exact dual: Spark computes both the sketch
    * and the exact counts and emits the per-token verdict; the oracle
    * computes the exact side and asserts the verdict is uniformly true —
    * a hash match is a checked bound, not a rows>0 smoke test.
    * (Production runs the sketch WITHOUT the exact dual — that is its
    * point; this is the verification query.) */
  def q43HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("w"))
    val sketch = words.as[String]
      .select(new graft.functions.SpaceSaving(64).toColumn).toDF("hh")
      .select(explode($"hh").as("e"))
      .select($"e._1".as("token"), $"e._2".as("est"), $"e._3".as("err"))
    // checkpointed vocab-sized counts: `total` and the probe filter both
    // read it, so the audit costs ONE corpus pass (plan-branch reuse does
    // not dedupe the explode pipeline — measured 3 scans without this)
    val exact = words.groupBy($"w").agg(count(lit(1)).as("exact_cnt"))
      .localCheckpoint()
    val total = exact.agg(sum($"exact_cnt").as("total"))
    exact.crossJoin(broadcast(total))
      .where($"exact_cnt" * 64 > $"total")
      .join(broadcast(sketch), $"w" === $"token", "left")
      .select($"w".as("token"), $"exact_cnt",
        $"token".isNotNull.as("in_sketch"),
        ($"token".isNotNull && $"est" <= $"exact_cnt" &&
          ($"est" + $"err") >= $"exact_cnt").as("bound_ok"))
      .orderBy($"w")
  }

  val q43Sql: String =
    """WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |wc AS (SELECT w, COUNT(*) AS exact_cnt FROM words GROUP BY w),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM words)
      |SELECT w AS token, exact_cnt, TRUE AS in_sketch, TRUE AS bound_ok
      |FROM wc, tot WHERE exact_cnt * 64 > total
      |ORDER BY token""".stripMargin

  // ---- q87: Count-Min point-frequency sketch ----

  val CmsDepth = 4
  val CmsWidth = 256

  /** q87: Count-Min frequency estimates for the heavy-hitter probe set —
    * the point-frequency member of the sketch family (q18 HLL
    * cardinality, q43 Misra–Gries heavy hitters). The sketch is built by
    * the [[graft.functions.CountMin]] typed Aggregator whose merge is
    * LOSSLESS (elementwise counter add — bit-identical under any
    * partitioning, CountMinSpec), and its md5-chunk hashing is the
    * repo's portable convention, so unlike q43 the estimates themselves
    * are exactly recomputable by DuckDB: this is a VALUE-level oracle
    * row for a sketch, not a verdict-level one. `within_3eps` uses pure
    * integer arithmetic ((est−true)·width ≤ 3·n) — no float anywhere.
    *
    * Scale: the corpus reduces to one 8·(depth·width+1)-byte sketch via
    * partial aggregation (items never shuffle); the exact side exists
    * only to audit the probe set and is the same one shuffle q43 pays. */
  def q87CmsFrequency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("w"))
    // the case-class output flattens to top-level (counts, n) columns
    val sketch = words.as[String]
      .select(new graft.functions.CountMin(CmsDepth, CmsWidth).toColumn)
      .toDF("counts", "n")
    // checkpointed vocab-sized counts: `total` and the probe filter both
    // read it, so the audit costs ONE corpus pass (plan-branch reuse does
    // not dedupe the explode pipeline — measured 3 scans without this)
    val exact = words.groupBy($"w").agg(count(lit(1)).as("exact_cnt"))
      .localCheckpoint()
    val total = exact.agg(sum($"exact_cnt").as("total"))
    val est = (0 until CmsDepth).map { d =>
      element_at($"counts",
        (lit(d * CmsWidth) +
          conv(substring(md5($"w".cast("binary")), 8 * d + 1, 8), 16, 10)
            .cast("long") % CmsWidth).cast("int") + 1)
    }.reduce(least(_, _))
    exact.crossJoin(broadcast(total))
      .where($"exact_cnt" * 64 > $"total")
      .crossJoin(broadcast(sketch))
      .select($"w".as("token"), $"exact_cnt", est.as("est"),
        (est - $"exact_cnt").as("overcount"), $"n",
        ((est - $"exact_cnt") * CmsWidth <= $"n" * 3).as("within_3eps"))
      .orderBy($"token")
  }

  val q87Sql: String = {
    def chunk(expr: String, d: Int): String =
      (1 to 8).map { k =>
        val w = math.pow(16, 8 - k).toLong
        s"(CAST(strpos('0123456789abcdef', substr(md5($expr), ${8 * d + k}, 1)) AS BIGINT) - 1) * ${w}"
      }.mkString("(", " + ", ")")
    val bds = (0 until CmsDepth).map { d =>
      s"b$d AS (SELECT ${chunk("w", d)} % $CmsWidth AS b, CAST(COUNT(*) AS BIGINT) AS c FROM words GROUP BY 1)"
    }.mkString(",\n")
    val joins = (0 until CmsDepth).map { d =>
      s"JOIN b$d c$d ON c$d.b = ${chunk("p.w", d)} % $CmsWidth"
    }.mkString("\n")
    val est = s"LEAST(${(0 until CmsDepth).map(d => s"c$d.c").mkString(", ")})"
    s"""WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM words),
       |probes AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM words GROUP BY w),
       |$bds
       |SELECT p.w AS token, p.exact_cnt, $est AS est,
       |  $est - p.exact_cnt AS overcount, tot.total AS n,
       |  ($est - p.exact_cnt) * $CmsWidth <= tot.total * 3 AS within_3eps
       |FROM probes p CROSS JOIN tot
       |$joins
       |WHERE p.exact_cnt * 64 > tot.total
       |ORDER BY token""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q40_bernoulli_sample"    -> (q40BernoulliSample _),
    "q41_kv_encode"           -> (q41KvEncode _),
    "q42_multimodal_features" -> (q42MultimodalFeatures _),
    "q43_heavy_hitters"       -> (q43HeavyHitters _),
    "q87_cms_frequency"       -> (q87CmsFrequency _),
  )

  /** All four oracle-checked: q41/q43 since round 5, q40/q42 since
    * round 6 (verdict-style bounds) — zero rows-only entries left. */
  val oracleSql: Map[String, String] = Map(
    "q40_bernoulli_sample"    -> q40Sql,
    "q41_kv_encode"           -> q41Sql,
    "q42_multimodal_features" -> q42Sql,
    "q43_heavy_hitters"       -> q43Sql,
    "q87_cms_frequency"       -> q87Sql,
  )
}
