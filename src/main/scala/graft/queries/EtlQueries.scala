package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.io.KvSink
import graft.operators.Multimodal

/** Non-SQL-expressible operators surfaced through the correctness gate as
  * rows-only checks (no oracleSql entry → the driver records a weaker
  * rows>0 check; value-level semantics are pinned by ScalaTests instead). */
object EtlQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q40 — X1/F2: seeded Bernoulli sample (the profile pipeline's
    * RAND() < rate at the scan, taar_profile_bigtable.py:90). Seeded for
    * run-to-run determinism; not oracle-matchable because DuckDB's PRNG
    * differs. */
  def q40BernoulliSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .sample(withReplacement = false, 0.1, seed = 42L)
      .select($"event_id", $"user_id", $"event_type")
      .orderBy($"event_id")
  }

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
    * PNG/WAV bytes). */
  def q42MultimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFeatures(s, Tables.documents(s, dir))
      .orderBy(col("media_id"))

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
    val exact = words.groupBy($"w").agg(count(lit(1)).as("exact_cnt"))
    val total = words.agg(count(lit(1)).as("total"))
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

  val queries: Map[String, Q] = Map(
    "q40_bernoulli_sample"    -> (q40BernoulliSample _),
    "q41_kv_encode"           -> (q41KvEncode _),
    "q42_multimodal_features" -> (q42MultimodalFeatures _),
    "q43_heavy_hitters"       -> (q43HeavyHitters _),
  )

  /** q40/q42 stay rows-only (PRNG / codec internals are engine-specific);
    * q41 and q43 are oracle-checked as of round 5. */
  val oracleSql: Map[String, String] = Map(
    "q41_kv_encode"     -> q41Sql,
    "q43_heavy_hitters" -> q43Sql,
  )
}
