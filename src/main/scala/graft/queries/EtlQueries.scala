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
    * payload) over the customer table; zlib has no DuckDB counterpart. */
  def q41KvEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val kv = KvSink.toKv(s, Tables.customer(s, dir), "c_custkey")
    kv.select($"key", length($"payload").as("payload_len")).orderBy($"key")
  }

  /** q42 — multimodal: binary payload + metadata + partition-wise
    * type-dispatched decode (REAL JDK codecs for image/audio; the
    * synthetic corpus is text so these rows take the text branch —
    * MultimodalSpec exercises the image/audio branches on generated
    * PNG/WAV bytes). */
  def q42MultimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFeatures(s, Tables.documents(s, dir))
      .orderBy(col("media_id"))

  /** q43 — Space-Saving heavy-hitter tokens (typed Aggregator sketch):
    * constant memory per group, partial-agg friendly; estimates carry
    * their error bound. Rows-only (sketch internals are engine-specific);
    * the exactness/overestimate contracts are pinned in SketchSpec. */
  def q43HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("w")).as[String]
    words.select(new graft.functions.SpaceSaving(16).toColumn).toDF("hh")
      .select(explode($"hh").as("e"))
      .select($"e._1".as("token"), $"e._2".as("est_count"), $"e._3".as("max_error"))
  }

  val queries: Map[String, Q] = Map(
    "q40_bernoulli_sample"    -> (q40BernoulliSample _),
    "q41_kv_encode"           -> (q41KvEncode _),
    "q42_multimodal_features" -> (q42MultimodalFeatures _),
    "q43_heavy_hitters"       -> (q43HeavyHitters _),
  )

  /** Intentionally empty: these are the rows-only checks. */
  val oracleSql: Map[String, String] = Map.empty
}
