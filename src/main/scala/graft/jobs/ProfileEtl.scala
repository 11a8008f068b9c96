package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.KvSink

/** Q1 — taar_profile_bigtable: the five-stage profile pipeline
  * (taar_profile_bigtable.py:527-546), re-expressed as three Spark stages
  * (the BQ→Avro→Bigtable hops collapse — no interchange format needed
  * between stages of one engine):
  *
  *  1. extract: projection+rename (P1), SAFE_CAST arithmetic (P2),
  *     non-empty addons filter (F1), Bernoulli sample (F2/X1), partition
  *     date filter (F3) — the CTAS SELECT of taar_profile_bigtable.py:70-93.
  *  2. loadKv: sha256 row key + zlib(JSON) payload → KV table (K4).
  *  3. deleteOptOuts: distinct opt-out ids over a trailing window (A2/F4)
  *     anti-joined against the KV table (K5/J3).
  *
  * Scale: stage 1 is scan+filter+project (pushdown: the date predicate
  * prunes partitions, the sample is evaluated at the scan); stage 2 is
  * map-only codegen; stage 3 broadcasts the (small) opt-out key set.
  */
object ProfileEtl {

  /** Stage 1 — the CTAS projection (taar_profile_bigtable.py:76-93).
    * Input columns mirror telemetry.clients_last_seen; `sampleRate` and
    * `date` are job params (`--sample-rate`, `--date`). `seed` pins the
    * Bernoulli sample for reproducible tests (the reference's RAND() is
    * unseeded). */
  def extract(clients: DataFrame, date: String, sampleRate: Double,
      seed: Long = 42L): DataFrame =
    clients
      .where(to_date(col("submission_date")) === lit(date).cast("date"))
      .where(size(col("active_addons")) > 0)
      .sample(withReplacement = false, sampleRate, seed)
      .select(
        col("client_id"),
        col("city").as("geo_city"),
        // int(x or 0) in the reference (taar_profile_bigtable.py:312-320):
        // null → 0 and float → truncated int, so the payload field is
        // always present and integer-typed.
        coalesce(expr("try_cast(subsession_hours_sum * 3600 AS bigint)"), lit(0L))
          .as("subsession_length"),
        col("locale"),
        col("os"),
        col("active_addons"),
        coalesce(col("places_bookmarks_count_mean").cast("bigint"), lit(0L))
          .as("bookmark_count"),
        coalesce(col("scalar_parent_browser_engagement_tab_open_event_count_sum")
          .cast("bigint"), lit(0L)).as("tab_open_count"),
        coalesce(col("scalar_parent_browser_engagement_total_uri_count_sum")
          .cast("bigint"), lit(0L)).as("total_uri"),
        coalesce(col("scalar_parent_browser_engagement_unique_domains_count_mean")
          .cast("bigint"), lit(0L)).as("unique_tlds"))

  /** Stage 2 — KV load (K4): key sha256(client_id), payload zlib(JSON). */
  def loadKv(spark: SparkSession, profiles: DataFrame, kvPath: String): Unit =
    KvSink.write(spark, profiles, "client_id", kvPath)

  /** Optional Avro interchange hop — the reference's staged form (BQ →
    * Avro files → Beam load, `taar_profile_bigtable.py:112-132,181-184`).
    * In a single-engine pipeline stages share the DataFrame and the hop
    * collapses, but pipelines whose loader runs elsewhere keep the
    * staged spelling: `exportAvro` writes the part files (K3),
    * `readAvro` streams them back (S6). AvroIoSpec pins
    * export→read→loadKv ≡ direct loadKv on the KV table bytes. */
  def exportAvro(profiles: DataFrame, dir: String): Unit =
    graft.io.AvroIo.write(profiles, dir)

  def readAvro(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    graft.io.AvroIo.read(spark, dir, schema)

  /** Stage 3 — opt-out delete (K5): distinct client ids whose deletion
    * request falls in the trailing `days` window ending at `date`. */
  def deleteOptOuts(spark: SparkSession, kvPath: String, deletions: DataFrame,
      date: String, days: Int = 28): Unit = {
    val d = lit(date).cast("date")
    val optOuts = deletions
      .where(to_date(col("submission_timestamp")).between(date_sub(d, days), d))
      .select(col("client_id")).distinct()
    KvSink.deleteOptOuts(spark, kvPath, optOuts, "client_id")
  }
}
