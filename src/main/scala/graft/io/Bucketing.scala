package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle fact tables ONCE at write time so
  * every subsequent equi-join/aggregation on the bucket key runs with no
  * exchange (SURVEY.md §2 "Partitioning & shuffle": co-located joins via
  * bucketing).
  *
  * At 100 TB this is the difference between shuffling the fact table per
  * query and shuffling it once per ingest: a nightly-loaded lineitem
  * bucketed by orderkey joins orders bucket-to-bucket on every downstream
  * query. Bucket counts should be sized so a bucket fits an executor
  * core's working set (~128-512 MB of rows).
  */
object Bucketing {

  private def save(df: DataFrame, table: String, key: String, buckets: Int,
      mode: String): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Write `df` as a bucketed (and sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    save(df, table, key, buckets, "overwrite")

  /** Append to an existing bucketed table — the incremental-ingest path.
    * The bucket spec must match the original write (Spark enforces it),
    * so appended rows land in the right buckets and co-located joins
    * stay exchange-free across increments. */
  def appendBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    save(df, table, key, buckets, "append")

  /** Join two same-bucketed tables on their bucket key — planner emits a
    * SortMergeJoin with NO shuffle on either side. */
  def cotableJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
