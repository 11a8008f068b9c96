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

  /** Drop a managed table AND its warehouse directory. DROP alone only
    * clears the CURRENT metastore; a directory left by a previous JVM
    * (fresh derby catalog, persistent warehouse dir) still fails the
    * next CTAS with LOCATION_ALREADY_EXISTS — the CodesIngest finding,
    * now shared by every ingest job instead of re-remembered per site
    * (round-13 review). */
  def dropManaged(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
  }

  /** Per-corpus table-name prefix: a sanitized dir (readable) + an md5
    * suffix (INJECTIVE — sanitization alone collapses "sf0.1" and
    * "sf0_1", and two corpora silently sharing a table would serve each
    * other's data; round-13 review finding). One definition for all
    * ingest jobs. NOTE for operators: changing this convention renames
    * every persisted table — tables written under an older convention
    * are orphaned (never dropped by the new names) and must be cleaned
    * from the warehouse on upgrade. */
  def corpusPrefix(kind: String, dir: String): String =
    kind + "_" + dir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("^_+", "") +
      "_" + org.apache.commons.codec.digest.DigestUtils.md5Hex(dir).take(8)
}
