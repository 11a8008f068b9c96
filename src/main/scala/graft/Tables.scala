package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file per scale factor. At cluster scale
  * these would be partitioned directories; the API takes a directory so the
  * same code serves both layouts (`spark.read.parquet` handles globs and
  * partitioned layouts transparently).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.ts has shipped in two physical parquet shapes:
    *   - TIMESTAMP(NANOS): Spark has no native nanosecond timestamp, so we
    *     read it as a long (legacy conf) and floor-divide to microseconds —
    *     the same truncation DuckDB applies when it coerces ns → its µs
    *     TIMESTAMP, so oracle values agree exactly.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads TIMESTAMP_NTZ;
    *     the session time zone is pinned UTC everywhere (Bench/Verify/specs),
    *     so casting to the session-zoned TimestampType preserves wall-clock
    *     values and matches DuckDB's naive-µs read of the same file.
    * Downstream consumers always see a plain TimestampType `ts`. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "events"))
  }

  /** The ONE place the ts physical-shape dispatch lives — batch
    * ([[events]]) and streaming (`EventStream.readEvents`) both call it,
    * so the next driver shape change is a one-match-arm fix (round 9's
    * breakage was this logic duplicated and updated in one place only). */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
