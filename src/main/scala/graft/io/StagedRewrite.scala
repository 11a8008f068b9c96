package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** Crash-safe in-place rewrite of a bucketed managed table — the commit
  * discipline behind document deletion and bucket compaction on the
  * derived-state tables (VERDICT r14 items 1 and 2). The protocol is
  * [[graft.jobs.GraphIngest]]'s stage → swap → clear, factored out so
  * every state family shares ONE mechanism instead of re-deriving the
  * crash-window analysis per table:
  *
  *  1. stage the complete rewritten table to `<t>__rnext` (reads the
  *     live table; nothing is mutated, so a crash here just leaves an
  *     orphan that the next rewrite drops);
  *  2. write the 1-row marker `<t>__rpending` — its presence certifies
  *     "staging is COMPLETE; `__rnext` is the authoritative state";
  *  3. drop the live table, rename `__rnext` into place, drop the
  *     marker.
  *
  * [[heal]] (run automatically before every rewrite, and safe to call
  * any time) closes each window: marker present ⇒ `__rnext` is complete
  * by contract, so the swap just finishes (drop the live table if the
  * crash left it, rename, clear); marker absent ⇒ any `__rnext` is a
  * partial stage and is dropped. Readers are never exposed to a partial
  * table: the live table exists untouched until the marker certifies
  * its replacement.
  *
  * At 100 TB a rewrite is one bucketed scan + one bucket-aligned write —
  * no shuffle: the staged frame is repartitioned by the bucket key into
  * exactly `buckets` partitions using the SAME murmur3 hash the bucket
  * spec uses, so each task holds one bucket and writes ONE file, which
  * is also what makes the rewrite a file-count compaction. */
object StagedRewrite {

  def stagingTable(table: String): String = s"${table}__rnext"
  def markerTable(table: String): String = s"${table}__rpending"

  /** Complete (marker present) or abandon (marker absent) a parked
    * rewrite of `table`. Idempotent. */
  def heal(s: SparkSession, table: String): Unit = {
    val next = stagingTable(table)
    val mark = markerTable(table)
    if (s.catalog.tableExists(mark)) {
      // staging was certified complete — finish the swap
      if (s.catalog.tableExists(next)) {
        Bucketing.dropManaged(s, table)
        s.sql(s"ALTER TABLE $next RENAME TO $table")
      }
      Bucketing.dropManaged(s, mark)
    } else if (s.catalog.tableExists(next)) {
      // un-certified staging: a crash mid-stage — abandon it
      Bucketing.dropManaged(s, next)
    }
  }

  /** Drop `table` AND any rewrite residue (staging + marker). Every
    * full rebuild/drop of a rewritable table must go through this: a
    * stale certified staging pair surviving a re-ingest would make a
    * LATER rewrite's heal swap pre-rebuild data over the fresh table. */
  def dropAll(s: SparkSession, table: String): Unit = {
    Bucketing.dropManaged(s, table)
    Bucketing.dropManaged(s, stagingTable(table))
    Bucketing.dropManaged(s, markerTable(table))
  }

  /** Rewrite `table` in place as `transform(liveRows)`, bucket-aligned
    * on (`key`, `buckets`) with one file per bucket, under the staged
    * commit above. `transform` must be a pure frame expression over its
    * input (it runs inside the staging write, while the live table is
    * still intact). */
  def rewrite(s: SparkSession, table: String, key: String, buckets: Int)(
      transform: DataFrame => DataFrame): Unit =
    rewriteUntil(s, table, key, buckets, stopAfter = "done")(transform)

  /** Failpoint-instrumented [[rewrite]] — `stopAfter` simulates a crash
    * after the named step ("stage" | "marker" | "drop"); production
    * passes "done". Exists so specs can drive REAL crash windows through
    * the REAL code path and pin that [[heal]] closes each one. */
  private[graft] def rewriteUntil(s: SparkSession, table: String, key: String,
      buckets: Int, stopAfter: String)(transform: DataFrame => DataFrame): Unit = {
    // heal FIRST: a crash in a prior rewrite's swap window legitimately
    // leaves the live table missing with the certified staging parked
    heal(s, table)
    require(s.catalog.tableExists(table), s"rewrite needs an existing table: $table")
    val next = stagingTable(table)
    val mark = markerTable(table)
    Bucketing.dropManaged(s, next)
    // cluster by the EXPLICIT bucket-id expression, not the raw key: the
    // source scan advertises HashPartitioning(key, buckets) from its own
    // bucket spec, so a repartition on the key is elided as redundant —
    // while the planner may simultaneously DISABLE the bucketed scan
    // (no downstream operator requires it), leaving the write with
    // file-packed mixed-bucket partitions (observed: a 100-row rewrite
    // landing 13 files). pmod(hash(key), buckets) is the writer's own
    // bucket-id function but a different EXPRESSION, so the exchange
    // survives and each bucket lands whole in one task → one file per
    // bucket (buckets are sized 128-512 MB at scale, per Bucketing's
    // contract, so whole-bucket files are the right compaction unit).
    Bucketing.writeBucketed(
      transform(s.table(table))
        .repartition(buckets, pmod(hash(col(key)), lit(buckets))),
      next, key, buckets)
    if (stopAfter == "stage") return
    Bucketing.dropManaged(s, mark)
    s.range(1).write.mode("overwrite").format("parquet").saveAsTable(mark)
    if (stopAfter == "marker") return
    Bucketing.dropManaged(s, table)
    if (stopAfter == "drop") return
    s.sql(s"ALTER TABLE $next RENAME TO $table")
    Bucketing.dropManaged(s, mark)
  }
}
