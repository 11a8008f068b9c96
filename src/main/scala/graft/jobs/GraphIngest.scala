package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Bucketing
import graft.operators.Materialize
import graft.queries.GraphQueries

/** Graph-state-at-ingest (VERDICT r12 item 1): persist the graph
  * family's shared derived state to storage, mirroring
  * [[CodesIngest]] (the ANN materialize-at-ingest precedent), so the
  * state survives the process instead of living only in the
  * per-session [[graft.operators.FrameMemo]].
  *
  * Two tables per corpus dir:
  *  - `<prefix>_edges` — the mirrored WEIGHTED co-purchase edge list
  *    (u, v, w) BUCKETED by `u` ([[graft.io.Bucketing]]): the canonical
  *    layout every iterative graph query wants (stationary edge side of
  *    each round's join already distributed on the join key). All ten
  *    graph queries derive their edge views from this frame.
  *  - `<prefix>_lpahist` — q146's REQUIRED persisted state: yesterday's
  *    per-round LPA label history over the OLD graph (round, v, lab),
  *    bucketed by `v` — node-sized × [[GraphQueries.LpaRounds]] rows.
  *
  * The session memos in [[GraphQueries]] become read-through caches
  * over these tables: a fresh process with the tables present pays one
  * bucket-file read instead of the basket→pair materialization plus a
  * full old-graph LPA run (rebuild-if-absent preserved — the tables are
  * derived and deterministic, so compute and read paths yield identical
  * frames; GraphIngestSpec pins both equality and the zero-edge-
  * re-materialization warm path).
  *
  * At 100 TB ingest is one basket→pair pass per load (the same pass any
  * single graph query would pay) plus [[GraphQueries.LpaRounds]]
  * node-sized label rounds; bucketing by u/v co-locates the tables with
  * any node-keyed per-entity table for exchange-free joins. */
object GraphIngest {

  val Buckets = 8

  /** Stable per-corpus table prefix (managed tables live in the session
    * warehouse; one corpus dir = one table pair, reused per run). The
    * sanitized dir keeps names readable; the md5 suffix makes the map
    * INJECTIVE — sanitization alone collapses "sf0.1" and "sf0_1" to
    * one name, and two corpora silently sharing a table pair would
    * serve each other's graph data (review finding r13). */
  def tablePrefix(dir: String): String =
    "graph_" + dir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("^_+", "") +
      "_" + org.apache.commons.codec.digest.DigestUtils.md5Hex(dir).take(8)

  def edgesTable(dir: String): String = s"${tablePrefix(dir)}_edges"
  def histTable(dir: String): String = s"${tablePrefix(dir)}_lpahist"

  /** Ingest the graph state of `dir`; returns (edgesTable, histTable).
    * Idempotent — a pair already in this session's catalog is reused
    * (same dir ⇒ same derived tables; the [[CodesIngest.ingestFrame]]
    * rationale: concurrent rebuilds would race DROP+CTAS against other
    * readers, and reuse is the production read path). */
  def ingest(s: SparkSession, dir: String): (String, String) =
    GraphIngest.synchronized {
      val (edgesT, histT) = (edgesTable(dir), histTable(dir))
      if (s.catalog.tableExists(edgesT) && s.catalog.tableExists(histT))
        (edgesT, histT)
      else buildTables(s, dir, edgesT, histT)
    }

  private def buildTables(s: SparkSession, dir: String,
      edgesT: String, histT: String): (String, String) = {
    import s.implicits._
    // build through the session memos, so the ingest writer and any
    // queries already run this session share one materialization
    val edges = GraphQueries.weightedEdgesPartitioned(s, dir)
    val hist = GraphQueries.lpaHistoryForIngest(s, dir)
    ingestTables(s, edges.select($"u", $"v", $"w"), hist, edgesT, histT)
    (edgesT, histT)
  }

  /** Write an arbitrary (mirrored weighted edge frame, per-round label
    * history) pair as the bucketed state tables — the writer shared by
    * [[ingest]] (dir-derived frames) and [[advanceState]] (rolled-
    * forward frames); GraphIngestSpec drives it directly with a
    * synthetic old/batch split. Both inputs must be MATERIALIZED
    * (checkpointed) before this runs: it DROPs the very tables a
    * table-read-through frame would lazily scan (the round-13 review
    * finding's hazard class). */
  private[graft] def ingestTables(s: SparkSession, edges: DataFrame,
      hist: Vector[DataFrame], edgesT: String, histT: String): Unit = {
    import s.implicits._
    // DROP only clears the CURRENT metastore; a managed-table directory
    // left by a previous JVM still fails CTAS with
    // LOCATION_ALREADY_EXISTS (the CodesIngest finding). Clear both.
    Seq(edgesT, histT).foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), t.toLowerCase)
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    }
    Bucketing.writeBucketed(edges, edgesT, "u", Buckets)
    val histUnion = hist.zipWithIndex
      .map { case (df, i) => df.select(lit(i + 1).as("round"), $"v", $"lab") }
      .reduce(_ unionByName _)
    Bucketing.writeBucketed(histUnion, histT, "v", Buckets)
  }

  /** Advance the persisted graph state of `prefix` by ONE day's edge
    * batch — the daily-ingest contract q146 documents, made durable:
    *
    *  1. the mirrored weighted batch rows APPEND bucket-aligned into the
    *     edges table (delta rows; the read path aggregates Σw per (u, v),
    *     which rides the bucketing exchange-free — HashPartitioning(u)
    *     satisfies the (u, v) clustering);
    *  2. the label history rolls forward via
    *     [[GraphQueries.lpaAdvance]] — churn-neighborhood-sized work per
    *     round against yesterday's stored rounds, NEVER a full-graph
    *     re-run — and the patched rounds overwrite the history table,
    *     becoming the next day's baseline. advance ≡ from-scratch
    *     rebuild is hash-pinned per round in GraphIngestSpec.
    *
    * `batch` must be the MIRRORED weighted (u, v, w) delta (both
    * orientations), delivered exactly once — edge rows carry no unique
    * key, so replay idempotency is the caller's contract (unlike
    * [[CodesIngest.appendBatch]]'s vec_id anti-join). The patched rounds
    * are eagerly materialized BEFORE the history table is rewritten —
    * they derive from the table being dropped. Session memos keyed to a
    * DIR whose tables this advanced are stale afterwards; pair with
    * [[GraphQueries.clearMemos]] (the spec prefix path has no memo). */
  def advanceState(s: SparkSession, prefix: String, batch: DataFrame): Unit =
    GraphIngest.synchronized {
      import s.implicits._
      val (edgesT, histT) = (s"${prefix}_edges", s"${prefix}_lpahist")
      require(s.catalog.tableExists(edgesT) && s.catalog.tableExists(histT),
        s"advanceState needs ingested base tables: $edgesT, $histT")
      val batchC = batch.select($"u", $"v", $"w").localCheckpoint(false)
      // the new full graph, duplicate (u, v) delta rows merged — LPA
      // votes count edge ROWS, so the frame must be pair-distinct
      val full = Materialize.checkpointPartitioned(
        s.table(edgesT).select($"u", $"v", $"w").unionByName(batchC)
          .groupBy($"u", $"v").agg(sum($"w").as("w"))
          .repartition($"u"))
      val hist = (1 to GraphQueries.LpaRounds).map(k =>
        s.table(histT).where($"round" === k)
          .select($"v", $"lab").localCheckpoint(true)).toVector
      val e0 = batchC.select($"u".as("v")).distinct()
      val (patched, _) = GraphQueries.lpaAdvance(full.select($"u", $"v"), e0, hist)
      // force the roll-forward into blocks before the rewrite drops its
      // lineage source (eager: these frames MUST NOT lazily re-scan)
      val patchedEager = patched.map(_.localCheckpoint(true))
      Bucketing.appendBucketed(batchC, edgesT, "u", Buckets)
      s.sql(s"DROP TABLE IF EXISTS $histT")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), histT.toLowerCase)
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      val histUnion = patchedEager.zipWithIndex
        .map { case (df, i) => df.select(lit(i + 1).as("round"), $"v", $"lab") }
        .reduce(_ unionByName _)
      Bucketing.writeBucketed(histUnion, histT, "v", Buckets)
    }

  /** Drop the persisted graph state of `dir` (test hook / re-ingest). */
  def drop(s: SparkSession, dir: String): Unit = GraphIngest.synchronized {
    Seq(edgesTable(dir), histTable(dir)).foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), t.toLowerCase)
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    }
  }
}
