package graft.jobs

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.io.{Bucketing, KvSink, WriterLease}

/** Cross-family takedown orchestration (VERDICT r15 item 2). The
  * reference models opt-out deletion as ONE job
  * (taar_profile_bigtable.py:193-223); here a document takedown spans
  * up to five independently crash-safe mutations — occ delete, codes
  * delete, rot delete, graph retract, KV anti-join — and a crash
  * BETWEEN families leaves corpus↔state drift that only a later fsck
  * surfaces. This orchestrator restores the reference's one-operation
  * semantics: one command, one lease, one resumable marker.
  *
  * The protocol is [[graft.io.StagedRewrite]]'s marker discipline
  * lifted one level, from "one table rewrite" to "one multi-family
  * mutation":
  *
  *  1. STAGE the manifest — the id list (and optional graph delta +
  *     KV/graph parameters) persisted as `<p>_manifest_*` tables.
  *     Nothing is mutated; a crash here leaves uncertified residue
  *     that [[heal]] drops.
  *  2. CERTIFY with the 1-row `<p>_pending` marker: "the manifest is
  *     complete; this takedown is in flight and MUST finish".
  *  3. APPLY each family in a fixed order, recording a `<p>_done_<fam>`
  *     marker after each family's own commit protocol completes. Every
  *     family mutation is idempotent (anti-join rewrites; watermarked
  *     graph retraction; content-keyed KV anti-join), so the only
  *     resume cost of a crash inside family N is re-running family N.
  *  4. CLEAN UP: drop the pending marker first (the takedown is no
  *     longer in flight), then the manifest and done markers (now
  *     uncertified residue by construction).
  *
  * [[heal]] closes every window: marker present ⇒ re-apply from the
  * manifest, skipping done families; marker absent ⇒ drop residue.
  * [[run]] heals FIRST, so a parked takedown always completes before a
  * new one stages — two takedowns never interleave.
  *
  * One LEASE (`takedown` scope, per corpus dir) serializes takedowns
  * across processes; the per-family leases the inner mutators take are
  * independent names and still guard each family against non-takedown
  * writers. If a family's lease is held by another process, the apply
  * fails fast with the marker still certified — rerun/heal resumes.
  *
  * Family applicability is derived from the manifest, re-evaluated on
  * every (re-)apply: a `doc_id` column drives the occ family, a
  * `vec_id` column drives codes + rot, the graph applies when the
  * manifest carries a delta batch, the KV store when it carries a
  * path. A family whose state tables are ABSENT is skipped — every
  * family is rebuild-if-absent, and a later rebuild reads the
  * already-reduced corpus, so there is nothing to take down.
  *
  * Scale: the manifest is takedown-sized (broadcast everywhere it is
  * consumed); each family pays exactly its own delete cost — one
  * bucket-aligned anti-join rewrite (occ/codes/rot), one watermarked
  * delta append + roll (graph), one filter rewrite (KV). Nothing here
  * adds a shuffle on top of the family paths. */
object Takedown {

  /** Orchestration scope — one takedown at a time per corpus dir. */
  def tdPrefix(dir: String): String = Bucketing.corpusPrefix("td", dir)

  def idsTable(p: String): String = s"${p}_manifest_ids"
  def edgesTable(p: String): String = s"${p}_manifest_edges"
  def metaTable(p: String): String = s"${p}_manifest_meta"
  def pendingTable(p: String): String = s"${p}_pending"
  def doneTable(p: String, fam: String): String = s"${p}_done_$fam"

  private val Families = Seq("occ", "codes", "rot", "graph", "kv")

  private val metaSchema = StructType(Seq(
    StructField("graph_prefix", StringType, nullable = true),
    StructField("batch_id", StringType, nullable = true),
    StructField("kv_path", StringType, nullable = true),
    StructField("kv_id_col", StringType, nullable = true)))

  /** One takedown: `ids` columns select the row-keyed families
    * (`doc_id` → occ, `vec_id` → codes + rot); a mirrored (u, v, w)
    * `edges` delta + `batchId` retracts from the live graph at
    * `graphPrefix`; `kvPath` anti-joins the KV store on the hashed
    * `kvIdCol` column of `ids`. Returns the per-family outcome line. */
  def run(s: SparkSession, dir: String, ids: DataFrame,
      graphPrefix: Option[String] = None, batchId: Option[String] = None,
      edges: Option[DataFrame] = None, kvPath: Option[String] = None,
      kvIdCol: String = "doc_id"): String =
    runUntil(s, dir, ids, graphPrefix, batchId, edges, kvPath, kvIdCol,
      stopAfter = "done")

  /** Failpoint-instrumented [[run]] — `stopAfter` simulates a crash
    * after the named step ("manifest" | "marker" | a family name |
    * "<fam>-nomark" for the window before a family's done marker);
    * production passes "done". Exists so DayTwoOpsSpec can drive REAL
    * crash windows through the REAL path and pin that [[heal]] closes
    * each one. */
  private[graft] def runUntil(s: SparkSession, dir: String, ids: DataFrame,
      graphPrefix: Option[String], batchId: Option[String],
      edges: Option[DataFrame], kvPath: Option[String], kvIdCol: String,
      stopAfter: String): String = Takedown.synchronized {
    require(graphPrefix.isEmpty == batchId.isEmpty &&
      batchId.isEmpty == edges.isEmpty,
      "graph retraction needs graphPrefix + batchId + edges together")
    // validated BEFORE the manifest is certified: a takedown staged with
    // a missing KV id column would otherwise park and fail every resume
    require(kvPath.isEmpty || ids.columns.contains(kvIdCol),
      s"KV takedown needs column '$kvIdCol' in the ids frame " +
        s"(has: ${ids.columns.mkString(", ")})")
    val p = tdPrefix(dir)
    WriterLease.withLease(s, p) {
      healLocked(s, dir, p) // a parked takedown completes before a new one
      // A retraction staged under an ALREADY-APPLIED batch id would
      // certify, then no-op inside the graph family (advanceState's
      // redelivery screen — the same screen that makes crash-resume
      // idempotent, so it cannot be removed) and report
      // `graph=retracted` with every edge still live (ADVICE r16).
      // Validated at STAGE time, after the heal (a parked takedown with
      // this id has then legitimately applied it) and before
      // certification; resume never re-stages, so heal idempotency is
      // untouched. Checked only when graph state exists — against an
      // absent family the takedown records "absent" and a later rebuild
      // reads the reduced corpus.
      // ...but a REDELIVERY of the same completed retraction — tagged
      // rows of the id equal the negated incoming delta — must still
      // converge silently (review r17: crash-after-certification
      // recovery IS re-running the identical command, and the first cut
      // of this check threw on exactly that recovery, with advice that
      // would have double-retracted the edges). When a graph-compact
      // has folded the tagged rows away, the digest the compact
      // recorded in `_applied_digest` takes over the comparison (ADVICE
      // r17: a retry landing after a compaction is the same legitimate
      // recovery, not an error). The rejection therefore fires only
      // when the deltas genuinely DIFFER — or the batch was folded by a
      // pre-digest compact, the one remaining incomparable case (the
      // message names the operator action).
      for (g <- graphPrefix; b <- batchId; e <- edges)
        if (s.catalog.tableExists(s"${g}_meta") &&
            GraphIngest.batchApplied(s, g, b)) {
          val negated = e.select(col("u"), col("v"), (-col("w")).as("w"))
          require(GraphIngest.taggedDeltaEquals(s, g, b, negated) ||
              GraphIngest.appliedDigestEquals(s, g, b, negated),
            s"batch id '$b' was already applied to graph '$g' with a " +
              "DIFFERENT delta (or it was compacted before digests were " +
              "recorded, making comparison impossible). If this is a " +
              "redelivery of an already-completed retraction, it has " +
              "already taken effect and there is nothing to do; if this " +
              "is a NEW retraction, pick a fresh batch id (e.g. 'take-" +
              b + "')")
        }
      // ---- stage the manifest (nothing mutated yet) ----
      dropResidue(s, p)
      ids.write.format("parquet").saveAsTable(idsTable(p))
      edges.foreach(_.select(col("u"), col("v"), col("w"))
        .write.format("parquet").saveAsTable(edgesTable(p)))
      s.createDataFrame(
        java.util.Arrays.asList(Row(graphPrefix.orNull, batchId.orNull,
          kvPath.orNull, if (kvPath.isDefined) kvIdCol else null)),
        metaSchema).write.format("parquet").saveAsTable(metaTable(p))
      if (stopAfter == "manifest") return "takedown parked after manifest"
      // ---- certify ----
      s.range(1).write.format("parquet").saveAsTable(pendingTable(p))
      if (stopAfter == "marker") return "takedown parked after marker"
      // ---- apply + clean up ----
      applyLocked(s, dir, p, stopAfter)
    }
  }

  /** Complete (marker present) or abandon (marker absent) a parked
    * takedown of `dir`. Idempotent; safe to run any time. */
  def heal(s: SparkSession, dir: String): String = Takedown.synchronized {
    val p = tdPrefix(dir)
    WriterLease.withLease(s, p) { healLocked(s, dir, p) }
  }

  private def healLocked(s: SparkSession, dir: String, p: String): String =
    if (s.catalog.tableExists(pendingTable(p)))
      applyLocked(s, dir, p, stopAfter = "done") // certified ⇒ finish it
    else { dropResidue(s, p); "no takedown in flight" } // abandon stage

  /** Apply every not-yet-done family from the certified manifest, then
    * clean up. The manifest is the ONLY input — resume and first run
    * share this path verbatim. */
  private def applyLocked(s: SparkSession, dir: String, p: String,
      stopAfter: String): String = {
    val ids = s.table(idsTable(p))
    val meta = s.table(metaTable(p)).head()
    def metaStr(i: Int): Option[String] =
      if (meta.isNullAt(i)) None else Some(meta.getString(i))
    val (gp, bid, kvp, kvc) = (metaStr(0), metaStr(1), metaStr(2), metaStr(3))

    val outcomes = Families.map { fam =>
      val done = doneTable(p, fam)
      if (s.catalog.tableExists(done)) fam -> "done"
      else {
        val outcome = fam match {
          case "occ" =>
            if (!ids.columns.contains("doc_id")) "n/a"
            else if (!s.catalog.tableExists(OccIngest.occTable(dir))) "absent"
            else { OccIngest.deleteDocs(s, dir, ids.select(col("doc_id")))
                   "deleted" }
          case "codes" =>
            if (!ids.columns.contains("vec_id")) "n/a"
            else if (!s.catalog.tableExists(
              s"${CodesIngest.tablePrefix(dir)}_codes")) "absent"
            else { CodesIngest.deleteVecs(s, ids.select(col("vec_id")),
                     CodesIngest.tablePrefix(dir))
                   "deleted" }
          case "rot" =>
            if (!ids.columns.contains("vec_id")) "n/a"
            else if (!s.catalog.tableExists(RotIngest.codesTable(dir))) "absent"
            else { RotIngest.deleteVecs(s, ids.select(col("vec_id")),
                     RotIngest.tablePrefix(dir))
                   "deleted" }
          case "graph" =>
            (gp, bid) match {
              case (Some(g), Some(b)) =>
                if (!s.catalog.tableExists(s"${g}_meta")) "absent"
                else { GraphIngest.retractBatch(s, g, b, s.table(edgesTable(p)))
                       "retracted" }
              case _ => "n/a"
            }
          case "kv" =>
            (kvp, kvc) match {
              case (Some(path), Some(idCol)) =>
                val live = new org.apache.hadoop.fs.Path(path)
                val fs = live.getFileSystem(s.sparkContext.hadoopConfiguration)
                // an interrupted KV rewrite parks the table at .old_rewrite
                // — deleteOptOuts restores it, so only "neither exists"
                // means there is no store to take down from
                if (!fs.exists(live) && !fs.exists(
                  new org.apache.hadoop.fs.Path(path + ".old_rewrite"))) "absent"
                else { KvSink.deleteOptOuts(s, path, ids.select(col(idCol)), idCol)
                       "deleted" }
              case _ => "n/a"
            }
        }
        // the window between a family's commit and its done marker:
        // resume re-applies the family (idempotent) — spec-driven
        if (stopAfter == s"$fam-nomark")
          return s"takedown parked inside $fam ($outcome, unmarked)"
        s.range(1).write.format("parquet").saveAsTable(done)
        if (stopAfter == fam)
          return s"takedown parked after $fam ($outcome)"
        fam -> outcome
      }
    }
    // ---- clean up: un-certify first, then drop now-orphan residue ----
    Bucketing.dropManaged(s, pendingTable(p))
    dropResidue(s, p)
    outcomes.map { case (f, o) => s"$f=$o" }.mkString("takedown ", " ", "")
  }

  private def dropResidue(s: SparkSession, p: String): Unit = {
    (Seq(idsTable(p), edgesTable(p), metaTable(p), pendingTable(p)) ++
      Families.map(doneTable(p, _))).foreach(Bucketing.dropManaged(s, _))
  }
}
