package graft

import org.apache.spark.sql.functions._

import graft.cli.IngestCli
import graft.jobs.{CodesIngest, GraphIngest, OccIngest, RotIngest}
import graft.queries.{DedupQueries, GraphQueries}

/** VERDICT r14 item 6: the per-family append/advance/delete/compact
  * paths are each spec-pinned in isolation — this suite drives ONE full
  * operational day through the production CLI and asserts the families
  * COMPOSE: base ingest, daily growth appends, a graph advance, a
  * takedown (delete/retract) across all four families, compaction, and
  * then consumer queries green on the final composed state. */
class DayTwoOpsSpec extends SparkSuite {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("one integrated day through IngestCli: ingest -> append/advance -> " +
      "takedown -> compact, consumers green on the composed state") {
    val dir = tmpDir("day2_corpus")
    val docs = Tables.documents(spark, sf0001).localCheckpoint(true)
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").localCheckpoint(true)
    val isNewDoc = $"doc_id" % 5 === 0
    val isNewVec = $"vec_id" >= 400
    // day-1 corpus
    docs.where(!isNewDoc).write.mode("append").parquet(s"$dir/documents.parquet")
    emb.where(!isNewVec).write.mode("append").parquet(s"$dir/embeddings.parquet")

    // ---- day 1: base ingests, all via the CLI ----
    val graphPrefix = "day2_graph_test"
    val full = GraphQueries.weightedEdgesPartitioned(spark, sf0001)
      .localCheckpoint(true)
    val isBatch = ($"u" + $"v") % GraphQueries.ChurnMod === 0
    assert(IngestCli.run(spark, Map("stage" -> "occ", "dir" -> dir))
      .contains("stage=occ"))
    assert(IngestCli.run(spark, Map("stage" -> "codes", "dir" -> dir))
      .contains("stage=codes"))
    assert(IngestCli.run(spark, Map("stage" -> "rot", "dir" -> dir))
      .contains("stage=rot"))
    GraphIngest.ingestConsistent(spark, graphPrefix, full.where(!isBatch))

    // ---- day 2: growth lands in the corpus dir AND flows through the
    // CLI append/advance stages ----
    val stage = tmpDir("day2_batches")
    docs.where(isNewDoc).select($"doc_id", $"text")
      .write.parquet(s"$stage/docs_new.parquet")
    emb.where(isNewVec).write.parquet(s"$stage/emb_new.parquet")
    full.where(isBatch).write.parquet(s"$stage/graph_day.parquet")
    docs.where(isNewDoc).write.mode("append").parquet(s"$dir/documents.parquet")
    emb.where(isNewVec).write.mode("append").parquet(s"$dir/embeddings.parquet")
    DedupQueries.clearMemos(spark)
    IngestCli.run(spark, Map("stage" -> "occ", "dir" -> dir,
      "append" -> s"$stage/docs_new.parquet"))
    IngestCli.run(spark, Map("stage" -> "codes", "dir" -> dir,
      "append" -> s"$stage/emb_new.parquet"))
    IngestCli.run(spark, Map("stage" -> "rot", "dir" -> dir,
      "append" -> s"$stage/emb_new.parquet"))
    IngestCli.run(spark, Map("stage" -> "graph-advance", "prefix" -> graphPrefix,
      "dir" -> dir, "batch" -> s"$stage/graph_day.parquet", "batch-id" -> "day2"))

    // full day-2 state sanity before the takedown
    assert(spark.table(OccIngest.occTable(dir)).select($"doc_id")
      .distinct().count() == docs.count())
    assert(spark.table(s"${CodesIngest.tablePrefix(dir)}_codes").count()
      == emb.count())
    assert(spark.table(RotIngest.codesTable(dir)).count() == emb.count())

    // snapshot the post-append code tables: deletion must be a pure row
    // filter of these (frozen encoders)
    val codesBefore = spark.table(s"${CodesIngest.tablePrefix(dir)}_codes")
      .localCheckpoint(true)
    val rotBefore = spark.table(RotIngest.codesTable(dir)).localCheckpoint(true)

    // ---- the takedown: docs % 7 == 0 and vecs % 5 == 1 go away, and
    // the graph loses the churn batch again ----
    val goneDoc = $"doc_id" % 7 === 0
    val goneVec = $"vec_id" % 5 === 1
    docs.where(goneDoc).select($"doc_id").write.parquet(s"$stage/doc_ids.parquet")
    emb.where(goneVec).select($"vec_id").write.parquet(s"$stage/vec_ids.parquet")
    IngestCli.run(spark, Map("stage" -> "occ-delete", "dir" -> dir,
      "ids" -> s"$stage/doc_ids.parquet"))
    IngestCli.run(spark, Map("stage" -> "codes-delete", "dir" -> dir,
      "ids" -> s"$stage/vec_ids.parquet"))
    IngestCli.run(spark, Map("stage" -> "rot-delete", "dir" -> dir,
      "ids" -> s"$stage/vec_ids.parquet"))
    IngestCli.run(spark, Map("stage" -> "graph-retract", "prefix" -> graphPrefix,
      "dir" -> dir, "batch" -> s"$stage/graph_day.parquet",
      "batch-id" -> "take-day2"))

    // ---- compaction across all four families ----
    IngestCli.run(spark, Map("stage" -> "occ-compact", "dir" -> dir))
    IngestCli.run(spark, Map("stage" -> "codes-compact", "dir" -> dir))
    IngestCli.run(spark, Map("stage" -> "rot-compact", "dir" -> dir))
    IngestCli.run(spark, Map("stage" -> "graph-compact",
      "prefix" -> graphPrefix, "dir" -> dir))

    // ---- consumers on the composed state ----
    // occ: the table-backed q25 equals the pure text path over a corpus
    // that never held the deleted docs
    val dirR = tmpDir("day2_reduced")
    docs.where(!goneDoc).write.mode("append").parquet(s"$dirR/documents.parquet")
    DedupQueries.clearMemos(spark)
    assert(rows(DedupQueries.q25MinhashSig(spark, dir)) ==
      rows(DedupQueries.q25MinhashSig(spark, dirR)),
      "post-takedown q25 must match the reduced-corpus pure path")

    // codes/rot: frozen-encoder row filters of the pre-delete snapshot
    val codesNow = spark.table(s"${CodesIngest.tablePrefix(dir)}_codes")
    val codesExp = codesBefore.where(!goneVec)
    assert(codesNow.exceptAll(codesExp).isEmpty &&
      codesExp.exceptAll(codesNow).isEmpty)
    val rotNow = spark.table(RotIngest.codesTable(dir))
    val rotExp = rotBefore.where(!goneVec)
    assert(rotNow.exceptAll(rotExp).isEmpty && rotExp.exceptAll(rotNow).isEmpty)

    // graph: advance + retraction of the same batch = the base graph,
    // compacted to one row per pair, with the day's batches watermarked
    val live = spark.table(s"${graphPrefix}_edges")
      .groupBy($"u", $"v").agg(sum($"w").as("w")).where($"w" > 0)
      .orderBy($"u", $"v")
    assert(rows(live) == rows(full.where(!isBatch).orderBy($"u", $"v")),
      "advance + retract of the same batch must recover the base graph")
    assert(spark.table(s"${graphPrefix}_edges")
      .where($"batch_id".isNotNull).count() == 0)
    // replaying BOTH folded batches after compaction: no-ops
    IngestCli.run(spark, Map("stage" -> "graph-advance", "prefix" -> graphPrefix,
      "dir" -> dir, "batch" -> s"$stage/graph_day.parquet", "batch-id" -> "day2"))
    IngestCli.run(spark, Map("stage" -> "graph-retract", "prefix" -> graphPrefix,
      "dir" -> dir, "batch" -> s"$stage/graph_day.parquet",
      "batch-id" -> "take-day2"))
    assert(rows(spark.table(s"${graphPrefix}_edges")
      .groupBy($"u", $"v").agg(sum($"w").as("w")).where($"w" > 0)
      .orderBy($"u", $"v")) == rows(full.where(!isBatch).orderBy($"u", $"v")))

    // cleanup
    OccIngest.drop(spark, dir)
    Seq("_codes", "_codebook", "_stats").foreach(sfx =>
      graft.io.Bucketing.dropManaged(spark, s"${CodesIngest.tablePrefix(dir)}$sfx"))
    Seq("_codes", "_codebook", "_model", "_stats").foreach(sfx =>
      graft.io.Bucketing.dropManaged(spark, s"${RotIngest.tablePrefix(dir)}$sfx"))
    Seq("_edges", "_lpahist", "_meta", "_pending", "_applied", "_applied_digest").foreach(sfx =>
      spark.sql(s"DROP TABLE IF EXISTS $graphPrefix$sfx"))
    DedupQueries.clearMemos(spark)
    GraphQueries.clearMemos(spark)
  }

  /** VERDICT r15 item 2: the one-command takedown. A crash BETWEEN
    * families leaves corpus↔state drift that fsck makes visible; the
    * certified marker makes the takedown resumable, and resume drives
    * it to a state fsck reports fully green. */
  test("takedown: one command, crash between families -> fsck red, " +
      "heal resumes to fsck green") {
    val dir = tmpDir("td_corpus")
    val docs = Tables.documents(spark, sf0001).localCheckpoint(true)
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").localCheckpoint(true)
    docs.write.mode("append").parquet(s"$dir/documents.parquet")
    emb.write.mode("append").parquet(s"$dir/embeddings.parquet")

    // the full day-2 perimeter: four state families + a KV store
    val gp = "td_graph_test"
    val full = GraphQueries.weightedEdgesPartitioned(spark, sf0001)
      .localCheckpoint(true)
    val isBatch = ($"u" + $"v") % GraphQueries.ChurnMod === 0
    IngestCli.run(spark, Map("stage" -> "occ", "dir" -> dir))
    IngestCli.run(spark, Map("stage" -> "codes", "dir" -> dir))
    IngestCli.run(spark, Map("stage" -> "rot", "dir" -> dir))
    GraphIngest.ingestConsistent(spark, gp, full.where(!isBatch))
    val stage = tmpDir("td_batches")
    full.where(isBatch).write.parquet(s"$stage/graph_day.parquet")
    val dayBatch = spark.read.parquet(s"$stage/graph_day.parquet")
    GraphIngest.advanceState(spark, gp, "day1", dayBatch)
    val kvPath = s"$stage/kv.parquet"
    graft.io.KvSink.write(spark, docs.select($"doc_id", $"lang"), "doc_id", kvPath)

    // the takedown: docs % 7 == 0 (and their same-id vectors) go away,
    // the graph loses the day batch. The corpus owner removes them from
    // the corpus dir FIRST — state now lags the corpus until the
    // takedown completes.
    val gone = $"doc_id" % 7 === 0
    val ids = docs.where(gone)
      .select($"doc_id", $"doc_id".as("vec_id")).localCheckpoint(true)
    docs.where(!gone).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    emb.where($"vec_id" % 7 =!= 0).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    DedupQueries.clearMemos(spark)

    // crash after the codes family: occ + codes applied, rot/graph/kv not
    val parked = jobs.Takedown.runUntil(spark, dir, ids,
      Some(gp), Some("take-day1"), Some(dayBatch), Some(kvPath), "doc_id",
      stopAfter = "codes")
    assert(parked.contains("parked after codes"))
    val tp = jobs.Takedown.tdPrefix(dir)
    assert(spark.catalog.tableExists(jobs.Takedown.pendingTable(tp)),
      "the certified marker must survive the crash")
    // the drift is VISIBLE: rot still holds the taken-down vectors the
    // reduced embeddings no longer carry
    val fsckMid = jobs.StateFsck.all(spark, dir, Some(gp))
    assert(fsckMid.where($"family" === "rot" && $"chk" === "referential" &&
      !$"ok").count() == 1, "half-applied takedown must surface as rot drift")
    assert(fsckMid.where($"family" === "takedown" &&
      $"chk" === "no_parked_takedown" && !$"ok").count() == 1,
      "fsck must surface the in-flight takedown itself")
    // ...and the lease was RELEASED by the crash simulation, so heal
    // (any process) can resume
    jobs.Takedown.heal(spark, dir)
    assert(!spark.catalog.tableExists(jobs.Takedown.pendingTable(tp)))
    val fsckDone = jobs.StateFsck.all(spark, dir, Some(gp))
    assert(fsckDone.where(!$"ok").isEmpty,
      s"post-heal fsck must be fully green: ${fsckDone.where(!$"ok").collect().toSeq}")
    // value-level: every family saw exactly the one takedown
    assert(spark.table(OccIngest.occTable(dir))
      .where($"doc_id" % 7 === 0).count() == 0)
    assert(spark.table(s"${CodesIngest.tablePrefix(dir)}_codes")
      .where($"vec_id" % 7 === 0).count() == 0)
    assert(spark.table(RotIngest.codesTable(dir))
      .where($"vec_id" % 7 === 0).count() == 0)
    assert(rows(spark.table(s"${gp}_edges").groupBy($"u", $"v")
      .agg(sum($"w").as("w")).where($"w" > 0).orderBy($"u", $"v")) ==
      rows(full.where(!isBatch).orderBy($"u", $"v")),
      "retract must recover the base graph")
    val goneKeys = ids.select(sha2($"doc_id".cast("string"), 256).as("key"))
    assert(spark.read.parquet(kvPath).join(goneKeys, Seq("key"), "left_semi")
      .isEmpty, "KV rows of taken-down docs must be gone")
    assert(spark.read.parquet(kvPath).count() ==
      docs.where(!gone).count())

    // ADVICE r16: a retraction staged under an ALREADY-APPLIED batch id
    // ("day1" here — the id of the batch being taken down, the natural
    // operator mistake) must be REJECTED at stage time: advanceState's
    // redelivery screen would otherwise silently skip the retraction
    // while the takedown reports graph=retracted. Nothing may be staged
    // or mutated by the rejected attempt.
    val reuse = intercept[IllegalArgumentException] {
      jobs.Takedown.run(spark, dir, ids, Some(gp), Some("day1"),
        Some(dayBatch), None, "doc_id")
    }
    assert(reuse.getMessage.contains("already applied"))
    assert(!spark.catalog.tableExists(jobs.Takedown.pendingTable(tp)) &&
      !spark.catalog.tableExists(jobs.Takedown.idsTable(tp)),
      "a rejected stage must leave no marker or manifest residue")
    // ...while a REDELIVERY of the completed takedown — the identical
    // command, the automation/crash-recovery re-run — must still
    // converge silently (review r17: the first cut of the reuse check
    // threw on exactly this, and obeying its fresh-id advice would have
    // double-retracted the edges): the graph family's redelivery screen
    // no-ops and every view is unchanged
    val graphBefore = rows(spark.table(s"${gp}_edges").groupBy($"u", $"v")
      .agg(sum($"w").as("w")).where($"w" > 0).orderBy($"u", $"v"))
    val redelivered = jobs.Takedown.run(spark, dir, ids,
      Some(gp), Some("take-day1"), Some(dayBatch), Some(kvPath), "doc_id")
    assert(redelivered.contains("graph=retracted"))
    assert(rows(spark.table(s"${gp}_edges").groupBy($"u", $"v")
      .agg(sum($"w").as("w")).where($"w" > 0).orderBy($"u", $"v"))
      == graphBefore, "a redelivered retraction must not change the graph")
    assert(spark.read.parquet(kvPath).count() == docs.where(!gone).count())
    // ...and the fresh-id guidance works: the suggested prefixing scheme
    // passed above ("take-day1") was accepted

    // ADVICE r17: a graph-compact folds the tagged rows into the
    // _applied watermark — the row-level comparison above becomes
    // impossible, and the first cut of the gate then hard-rejected the
    // SAME legitimate redelivery it was built to accept. The compact now
    // records each folded batch's digest, so the comparison survives:
    GraphIngest.compact(spark, gp)
    assert(spark.table(s"${gp}_edges").where($"batch_id".isNotNull).isEmpty,
      "compact must fold every tagged row")
    val redeliveredPostCompact = jobs.Takedown.run(spark, dir, ids,
      Some(gp), Some("take-day1"), Some(dayBatch), Some(kvPath), "doc_id")
    assert(redeliveredPostCompact.contains("graph=retracted"))
    assert(rows(spark.table(s"${gp}_edges").groupBy($"u", $"v")
      .agg(sum($"w").as("w")).where($"w" > 0).orderBy($"u", $"v"))
      == graphBefore,
      "a post-compaction redelivery must converge without touching the graph")
    // ...while a genuinely DIFFERENT delta under the folded id stays
    // rejected — the digest distinguishes, not just remembers
    val reusePostCompact = intercept[IllegalArgumentException] {
      jobs.Takedown.run(spark, dir, ids, Some(gp), Some("take-day1"),
        Some(dayBatch.withColumn("w", $"w" * 2)), None, "doc_id")
    }
    assert(reusePostCompact.getMessage.contains("DIFFERENT delta"))

    // second crash window: inside a family, after its mutation but
    // before its done marker — resume re-applies it (idempotent)
    val gone2 = $"doc_id" % 11 === 3
    val ids2 = docs.where(gone2 && !gone)
      .select($"doc_id", $"doc_id".as("vec_id")).localCheckpoint(true)
    docs.where(!gone && !gone2).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    emb.where($"vec_id" % 7 =!= 0 && $"vec_id" % 11 =!= 3)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    DedupQueries.clearMemos(spark)
    val parked2 = jobs.Takedown.runUntil(spark, dir, ids2,
      None, None, None, None, "doc_id", stopAfter = "occ-nomark")
    assert(parked2.contains("parked inside occ"))
    // fsck-repair is the operational remedy: it completes the parked
    // takedown (re-running occ idempotently, then the rest) before its
    // scrubs, and its returned audit is fully green
    assert(jobs.StateFsck.repair(spark, dir, Some(gp)).where(!$"ok").isEmpty)
    assert(spark.table(OccIngest.occTable(dir)).select($"doc_id").distinct()
      .count() == docs.where(!gone && !gone2).count())

    // cleanup
    OccIngest.drop(spark, dir)
    Seq("_codes", "_codebook", "_stats").foreach(sfx =>
      graft.io.Bucketing.dropManaged(spark, s"${CodesIngest.tablePrefix(dir)}$sfx"))
    Seq("_codes", "_codebook", "_model", "_stats").foreach(sfx =>
      graft.io.Bucketing.dropManaged(spark, s"${RotIngest.tablePrefix(dir)}$sfx"))
    Seq("_edges", "_lpahist", "_meta", "_pending", "_applied", "_applied_digest").foreach(sfx =>
      spark.sql(s"DROP TABLE IF EXISTS $gp$sfx"))
    DedupQueries.clearMemos(spark)
    GraphQueries.clearMemos(spark)
  }

  test("warehouse snapshot/restore (VERDICT r16 item 3): one consistent " +
      "copy of four families + KV store; mutate, restore, fsck green, " +
      "consumers read the snapshot state") {
    val dir = tmpDir("snap_corpus")
    val docs = Tables.documents(spark, sf0001).localCheckpoint(true)
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").localCheckpoint(true)
    docs.write.mode("append").parquet(s"$dir/documents.parquet")
    emb.write.mode("append").parquet(s"$dir/embeddings.parquet")
    val gp = "snap_graph_test"
    val full = GraphQueries.weightedEdgesPartitioned(spark, sf0001)
      .localCheckpoint(true)
    val isBatch = ($"u" + $"v") % GraphQueries.ChurnMod === 0
    IngestCli.run(spark, Map("stage" -> "occ", "dir" -> dir))
    IngestCli.run(spark, Map("stage" -> "codes", "dir" -> dir))
    IngestCli.run(spark, Map("stage" -> "rot", "dir" -> dir))
    GraphIngest.ingestConsistent(spark, gp, full.where(!isBatch))
    val aux = tmpDir("snap_aux")
    val kvPath = s"$aux/kv.parquet"
    graft.io.KvSink.write(spark, docs.select($"doc_id", $"lang"),
      "doc_id", kvPath)

    // the state a consumer would read at the snapshot point
    def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val occT = OccIngest.occTable(dir)
    def graphView() = spark.table(s"${gp}_edges").groupBy($"u", $"v")
      .agg(sum($"w").as("w")).where($"w" > 0)
    val occAt = sorted(spark.table(occT))
    val codesAt = sorted(spark.table(s"${CodesIngest.tablePrefix(dir)}_codes")
      .select($"vec_id"))
    val graphAt = sorted(graphView())
    val kvAt = sorted(spark.read.parquet(kvPath).select($"key"))

    // snapshot through the CLI (the takedown lease + every family lease)
    val snapDir = s"$aux/snap1"
    val snapOut = IngestCli.run(spark, Map("stage" -> "snapshot",
      "dir" -> dir, "prefix" -> gp, "snap-dir" -> snapDir,
      "kv-path" -> kvPath))
    assert(snapOut.contains(s"$occT=copied") && snapOut.contains("kv.parquet=copied"))
    // a half-finished snapshot must be rejected: retract the marker
    val fs = new org.apache.hadoop.fs.Path(snapDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(snapDir, "_COMPLETE"), false))
    val rejected = intercept[IllegalArgumentException] {
      jobs.Warehouse.restore(spark, dir, snapDir)
    }
    assert(rejected.getMessage.contains("_COMPLETE"))
    // ...and the scheduled-audit face sees the same thing, read-only
    assert(jobs.Warehouse.verify(spark, snapDir)
      .where($"chk" === "complete_marker" && !$"ok").count() == 1,
      "snapshot-verify must flag the missing marker")
    // re-snapshot into the same dir re-certifies (idempotent re-run)
    IngestCli.run(spark, Map("stage" -> "snapshot", "dir" -> dir,
      "prefix" -> gp, "snap-dir" -> snapDir, "kv-path" -> kvPath))
    val audit = jobs.Warehouse.verify(spark, snapDir)
    assert(audit.where(!$"ok").isEmpty,
      s"fresh snapshot must audit green: ${audit.where(!$"ok").collect().toSeq}")
    assert(audit.where($"chk" === s"item:$occT").count() == 1)
    val auditCli = IngestCli.run(spark, Map("stage" -> "snapshot-verify",
      "dir" -> dir, "snap-dir" -> snapDir))
    assert(auditCli.contains("failures=0"), auditCli)

    // ---- mutate EVERYTHING after the snapshot ----
    // graph: advance a day batch, then compact (compaction creates the
    // _applied watermark — a table that did NOT exist at the snapshot
    // point, so restore must DROP it)
    full.where(isBatch).write.parquet(s"$aux/day.parquet")
    val dayBatch = spark.read.parquet(s"$aux/day.parquet")
    GraphIngest.advanceState(spark, gp, "day1", dayBatch)
    GraphIngest.compact(spark, gp)
    assert(spark.catalog.tableExists(s"${gp}_applied"))
    // row families + KV: a takedown of every doc_id % 5 == 0 (the
    // corpus dir is UNCHANGED, so both vintages stay referentially
    // green — fsck's referential checks are state ⊆ corpus)
    val ids = docs.where($"doc_id" % 5 === 0)
      .select($"doc_id", $"doc_id".as("vec_id")).localCheckpoint(true)
    jobs.Takedown.run(spark, dir, ids, None, None, None,
      Some(kvPath), "doc_id")
    assert(sorted(spark.table(occT)) != occAt, "mutation must be visible")
    assert(sorted(graphView()) != graphAt)

    // ---- restore: no --prefix/--kv-path, the manifest knows them ----
    val restOut = IngestCli.run(spark,
      Map("stage" -> "restore", "dir" -> dir, "snap-dir" -> snapDir))
    assert(restOut.contains(s"$occT=restored") &&
      restOut.contains(s"${gp}_applied=dropped"), restOut)
    assert(!spark.catalog.tableExists(s"${gp}_applied"),
      "a table created after the snapshot is not of this vintage")

    // consumers read the snapshot state, value-level, every family
    assert(sorted(spark.table(occT)) == occAt)
    assert(sorted(spark.table(s"${CodesIngest.tablePrefix(dir)}_codes")
      .select($"vec_id")) == codesAt)
    assert(sorted(graphView()) == graphAt)
    assert(sorted(spark.read.parquet(kvPath).select($"key")) == kvAt)
    // ...the bucket spec survived the restore (co-located joins depend
    // on it): a fresh advance works against the restored graph
    GraphIngest.advanceState(spark, gp, "day1b", dayBatch)
    assert(sorted(graphView()) != graphAt)

    // fsck fully green on the restored point (advance rolled forward)
    val fsck = jobs.StateFsck.all(spark, dir, Some(gp), Some(kvPath))
    assert(fsck.where(!$"ok").isEmpty,
      s"post-restore fsck must be green: ${fsck.where(!$"ok").collect().toSeq}")

    // restore is idempotent replay: running it again converges to the
    // same state (the day1b advance above is rolled back again)
    jobs.Warehouse.restore(spark, dir, snapDir)
    assert(sorted(graphView()) == graphAt)

    // mid-restore CRASH window: mutate again, then park the restore
    // right after its first manifest item (occ). occ is back at the
    // snapshot point, the graph and KV store are not — and the
    // documented recovery ("run restore again": stateless replay from
    // an immutable source) converges everything
    GraphIngest.advanceState(spark, gp, "day1c", dayBatch)
    jobs.Takedown.run(spark, dir, ids, None, None, None,
      Some(kvPath), "doc_id")
    val parked = jobs.Warehouse.restoreUntil(spark, dir, snapDir, Some(occT))
    assert(parked == s"restore parked after $occT")
    assert(sorted(spark.table(occT)) == occAt,
      "the item applied before the crash is already at the snapshot point")
    assert(sorted(graphView()) != graphAt,
      "items after the crash point must still carry the mutation")
    assert(sorted(spark.read.parquet(kvPath).select($"key")) != kvAt)
    jobs.Warehouse.restore(spark, dir, snapDir) // the recovery IS a re-run
    assert(sorted(spark.table(occT)) == occAt)
    assert(sorted(graphView()) == graphAt)
    assert(sorted(spark.read.parquet(kvPath).select($"key")) == kvAt)
    val fsck2 = jobs.StateFsck.all(spark, dir, Some(gp), Some(kvPath))
    assert(fsck2.where(!$"ok").isEmpty,
      s"post-crash-recovery fsck must be green: ${fsck2.where(!$"ok").collect().toSeq}")

    // a snapshot that LOST a table's data after certification (bit rot,
    // partial storage loss — the marker alone cannot vouch for the
    // bytes) audits red on exactly that item, before any restore needs it
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$snapDir/tables/$occT"), true))
    val rotted = jobs.Warehouse.verify(spark, snapDir)
    assert(rotted.where($"chk" === s"item:$occT" && !$"ok").count() == 1,
      "snapshot-verify must flag the lost table copy")
    assert(rotted.where($"chk" === "complete_marker" && $"ok").count() == 1)

    // ...and a mis-aimed in-place restore is refused BEFORE any guard or
    // mutation: the manifest records the source dir, and a --dir that
    // differs must not take leases on one warehouse while rewriting
    // another (ADVICE r17)
    val misAim = intercept[IllegalArgumentException] {
      jobs.Warehouse.restore(spark, tmpDir("snap_wrong_dir"), snapDir)
    }
    assert(misAim.getMessage.contains(s"taken for dir '$dir'"), misAim.getMessage)

    // cleanup
    OccIngest.drop(spark, dir)
    Seq("_codes", "_codebook", "_stats").foreach(sfx =>
      graft.io.Bucketing.dropManaged(spark, s"${CodesIngest.tablePrefix(dir)}$sfx"))
    Seq("_codes", "_codebook", "_model", "_stats").foreach(sfx =>
      graft.io.Bucketing.dropManaged(spark, s"${RotIngest.tablePrefix(dir)}$sfx"))
    Seq("_edges", "_lpahist", "_meta", "_pending", "_applied", "_applied_digest").foreach(sfx =>
      spark.sql(s"DROP TABLE IF EXISTS $gp$sfx"))
    DedupQueries.clearMemos(spark)
    GraphQueries.clearMemos(spark)
  }

  /** VERDICT r17 items 1/2/5: the snapshot's RECORDED expectation
    * (per-bucket counts + fingerprints) catches a single lost part
    * file; a delta snapshot copies only the buckets that changed; a
    * base+delta chain restores to the exact point; and restore-as-clone
    * rebuilds the point under a different warehouse identity with the
    * source untouched. */
  test("warehouse r18: fingerprint verify, delta snapshots, chain " +
      "restore, restore-as-clone") {
    val dir = tmpDir("wh18_corpus")
    val docs = Tables.documents(spark, sf0001).localCheckpoint(true)
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").localCheckpoint(true)
    docs.write.mode("append").parquet(s"$dir/documents.parquet")
    emb.write.mode("append").parquet(s"$dir/embeddings.parquet")
    val gp = "wh18_graph_test"
    val full = GraphQueries.weightedEdgesPartitioned(spark, sf0001)
      .localCheckpoint(true)
    val isBatch = ($"u" + $"v") % GraphQueries.ChurnMod === 0
    IngestCli.run(spark, Map("stage" -> "occ", "dir" -> dir))
    IngestCli.run(spark, Map("stage" -> "codes", "dir" -> dir))
    IngestCli.run(spark, Map("stage" -> "rot", "dir" -> dir))
    GraphIngest.ingestConsistent(spark, gp, full.where(!isBatch))
    val aux = tmpDir("wh18_aux")
    val kvPath = s"$aux/kv.parquet"
    graft.io.KvSink.write(spark, docs.select($"doc_id", $"lang"),
      "doc_id", kvPath)
    val occT = OccIngest.occTable(dir)
    val embT = s"${CodesIngest.tablePrefix(dir)}_codes"
    def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

    // ---- full snapshot, forced to land MULTI-FILE copies (tiny split
    // targets) so partial loss is a real scenario at sf0.001 too ----
    val snap1 = s"$aux/snap1"
    withSQLConf("spark.sql.files.maxPartitionBytes" -> "16384",
        "spark.sql.files.openCostInBytes" -> "1") {
      IngestCli.run(spark, Map("stage" -> "snapshot", "dir" -> dir,
        "prefix" -> gp, "snap-dir" -> snap1, "kv-path" -> kvPath))
    }
    assert(jobs.Warehouse.verify(spark, snap1).where(!$"ok").isEmpty)

    // VERDICT r17 item 1: lose ONE part file of a multi-file copy — the
    // copy still READS as valid parquet with fewer rows, which the r17
    // readability audit passed green; the recorded counts+fingerprints
    // go red on exactly that item
    val occCopy = new java.io.File(s"$snap1/tables/$occT")
    val occParts = occCopy.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(occParts.length >= 2,
      s"need a multi-file copy to pin partial loss, got ${occParts.length}")
    // delete the LARGEST part: split packing sometimes lands a
    // footer-only ZERO-ROW part file (a ~450-byte schema shell from an
    // empty write task), and losing THAT is content-invisible by the
    // manifest's own contract (recorded rows+fingerprints) — verify is
    // correctly green on it, so the test must lose rows, not bytes
    assert(occParts.maxBy(_.length).delete())
    val rotted = jobs.Warehouse.verify(spark, snap1)
    assert(rotted.where($"chk" === s"item:$occT" && !$"ok").count() == 1,
      "partial file loss must audit red on exactly the lossy item")
    assert(rotted.where($"chk" =!= s"item:$occT" && !$"ok").isEmpty,
      "every other item (and the marker) must stay green")
    // a fresh snapshot into the same dir re-certifies green
    IngestCli.run(spark, Map("stage" -> "snapshot", "dir" -> dir,
      "prefix" -> gp, "snap-dir" -> snap1, "kv-path" -> kvPath))
    assert(jobs.Warehouse.verify(spark, snap1).where(!$"ok").isEmpty)

    // ---- VERDICT r17 item 2: mutate ONE family, delta-snapshot ----
    // a 2-doc deletion: at most 2 of occ's 8 buckets change, so the
    // delta's bucket granularity is observable (a wide deletion would
    // legitimately touch all buckets and degrade to a full table copy)
    val goneDocs = docs.where($"doc_id".isin(1L, 251L)).select($"doc_id")
      .localCheckpoint(true)
    OccIngest.deleteDocs(spark, dir, goneDocs)
    // the state a consumer reads at the snap2 point, every family
    val occAt2 = sorted(spark.table(occT))
    val embAt2 = sorted(spark.table(embT).select($"vec_id"))
    def graphView(p: String) = spark.table(s"${p}_edges")
      .groupBy($"u", $"v").agg(sum($"w").as("w")).where($"w" > 0)
    val graphAt2 = sorted(graphView(gp))
    val kvAt2 = sorted(spark.read.parquet(kvPath).select($"key"))
    val snap2 = s"$aux/snap2"
    val out2 = IngestCli.run(spark, Map("stage" -> "snapshot", "dir" -> dir,
      "prefix" -> gp, "snap-dir" -> snap2, "kv-path" -> kvPath,
      "base" -> snap1))
    // only the occ table physically copied, and only its CHANGED buckets
    val deltaRe = (occT + """=delta\((\d+)/8 buckets\)""").r
    val k = deltaRe.findFirstMatchIn(out2).map(_.group(1).toInt)
      .getOrElse(fail(s"no delta outcome for $occT in: $out2"))
    assert(k >= 1 && k <= 2,
      s"a 2-doc deletion must change at most 2 of 8 buckets, got $k")
    val copiedDirs = Option(new java.io.File(s"$snap2/tables").listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty[String])
    assert(copiedDirs == Set(occT),
      s"delta must copy only the changed family's table: $copiedDirs")
    assert(!new java.io.File(s"$snap2/kv").exists(),
      "an unchanged KV store must not be re-copied")
    def bytesUnder(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else f.length()
      walk(new java.io.File(p))
    }
    assert(bytesUnder(s"$snap2/tables") < bytesUnder(s"$snap1/tables"),
      "the delta's copy I/O must be smaller than the full snapshot's")
    // the chain audits green (snap2's parts resolve into snap1's copies)
    assert(jobs.Warehouse.verify(spark, snap2).where(!$"ok").isEmpty)

    // ---- mutate EVERYTHING, restore from the delta: base+delta chain
    // ≡ the point state, value-level, every family ----
    full.where(isBatch).write.parquet(s"$aux/day.parquet")
    val dayBatch = spark.read.parquet(s"$aux/day.parquet")
    GraphIngest.advanceState(spark, gp, "day1", dayBatch)
    val ids = docs.where($"doc_id" % 5 === 0)
      .select($"doc_id", $"doc_id".as("vec_id")).localCheckpoint(true)
    jobs.Takedown.run(spark, dir, ids, None, None, None,
      Some(kvPath), "doc_id")
    assert(sorted(spark.table(occT)) != occAt2)
    IngestCli.run(spark, Map("stage" -> "restore", "dir" -> dir,
      "snap-dir" -> snap2))
    assert(sorted(spark.table(occT)) == occAt2,
      "chain restore must recover the delta-snapshot point")
    assert(sorted(spark.table(embT).select($"vec_id")) == embAt2)
    assert(sorted(graphView(gp)) == graphAt2)
    assert(sorted(spark.read.parquet(kvPath).select($"key")) == kvAt2)

    // ---- VERDICT r17 item 5: restore-as-clone into a fresh identity;
    // the source warehouse stays bit-unchanged ----
    val dir2 = tmpDir("wh18_clone")
    docs.write.mode("append").parquet(s"$dir2/documents.parquet")
    emb.write.mode("append").parquet(s"$dir2/embeddings.parquet")
    val gp2 = "wh18_clone_graph"
    val kv2 = s"$aux/kv2.parquet"
    val srcOcc = sorted(spark.table(occT))
    val srcEmb = sorted(spark.table(embT))
    val srcGraph = sorted(spark.table(s"${gp}_edges"))
    // payload is binary — compare via base64, not Array.toString identity
    def kvRows() = sorted(spark.read.parquet(kvPath)
      .select($"key", base64($"payload")))
    val srcKv = kvRows()
    val cloneOut = IngestCli.run(spark, Map("stage" -> "restore-clone",
      "snap-dir" -> snap2, "into-dir" -> dir2, "into-prefix" -> gp2,
      "into-kv-path" -> kv2))
    assert(cloneOut.contains(s"${OccIngest.occTable(dir2)}=restored"), cloneOut)
    // the clone reads the snapshot point under ITS identity...
    assert(sorted(spark.table(OccIngest.occTable(dir2))) == occAt2)
    assert(sorted(spark.table(s"${CodesIngest.tablePrefix(dir2)}_codes")
      .select($"vec_id")) == embAt2)
    assert(sorted(graphView(gp2)) == graphAt2)
    assert(sorted(spark.read.parquet(kv2).select($"key")) == kvAt2)
    // ...is fsck-green there...
    val cloneFsck = jobs.StateFsck.all(spark, dir2, Some(gp2), Some(kv2))
    assert(cloneFsck.where(!$"ok").isEmpty,
      s"clone fsck must be green: ${cloneFsck.where(!$"ok").collect().toSeq}")
    // ...and the source warehouse is untouched, value-level
    assert(sorted(spark.table(occT)) == srcOcc)
    assert(sorted(spark.table(embT)) == srcEmb)
    assert(sorted(spark.table(s"${gp}_edges")) == srcGraph)
    assert(kvRows() == srcKv)

    // a delta chain PINS its ancestors: losing a base item that the
    // delta still references goes red at the DELTA's audit
    assert(new org.apache.hadoop.fs.Path(s"$snap1/tables/$embT")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(s"$snap1/tables/$embT"), true))
    assert(jobs.Warehouse.verify(spark, snap2)
      .where($"chk" === s"item:$embT" && !$"ok").count() == 1,
      "a deleted base copy must surface at the delta's audit")

    // cleanup (both identities)
    for (d <- Seq(dir, dir2)) {
      OccIngest.drop(spark, d)
      Seq("_codes", "_codebook", "_stats").foreach(sfx =>
        graft.io.Bucketing.dropManaged(spark, s"${CodesIngest.tablePrefix(d)}$sfx"))
      Seq("_codes", "_codebook", "_model", "_stats").foreach(sfx =>
        graft.io.Bucketing.dropManaged(spark, s"${RotIngest.tablePrefix(d)}$sfx"))
    }
    for (g <- Seq(gp, gp2))
      Seq("_edges", "_lpahist", "_meta", "_pending", "_applied",
        "_applied_digest").foreach(sfx =>
        spark.sql(s"DROP TABLE IF EXISTS $g$sfx"))
    DedupQueries.clearMemos(spark)
    GraphQueries.clearMemos(spark)
  }
}
