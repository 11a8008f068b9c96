package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{Bucketing, KvSink, StagedRewrite, WriterLease}

/** Warehouse-level snapshot/restore (VERDICT r16 item 3): copy the four
  * derived-state families + the KV store + the graph provenance at ONE
  * consistent point, and later restore that point with fsck green.
  *
  * fsck can already DETECT a wrong-vintage restore (the graph
  * provenance row) and every family is rebuild-if-absent, but the
  * operator story stopped there: "copy the five state roots at a
  * consistent point" required hand-sequencing five paths and their
  * leases. This gives the detection its legitimate counterpart as one
  * command each way.
  *
  * CONSISTENCY. A snapshot is taken holding BOTH guard layers every
  * state mutator uses: the in-process object monitors (Takedown + the
  * four families + the KV store's per-store monitor — [[graft.io
  * .WriterLease]] is deliberately JVM-re-entrant, so leases alone
  * cannot exclude a second thread of this JVM) and the cross-process
  * writer leases (takedown scope, each family, the KV store). No
  * cross-family takedown can interleave between two family copies —
  * the exact drift window [[Takedown]] exists to close — and no
  * single-family append/delete/compact can land mid-copy from another
  * process OR another thread. Every family is HEALED first — a parked
  * takedown completes, parked rewrites/advances commit, an interrupted
  * KV rewrite restores — so the copied point is protocol-clean, never
  * mid-crash-window.
  *
  * SNAPSHOT LAYOUT. `snapDir/tables/<tableName>` (plain parquet, one
  * dir per managed table), `snapDir/kv` (the KV store rows), and
  * `snapDir/manifest` — rows (kind, name, bucket_key, buckets,
  * present) — written BEFORE the `_COMPLETE` marker file, which is
  * written LAST and is the only thing [[restore]] trusts: a snapshot
  * that crashed mid-copy is rejected, and re-running [[snapshot]] into
  * the same dir first retracts the stale marker so a second crash
  * cannot leave an old marker validating mixed vintages. ABSENT tables
  * are recorded absent (present=false), so restore can drop a table
  * that was created only after the snapshot.
  *
  * RESTORE is idempotent replay from the immutable snapshot — the
  * manifest (not the caller) names every table, the graph prefix and
  * the KV path, so a restore cannot be mis-aimed; bucketed tables
  * rewrite under [[StagedRewrite]]'s marker discipline (bucket spec
  * preserved: same key, same count, one file per bucket), small tables
  * overwrite in place, and the KV store rewrites under its tmp/old/live
  * rename protocol. A crash mid-restore is recovered by RE-RUNNING
  * restore: each per-table step is individually crash-safe and the
  * source never changes.
  *
  * CORPUS VINTAGE. The perimeter is the STATE roots — the corpus dir
  * itself (documents/embeddings parquet) is the operator's own data and
  * is not copied. A restore is therefore consistent with the corpus AS
  * OF the snapshot: corpus GROWTH since the snapshot stays fsck-green
  * (referential checks are state ⊆ corpus; the restored state simply
  * lags, and the next append catches up), while a corpus TAKEDOWN since
  * the snapshot makes the restored state resurrect rows for removed
  * docs — which fsck flags as referential drift, exactly as it should:
  * that restore re-created the condition a takedown exists to prevent,
  * and the remedy is re-running the takedown (its manifest ids), not
  * suppressing the check.
  *
  * SCALE. Snapshot is one linear copy of each state root (no shuffle —
  * table scan → parquet write at the table's own parallelism); restore
  * pays one bucket-aligned write per bucketed table (the same cost as
  * any family rewrite) and linear copies for the rest. Nothing here is
  * corpus-sized beyond the state being copied. At warehouse scale the
  * underlying copy would be storage-level (distcp / GCS rewrite); this
  * module is the orchestration protocol — what must be quiesced, in
  * which order, and what marks a snapshot trustworthy. */
object Warehouse {

  /** Everything a snapshot covers for (dir, graphPrefix): table name →
    * bucket spec (None = small unbucketed table). */
  private def inventory(dir: String, gp: Option[String])
      : Seq[(String, Option[(String, Int)])] = {
    val emb = CodesIngest.tablePrefix(dir)
    val rot = RotIngest.tablePrefix(dir)
    Seq(
      OccIngest.occTable(dir) -> Some(("doc_id", OccIngest.Buckets)),
      s"${emb}_codes" -> Some(("vec_id", CodesIngest.Buckets)),
      s"${emb}_codebook" -> None,
      s"${emb}_stats" -> None,
      s"${rot}_codes" -> Some(("vec_id", RotIngest.Buckets)),
      s"${rot}_codebook" -> None,
      s"${rot}_model" -> None,
      s"${rot}_stats" -> None) ++
      gp.toSeq.flatMap(g => Seq(
        s"${g}_edges" -> Some(("u", GraphIngest.Buckets)),
        s"${g}_lpahist" -> Some(("v", GraphIngest.Buckets)),
        s"${g}_meta" -> None,
        s"${g}_applied" -> None))
  }

  private def manifestSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("kind",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("name",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("bucket_key",
      org.apache.spark.sql.types.StringType, nullable = true),
    org.apache.spark.sql.types.StructField("buckets",
      org.apache.spark.sql.types.IntegerType, nullable = true),
    org.apache.spark.sql.types.StructField("present",
      org.apache.spark.sql.types.BooleanType)))

  private def fsOf(s: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  private def completeMarker(snapDir: String) =
    new org.apache.hadoop.fs.Path(snapDir, "_COMPLETE")

  /** Acquire EVERY guard a state mutator can hold, around `f`:
    *
    *  - the in-process object monitors (Takedown + the four families,
    *    in the SAME order Takedown's own chain acquires them —
    *    Takedown first, then families — so no lock-order cycle exists
    *    anywhere in the module; review r17 finding: [[WriterLease]] is
    *    deliberately JVM-re-entrant, so leases alone exclude other
    *    PROCESSES but not other THREADS of this one, and a same-JVM
    *    mutator thread would otherwise pass straight through
    *    mid-copy);
    *  - the cross-process writer leases (takedown scope + each family
    *    + the KV store's combined monitor+lease via
    *    [[KvSink.withStoreLease]]). Leases fail fast on cross-process
    *    contention rather than block, so they cannot deadlock. */
  private def withAllGuards[T](s: SparkSession, dir: String,
      gp: Option[String], kvPath: Option[String])(f: => T): T = {
    def nest(names: List[String])(g: => T): T = names match {
      case Nil => g
      case n :: rest => WriterLease.withLease(s, n)(nest(rest)(g))
    }
    Takedown.synchronized { OccIngest.synchronized {
      CodesIngest.synchronized { RotIngest.synchronized {
        GraphIngest.synchronized {
          def leased = nest(List(Takedown.tdPrefix(dir),
            OccIngest.tablePrefix(dir), CodesIngest.tablePrefix(dir),
            RotIngest.tablePrefix(dir)) ++ gp.toList)(f)
          kvPath.fold(leased)(p => KvSink.withStoreLease(s, p)(leased))
        }
      } } } }
  }

  /** One consistent copy of the warehouse state of `dir` (+ the graph
    * at `graphPrefix`, + the KV store at `kvPath`) into `snapDir`.
    * Returns the per-item outcome line. */
  def snapshot(s: SparkSession, dir: String, snapDir: String,
      graphPrefix: Option[String] = None,
      kvPath: Option[String] = None): String =
    withAllGuards(s, dir, graphPrefix, kvPath) {
      val fs = fsOf(s, snapDir)
      // retract a stale marker FIRST: a crash mid-re-snapshot must not
      // leave an old _COMPLETE validating mixed-vintage contents
      fs.delete(completeMarker(snapDir), false)
      // heal everything to a protocol-clean point before copying
      Takedown.heal(s, dir)
      graphPrefix.filter(g => s.catalog.tableExists(s"${g}_meta"))
        .foreach(GraphIngest.heal(s, _))
      inventory(dir, graphPrefix).foreach { case (t, _) =>
        StagedRewrite.heal(s, t) }
      kvPath.foreach(KvSink.heal(s, _))

      val items = inventory(dir, graphPrefix).map { case (t, spec) =>
        val present = s.catalog.tableExists(t)
        if (present) s.table(t).write.mode("overwrite")
          .parquet(s"$snapDir/tables/$t")
        ("table", t, spec.map(_._1).orNull,
          spec.map(x => Integer.valueOf(x._2)).orNull, present)
      } ++ kvPath.map { p =>
        // the store's OWN filesystem, not the snapshot dir's (review
        // r17: probing an hdfs:// store with the local snapDir FS would
        // record it absent, certify a storeless snapshot, and a later
        // restore would then DROP the live store as post-snapshot)
        val present = fsOf(s, p).exists(new org.apache.hadoop.fs.Path(p))
        if (present) s.read.parquet(p).write.mode("overwrite")
          .parquet(s"$snapDir/kv")
        ("kv", p, null, null, present)
      }
      import scala.jdk.CollectionConverters._
      s.createDataFrame(items.map(i => org.apache.spark.sql.Row(
        i._1, i._2, i._3, i._4, i._5)).asJava, manifestSchema)
        .coalesce(1).write.mode("overwrite").parquet(s"$snapDir/manifest")
      fs.create(completeMarker(snapDir), true).close() // certify LAST
      items.map(i => s"${i._2}=${if (i._5) "copied" else "absent"}")
        .mkString("snapshot ", " ", "")
    }

  /** Snapshot integrity audit — "is this snapshot restorable?", asked
    * BEFORE it is needed (the fsck convention transported to the
    * backup: a snapshot is only worth its weakest table, and the time
    * to discover a half-lost copy is a scheduled audit, not the
    * emergency restore). One (family, chk, ok, observed, detail) row
    * per check, same shape as [[StateFsck]]: the `_COMPLETE` marker,
    * manifest readability, and per present item — the copied data
    * exists, reads, and (bucketed tables) still carries its bucket-key
    * column so the restore-side bucketed rewrite cannot fail midway.
    * READ-ONLY: never takes a lease, never mutates — safe against live
    * snapshots and from any process. Scale: catalog/FS probes plus one
    * schema read (parquet footer) per item; the row-count probe reads
    * metadata only. */
  def verify(s: SparkSession, snapDir: String): DataFrame = {
    def firstLine(e: Throwable): String = Option(e.getMessage)
      .getOrElse(e.getClass.getName).linesIterator.nextOption()
      .getOrElse("").take(120)
    val fs = fsOf(s, snapDir)
    val marker = fs.exists(completeMarker(snapDir))
    val markerRow = ("snapshot", "complete_marker", marker,
      if (marker) 0L else 1L,
      if (marker) "_COMPLETE present"
      else "no _COMPLETE - the copy crashed mid-flight (or this is not " +
        "a snapshot dir); restore refuses it")
    val rows = Seq(markerRow) ++ (try {
      val manifest = s.read.parquet(s"$snapDir/manifest").collect()
      val manRow = ("snapshot", "manifest", true, manifest.length.toLong,
        s"${manifest.length} items")
      Seq(manRow) ++ manifest.toSeq.filter(_.getBoolean(4)).map { r =>
        val (kind, name) = (r.getString(0), r.getString(1))
        val path = if (kind == "kv") s"$snapDir/kv" else s"$snapDir/tables/$name"
        try {
          val df = s.read.parquet(path)
          val keyOk = Option(r.getString(2)).forall(df.columns.contains)
          val n = df.count() // parquet footer metadata, no data scan
          if (!keyOk)
            ("snapshot", s"item:$name", false, 1L,
              s"bucket key '${r.getString(2)}' missing from the copied " +
                "schema - the restore-side bucketed rewrite would fail")
          else ("snapshot", s"item:$name", true, n, s"readable, $n rows")
        } catch { case scala.util.control.NonFatal(e) =>
          ("snapshot", s"item:$name", false, 1L,
            "copied data unreadable: " + firstLine(e))
        }
      }
    } catch { case scala.util.control.NonFatal(e) =>
      Seq(("snapshot", "manifest", false, 1L,
        "manifest unreadable: " + firstLine(e)))
    })
    import s.implicits._
    rows.toDF("family", "chk", "ok", "observed", "detail")
  }

  /** Restore the point captured at `snapDir`. The manifest names every
    * table, the graph prefix, and the KV path — the caller only points
    * at the snapshot. Idempotent; re-run after any crash. */
  def restore(s: SparkSession, dir: String, snapDir: String): String =
    restoreUntil(s, dir, snapDir, stopAfter = None)

  /** Failpoint-instrumented [[restore]] — `stopAfter = Some(name)`
    * simulates a crash after the named manifest item is applied
    * (production passes None). Restore carries no marker of its own
    * BY DESIGN: it is stateless replay from an immutable source, so
    * the recovery protocol for a crash at ANY point is simply "run
    * restore again" — each per-item step is individually crash-safe
    * (StagedRewrite / rename protocol / drop), already-restored items
    * re-converge to the same rows, and not-yet-restored items get
    * their turn. The seam exists so DayTwoOpsSpec can drive a REAL
    * mid-restore crash through the REAL path and pin that contract. */
  private[graft] def restoreUntil(s: SparkSession, dir: String,
      snapDir: String, stopAfter: Option[String]): String = {
    val fs = fsOf(s, snapDir)
    require(fs.exists(completeMarker(snapDir)),
      s"no _COMPLETE marker at $snapDir - not a finished snapshot " +
        "(a snapshot that crashed mid-copy must not be restored)")
    val manifest = s.read.parquet(s"$snapDir/manifest").collect()
    val gp = manifest.find(r => r.getString(0) == "table" &&
        r.getString(1).endsWith("_edges"))
      .map(_.getString(1).stripSuffix("_edges"))
    val kvPath = manifest.find(_.getString(0) == "kv").map(_.getString(1))
    withAllGuards(s, dir, gp, kvPath) {
      // heal first so every live table is protocol-clean before its
      // rewrite (a parked swap would otherwise fail the rewrite's
      // own require)
      Takedown.heal(s, dir)
      gp.filter(g => s.catalog.tableExists(s"${g}_meta"))
        .foreach(GraphIngest.heal(s, _))
      val outcomes = scala.collection.mutable.ArrayBuffer[String]()
      for (r <- manifest) {
        val (kind, name, present) = (r.getString(0), r.getString(1),
          r.getBoolean(4))
        val outcome = kind match {
          case "table" =>
            StagedRewrite.heal(s, name)
            val live = s.catalog.tableExists(name)
            if (!present) {
              // the table did not exist at the snapshot point: a copy
              // created since is NOT of this vintage — drop it
              if (live) { StagedRewrite.dropAll(s, name); "dropped" }
              else "absent"
            } else {
              val snap = s.read.parquet(s"$snapDir/tables/$name")
              (Option(r.getString(2)), live) match {
                case (Some(key), true) =>
                  StagedRewrite.rewrite(s, name, key, r.getInt(3))(_ => snap)
                  "restored"
                case (Some(key), false) =>
                  StagedRewrite.dropAll(s, name) // stale staging residue
                  Bucketing.writeBucketed(snap.repartition(r.getInt(3),
                    pmod(hash(col(key)), lit(r.getInt(3)))),
                    name, key, r.getInt(3))
                  "restored"
                case (None, _) =>
                  Bucketing.dropManaged(s, name) // incl. orphan warehouse dir
                  snap.write.format("parquet").saveAsTable(name)
                  "restored"
              }
            }
          case "kv" =>
            if (present) { KvSink.restoreFrom(s, name,
              s.read.parquet(s"$snapDir/kv")); "restored" }
            else {
              KvSink.dropStore(s, name)
              "dropped"
            }
        }
        outcomes += s"$name=$outcome"
        if (stopAfter.contains(name)) {
          // a real crash would not clear memos either — but this JVM
          // lives on, so stale memos must go before anything reads them
          graft.queries.GraphQueries.clearMemos(s)
          graft.queries.DedupQueries.clearMemos(s)
          return s"restore parked after $name"
        }
      }
      // session memos keyed to this dir's tables are stale after the
      // content swap — same contract as advance/retract
      graft.queries.GraphQueries.clearMemos(s)
      graft.queries.DedupQueries.clearMemos(s)
      outcomes.mkString("restore ", " ", "")
    }
  }
}
