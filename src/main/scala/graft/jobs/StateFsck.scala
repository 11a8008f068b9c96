package graft.jobs

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.queries.SimilarityQueries

/** Consistency auditor (`fsck`) for the four derived-state families —
  * the day-2 operation the heal/lease machinery deliberately does NOT
  * cover. `heal` finishes or abandons a rewrite the PROTOCOL parked;
  * `WriterLease` keeps compliant writers out of each other's way; this
  * job detects what neither can: drift between a state table and the
  * corpus it claims to derive from (a takedown applied to the corpus
  * but not the family, a foreign writer that ignored the lease, a
  * restored-from-backup table of the wrong vintage), value-domain
  * corruption, and protocol residue awaiting a heal.
  *
  * Output: one row per check — (family, chk, ok, observed, detail) —
  * so the CLI face is greppable and a scheduler can alert on any
  * `ok = false`. An ABSENT family is ok (every family is
  * rebuild-if-absent by design); a PARTIAL table set is not.
  *
  * Scale: every check is either a catalog probe or ONE column-pruned
  * aggregation/anti-join over a bucketed state table — the most
  * expensive (referential integrity) costs a key-column scan of the
  * state table + the corpus id column, orders below the re-ingest it
  * rules out. Checks collect 1-row counts driver-side (the heal/CLI
  * convention: fsck is an operations command, not a query operator). */
object StateFsck {

  private val schema = StructType(Seq(
    StructField("family", StringType, nullable = false),
    StructField("chk", StringType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("observed", LongType, nullable = false),
    StructField("detail", StringType, nullable = false)))

  private def mk(s: SparkSession, rows: Seq[(String, String, Boolean, Long, String)]): DataFrame =
    s.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3, r._4, r._5)): _*),
      schema)

  private def cnt(df: DataFrame): Long = df.count()

  /** Run a family's value checks; a thrown analysis/read error (schema
    * drift, unreadable files) becomes an `audit_error` FINDING — an
    * auditor that crashes on the corruption it exists to find would be
    * useless exactly when needed. */
  private def guarded(family: String)(
      checks: => Seq[(String, String, Boolean, Long, String)])
      : Seq[(String, String, Boolean, Long, String)] =
    try checks catch {
      case scala.util.control.NonFatal(e) =>
        Seq((family, "audit_error", false, 1L,
          "check failed to run: " + Option(e.getMessage).getOrElse(e.toString)
            .linesIterator.nextOption().getOrElse(e.getClass.getName).take(160)))
    }

  /** Rewrite-protocol residue on `table`: staging and/or marker left by
    * a crashed StagedRewrite. Residue is healable, but it is also the
    * fingerprint of a crashed writer — fsck surfaces it instead of
    * silently absorbing it the way the next rewrite would. */
  private def residue(s: SparkSession, family: String, table: String)
      : (String, String, Boolean, Long, String) = {
    val st = s.catalog.tableExists(graft.io.StagedRewrite.stagingTable(table))
    val mk = s.catalog.tableExists(graft.io.StagedRewrite.markerTable(table))
    val n = (if (st) 1L else 0L) + (if (mk) 1L else 0L)
    (family, "rewrite_residue", n == 0L, n,
      if (n == 0L) "no parked rewrite"
      else if (mk) "certified staging parked - heal completes the swap"
      else "uncertified staging orphan - heal abandons it")
  }

  /** All-or-nothing table-set existence: absent families are legal
    * (rebuild-if-absent), partial sets are corruption. */
  private def tableSet(s: SparkSession, family: String, tables: Seq[String])
      : ((String, String, Boolean, Long, String), Boolean) = {
    val missing = tables.filterNot(s.catalog.tableExists)
    val present = missing.size < tables.size
    val ok = missing.isEmpty || !present
    ((family, "table_set", ok, missing.size.toLong,
      if (missing.isEmpty) "complete"
      else if (!present) "absent - consumers rebuild on demand"
      else s"PARTIAL: missing ${missing.mkString(", ")}"),
      missing.isEmpty)
  }

  /** Occurrence frame vs its corpus dir. */
  def occ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = OccIngest.occTable(dir)
    val (setRow, complete) = tableSet(s, "occ", Seq(t))
    val rows = Seq(setRow, residue(s, "occ", t)) ++ (if (!complete) Nil
    else guarded("occ") {
      val stored = s.table(t)
      val orphans = cnt(stored.select($"doc_id").distinct()
        .join(Tables.documents(s, dir).select($"doc_id"), Seq("doc_id"), "left_anti"))
      val badKind = cnt(stored.where(!$"kind".isin(0, 1)))
      val badH = cnt(stored.where($"h".isNotNull &&
        ($"h" < 0L || $"h" >= (1L << 60))))
      Seq(
        ("occ", "referential", orphans == 0L, orphans,
          if (orphans == 0L) "every stored doc_id exists in the corpus"
          else "stored doc_ids absent from the corpus - stale state or missed takedown"),
        ("occ", "kind_domain", badKind == 0L, badKind, "kind must be 0 or 1"),
        ("occ", "h_domain", badH == 0L, badH, "h must fit 60 bits"))
    })
    mk(s, rows)
  }

  /** SQ8/PQ/binary codes tables vs the embeddings table. */
  def codes(s: SparkSession, dir: String): DataFrame =
    codesLike(s, "codes", CodesIngest.tablePrefix(dir),
      Seq("_codes", "_codebook", "_stats"), dir)

  /** Learned-rotation codes tables vs the embeddings table. */
  def rot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prefix = RotIngest.tablePrefix(dir)
    val base = codesLike(s, "rot", prefix,
      Seq("_codes", "_codebook", "_model", "_stats"), dir)
    if (!s.catalog.tableExists(s"${prefix}_model")) base
    else base.unionByName(mk(s, guarded("rot") {
      // the stored rotation must be a complete d-row basis of d-wide rows
      val m = s.table(s"${prefix}_model")
      val nRows = cnt(m)
      val badWidth = cnt(m.where(size($"brow") =!= SimilarityQueries.EmbDim))
      val ok = nRows == SimilarityQueries.EmbDim.toLong && badWidth == 0L
      Seq(("rot", "model_shape", ok,
        if (ok) 0L else math.max(badWidth, math.abs(nRows - SimilarityQueries.EmbDim)),
        s"basis must be ${SimilarityQueries.EmbDim} rows x ${SimilarityQueries.EmbDim} doubles"))
    }))
  }

  /** Shared codes-family checks: table set, residue, vec_id uniqueness,
    * referential integrity vs embeddings, pq code domain. */
  private def codesLike(s: SparkSession, family: String, prefix: String,
      suffixes: Seq[String], dir: String): DataFrame = {
    import s.implicits._
    val t = s"${prefix}_codes"
    val (setRow, complete) = tableSet(s, family, suffixes.map(prefix + _))
    val rows = Seq(setRow, residue(s, family, t)) ++ (if (!complete) Nil
    else guarded(family) {
      val stored = s.table(t)
      val n = cnt(stored)
      val dup = n - cnt(stored.select($"vec_id").distinct())
      val orphans = cnt(stored.select($"vec_id").distinct()
        .join(Tables.embeddings(s, dir).select($"vec_id"), Seq("vec_id"), "left_anti"))
      val badPq = cnt(stored.where(exists($"pq",
        x => x < 0 || x >= SimilarityQueries.PqK)))
      Seq(
        (family, "vec_id_unique", dup == 0L, dup,
          "one code row per vector (append idempotency invariant)"),
        (family, "referential", orphans == 0L, orphans,
          if (orphans == 0L) "every coded vec_id exists in embeddings"
          else "coded vec_ids absent from embeddings - stale codes or missed takedown"),
        (family, "pq_domain", badPq == 0L, badPq,
          s"pq codes must lie in [0, ${SimilarityQueries.PqK})"))
    })
    mk(s, rows)
  }

  /** Graph family: provenance, parked advances, history balance,
    * retraction debt. Prefix-based like the graph mutators — the
    * PRODUCTION pair is the CLI's `--prefix` (or its graphlive
    * default), not the corpus-derived q146 demo pair, whose provenance
    * is deliberately `consistent = false`. */
  def graph(s: SparkSession, prefix: String): DataFrame = {
    import s.implicits._
    val (edgesT, histT) = (s"${prefix}_edges", s"${prefix}_lpahist")
    val (setRow, complete) = tableSet(s, "graph",
      Seq(edgesT, histT, s"${prefix}_meta"))
    // the graph has TWO rewrite protocols: StagedRewrite on the edges
    // table (compact) and the hist __next staging (advance) — a parked
    // compact was invisible without this row (review r15)
    val histNext = s.catalog.tableExists(s"${histT}__next")
    val edgeRes = residue(s, "graph", edgesT)
    val resRow = ("graph", "rewrite_residue",
      edgeRes._3 && !histNext, edgeRes._4 + (if (histNext) 1L else 0L),
      if (edgeRes._3 && !histNext) "no parked rewrite"
      else if (!edgeRes._3) edgeRes._5
      else "hist staging parked - graph-heal commits or abandons it")
    val rows = Seq(setRow, resRow) ++ (if (!complete) Nil
    else guarded("graph") {
      val consistent =
        try s.table(s"${prefix}_meta").select($"consistent")
          .head().getBoolean(0)
        catch { case scala.util.control.NonFatal(_) => false }
      val pending = s.catalog.tableExists(s"${prefix}_pending")
      // every hist round must describe the same node set: per-round row
      // counts are equal iff the roll-forward committed atomically
      // (an EMPTY history is unbalanced-by-vacancy: a complete table set
      // with zero history rows is itself corruption, not a green state)
      val perRound = s.table(histT).groupBy($"round")
        .agg(count(lit(1)).as("n")).agg(
          coalesce(max($"n") === min($"n"), lit(false)).as("bal"),
          coalesce(max($"n"), lit(0L)).as("mx")).head()
      val retracted = cnt(s.table(edgesT).groupBy($"u", $"v")
        .agg(sum($"w").as("sw")).where($"sw" <= 0L))
      Seq(
        ("graph", "provenance", consistent, if (consistent) 0L else 1L,
          "meta.consistent must be true (edges and history describe one graph)"),
        ("graph", "no_parked_advance", !pending, if (pending) 1L else 0L,
          if (pending) "pending marker present - run graph-heal" else "no advance in flight"),
        ("graph", "hist_balanced", perRound.getBoolean(0), perRound.getLong(1),
          "every LPA round carries the same node count"),
        ("graph", "retraction_debt", true, retracted,
          "fully-retracted pairs awaiting compaction (informational)"))
    })
    mk(s, rows)
  }

  /** KV profile store checks (VERDICT r15 item 3) — the K4/K5 parquet
    * KV store is the one component the reference itself treats as
    * production state (the Bigtable table), so it joins the fsck
    * perimeter: rewrite-protocol residue (interrupted tmp/old renames,
    * orphan task-attempt `_temporary` dirs), the maxVersions=1 key
    * uniqueness invariant, value-domain (non-empty key and payload),
    * opt-out referential drift (hashed opt-out ids still present — a
    * missed or half-applied takedown), and informational file growth
    * (what [[graft.io.KvSink.compact]] folds). An absent store is ok. */
  def kv(s: SparkSession, kvPath: String, optOuts: Option[DataFrame] = None,
      idCol: String = "client_id"): DataFrame = {
    val live = new org.apache.hadoop.fs.Path(kvPath)
    val fs = live.getFileSystem(s.sparkContext.hadoopConfiguration)
    def ex(suffix: String) =
      fs.exists(new org.apache.hadoop.fs.Path(kvPath + suffix))
    val (liveEx, oldEx, tmpEx) = (fs.exists(live), ex(".old_rewrite"),
      ex(".tmp_rewrite"))
    val orphanTmp = liveEx &&
      fs.exists(new org.apache.hadoop.fs.Path(live, "_temporary"))
    val setRow = ("kv", "table_set", liveEx || !oldEx,
      if (liveEx) 0L else 1L,
      if (liveEx) "store present"
      else if (oldEx) "INTERRUPTED rewrite: live missing, backup present - " +
        "any KV mutator (or scrub) restores it"
      else "absent - nothing to audit")
    val resN = (if (tmpEx) 1L else 0L) + (if (orphanTmp) 1L else 0L) +
      (if (oldEx && liveEx) 1L else 0L)
    val resRow = ("kv", "rewrite_residue", resN == 0L, resN,
      if (resN == 0L) "no rewrite residue"
      else "crashed-writer residue: " + Seq(
        if (tmpEx) Some("staged .tmp_rewrite") else None,
        if (orphanTmp) Some("orphan _temporary task dirs") else None,
        if (oldEx && liveEx) Some("post-publish .old_rewrite backup") else None)
        .flatten.mkString(", ") + " - scrub clears it")
    val rows = Seq(setRow, resRow) ++ (if (!liveEx) Nil else guarded("kv") {
      // ONE scan for all three row-level checks (VERDICT r16 item 6:
      // three separate counts made the KV audit the costliest family
      // check — 1.80s warm at sf0.1). key_unique, key_domain and
      // optout_drift fuse into a single aggregation over one pass
      // (count(distinct) plans an Expand, still one file scan); the
      // drift's opt-out set stays a broadcast side. Each check still
      // emits its own attributable row below — the q74
      // expectations-pass pattern.
      val kvDf = s.read.parquet(kvPath)
      val optKeys = optOuts.map(o => broadcast(
        o.select(sha2(col(idCol).cast("string"), 256).as("key")).distinct()
          .withColumn("_opt", lit(true))))
      // left_outer against a DISTINCT right side keeps one row per kv
      // row, so the fused counts see exactly the rows the separate
      // scans did (null keys never match — same as the old left_semi)
      val joined = optKeys.fold(kvDf.withColumn("_opt", lit(false)))(k =>
        kvDf.join(k, Seq("key"), "left_outer")
          .withColumn("_opt", coalesce(col("_opt"), lit(false))))
      val a = joined.agg(
        count(lit(1L)).as("n"),
        // + max(key IS NULL): distinct() counted null as one distinct
        // key; count_distinct ignores nulls — preserve the old dup
        // arithmetic bit-for-bit even on a null-keyed store
        (count_distinct(col("key")) +
          coalesce(max(when(col("key").isNull, 1L).otherwise(0L)),
            lit(0L))).as("nd"), // coalesce: max over an EMPTY store is null
        count(when(col("key").isNull || length(col("key")) === 0 ||
          col("payload").isNull || octet_length(col("payload")) === 0,
          1)).as("bad"),
        count(when(col("_opt"), 1)).as("drift")).head()
      val n = a.getLong(0)
      val dup = n - a.getLong(1)
      val bad = a.getLong(2)
      val drift = optOuts.map(_ => a.getLong(3))
      val files = {
        val it = fs.listFiles(live, true)
        var c = 0L
        while (it.hasNext) {
          if (it.next().getPath.getName.startsWith("part-")) c += 1
        }
        c
      }
      Seq(
        ("kv", "key_unique", dup == 0L, dup,
          "one row per key (the maxVersions=1 invariant)"),
        ("kv", "key_domain", bad == 0L, bad,
          "keys and payloads must be non-empty"),
        ("kv", "file_growth", true, files,
          "accumulated data files (informational - compact folds them)")) ++
        drift.map(d => ("kv", "optout_drift", d == 0L, d,
          if (d == 0L) "no opted-out key present"
          else "opted-out keys still stored - missed or half-applied takedown"))
    })
    mk(s, rows)
  }

  /** Cross-family takedown residue: a CERTIFIED takedown marker means a
    * takedown is parked mid-flight — some families may already be
    * mutated (their own checks stay green against the reduced corpus
    * only after it completes), so fsck surfaces it; `takedown-heal`
    * (or the next takedown) resumes it. Uncertified manifest residue
    * is abandoned staging — informational, the next run drops it. */
  def takedown(s: SparkSession, dir: String): DataFrame = {
    val p = Takedown.tdPrefix(dir)
    val pending = s.catalog.tableExists(Takedown.pendingTable(p))
    val residue = Seq(Takedown.idsTable(p), Takedown.edgesTable(p),
      Takedown.metaTable(p)).count(s.catalog.tableExists)
    mk(s, Seq(
      ("takedown", "no_parked_takedown", !pending, if (pending) 1L else 0L,
        if (pending) "certified takedown in flight - run takedown-heal"
        else "no takedown in flight"),
      ("takedown", "manifest_residue", pending || residue == 0,
        residue.toLong,
        if (residue == 0) "no manifest residue"
        else if (pending) "manifest of the in-flight takedown"
        else "uncertified manifest - the next takedown/heal drops it")))
  }

  /** All four families + the takedown orchestration scope, one frame —
    * plus the KV store when a path is given. `graphPrefix` defaults to
    * the CLI's graphlive convention for `dir`. */
  def all(s: SparkSession, dir: String, graphPrefix: Option[String] = None,
      kvPath: Option[String] = None, kvOptOuts: Option[DataFrame] = None,
      kvIdCol: String = "client_id"): DataFrame = {
    val four = occ(s, dir).unionByName(codes(s, dir)).unionByName(rot(s, dir))
      .unionByName(graph(s, graphPrefix.getOrElse(
        graft.io.Bucketing.corpusPrefix("graphlive", dir))))
      .unionByName(takedown(s, dir))
    kvPath.fold(four)(p => four.unionByName(kv(s, p, kvOptOuts, kvIdCol)))
  }

  /** Apply the remedies for what [[all]] finds, then re-audit: heal +
    * row-scrub on each row-keyed family (domain-invalid rows cannot
    * have come from the engine, so removing them RESTORES ingest
    * equivalence; referential orphans are removed exactly as the
    * takedown path would), and a protocol heal on the graph. Returns
    * the POST-repair audit — what repair cannot fix stays visible
    * there: a partial table set (re-ingest the family), inconsistent
    * graph provenance (graph-init), unbalanced history (rebuild). */
  def repair(s: SparkSession, dir: String,
      graphPrefix: Option[String] = None, kvPath: Option[String] = None,
      kvOptOuts: Option[DataFrame] = None,
      kvIdCol: String = "client_id"): DataFrame = {
    // a parked takedown completes FIRST: its remaining family deletes
    // are exactly the referential repairs the scrubs below would
    // otherwise re-derive row by row
    Takedown.heal(s, dir)
    OccIngest.scrub(s, dir)
    CodesIngest.scrub(s, dir)
    RotIngest.scrub(s, dir)
    val gp = graphPrefix.getOrElse(
      graft.io.Bucketing.corpusPrefix("graphlive", dir))
    if (s.catalog.tableExists(s"${gp}_meta")) GraphIngest.heal(s, gp)
    kvPath.foreach(p => graft.io.KvSink.scrub(s, p, kvOptOuts, kvIdCol))
    all(s, dir, Some(gp), kvPath, kvOptOuts, kvIdCol)
  }
}
