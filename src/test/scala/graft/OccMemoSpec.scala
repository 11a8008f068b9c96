package graft

import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** The family-shared corpus gram-occurrence memo (VERDICT r12 item 4):
  * q25/q26/q29/q83/q88/q100 ride ONE tagged occurrence materialization
  * per (session, dir). Pins (a) memo-path ≡ direct-path values, (b) the
  * scan-sharing: a warm consumer's plan reads the checkpoint, not the
  * corpus text, (c) rebuild-if-absent (a cleared memo rebuilds and
  * still matches). */
class OccMemoSpec extends SparkSuite {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("memoized signature path == direct minhashSignatures; rebuild matches") {
    DedupQueries.clearMemos(spark)
    val direct = rows(DedupQueries.minhashSignatures(
      Tables.documents(spark, sf0001)
        .select($"doc_id", DedupQueries.shingles($"text").as("shingles")))
      .orderBy($"doc_id"))
    val viaMemo = rows(DedupQueries.q25MinhashSig(spark, sf0001))
    assert(viaMemo == direct)
    // rebuild-if-absent: clearing the memo must not change values
    DedupQueries.clearMemos(spark)
    assert(rows(DedupQueries.q25MinhashSig(spark, sf0001)) == direct)
  }

  test("OccIngest: persisted table serves the family across a cold memo — " +
      "values identical, no text scan, rebuild-if-absent on drop") {
    import graft.jobs.OccIngest
    OccIngest.drop(spark, sf0001)
    val direct = rows(DedupQueries.q25MinhashSig(spark, sf0001))
    val q83Direct = rows(DedupQueries.q83DupGramFraction(spark, sf0001))

    OccIngest.ingest(spark, sf0001)
    assert(spark.catalog.tableExists(OccIngest.occTable(sf0001)))
    // idempotent: a second ingest reuses the table
    assert(OccIngest.ingest(spark, sf0001) == OccIngest.occTable(sf0001))
    // cold process simulated: memo cleared, table present — the family
    // reads the TABLE (no text scan anywhere in a consumer's plan)
    DedupQueries.clearMemos(spark)
    assert(rows(DedupQueries.q25MinhashSig(spark, sf0001)) == direct)
    assert(rows(DedupQueries.q83DupGramFraction(spark, sf0001)) == q83Direct)
    val scans = DedupQueries.q83DupGramFraction(spark, sf0001)
      .queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.schema.fieldNames.contains("text") => s
      }
    assert(scans.isEmpty, s"table-backed q83 must not tokenize text: $scans")
    // and nothing was memoized for it — the bucketed scan IS the cheap
    // form; pinning a corpus-occurrence-sized frame would be the mistake
    assert(DedupQueries.sharedRddIds(spark).isEmpty,
      "the table read path must not checkpoint the occurrence frame")
    // rebuild-if-absent: dropping the table falls back to the text mint
    OccIngest.drop(spark, sf0001)
    assert(rows(DedupQueries.q25MinhashSig(spark, sf0001)) == direct)
  }

  test("OccIngest.appendBatch: daily growth tokenizes only the new docs — " +
      "merged table == full re-ingest row-for-row, a replayed batch appends " +
      "nothing, and consumers over the grown corpus match the pure text path") {
    import graft.jobs.OccIngest
    val dir = tmpDir("occ_grow")
    val docs = Tables.documents(spark, sf0001).localCheckpoint(true)
    // day-1 corpus = ~80% of docs; day-2 batch = the complement
    val isNew = $"doc_id" % 5 === 0
    docs.where(!isNew).write.mode("append").parquet(s"$dir/documents.parquet")
    OccIngest.ingest(spark, dir)
    val t = OccIngest.occTable(dir)
    val baseRows = spark.table(t).count()

    // day-2: the new docs land in the dir (the daily-growth model) AND
    // flow through appendBatch; the pre-growth text memo is now stale
    val newDocs = docs.where(isNew).localCheckpoint(true)
    newDocs.write.mode("append").parquet(s"$dir/documents.parquet")
    DedupQueries.clearMemos(spark)
    // the delivered batch carries an intra-batch duplicate row (dirty
    // export): the append must still write each doc's rows exactly once
    OccIngest.appendBatch(spark, dir,
      newDocs.unionByName(newDocs.orderBy($"doc_id").limit(1)))
    val mergedRows = spark.table(t).count()
    assert(mergedRows > baseRows)

    // merged table == the full-corpus mint (what a full re-ingest writes)
    val merged = spark.table(t).select($"doc_id", $"kind", $"h")
    val full = DedupQueries.taggedOccForDocs(spark,
      Tables.documents(spark, dir).select($"doc_id", $"text"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "incremental append must reproduce the full re-ingest exactly")

    // at-least-once delivery: the replayed batch appends nothing
    OccIngest.appendBatch(spark, dir, newDocs)
    assert(spark.table(t).count() == mergedRows, "replay must be a no-op")

    // a consumer over the grown corpus reads the merged table and equals
    // the pure text path of the same (grown) corpus
    val viaTable = rows(DedupQueries.q25MinhashSig(spark, dir))
    OccIngest.drop(spark, dir)
    DedupQueries.clearMemos(spark)
    assert(rows(DedupQueries.q25MinhashSig(spark, dir)) == viaTable)
  }

  test("OccIngest.appendBatch fails fast on CONFLICTING intra-batch " +
      "payloads — a duplicated doc_id with two distinct texts cannot be " +
      "silently max-merged (ADVICE r14)") {
    import graft.jobs.OccIngest
    val dir = tmpDir("occ_conflict")
    Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    OccIngest.ingest(spark, dir)
    val t = OccIngest.occTable(dir)
    val before = spark.table(t).count()
    val dirty = Seq(
      (900001L, "alpha beta gamma delta epsilon zeta eta theta"),
      (900001L, "iota kappa lambda mu nu xi omicron pi")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      OccIngest.appendBatch(spark, dir, dirty)
    }
    assert(e.getMessage.contains("conflicting intra-batch payloads"), e.getMessage)
    assert(spark.table(t).count() == before, "no partial append on refusal")
    OccIngest.drop(spark, dir)
  }

  test("OccIngest.deleteDocs: takedown == re-ingest without the docs; a " +
      "consumer over the post-delete table matches the pure text path of " +
      "the reduced corpus; replayed delete is a no-op; compact preserves " +
      "rows and collapses files") {
    import graft.jobs.OccIngest
    val dir = tmpDir("occ_del")
    val docs = Tables.documents(spark, sf0001).localCheckpoint(true)
    docs.write.mode("append").parquet(s"$dir/documents.parquet")
    OccIngest.ingest(spark, dir)
    val t = OccIngest.occTable(dir)
    val isGone = $"doc_id" % 7 === 0
    val gone = docs.where(isGone).select($"doc_id")

    OccIngest.deleteDocs(spark, dir, gone)
    val remaining = docs.where(!isGone).select($"doc_id", $"text")
    val expected = DedupQueries.taggedOccForDocs(spark, remaining)
    val stored = spark.table(t).select($"doc_id", $"kind", $"h")
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty,
      "delete must equal the re-ingest without the docs, row for row")

    // replayed delete (at-least-once): the identity
    val n1 = spark.table(t).count()
    OccIngest.deleteDocs(spark, dir, gone)
    assert(spark.table(t).count() == n1)

    // consumer check: q25 over the post-delete TABLE equals q25's pure
    // text path over a corpus that never held the docs
    val dirR = tmpDir("occ_del_reduced")
    docs.where(!isGone).write.mode("append").parquet(s"$dirR/documents.parquet")
    DedupQueries.clearMemos(spark)
    val viaTable = rows(DedupQueries.q25MinhashSig(spark, dir))
    val pure = rows(DedupQueries.q25MinhashSig(spark, dirR))
    assert(viaTable == pure,
      "post-delete consumer must match the reduced-corpus pure path")

    // compaction: row-identical, file count collapsed to one per bucket
    OccIngest.compact(spark, dir)
    val stored2 = spark.table(t).select($"doc_id", $"kind", $"h")
    assert(stored2.exceptAll(expected).isEmpty && expected.exceptAll(stored2).isEmpty)
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), t.toLowerCase)
    val files = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(loc).count(_.getPath.getName.endsWith(".parquet"))
    assert(files == OccIngest.Buckets,
      s"compaction must leave one file per bucket, got $files")
    OccIngest.drop(spark, dir)
    DedupQueries.clearMemos(spark)
  }

  test("a crash in a delete's DROP window does not lock the family out: " +
      "the next mutator (append) heals the certified staging instead of " +
      "refusing, and ingest() heals instead of paying a full re-ingest " +
      "(review r15)") {
    import graft.jobs.OccIngest
    import graft.io.StagedRewrite
    val dir = tmpDir("occ_park")
    Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    OccIngest.ingest(spark, dir)
    val t = OccIngest.occTable(dir)
    val expectedAfter = spark.table(t).where($"doc_id" % 7 =!= 0).count()
    // the worst crash window: live table dropped, certified staging parked
    StagedRewrite.rewriteUntil(spark, t, "doc_id", OccIngest.Buckets, "drop")(
      _.where($"doc_id" % 7 =!= 0))
    assert(!spark.catalog.tableExists(t), "the park leaves no live table")
    // ingest() must COMMIT the staged delete, not rebuild from text
    assert(OccIngest.ingest(spark, dir) == t)
    assert(spark.table(t).count() == expectedAfter,
      "ingest must heal the staged state, not re-mint the full corpus")
    // and a mutator over the healed table proceeds normally
    OccIngest.appendBatch(spark, dir,
      Seq((990001L, "alpha beta gamma delta")).toDF("doc_id", "text"))
    assert(spark.table(t).where($"doc_id" === 990001L).count() > 0)
    OccIngest.drop(spark, dir)
  }

  test("OccIngest.appendStreamBounded: streamed doc batches append once — " +
      "merged table == full mint, checkpoint re-delivery a no-op") {
    import graft.jobs.OccIngest
    val dir = tmpDir("occ_stream")
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").localCheckpoint(true)
    // base corpus = ~80%; the complement arrives as two drop files
    // (maxFilesPerTrigger=1 → two micro-batches, cross-batch state)
    docs.where($"doc_id" % 5 =!= 0).write.mode("append")
      .parquet(s"$dir/documents.parquet")
    OccIngest.ingest(spark, dir)
    val t = OccIngest.occTable(dir)
    val base = spark.table(t).count()
    val drop = tmpDir("occ_drop")
    docs.where($"doc_id" % 10 === 0).coalesce(1)
      .write.mode("append").parquet(s"$drop/in")
    docs.where($"doc_id" % 10 === 5).coalesce(1)
      .write.mode("append").parquet(s"$drop/in")
    OccIngest.appendStreamBounded(spark, dir, s"$drop/in", s"$drop/ckpt")
    val merged = spark.table(t).count()
    assert(merged > base)
    // merged table == the full-corpus mint (old ∪ streamed = all docs)
    val full = DedupQueries.taggedOccForDocs(spark, docs)
    val stored = spark.table(t).select($"doc_id", $"kind", $"h")
    assert(stored.exceptAll(full).isEmpty && full.exceptAll(stored).isEmpty)
    // same checkpoint, no new files: nothing replays
    OccIngest.appendStreamBounded(spark, dir, s"$drop/in", s"$drop/ckpt")
    assert(spark.table(t).count() == merged)
    OccIngest.drop(spark, dir)
  }

  test("warm consumers read the checkpoint: q83's plan holds no text scan; " +
      "one shared RDD id serves the family") {
    DedupQueries.clearMemos(spark)
    DedupQueries.q25MinhashSig(spark, sf0001).write.format("noop")
      .mode("overwrite").save() // warms the memo
    val shared = DedupQueries.sharedRddIds(spark)
    assert(shared.size == 1, s"one corpus dir => one live memo frame: $shared")
    // q83 (kind-1 slice) rides the SAME frame: no FileSourceScanExec of
    // the documents text anywhere in its plan
    val scans = DedupQueries.q83DupGramFraction(spark, sf0001)
      .queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.schema.fieldNames.contains("text") => s
      }
    assert(scans.isEmpty,
      s"warm q83 must not re-tokenize the corpus: $scans")
    assert(DedupQueries.sharedRddIds(spark) == shared,
      "q83 must not have minted a second occurrence frame")
    // q26's pair chain is EAGERLY checkpointed at mint since r15
    // (verifiedPairs — shared with q164): the candidate-verify text
    // scans (candidate-bounded broadcast semi-join, referenced twice by
    // the doc_a/doc_b join sides) run inside the mint, so the FINAL
    // plan scans only the checkpointed pair RDD — zero text scans, and
    // still no second memo frame
    val scans26 = DedupQueries.q26MinhashPairs(spark, sf0001)
      .queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.schema.fieldNames.contains("text") => s
      }
    assert(scans26.isEmpty,
      s"q26 reads its checkpointed pair frame, got ${scans26.size} text scans")
    assert(DedupQueries.sharedRddIds(spark) == shared,
      "the pair mint must ride the existing memo, not mint a second frame")
  }
}
