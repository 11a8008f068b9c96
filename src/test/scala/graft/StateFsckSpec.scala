package graft

import org.apache.spark.sql.functions._

import graft.io.{Bucketing, StagedRewrite}
import graft.jobs.{CodesIngest, GraphIngest, OccIngest, RotIngest, StateFsck}
import graft.queries.GraphQueries

/** StateFsck: a healthy state passes every check; each corruption class
  * the auditor exists for — foreign-writer junk, protocol residue,
  * partial table sets, parked advances, history imbalance — is injected
  * for real and pinned detected (and, where a remedy exists, pinned
  * green again after it). */
class StateFsckSpec extends SparkSuite {
  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getBoolean(2), r.getLong(3)))).toMap

  test("fsck end-to-end: freshly ingested families are green; injected " +
      "corruption of every class is detected; heal restores the " +
      "rewrite-residue check") {
    val dir = tmpDir("fsck_corpus")
    Tables.documents(spark, sf0001).write.parquet(s"$dir/documents.parquet")
    Tables.embeddings(spark, sf0001).select($"vec_id", $"embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    OccIngest.ingest(spark, dir)
    CodesIngest.ingest(spark, dir)
    RotIngest.ingest(spark, dir)
    val gp = "fsck_graph_live"
    GraphIngest.ingestConsistent(spark, gp,
      GraphQueries.weightedEdgesPartitioned(spark, sf0001))

    // healthy state: every check ok
    val healthy = asMap(StateFsck.all(spark, dir, Some(gp)))
    assert(healthy.nonEmpty && healthy.values.forall(_._1),
      s"healthy state must be all-green: ${healthy.filterNot(_._2._1).keys}")
    assert(healthy.contains(("occ", "referential")) &&
      healthy.contains(("codes", "pq_domain")) &&
      healthy.contains(("graph", "provenance")))

    // foreign writer appends junk to the occ table: a doc_id the corpus
    // never had, an undefined kind, an h outside 60 bits
    Bucketing.appendBucketed(
      Seq((999999L, 7, -5L)).toDF("doc_id", "kind", "h"),
      OccIngest.occTable(dir), "doc_id", OccIngest.Buckets)
    val occBad = asMap(StateFsck.occ(spark, dir))
    assert(!occBad(("occ", "referential"))._1 &&
      occBad(("occ", "referential"))._2 == 1L)
    assert(!occBad(("occ", "kind_domain"))._1)
    assert(!occBad(("occ", "h_domain"))._1)

    // rewrite residue: an uncertified staging orphan parks on the codes
    // table; fsck flags it, heal abandons it, fsck is green again
    val codesT = s"${CodesIngest.tablePrefix(dir)}_codes"
    Seq((1L, "junk")).toDF("a", "b").write
      .saveAsTable(StagedRewrite.stagingTable(codesT))
    assert(!asMap(StateFsck.codes(spark, dir))(("codes", "rewrite_residue"))._1)
    StagedRewrite.heal(spark, codesT)
    assert(asMap(StateFsck.codes(spark, dir))(("codes", "rewrite_residue"))._1)

    // foreign writer duplicates a code row with an out-of-domain pq
    val dup = spark.table(codesT).limit(1)
      .withColumn("pq", transform($"pq", _ => lit(99)))
    Bucketing.appendBucketed(dup, codesT, "vec_id", CodesIngest.Buckets)
    val codesBad = asMap(StateFsck.codes(spark, dir))
    assert(!codesBad(("codes", "vec_id_unique"))._1 &&
      codesBad(("codes", "vec_id_unique"))._2 == 1L)
    assert(!codesBad(("codes", "pq_domain"))._1)

    // partial table set: the rot stats table vanishes
    Bucketing.dropManaged(spark, RotIngest.statsTable(dir))
    val rotBad = asMap(StateFsck.rot(spark, dir))
    assert(!rotBad(("rot", "table_set"))._1 &&
      rotBad(("rot", "table_set"))._2 == 1L)

    // parked advance: a pending marker without its commit
    Seq("batch-x").toDF("batch_id").write.saveAsTable(s"${gp}_pending")
    val gBad = asMap(StateFsck.graph(spark, gp))
    assert(!gBad(("graph", "no_parked_advance"))._1)
    GraphIngest.heal(spark, gp)
    assert(asMap(StateFsck.graph(spark, gp))(("graph", "no_parked_advance"))._1)

    // history imbalance: a stray round with one node
    spark.sql(s"INSERT INTO ${gp}_lpahist VALUES (999, 1, 1)")
    assert(!asMap(StateFsck.graph(spark, gp))(("graph", "hist_balanced"))._1)
  }

  test("fsck on an empty warehouse: absent families are legal " +
      "(rebuild-if-absent), nothing fails") {
    val dir = tmpDir("fsck_absent")
    val out = asMap(StateFsck.all(spark, dir, Some("fsck_no_such_graph")))
    assert(out.values.forall(_._1), s"absent state must be green: $out")
    assert(out(("occ", "table_set"))._2 == 1L) // observed = missing count
  }

  test("fsck-repair: heal + row-scrub returns a corrupted warehouse to " +
      "green, removing EXACTLY the junk (clean row counts preserved)") {
    val dir = tmpDir("fsck_repair")
    Tables.documents(spark, sf0001).write.parquet(s"$dir/documents.parquet")
    Tables.embeddings(spark, sf0001).select($"vec_id", $"embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    OccIngest.ingest(spark, dir)
    CodesIngest.ingest(spark, dir)
    val occT = OccIngest.occTable(dir)
    val codesT = s"${CodesIngest.tablePrefix(dir)}_codes"
    val (occClean, codesClean) = (spark.table(occT).count(), spark.table(codesT).count())

    // corruption: occ junk (orphan id, bad kind, bad h), a duplicated
    // codes row with out-of-domain pq, a staging orphan on codes
    Bucketing.appendBucketed(Seq((777777L, 9, -1L)).toDF("doc_id", "kind", "h"),
      occT, "doc_id", OccIngest.Buckets)
    Bucketing.appendBucketed(
      spark.table(codesT).limit(1).withColumn("pq", transform($"pq", _ => lit(99))),
      codesT, "vec_id", CodesIngest.Buckets)
    Seq((1L, "junk")).toDF("a", "b").write
      .saveAsTable(StagedRewrite.stagingTable(codesT))
    val pre = asMap(StateFsck.all(spark, dir, Some("fsck_repair_none")))
    assert(pre.exists(!_._2._1), "corruption must be visible pre-repair")

    val post = asMap(graft.jobs.StateFsck.repair(spark, dir, Some("fsck_repair_none")))
    assert(post.values.forall(_._1),
      s"post-repair audit must be green: ${post.filterNot(_._2._1).keys}")
    assert(spark.table(occT).count() == occClean,
      "scrub must remove exactly the junk occ row")
    assert(spark.table(codesT).count() == codesClean,
      "scrub must remove exactly the duplicated codes row")

    // CLI face: the repair stage reports zero failures afterwards
    val out = graft.cli.IngestCli.run(spark,
      Map("stage" -> "fsck-repair", "dir" -> dir, "prefix" -> "fsck_repair_none"))
    assert(out.startsWith("stage=fsck-repair") && out.contains("failures=0"))
  }

  test("fsck on schema drift: a state table with the wrong shape yields " +
      "an audit_error FINDING, not a crashed auditor") {
    val dir = tmpDir("fsck_drift")
    Tables.documents(spark, sf0001).limit(10)
      .write.parquet(s"$dir/documents.parquet")
    // a foreign writer left a wrong-schema table under the occ name
    Seq((1L, "junk")).toDF("doc_id", "payload")
      .write.saveAsTable(OccIngest.occTable(dir))
    val out = asMap(StateFsck.occ(spark, dir))
    assert(out(("occ", "table_set"))._1, "table exists - set is complete")
    assert(out.contains(("occ", "audit_error")) && !out(("occ", "audit_error"))._1,
      s"schema drift must surface as audit_error: $out")
  }

  test("fsck on the KV store (VERDICT r15 item 3): every injected " +
      "corruption class detected; scrub + compact restore green; the " +
      "mutators are lease-guarded") {
    val base = tmpDir("fsck_kv")
    val kvPath = s"$base/kv.parquet"
    val docs = Tables.documents(spark, sf0001).limit(100).localCheckpoint(true)
    graft.io.KvSink.write(spark, docs.select($"doc_id", $"lang"), "doc_id", kvPath)

    // healthy store: all green; absent store: green (nothing to audit)
    val ok = asMap(StateFsck.kv(spark, kvPath))
    assert(ok.values.forall(_._1), s"healthy KV must be green: $ok")
    assert(ok(("kv", "file_growth"))._2 >= 1L)
    assert(asMap(StateFsck.kv(spark, s"$base/nope.parquet")).values.forall(_._1))

    // corruption injection: a staged tmp orphan + a crashed write job's
    // _temporary dir, a duplicated key, an empty key/payload row, and
    // five opted-out ids still stored
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(kvPath),
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(kvPath + ".tmp_rewrite"))
    spark.read.parquet(kvPath).limit(1).write.mode("append").parquet(kvPath)
    Seq(("", Array[Byte]())).toDF("key", "payload")
      .write.mode("append").parquet(kvPath)
    // after the appends: a normal job commit would have cleared this
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$kvPath/_temporary"))
    val opt = docs.limit(5).select($"doc_id").localCheckpoint(true)
    val bad = asMap(StateFsck.kv(spark, kvPath, Some(opt), "doc_id"))
    assert(!bad(("kv", "rewrite_residue"))._1 &&
      bad(("kv", "rewrite_residue"))._2 == 2L)
    assert(!bad(("kv", "key_unique"))._1 && bad(("kv", "key_unique"))._2 == 1L)
    assert(!bad(("kv", "key_domain"))._1 && bad(("kv", "key_domain"))._2 == 1L)
    // >= 5: drift counts stored ROWS, and the duplicated row's key may
    // itself be one of the opted-out five
    assert(!bad(("kv", "optout_drift"))._1 &&
      bad(("kv", "optout_drift"))._2 >= 5L)

    // scrub: green again, removing EXACTLY the junk + the opt-outs
    graft.io.KvSink.scrub(spark, kvPath, Some(opt), "doc_id")
    val post = asMap(StateFsck.kv(spark, kvPath, Some(opt), "doc_id"))
    assert(post.values.forall(_._1), s"post-scrub KV must be green: " +
      s"${post.filterNot(_._2._1).keys}")
    assert(spark.read.parquet(kvPath).count() == 95L)

    // interrupted rewrite (live stepped aside, crash before publish):
    // fsck flags it, scrub restores the backup
    assert(fs.rename(new org.apache.hadoop.fs.Path(kvPath),
      new org.apache.hadoop.fs.Path(kvPath + ".old_rewrite")))
    assert(!asMap(StateFsck.kv(spark, kvPath))(("kv", "table_set"))._1)
    graft.io.KvSink.scrub(spark, kvPath)
    assert(asMap(StateFsck.kv(spark, kvPath)).values.forall(_._1))
    assert(spark.read.parquet(kvPath).count() == 95L)

    // compact: row-identical, folded to one file at the default target
    val before = spark.read.parquet(kvPath).orderBy($"key")
      .collect().toSeq
    graft.io.KvSink.compact(spark, kvPath)
    assert(spark.read.parquet(kvPath).orderBy($"key").collect().toSeq == before)
    assert(asMap(StateFsck.kv(spark, kvPath))(("kv", "file_growth"))._2 == 1L)
    val cliOut = graft.cli.IngestCli.run(spark,
      Map("stage" -> "kv-compact", "kv-path" -> kvPath))
    assert(cliOut.contains("rows=95"))

    // compact on an absent store: the families' fail-fast convention
    intercept[IllegalArgumentException] {
      graft.io.KvSink.compact(spark, s"$base/no_such.parquet")
    }

    // the lease: a live foreign lease refuses the mutation fail-fast
    val lease = graft.io.WriterLease.leasePath(spark,
      graft.io.KvSink.leaseName(kvPath))
    lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(lease, false).close()
    intercept[IllegalStateException] {
      graft.io.KvSink.deleteOptOuts(spark, kvPath, opt, "doc_id")
    }
    lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(lease, false)
    graft.io.KvSink.deleteOptOuts(spark, kvPath, opt, "doc_id") // released: works
    assert(spark.read.parquet(kvPath).count() == 95L) // idempotent re-delete
  }

  test("fsck CLI stage: greppable rows + failure summary in the result") {
    val dir = tmpDir("fsck_cli")
    Tables.documents(spark, sf0001).limit(50)
      .write.parquet(s"$dir/documents.parquet")
    Tables.embeddings(spark, sf0001).select($"vec_id", $"embedding").limit(50)
      .write.parquet(s"$dir/embeddings.parquet")
    OccIngest.ingest(spark, dir)
    val ok = graft.cli.IngestCli.run(spark, Map("stage" -> "fsck", "dir" -> dir))
    assert(ok.startsWith("stage=fsck") && ok.contains("failures=0"))
    Bucketing.appendBucketed(Seq((888888L, 0, 1L)).toDF("doc_id", "kind", "h"),
      OccIngest.occTable(dir), "doc_id", OccIngest.Buckets)
    val bad = graft.cli.IngestCli.run(spark, Map("stage" -> "fsck", "dir" -> dir))
    assert(bad.contains("failures=1") && bad.contains("occ/referential"))
  }
}
