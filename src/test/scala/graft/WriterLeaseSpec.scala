package graft

import org.apache.spark.sql.functions._

import graft.io.WriterLease
import graft.jobs.OccIngest

/** The cross-process single-writer guard (VERDICT r14 item 7): a lease
  * file in the warehouse turns the one-writer-per-warehouse contract
  * into a fail-fast. Pins (a) a live foreign lease refuses the mutation
  * and is NOT deleted by the refused writer, (b) a stale lease (crashed
  * writer) is stolen, (c) a completed mutation releases its lease, (d)
  * nested mutators re-enter instead of self-deadlocking. */
class WriterLeaseSpec extends SparkSuite {
  import spark.implicits._

  test("foreign live lease refuses the mutation and survives the refusal; " +
      "a stale lease is stolen; a completed mutation releases its own") {
    val dir = tmpDir("lease_corpus")
    Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    OccIngest.ingest(spark, dir)
    val prefix = OccIngest.tablePrefix(dir)
    val lease = WriterLease.leasePath(spark, prefix)
    val fs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(lease), "a completed ingest must release its lease")

    // a SECOND process's live lease: this writer must refuse — and must
    // not delete the other writer's lease on the way out
    val out = fs.create(lease, false)
    out.write("other-writer@elsewhere".getBytes("UTF-8")); out.close()
    val batch = Seq((990001L, "some new text here")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      OccIngest.appendBatch(spark, dir, batch)
    }
    assert(e.getMessage.contains("another writer holds the lease"), e.getMessage)
    assert(fs.exists(lease), "the refused writer must not delete the lease")
    val rows = spark.table(OccIngest.occTable(dir)).count()

    // the same lease gone STALE (its holder crashed): stolen, mutation
    // lands, and the thief's lease is released afterwards
    fs.setTimes(lease, System.currentTimeMillis() - 16L * 60L * 1000L, -1)
    OccIngest.appendBatch(spark, dir, batch)
    assert(spark.table(OccIngest.occTable(dir)).count() > rows,
      "the stolen-lease mutation must land")
    assert(!fs.exists(lease), "the thief must release the stolen lease")
    OccIngest.drop(spark, dir)
  }

  test("the holder heartbeats: a mutation running past staleMs keeps its " +
      "lease fresh, so it cannot be stolen mid-write (review r15)") {
    val name = "lease_beat_test"
    val lease = WriterLease.leasePath(spark, name)
    val fs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.conf.set("spark.graft.lease.staleMs", "3000")
    try {
      WriterLease.withLease(spark, name) {
        val t0 = fs.getFileStatus(lease).getModificationTime
        Thread.sleep(4500) // > staleMs: without a heartbeat this lease
                           // would now read as a crashed writer's
        val t1 = fs.getFileStatus(lease).getModificationTime
        assert(t1 > t0, "heartbeat must refresh the lease mtime")
        assert(System.currentTimeMillis() - t1 < 3000,
          "the lease must read FRESH to any would-be thief")
      }
      assert(!fs.exists(lease))
    } finally spark.conf.unset("spark.graft.lease.staleMs")
  }

  test("a dead heartbeat's lease is stolen and the thief's FIRST act heals " +
      "the corpse's parked mutation (VERDICT r15 item 8: the crash window " +
      "the steal contract leans on, driven end to end)") {
    import graft.io.StagedRewrite
    val dir = tmpDir("lease_dead_corpus")
    Tables.documents(spark, sf0001).select($"doc_id", $"text")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    OccIngest.ingest(spark, dir)
    val t = OccIngest.occTable(dir)
    val before = spark.table(t).count()
    // writer 1 "dies" mid-delete: its rewrite is staged AND certified
    // (marker written) but the swap never ran — exactly what a crash
    // after the marker leaves behind
    val victim = spark.table(t).select($"doc_id").orderBy($"doc_id")
      .limit(1).head().getLong(0)
    StagedRewrite.rewriteUntil(spark, t, "doc_id", OccIngest.Buckets,
      stopAfter = "marker")(_.where($"doc_id" =!= victim))
    assert(spark.catalog.tableExists(StagedRewrite.markerTable(t)))
    // ...and its heartbeat died with it: the lease file sits there with
    // a stale mtime (no thread refreshing it)
    val prefix = OccIngest.tablePrefix(dir)
    val lease = WriterLease.leasePath(spark, prefix)
    val fs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(lease, false)
    out.write("corpse@elsewhere".getBytes("UTF-8")); out.close()
    fs.setTimes(lease, System.currentTimeMillis() - 16L * 60L * 1000L, -1)
    // the thief: a routine compact. Its acquire steals the stale lease;
    // its rewrite heals the certified staging FIRST (completing the
    // corpse's swap — the victim row is gone), then compacts.
    OccIngest.compact(spark, dir)
    assert(!spark.catalog.tableExists(StagedRewrite.markerTable(t)) &&
      !spark.catalog.tableExists(StagedRewrite.stagingTable(t)),
      "healing must consume the parked rewrite")
    assert(spark.table(t).where($"doc_id" === victim).count() == 0,
      "the certified staged delete must have committed, not been lost")
    assert(spark.table(t).count() < before,
      "only the victim's rows may be missing")
    assert(!fs.exists(lease), "the thief must release the stolen lease")
    OccIngest.drop(spark, dir)
  }

  test("nested mutators re-enter the lease instead of deadlocking; the " +
      "graph family's full day cycle (advance -> heal -> retract -> " +
      "compact) holds ONE lease end to end") {
    import graft.jobs.GraphIngest
    import graft.queries.GraphQueries
    val prefix = "lease_graph_test"
    val full = GraphQueries.weightedEdgesPartitioned(spark, sf0001)
      .localCheckpoint(true)
    val isBatch = ($"u" + $"v") % GraphQueries.ChurnMod === 0
    GraphIngest.ingestConsistent(spark, prefix, full.where(!isBatch))
    // advanceState acquires the lease, then calls healLocked (re-entry);
    // retractBatch routes through advanceState (re-entry again)
    GraphIngest.advanceState(spark, prefix, "d1",
      full.where(isBatch).localCheckpoint(true))
    GraphIngest.retractBatch(spark, prefix, "t1",
      full.where(isBatch).localCheckpoint(true))
    GraphIngest.compact(spark, prefix)
    val lease = WriterLease.leasePath(spark, prefix)
    val fs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(lease), "every cycle stage must release the lease")
    Seq("_edges", "_lpahist", "_meta", "_pending", "_applied", "_applied_digest")
      .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $prefix$sfx"))
  }
}
