package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.jobs.{CodesIngest, GraphIngest, OccIngest, RotIngest, StateFsck, Takedown}
import graft.queries.GraphQueries

/** Round-16 scale probes (VERDICT r15 item 7): the fsck audit + repair
  * against the FULL sf0.1 four-family warehouse (+ the KV store, new to
  * the perimeter this round), per-family timings, plus the one-command
  * takedown end to end. Results recorded in docs/SCALE.md with causes
  * named. */
object R16Probe {
  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] ${(System.nanoTime() - t0) / 1e9}%8.2f  $name")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val dir = "/root/testdata/sf0.1"
    val gp = "r16probe_graph"

    // ---- build the full warehouse (timings incidental; r15 costed them) ----
    OccIngest.drop(spark, dir)
    time("occ ingest")(OccIngest.ingest(spark, dir))
    time("codes ingest")(CodesIngest.ingest(spark, dir))
    time("rot ingest")(RotIngest.ingest(spark, dir))
    Seq("_edges", "_lpahist", "_meta", "_pending", "_applied", "_applied_digest")
      .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $gp$sfx"))
    val full = GraphQueries.weightedEdgesPartitioned(spark, dir)
      .localCheckpoint(true)
    val isBatch = ($"u" + $"v") % GraphQueries.ChurnMod === 0
    time("graph ingestConsistent")(
      GraphIngest.ingestConsistent(spark, gp, full.where(!isBatch)))
    time("graph advance")(GraphIngest.advanceState(spark, gp, "d1",
      full.where(isBatch).localCheckpoint(true)))
    // a KV store with real volume: 600k lineitem rows, unique key per line
    val kvPath = java.nio.file.Files
      .createTempDirectory("r16_kv").toString + "/kv.parquet"
    val li = graft.Tables.lineitem(spark, dir)
      .withColumn("line_id", $"l_orderkey" * 10L + $"l_linenumber")
    time("kv write (600k rows)")(
      graft.io.KvSink.write(spark, li, "line_id", kvPath))

    // ---- the fsck audit, per family (each call runs that family's
    // full check set; counts are collected per check) ----
    for (rep <- 1 to 2) {
      println(s"[probe] -- fsck pass $rep --")
      time("fsck occ")(StateFsck.occ(spark, dir).collect())
      time("fsck codes")(StateFsck.codes(spark, dir).collect())
      time("fsck rot")(StateFsck.rot(spark, dir).collect())
      time("fsck graph")(StateFsck.graph(spark, gp).collect())
      time("fsck kv")(StateFsck.kv(spark, kvPath,
        Some(li.where($"line_id" % 997L === 0L).select($"line_id")),
        "line_id").collect())
      time("fsck all (4 families)")(
        StateFsck.all(spark, dir, Some(gp)).collect())
    }
    time("fsck repair (green warehouse: scrub rewrites all families)")(
      StateFsck.repair(spark, dir, Some(gp)).collect())
    time("kv compact (600k rows)")(graft.io.KvSink.compact(spark, kvPath))

    // ---- the one-command takedown, end to end: 1/7 of docs + their
    // vectors + the graph day batch + the KV anti-join ----
    val ids = graft.Tables.documents(spark, dir)
      .where($"doc_id" % 7 === 0)
      .select($"doc_id", $"doc_id".as("vec_id"),
        ($"doc_id" * 10L + 1L).as("line_id"))
      .localCheckpoint(true)
    graft.queries.DedupQueries.clearMemos(spark)
    time("takedown (occ+codes+rot+graph+kv, one lease)")(
      println("[probe]   " + Takedown.run(spark, dir, ids,
        Some(gp), Some("take-d1"), Some(full.where(isBatch)),
        Some(kvPath), "line_id")))
    time("fsck all post-takedown")(
      StateFsck.all(spark, dir, Some(gp)).collect()
        .foreach(r => if (!r.getBoolean(2))
          println(s"[probe]   RED ${r.getString(0)}/${r.getString(1)}")))

    // cleanup
    OccIngest.drop(spark, dir)
    Seq("_codes", "_codebook", "_stats").foreach(sfx =>
      graft.io.Bucketing.dropManaged(spark, s"${CodesIngest.tablePrefix(dir)}$sfx"))
    Seq("_codes", "_codebook", "_model", "_stats").foreach(sfx =>
      graft.io.Bucketing.dropManaged(spark, s"${RotIngest.tablePrefix(dir)}$sfx"))
    Seq("_edges", "_lpahist", "_meta", "_pending", "_applied", "_applied_digest")
      .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $gp$sfx"))
    GraphQueries.clearMemos(spark)
    spark.stop()
  }
}
