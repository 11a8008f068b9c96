package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.jobs.{CodesIngest, GraphIngest, OccIngest}
import graft.queries.GraphQueries

/** Round-15 scale probes: the delete/compact/retract maintenance paths
  * timed at sf0.001 and sf0.1 (10× documents, 4× embeddings) through
  * the REAL code paths. Results recorded in docs/SCALE.md. */
object R15Probe {
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

    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      println(s"[probe] == $dir ==")
      OccIngest.drop(spark, dir)
      time(s"occ ingest")(OccIngest.ingest(spark, dir))
      val ids = graft.Tables.documents(spark, dir)
        .where($"doc_id" % 7 === 0).select($"doc_id")
      time(s"occ deleteDocs (1/7 of docs)")(OccIngest.deleteDocs(spark, dir, ids))
      time(s"occ compact")(OccIngest.compact(spark, dir))
      OccIngest.drop(spark, dir)

      val prefix = "r15probe_" + dir.replaceAll("[^0-9]", "")
      Seq("_edges", "_lpahist", "_meta", "_pending", "_applied", "_applied_digest")
        .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $prefix$sfx"))
      val full = GraphQueries.weightedEdgesPartitioned(spark, dir)
        .localCheckpoint(true)
      val isBatch = ($"u" + $"v") % GraphQueries.ChurnMod === 0
      time(s"graph ingestConsistent")(
        GraphIngest.ingestConsistent(spark, prefix, full.where(!isBatch)))
      val batch = full.where(isBatch).localCheckpoint(true)
      time(s"graph advance")(
        GraphIngest.advanceState(spark, prefix, "d1", batch))
      time(s"graph retract")(
        GraphIngest.retractBatch(spark, prefix, "t1", batch))
      time(s"graph compact")(GraphIngest.compact(spark, prefix))
      Seq("_edges", "_lpahist", "_meta", "_pending", "_applied", "_applied_digest")
        .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $prefix$sfx"))
      GraphQueries.clearMemos(spark)
    }

    // evaluation/audit family 10x probes (sf0.01 -> sf0.1): the domain
    // arguments predict near-flat post-agg cost, corpus-pass-dominated
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"[probe] == eval family $dir ==")
      time("q161 clf AUC")(
        noop(graft.queries.TextQueries.q161ClfAuc(spark, dir)))
      time("q162 gate agreement")(
        noop(graft.queries.TextQueries.q162GateAgreement(spark, dir)))
      time("q163 skew audit")(
        noop(graft.queries.RelationalQueries.q163SkewAudit(spark, dir)))
      time("q164 split leakage")(
        noop(graft.queries.DedupQueries.q164SplitLeakage(spark, dir)))
      time("q165 calibration")(
        noop(graft.queries.TextQueries.q165CalibrationTable(spark, dir)))
      graft.queries.DedupQueries.clearMemos(spark)
    }

    // fsck probe: the audit's cost on the sf0.1 state tables
    val fd = "/root/testdata/sf0.1"
    OccIngest.ingest(spark, fd)
    time("fsck occ (sf0.1 state)")(
      println(s"[probe] fsck rows=${graft.jobs.StateFsck.occ(spark, fd).count()}"))
    OccIngest.drop(spark, fd)
    spark.stop()
  }
}
