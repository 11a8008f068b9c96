package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.jobs.{CodesIngest, GraphIngest, OccIngest, RotIngest, Warehouse}
import graft.queries.{DedupQueries, GraphQueries}

/** Round-18 scale probes (VERDICT r17 items 1/2/5): the snapshot
  * lifecycle at 1× (sf0.1) and 10× (ScaleGen-unioned) — FULL snapshot
  * vs DELTA snapshot after a 2-doc single-family mutation (time AND
  * bytes copied: the delta's point is O(changed buckets) copy I/O at
  * O(state) fingerprint-scan cost), the fingerprint VERIFY audit (now
  * a real data scan — the r17 "metadata only" claim is gone), the
  * chain restore, and restore-as-clone. Plus q170 (image perceptual
  * hash + Hamming band-LSH) at both scales — the hash leg is map-only,
  * so the growth should track the corpus, not the pair space.
  * Results → docs/SCALE.md with causes named.
  *
  * Usage: runMain graft.tools.R18Probe [scaledDir] */
object R18Probe {
  private def time[T](name: String)(f: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[probe] $dt%8.2f  $name")
    (dt, r)
  }

  private def bytesUnder(p: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(p))
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

    val base = "/root/testdata/sf0.1"
    val scaled = args.headOption.getOrElse("/tmp/graft_sf1")
    if (!new java.io.File(s"$scaled/documents.parquet").exists()) {
      println(s"[probe] generating 10x dir at $scaled")
      ScaleGen.generate(spark, base, scaled, 10)
    }

    for ((dir, tag) <- Seq(base -> "1x", scaled -> "10x")) {
      println(s"[probe] ===== $tag ($dir) =====")
      val gp = s"r18probe_graph_$tag"
      def dropAll(): Unit = {
        OccIngest.drop(spark, dir)
        Seq("_codes", "_codebook", "_stats").foreach(sfx =>
          graft.io.Bucketing.dropManaged(spark, s"${CodesIngest.tablePrefix(dir)}$sfx"))
        Seq("_codes", "_codebook", "_model", "_stats").foreach(sfx =>
          graft.io.Bucketing.dropManaged(spark, s"${RotIngest.tablePrefix(dir)}$sfx"))
        Seq("_edges", "_lpahist", "_meta", "_pending", "_applied", "_applied_digest")
          .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $gp$sfx"))
        DedupQueries.clearMemos(spark)
        GraphQueries.clearMemos(spark)
      }
      dropAll()

      // q170 first (it shares no state with the warehouse legs)
      time(s"$tag q170 phash near-dup (render+decode+hash+band+verify)")(
        DedupQueries.q170PhashNeardup(spark, dir)
          .write.format("noop").mode("overwrite").save())

      time(s"$tag occ ingest")(OccIngest.ingest(spark, dir))
      time(s"$tag codes ingest")(CodesIngest.ingest(spark, dir))
      time(s"$tag rot ingest")(RotIngest.ingest(spark, dir))
      val full = GraphQueries.weightedEdgesPartitioned(spark, dir)
        .localCheckpoint(true)
      val isBatch = ($"u" + $"v") % GraphQueries.ChurnMod === 0
      time(s"$tag graph ingestConsistent")(
        GraphIngest.ingestConsistent(spark, gp, full.where(!isBatch)))
      val kvPath = java.nio.file.Files
        .createTempDirectory(s"r18_kv_$tag").toString + "/kv.parquet"
      val docs = graft.Tables.documents(spark, dir)
      time(s"$tag kv write")(graft.io.KvSink.write(spark,
        docs.select($"doc_id", $"lang"), "doc_id", kvPath))

      val aux = java.nio.file.Files.createTempDirectory(s"r18_snap_$tag").toString
      val (snap1, snap2) = (s"$aux/snap1", s"$aux/snap2")
      val (tFull, _) = time(s"$tag FULL snapshot (4 families + kv, fingerprinted)")(
        Warehouse.snapshot(spark, dir, snap1, Some(gp), Some(kvPath)))

      // the daily-cadence scenario: a small single-family mutation
      val gone = docs.select($"doc_id").orderBy($"doc_id").limit(2)
        .localCheckpoint(true)
      OccIngest.deleteDocs(spark, dir, gone)
      val (tDelta, _) = time(s"$tag DELTA snapshot (2-doc occ mutation, --base)")(
        Warehouse.snapshot(spark, dir, snap2, Some(gp), Some(kvPath), Some(snap1)))
      val (bFull, bDelta) = (bytesUnder(s"$snap1/tables") + bytesUnder(s"$snap1/kv"),
        bytesUnder(s"$snap2/tables") + bytesUnder(s"$snap2/kv"))
      println(f"[probe]   delta/full: time ${tDelta / tFull}%.3f, copied bytes " +
        f"${bDelta.toDouble / bFull}%.4f ($bDelta%d of $bFull%d)")

      time(s"$tag verify (fingerprint audit of the delta chain)")(
        Warehouse.verify(spark, snap2).where(!col("ok")).count() match {
          case 0 => ()
          case n => println(s"[probe]   RED verify rows: $n")
        })

      // mutate more, then restore the delta point through the chain
      OccIngest.deleteDocs(spark, dir,
        docs.select($"doc_id").orderBy($"doc_id".desc).limit(100)
          .localCheckpoint(true))
      time(s"$tag chain restore (base+delta)")(
        Warehouse.restore(spark, dir, snap2))

      // clone: target identity only (corpus files not needed — the
      // clone rewrites state tables; fsck of the clone is the spec's
      // job at test scale)
      val cloneDir = java.nio.file.Files
        .createTempDirectory(s"r18_clone_$tag").toString
      time(s"$tag restore-as-clone (fresh dir/prefix/kv)")(
        Warehouse.restoreInto(spark, snap2, cloneDir,
          Some(s"r18probe_clone_$tag"),
          Some(s"$aux/kv_clone.parquet")))

      // cleanup both identities
      dropAll()
      OccIngest.drop(spark, cloneDir)
      Seq("_codes", "_codebook", "_stats").foreach(sfx =>
        graft.io.Bucketing.dropManaged(spark, s"${CodesIngest.tablePrefix(cloneDir)}$sfx"))
      Seq("_codes", "_codebook", "_model", "_stats").foreach(sfx =>
        graft.io.Bucketing.dropManaged(spark, s"${RotIngest.tablePrefix(cloneDir)}$sfx"))
      Seq("_edges", "_lpahist", "_meta", "_pending", "_applied", "_applied_digest")
        .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS r18probe_clone_$tag$sfx"))
      DedupQueries.clearMemos(spark)
      GraphQueries.clearMemos(spark)
    }
    spark.stop()
  }
}
