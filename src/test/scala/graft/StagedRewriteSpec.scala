package graft

import org.apache.spark.sql.functions._

import graft.io.{Bucketing, StagedRewrite}

/** The shared crash-safe rewrite protocol behind deletion and compaction
  * (VERDICT r14 items 1-2): stage → marker → swap. Pins (a) a committed
  * rewrite transforms the rows and lands bucket-aligned with ONE file
  * per bucket, (b) every crash window heals to the OLD or the NEW
  * table — never a partial one, (c) orphan staging without a marker is
  * abandoned, staging WITH a marker is committed. */
class StagedRewriteSpec extends SparkSuite {
  import spark.implicits._

  private val T = "srw_spec"
  private val Buckets = 4

  private def reset(): Unit = {
    StagedRewrite.dropAll(spark, T)
    Bucketing.writeBucketed(
      (1L to 100L).map(i => (i, i * 2)).toDF("k", "v"), T, "k", Buckets)
  }

  private def liveRows(): Seq[(Long, Long)] =
    spark.table(T).orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  private val oldRows = (1L to 100L).map(i => (i, i * 2))
  private val newRows = oldRows.filterNot(_._1 % 10 == 0)

  private def bucketFiles(): Int = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), T.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(loc).count(_.getPath.getName.endsWith(".parquet"))
  }

  test("committed rewrite: rows transformed, bucket-aligned, ONE file per " +
      "bucket; bucketed join still exchange-free on the rewritten table") {
    reset()
    StagedRewrite.rewrite(spark, T, "k", Buckets)(_.where($"k" % 10 =!= 0))
    assert(liveRows() == newRows)
    assert(bucketFiles() == Buckets,
      s"expected one file per bucket, got ${bucketFiles()}")
    assert(!spark.catalog.tableExists(StagedRewrite.stagingTable(T)))
    assert(!spark.catalog.tableExists(StagedRewrite.markerTable(T)))
    // the rename preserves the bucket spec: a k-keyed join still rides it
    val vec = spark.table(T).select($"k").distinct().withColumn("r", lit(1L))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = spark.table(T).join(vec.hint("shuffle_hash"), Seq("k"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan)
    }
    StagedRewrite.dropAll(spark, T)
  }

  test("every crash window heals to a complete table: pre-marker staging " +
      "is abandoned (old state), post-marker windows commit (new state)") {
    // stage: staging complete but NOT certified — heal must abandon it
    reset()
    StagedRewrite.rewriteUntil(spark, T, "k", Buckets, "stage")(
      _.where($"k" % 10 =!= 0))
    assert(liveRows() == oldRows, "live table untouched mid-stage")
    assert(spark.catalog.tableExists(StagedRewrite.stagingTable(T)))
    StagedRewrite.heal(spark, T)
    assert(liveRows() == oldRows)
    assert(!spark.catalog.tableExists(StagedRewrite.stagingTable(T)),
      "un-certified staging must be abandoned")

    // marker: staging certified complete, live table still present —
    // heal must finish the swap
    reset()
    StagedRewrite.rewriteUntil(spark, T, "k", Buckets, "marker")(
      _.where($"k" % 10 =!= 0))
    assert(liveRows() == oldRows, "readers see the old table until the swap")
    StagedRewrite.heal(spark, T)
    assert(liveRows() == newRows, "certified staging must commit")
    assert(!spark.catalog.tableExists(StagedRewrite.markerTable(T)))

    // drop: live table gone, staging + marker present — the worst
    // window; heal must rename the staged state into place
    reset()
    StagedRewrite.rewriteUntil(spark, T, "k", Buckets, "drop")(
      _.where($"k" % 10 =!= 0))
    assert(!spark.catalog.tableExists(T), "crash left no live table")
    StagedRewrite.heal(spark, T)
    assert(liveRows() == newRows, "heal must complete the swap")
    assert(!spark.catalog.tableExists(StagedRewrite.markerTable(T)))

    // a NEXT rewrite self-heals without an explicit heal call
    reset()
    StagedRewrite.rewriteUntil(spark, T, "k", Buckets, "drop")(
      _.where($"k" % 10 =!= 0))
    StagedRewrite.rewrite(spark, T, "k", Buckets)(_.where($"k" <= 50))
    assert(liveRows() == newRows.filter(_._1 <= 50),
      "rewrite must heal the park, then apply its own transform")
    StagedRewrite.dropAll(spark, T)
  }
}
