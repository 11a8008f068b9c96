package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort}
import org.apache.spark.sql.graft.GraftShim

/** Round-18 probe: cost of the final deterministic-output `orderBy`.
  *
  * Hypothesis (guide §2.4 "orderBy used only to make output
  * deterministic"): a global sort plants Exchange(rangepartitioning),
  * whose RangePartitioner SAMPLES the child RDD — a reservoir pass that
  * consumes every child partition's full iterator. The child of that
  * exchange is everything after the previous stage boundary, so a
  * map-only query computes its entire scan+projection TWICE per action
  * (once for the sample job, once for the shuffle map).
  *
  * For each named query this measures, min of 3 noop-sink reps each:
  *   full    — the query as declared (sort included);
  *   nosort  — the top Sort stripped (the 1× compute floor);
  *   ckpt    — child lazily localCheckpoint'd, then the same Sort
  *             re-applied (sample + shuffle read the cached blocks, so
  *             compute runs once).
  * full ≈ 2×nosort with ckpt ≈ nosort + ε confirms the hypothesis and
  * sizes the win per query.
  */
object R18SortProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def release(): Unit = {
      spark.catalog.clearCache()
      val keep = graft.queries.GraphQueries.sharedRddIds(spark) ++
        graft.queries.DedupQueries.sharedRddIds(spark)
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) => if (!keep.contains(id)) rdd.unpersist(blocking = false) }
    }
    def best(reps: Int)(f: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; release()
        (System.nanoTime() - t0) / 1e9
      }.min

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val full = fn(spark, sfDir)
      val (sortNode, child) = full.queryExecution.analyzed match {
        case s @ Sort(_, true, c, _) => (Some(s), c)
        case p => (None, p)
      }
      val childDf = GraftShim.ofRows(spark, child)
      // warmups
      noop(full); release()
      val tFull = best(3)(noop(fn(spark, sfDir)))
      val tNosort = best(3)(noop(GraftShim.ofRows(spark,
        fn(spark, sfDir).queryExecution.analyzed match {
          case Sort(_, true, c, _) => c; case p => p
        })))
      // expression sort keys (orderBy(md5(..)) — q56/q81) are not plain
      // Attributes: fall back to NaN like the sort-free arm instead of
      // crashing the probe run (ADVICE r18)
      val tCkpt = sortNode match {
        case Some(s) if !s.order.forall(_.child.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.Attribute]) => Double.NaN
        case Some(s) => best(3) {
          val base = GraftShim.ofRows(spark,
            fn(spark, sfDir).queryExecution.analyzed match {
              case Sort(_, true, c, _) => c; case p => p
            }).localCheckpoint(false)
          // re-resolve the sort keys against the checkpoint's fresh
          // attribute ids by NAME (declared queries sort on plain columns)
          val cols = s.order.map { so =>
            val name = so.child.asInstanceOf[
              org.apache.spark.sql.catalyst.expressions.Attribute].name
            if (so.direction.sql == "ASC") base.col(name).asc else base.col(name).desc
          }
          noop(base.orderBy(cols: _*))
        }
        case None => Double.NaN
      }
      println(f"[sortprobe] $name%-28s full=$tFull%6.3f nosort=$tNosort%6.3f ckpt=$tCkpt%6.3f sort_overhead=${tFull - tNosort}%6.3f ckpt_win=${tFull - tCkpt}%6.3f")
    }
    spark.stop()
  }
}
