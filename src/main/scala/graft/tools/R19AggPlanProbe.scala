package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Round-19 evidence probe: the formatted plans of the centroid/stats
  * SUBTREES that the vec_agg_* rewrite collapsed (the full declared
  * queries hide these behind their localCheckpoints, so the per-query
  * plan dumps cannot show the Aggregate shrinking from 65–129
  * expressions to 2–3 — this prints the subtree plans directly). */
object R19AggPlanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val emb = graft.Tables.embeddings(spark, dir)

    println("===== labelCentroids =====")
    graft.queries.SimilarityQueries.labelCentroids(emb).explain("formatted")
    println("===== sq8Stats =====")
    graft.queries.SimilarityQueries.sq8Stats(emb).explain("formatted")
    println("===== pqTrainCodebook =====")
    val sub = graft.queries.SimilarityQueries.pqSubcodes(spark,
      emb.select(col("vec_id"), col("embedding")))
    graft.queries.SimilarityQueries.pqTrainCodebook(spark, sub).explain("formatted")
    spark.stop()
  }
}
