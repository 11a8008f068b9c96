package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.GraphQueries

/** Convergence-trajectory probe for label propagation (dev tool): per
  * round prints how many labels changed vs the previous round and vs two
  * rounds ago (0 in the latter with changes in the former = a 2-cycle
  * oscillation) at each SF, to calibrate q145's stop rule the way
  * [[Q82Probe]] calibrated q82's ε. */
object Q145Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val edges = GraphQueries.copurchaseEdgesPartitioned(spark, dir)
      var prev2: org.apache.spark.sql.DataFrame = null
      var prev1 = GraphQueries.lpaInit(edges).localCheckpoint()
      val t0 = System.nanoTime()
      var done = false
      for (i <- 1 to 15 if !done) {
        val cur = GraphQueries.lpaRound(edges, prev1).localCheckpoint()
        val d1 = cur.as("c").join(prev1.as("p"), "v")
          .where(col("c.lab") =!= col("p.lab")).count()
        val d2 = if (prev2 == null) -1L
          else cur.as("c").join(prev2.as("p"), "v")
            .where(col("c.lab") =!= col("p.lab")).count()
        println(f"[q145] $sf round $i%2d  changed=$d1%8d  vs2ago=$d2%8d  t=${(System.nanoTime() - t0) / 1e9}%6.2f")
        if (d1 == 0 || d2 == 0) done = true
        prev2 = prev1; prev1 = cur
      }
    }
    spark.stop()
  }
}
