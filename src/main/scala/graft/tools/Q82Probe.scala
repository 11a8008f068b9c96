package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.GraphQueries

/** Delta-trajectory probe for convergence-threshold PageRank (dev tool):
  * prints the quantized L∞ delta per round at each SF to calibrate ε. */
object Q82Probe {
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
      val deg = graft.operators.Materialize.checkpointPartitioned(
        edges.groupBy($"u").agg(count(lit(1)).as("deg")))
      var ranks = deg.select($"u", lit(1.0).as("r"))
      val t0 = System.nanoTime()
      for (i <- 1 to 20) {
        val next = graft.operators.Materialize.checkpointPartitioned(
          GraphQueries.prIteration(edges, deg, ranks), eager = false)
        val delta = next.as("n").join(ranks.as("p"), Seq("u"))
          .agg(max(abs(floor(col("n.r") * 1e12 + 0.5) -
            floor(col("p.r") * 1e12 + 0.5))))
          .head().getLong(0)
        println(f"[q82] $sf round $i%2d  linf_pico=$delta%14d  t=${(System.nanoTime()-t0)/1e9}%6.2f")
        ranks = next
      }
    }
    spark.stop()
  }
}
