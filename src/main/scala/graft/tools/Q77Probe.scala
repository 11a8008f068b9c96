package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.GraphQueries

/** Stage-level profile of q77 triangle counting (dev tool). */
object Q77Probe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[q77] ${(System.nanoTime() - t0) / 1e9}%8.2f  $name")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val pairs = time("pairs checkpoint")(
      GraphQueries.copurchasePairs(spark, dir).localCheckpoint())
    println(s"[q77] n_edges = ${pairs.count()}")
    val deg = pairs.select($"u".as("n")).union(pairs.select($"v".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("d"))
    val o = time("orientation checkpoint")(pairs
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), Seq("u"))
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), Seq("v"))
      .select(
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"u").otherwise($"v").as("src"),
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"v").otherwise($"u").as("dst"),
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"dv").otherwise($"du").as("ddeg"))
      .localCheckpoint())
    val w = o.as("e1").join(o.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.ddeg") < col("e2.ddeg") ||
            (col("e1.ddeg") === col("e2.ddeg") && col("e1.dst") < col("e2.dst"))))
      .select(col("e1.dst").as("w1"), col("e2.dst").as("w2"))
    time("wedge join + count only")(noop(w.groupBy().count()))
    time("wedge + closing left join agg")(noop(
      w.join(o, $"w1" === $"src" && $"w2" === $"dst", "left")
        .agg(count(lit(1)).as("n_wedges"), count($"src").as("n_triangles"))))
    time("wedge + closing BROADCAST left join agg")(noop(
      w.join(broadcast(o), $"w1" === $"src" && $"w2" === $"dst", "left")
        .agg(count(lit(1)).as("n_wedges"), count($"src").as("n_triangles"))))
    time("broadcast wedge join too")(noop(
      o.as("e1").join(broadcast(o).as("e2"),
          col("e1.src") === col("e2.src") &&
            (col("e1.ddeg") < col("e2.ddeg") ||
              (col("e1.ddeg") === col("e2.ddeg") && col("e1.dst") < col("e2.dst"))))
        .select(col("e1.dst").as("w1"), col("e2.dst").as("w2"))
        .join(broadcast(o), $"w1" === $"src" && $"w2" === $"dst", "left")
        .agg(count(lit(1)).as("n_wedges"), count($"src").as("n_triangles"))))
    println(s"[q77] n_wedges probe = " +
      w.groupBy().count().collect().head.getLong(0))
    // adjacency-intersection variant (compact-forward): group oriented
    // out-neighbors into sorted arrays, intersect per edge
    val adj = o.groupBy($"src").agg(array_sort(collect_list($"dst")).as("nbrs"))
    time("adjacency build")(noop(adj))
    val adjCk = adj.localCheckpoint()
    time("intersect count (checkpointed adj)")(noop(
      o.join(adjCk.select($"src".as("src"), $"nbrs".as("au")), Seq("src"))
        .join(adjCk.select($"src".as("dst"), $"nbrs".as("av")), Seq("dst"))
        .agg(sum(size(array_intersect($"au", $"av"))).as("n_triangles"))))
    time("wedges from adjacency sizes")(noop(
      adjCk.agg(sum(expr("size(nbrs) * (size(nbrs) - 1) / 2")).as("n_wedges"))))
    println(s"[q77] full query:")
    time("q77Triangles end-to-end")(noop(GraphQueries.q77Triangles(spark, dir)))
    spark.stop()
  }
}
