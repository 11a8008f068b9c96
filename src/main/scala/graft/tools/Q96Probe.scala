package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.EtlQueries
/** Calibration probe for the q96 HLL bound (dev tool): measures the
  * worst relative and absolute estimate error across rollup rows at all
  * SFs, against the LIVE bound constants (EtlQueries.Q96Rsd/Q96AbsSlack
  * — recalibrating q96 automatically recalibrates this probe). Outcome
  * baked into q96: tiny (~5-doc) leaves see single-register collisions
  * (estimate 4 for exact 5 — 20% relative), so the verdict uses
  * max(3·rsd·exact, Q96AbsSlack) absolute slack below the
  * linear-counting regime. */
object Q96Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select($"source", $"lang", md5($"text").as("content"))
      val r = d.rollup($"source", $"lang")
        .agg(count(lit(1)).as("n"),
          approx_count_distinct($"content", EtlQueries.Q96Rsd).as("a"),
          countDistinct($"content").as("e"))
      val worst = r.agg(
        max(abs($"a" - $"e").cast("double") / $"e").as("rel"),
        max(abs($"a" - $"e")).as("abs"),
        sum(when(abs($"a" - $"e").cast("double") >
          greatest(lit(3 * EtlQueries.Q96Rsd) * $"e".cast("double"),
            lit(EtlQueries.Q96AbsSlack)), 1).otherwise(0)).as("viol"))
        .head()
      println(s"[q96probe] $sf worst rel=${worst.getDouble(0)} " +
        s"abs=${worst.getLong(1)} violations(q96 bound)=${worst.getLong(2)}")
    }
    spark.stop()
  }
}
