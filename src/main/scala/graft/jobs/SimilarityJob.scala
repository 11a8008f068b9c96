package graft.jobs

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.JsonArtifact
import graft.queries.SimilarityQueries.{cosinePre, norm2}

/** §2.11 taar_similarity — the last declared-only artifact pair
  * (README.md:96-100): `donors.json` (representative donor profiles per
  * cluster) and `lr_curves.json` (likelihood-ratio curve: how the odds of
  * "same cluster" change with similarity — the calibration table the
  * recommender uses to turn a similarity into a score).
  *
  * donors: one representative per cluster = the member closest to the
  * cluster's elementwise-mean centroid (single shuffle for centroids,
  * map-side scoring, WindowGroupLimit top-1 per cluster).
  *
  * lr_curves: sample pairs deterministically (mod-filter), bin pairwise
  * cosine into `bins`, and emit P(bin | same cluster) / P(bin | diff
  * cluster) — the empirical likelihood ratio per similarity bin.
  */
object SimilarityJob {

  case class Result(donors: DataFrame, lrCurves: DataFrame)

  def transform(emb: DataFrame, bins: Int = 20, sampleMod: Int = 4): Result = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dim = emb.select(size($"embedding")).as[Int].head()

    // centroids: one shuffle (per-position sums + count)
    val sums = (0 until dim).map(i =>
      sum(element_at($"embedding", i + 1).cast("double")).as(s"s_$i")) :+
      count(lit(1)).as("s_cnt")
    val cents = emb.groupBy($"label")
      .agg(sums.head, sums.tail: _*)
      .select($"label".as("c_label"), array((0 until dim).map(i =>
        col(s"s_$i") / col("s_cnt")): _*).as("centroid"))

    // donor = member closest to its centroid (deterministic tie-break)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"label")
      .orderBy(round(cosinePre($"embedding", $"centroid", $"n2", $"cn2"), 6).desc, $"vec_id".asc)
    val donors = emb
      .withColumn("n2", norm2($"embedding"))
      .join(broadcast(cents.withColumn("cn2", norm2($"centroid"))), $"label" === $"c_label")
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"label", $"vec_id".as("donor_id"),
        round(cosinePre($"embedding", $"centroid", $"n2", $"cn2"), 6).as("centroid_sim"))

    // likelihood-ratio curve from a deterministic pair sample
    val s = emb.where($"vec_id" % sampleMod === 0)
      .select($"vec_id", $"label", $"embedding", norm2($"embedding").as("n2"))
    val pairs = s.as("a").join(s.as("b"), $"a.vec_id" < $"b.vec_id")
      .select(
        (($"a.label" === $"b.label").cast("int")).as("same"),
        least(greatest(floor(
          (cosinePre($"a.embedding", $"b.embedding", $"a.n2", $"b.n2") + 1.0) / 2.0 * bins
        ), lit(0)), lit(bins - 1)).as("bin"))
    val counts = pairs.groupBy($"bin")
      .agg(sum($"same").as("n_same"), sum(lit(1) - $"same").as("n_diff"))
    val totals = counts.agg(sum($"n_same").as("t_same"), sum($"n_diff").as("t_diff")).head()
    val (tSame, tDiff) = (totals.getLong(0).toDouble, totals.getLong(1).toDouble)
    // lr is null (not Infinity) when the bin has no different-cluster
    // mass — unbounded ratio; Infinity would serialize as a JSON string
    val lrCurves = counts
      .select($"bin", $"n_same", $"n_diff",
        when($"n_diff" === 0, lit(null).cast("double"))
          .otherwise(($"n_same" / tSame) / ($"n_diff" / tDiff)).as("lr"))
      .orderBy($"bin")
    Result(donors.orderBy($"label"), lrCurves)
  }

  def run(emb: DataFrame, prefix: String, asOf: LocalDate): Result = {
    val r = transform(emb)
    JsonArtifact.writeRows(r.donors, prefix, "donors.json", asOf)
    JsonArtifact.writeRows(r.lrCurves, prefix, "lr_curves.json", asOf)
    r
  }
}
