package graft

import graft.queries.EtlQueries

/** q115 theta-sketch semantics on CONSTRUCTED sets (the oracle pins the
  * corpus values; these pin the sketch CONTRACT). */
class ThetaSketchSpec extends SparkSuite {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect()
    assert(r.length == 1)
    r(0)
  }

  test("exact mode: sets below K estimate EXACTLY (θ stays at the domain bound)") {
    // |A|=10, |B|=8, |A∩B|=4 — all far below K=64, so every retained set
    // is the full set and est == exact for every expression
    val users = ((0 until 10).map(i => ("a", i.toLong)) ++
      (6 until 14).map(i => ("b", i.toLong))).toDF("event_type", "user_id")
    val r = row(EtlQueries.thetaCore(spark, users))
    assert(r.getAs[Long]("n_a") == 10 && r.getAs[Long]("n_b") == 8)
    assert(r.getAs[Long]("n_common") == 4)
    assert(r.getAs[Double]("est_a") == 10.0)
    assert(r.getAs[Double]("est_b") == 8.0)
    assert(r.getAs[Double]("est_union") == 14.0)
    assert(r.getAs[Double]("est_inter") == 4.0)
  }

  test("estimator mode: K=64 sketch lands within ±40% on 500-element sets") {
    // |A|=500, |B|=500, overlap 100 (ids 400..499 shared)
    val users = ((0 until 500).map(i => ("a", i.toLong)) ++
      (400 until 900).map(i => ("b", i.toLong))).toDF("event_type", "user_id")
    val r = row(EtlQueries.thetaCore(spark, users))
    assert(r.getAs[Long]("n_common") == 100)
    def within(est: Double, truth: Double, tol: Double): Unit =
      assert(math.abs(est - truth) <= tol * truth,
        s"est $est vs truth $truth beyond ±${tol * 100}%")
    within(r.getAs[Double]("est_a"), 500.0, 0.40)
    within(r.getAs[Double]("est_b"), 500.0, 0.40)
    within(r.getAs[Double]("est_union"), 900.0, 0.40)
    // intersection is the noisiest theta expression (few retained hits
    // below the pairwise θ) — a loose sanity band, not a precision claim
    within(r.getAs[Double]("est_inter"), 100.0, 0.75)
  }

  test("disjoint estimator-mode sets report est_inter == 0") {
    val users = ((0 until 300).map(i => ("a", i.toLong)) ++
      (1000 until 1300).map(i => ("b", i.toLong))).toDF("event_type", "user_id")
    val r = row(EtlQueries.thetaCore(spark, users))
    assert(r.getAs[Long]("n_common") == 0)
    assert(r.getAs[Double]("est_inter") == 0.0)
  }
}
