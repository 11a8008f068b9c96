package graft

import graft.jobs.SimilarityJob

class SimilarityJobSpec extends SparkSuite {
  import spark.implicits._

  test("donors: one representative per cluster, closest to its centroid") {
    val emb = Tables.embeddings(spark, sf0001)
    val r = SimilarityJob.transform(emb)
    val donors = r.donors.collect()
    val nLabels = emb.select("label").distinct().count()
    assert(donors.length == nLabels)
    assert(donors.map(_.getInt(0)).distinct.length == nLabels) // one per label
    // donor must belong to its cluster
    val members = emb.select($"label", $"vec_id").as[(Int, Long)].collect()
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).toSet }
    donors.foreach { d =>
      assert(members(d.getInt(0)).contains(d.getLong(1)))
    }
  }

  test("lr_curves: bins partition the sample; ratios finite where both classes present") {
    val r = SimilarityJob.transform(Tables.embeddings(spark, sf0001))
    val rows = r.lrCurves.collect()
    assert(rows.nonEmpty)
    val totalPairs = rows.map(x => x.getLong(1) + x.getLong(2)).sum
    // deterministic 1/4 sample of 500 → 125 vectors → C(125,2) pairs
    assert(totalPairs == 125L * 124 / 2)
    rows.foreach { x =>
      if (x.getLong(2) > 0) { // diff-cluster mass present → finite ratio
        assert(!x.isNullAt(3))
        assert(!x.getDouble(3).isInfinite && x.getDouble(3) >= 0.0)
      } else assert(x.isNullAt(3)) // unbounded → null, not Infinity
    }
  }

  test("artifacts published dual-versioned") {
    val dir = tmpDir("simjob")
    SimilarityJob.run(Tables.embeddings(spark, sf0001), dir,
      java.time.LocalDate.parse("2024-06-01"))
    val files = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(files.contains("donors.json.bz2") && files.contains("donors.json.20240601.bz2"))
    assert(files.contains("lr_curves.json.bz2") && files.contains("lr_curves.json.20240601.bz2"))
  }
}
