package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** q129: MaxSim late-interaction retrieval — the multi-vector scoring
  * semantics on a constructed fixture (facet coverage must beat a single
  * strong facet) plus shape invariants on the real table. */
class MaxSimSpec extends SparkSuite {
  import spark.implicits._

  /** Fixture: 4-dim one-hot-ish vectors, M=4 per doc. Query doc 0 has
    * one vector per axis e0..e3. Candidate doc 1 covers ALL four axes
    * (cos 1.0 each → MaxSim 4.0); candidate doc 2 is four copies of e0
    * (only the e0 query position matches → MaxSim 1.0). A
    * single-vector scorer pooling the query (mean = uniform) ranks the
    * two candidates EQUAL (both contain the same total mass along the
    * mean direction per best member: cos(mean, e0) identical for every
    * one-hot member) — MaxSim separates them. */
  private def fixture = {
    def v(d: Int): Array[Float] = Array.tabulate(4)(i => if (i == d) 1f else 0f)
    val rows =
      (0L until 4L).map(i => (i, v(i.toInt))) ++ // query doc 0: e0..e3
        (4L until 8L).map(i => (i, v((i - 4).toInt))) ++ // doc 1: all axes
        (8L until 12L).map(i => (i, v(0))) // doc 2: e0 only
    rows.toDF("vec_id", "embedding")
  }

  test("q129 fixture: facet-covering doc outranks the single-facet doc") {
    val out = SimilarityQueries.maxSimCore(spark, fixture)
      .where($"query_doc" === 0L).orderBy($"rn").collect()
    val first = out.head
    assert(first.getLong(1) == 1L, s"doc 1 (covers all facets) must rank first: ${out.toSeq}")
    assert(first.getDouble(2) == 4.0, s"perfect cover scores 4.0: ${first.getDouble(2)}")
    val doc2 = out.find(_.getLong(1) == 2L).get
    assert(doc2.getDouble(2) == 1.0, s"single-facet cover scores 1.0: ${doc2.getDouble(2)}")
  }

  test("q129: self-exclusion, k rows per query doc, deterministic rerun") {
    val a = SimilarityQueries.q129MaxSim(spark, sf0001).collect()
    val byQ = a.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until SimilarityQueries.MaxSimQDocs).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == SimilarityQueries.TopK)
      assert(!rows.exists(_.getLong(1) == q), "a query doc must not retrieve itself")
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to SimilarityQueries.TopK))
    }
    val b = SimilarityQueries.q129MaxSim(spark, sf0001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("q131: corpus-wide member shortlist degenerates to single-stage q129") {
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding")
    val n = emb.count().toInt
    val pruned = SimilarityQueries.plaidCore(spark, emb, n).collect()
    val full = SimilarityQueries.maxSimCore(spark, emb).collect()
    assert(pruned.map(_.toString).sorted.toSeq == full.map(_.toString).sorted.toSeq)
  }

  test("q131: measured recall@5 of the pruned two-stage vs single-stage q129") {
    def ids(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = ids(SimilarityQueries.q129MaxSim(spark, sf0001).collect())
    val pruned = ids(SimilarityQueries.q131MaxSimPruned(spark, sf0001).collect())
    val recall = pruned.count(full.contains).toDouble / full.size
    info(f"q131 recall@5 vs q129: $recall%.3f")
    assert(recall > 0.5, s"two-stage recall too low: $recall")
    assert(pruned.groupBy(_._1).forall(_._2.size == SimilarityQueries.TopK))
  }

  test("q133: pooled vectors are the member means; overlap with MaxSim measured") {
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding")
    // pooled value check: doc 0's pooled[d] = mean of members' dim d
    val members = emb.where($"vec_id" < SimilarityQueries.MaxSimM)
      .orderBy($"vec_id").collect().map(_.getSeq[Float](1).toArray)
    val pooled = SimilarityQueries.pooledDocs(spark, emb)
      .where($"doc" === 0L).collect().head.getSeq[Double](1)
    (0 until SimilarityQueries.EmbDim).foreach { d =>
      val exp = (((members(0)(d).toDouble + members(1)(d).toDouble)
        + members(2)(d).toDouble) + members(3)(d).toDouble) / 4.0
      assert(pooled(d) == exp, s"dim $d: ${pooled(d)} != $exp")
    }
    // ranking-overlap: pooling blurs facets, MaxSim keeps them — the two
    // rankings agree only partially (reported, not asserted tightly)
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_doc", $"doc").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ms = ids(SimilarityQueries.q129MaxSim(spark, sf0001))
    val mp = ids(SimilarityQueries.q133MeanPool(spark, sf0001))
    val overlap = mp.count(ms.contains).toDouble / ms.size
    info(f"q133 pooled top-5 overlap with q129 MaxSim: $overlap%.3f")
    assert(mp.groupBy(_._1).forall(_._2.size == SimilarityQueries.TopK))
  }

  test("q129: score equals hand-computed MaxSim for one (query, doc) pair") {
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = SimilarityQueries.q129MaxSim(spark, sf0001)
      .where($"query_doc" === 0L && $"rn" === 1).collect().head
    val cand = out.getLong(1)
    val m = SimilarityQueries.MaxSimM
    val expected = r6((0 until m).map { qp =>
      (0 until m).map { dp =>
        r6(cos(emb(qp.toLong), emb(cand * m + dp)))
      }.max
    }.reduce(_ + _))
    assert(out.getDouble(2) == expected,
      s"engine score ${out.getDouble(2)} != hand-computed $expected")
  }
}
