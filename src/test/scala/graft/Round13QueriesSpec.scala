package graft

import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, TextQueries}

/** Round-13 operator pins: q151 streaming-gate batch dual, q153
  * continuous-score GK gate. */
class Round13QueriesSpec extends SparkSuite {
  import spark.implicits._

  test("q151: hits bounded by NumBands; matches precede; q26 pairs flagged") {
    val out = DedupQueries.q151AdmissionGate(spark, sf0001).collect()
    val byId = out.map(r => r.getLong(0) ->
      ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out.nonEmpty)
    byId.foreach { case (id, (hits, m, cand)) =>
      assert(hits >= 0 && hits <= DedupQueries.NumBands)
      assert(cand == (hits > 0))
      if (hits > 0) assert(m >= 0 && m < id,
        s"first_match must be an earlier doc: doc=$id match=$m")
    }
    // every q26 VERIFIED pair shares a band, so the later member is
    // gated (banding recall 1.0 on caught pairs — the stream contract)
    val pairs = DedupQueries.q26MinhashPairs(spark, sf0001).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val later = math.max(r.getLong(0), r.getLong(1))
      assert(byId(later)._3, s"pair later member $later must be a candidate")
    }
  }

  test("q153 divergence fixture: low-accuracy sketch threshold diverges from " +
      "the exact quantile yet stays within its rank guarantee") {
    // 1000 distinct float scores per source — the unbounded-domain case
    // q149's exact machinery cannot aggregate; deterministic spread
    val rows = for {
      src <- Seq("a", "b"); i <- 1 to 1000
    } yield (src, i.toDouble + (if (src == "a") 0.25 else 0.5) + i * 1e-4)
    val scored = rows.toDF("source", "score")
    val acc = 10 // rank error up to n/10 — forces visible divergence
    val out = TextQueries.gkGateCore(spark, scored, acc)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.keySet == Set("a", "b"))
    out.foreach { case (src, (n, p25, kept, ok)) =>
      assert(n == 1000L)
      // exact rank-250 value of this source's sorted scores
      val sorted = rows.filter(_._1 == src).map(_._2).sorted
      assert(p25 == sorted(249), s"$src: exact quantile must be rank ⌈n/4⌉")
      assert(kept == 751L) // all distinct => n − 249 keep
      assert(ok, s"$src: GK rank guarantee must hold at acc=$acc")
    }
    // the sketch threshold itself must DIVERGE from exact somewhere at
    // this accuracy on at least one source (else the fixture is vacuous)
    val thrs = scored.localCheckpoint(false).groupBy($"source")
      .agg(percentile_approx($"score", lit(0.25), lit(acc)).as("t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Map(
      "a" -> rows.filter(_._1 == "a").map(_._2).sorted.apply(249),
      "b" -> rows.filter(_._1 == "b").map(_._2).sorted.apply(249))
    assert(thrs.exists { case (s0, t) => t != exact(s0) },
      s"fixture must exhibit sketch-vs-exact divergence: $thrs vs $exact")
  }

  test("q153 named query: verdicts uniformly true on the corpus; " +
      "keep fraction is at least 1 - q/100 per source") {
    val out = TextQueries.q153GkGate(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, kept, ok) = (r.getLong(1), r.getLong(3), r.getBoolean(4))
      assert(ok, s"${r.getString(0)}: rank guarantee failed")
      // exact-threshold keep: ties at the threshold are kept, so at
      // least (100 - GkGateQ)% of every source survives
      assert(kept * 100L >= n * (100L - TextQueries.GkGateQ),
        s"${r.getString(0)}: kept=$kept of $n")
    }
  }
}
