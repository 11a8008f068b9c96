package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Round-14 additions beyond the verdict asks: q158 CCNet-style
  * per-language quality buckets (exact tercile partitioning). */
class Round14QueriesSpec extends SparkSuite {
  import spark.implicits._

  test("q158 fixture: exact tercile cuts with tie-to-upper boundary " +
      "semantics; a constant-score language has a legitimately empty " +
      "middle (both cuts coincide)") {
    val scored = (
      (1L to 6L).map(i => ("en", i)) ++           // scores 1..6
      Seq.fill(5)(("zz", 7L))                      // constant skew
    ).toDF("lang", "score")
    val out = TextQueries.ccnetBucketsCore(spark, scored).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    // en: n=6, thr_low = rank-⌈6/3⌉ value = 2, thr_high = rank-⌈12/3⌉
    // value = 4; tail {1}, middle {2,3}, head {4,5,6}
    assert(out("en") == Seq(6L, 2L, 4L, 1L, 2L, 3L))
    // zz: both cuts land on the constant → tail 0, middle 0, head all
    assert(out("zz") == Seq(5L, 7L, 7L, 0L, 0L, 5L))
  }

  test("q159 identity: with target == raw every smoothed ratio is exactly " +
      "1.0 (ct=cr, nt=nr cancel), so every doc weighs 1.0 and keeps") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang", $"text")
    val out = TextQueries.dsirCore(spark, docs, lit(true)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(2) == 1.0 && r.getBoolean(3),
        s"doc ${r.getLong(0)}: target==raw must weigh exactly 1.0")
    }
  }

  test("q159 corpus: target-slice docs skew heavier than the complement " +
      "(the learned ratio actually separates); weights positive") {
    val rows = TextQueries.q159DsirWeights(spark, sf0001).collect()
    val langs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.forall(_.getDouble(2) > 0.0))
    val (en, rest) = rows.partition(r => langs(r.getLong(0)) == "en")
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getDouble(2)).sum / rs.length
    assert(en.nonEmpty && rest.nonEmpty)
    assert(mean(en) > mean(rest),
      s"target mean ${mean(en)} must exceed raw-complement mean ${mean(rest)}")
  }

  test("q158 corpus: buckets partition every language exactly") {
    val rows = TextQueries.q158CcnetBuckets(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(n, _, _, tail, mid, head) =
        r.toSeq.tail.map(_.asInstanceOf[Long])
      assert(tail + mid + head == n,
        s"${r.getString(0)}: buckets must partition the language")
      assert(head >= n / 3,
        s"${r.getString(0)}: tie-to-upper semantics make head >= n/3")
    }
  }
}
