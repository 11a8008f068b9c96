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
