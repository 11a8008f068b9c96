package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents
import graft.queries.DedupQueries

/** The alternating large-star/small-star connected components operator:
  * label equality with min-label propagation, and the round-count claim
  * that justifies its existence (O(log² n) rounds on a long path, where
  * min-label needs O(diameter)). */
class StarCcSpec extends SparkSuite {
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star CC == min-label propagation on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 400)
      .map(_ => (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
      .toDF("a", "b")
      // parquet-free but that's fine: CC takes any DataFrame
    val star = labelsOf(ConnectedComponents.componentsStar(edges, "a", "b"))
    val prop = labelsOf(ConnectedComponents.components(edges, "a", "b"))
    assert(star == prop)
    assert(star.nonEmpty)
  }

  test("star CC contracts a 512-node path where min-label propagation cannot") {
    // path 0-1-2-...-511: diameter 511. Min-label moves the 0 label one
    // hop per round — at maxIter=20 it is nowhere near converged. The
    // star rounds contract doubly-logarithmically.
    val path = (0L until 511L).map(i => (i, i + 1)).toDF("a", "b")
    val star = labelsOf(ConnectedComponents.componentsStar(path, "a", "b", maxIter = 12))
    assert(star.size == 512)
    assert(star.values.toSet == Set(0L), "every node must label to the path head")

    val prop = labelsOf(ConnectedComponents.components(path, "a", "b", maxIter = 20))
    assert(prop.values.toSet != Set(0L),
      "min-label at 20 rounds should NOT have finished a 511-diameter path " +
        "(if it did, this spec's premise is wrong)")
  }

  test("star CC matches the q49 clustering on the real LSH pair graph") {
    val pairs = DedupQueries.q26MinhashPairs(spark, sf0001).select($"doc_a", $"doc_b")
      .localCheckpoint(true)
    val star = labelsOf(ConnectedComponents.componentsStar(pairs, "doc_a", "doc_b"))
    val prop = labelsOf(ConnectedComponents.components(pairs, "doc_a", "doc_b"))
    assert(star == prop)
  }
}
