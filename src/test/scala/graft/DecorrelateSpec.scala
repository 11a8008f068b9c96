package graft

import org.apache.spark.sql.catalyst.expressions.SubqueryExpression

import graft.queries.RelationalQueries

/** q62's correlated scalar subqueries and EXISTS must be DECORRELATED by
  * Catalyst into aggregate+join plans — a per-row subquery execution would
  * be a driver-side loop in disguise and could never scale. */
class DecorrelateSpec extends SparkSuite {

  private def q62 = RelationalQueries.q62CorrelatedSubq(spark, sf0001)

  test("optimized plan contains no surviving subquery expressions") {
    val optimized = q62.queryExecution.optimizedPlan
    val leftover = optimized.expressions.flatMap(_.collect {
      case s: SubqueryExpression => s
    })
    assert(leftover.isEmpty,
      s"correlated subqueries survived optimization: $leftover")
  }

  test("subqueries became real joins (and the query still answers)") {
    val joins = q62.queryExecution.executedPlan.toString()
    // 2 scalar subqueries + 1 EXISTS → at least 3 join operators of any
    // physical flavor in the executed plan
    val njoins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
      .map(n => joins.sliding(n.length).count(_ == n)).sum
    assert(njoins >= 3, s"expected >=3 joins after decorrelation, plan:\n$joins")
    assert(q62.limit(1).count() === 1)
  }
}
