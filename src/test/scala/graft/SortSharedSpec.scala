package graft

import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

import graft.operators.Materialize

/** Round-18 optimization: [[Materialize.sortShared]] — the final
  * deterministic-output Sort's range exchange samples its child (a full
  * reservoir pass per partition), so the final stage computes twice per
  * action. sortShared lazily localCheckpoints the sort's child so the
  * sample and the shuffle map share one computation. These pin the
  * contract: identical rows in identical order (the oracle-hash
  * invariant), identity on sort-free plans, and the expected plan shape
  * (Sort over a materialized LogicalRDD). */
class SortSharedSpec extends SparkSuite {
  import spark.implicits._

  test("same rows, same order, for column and expression sort keys") {
    // expression key (md5) exercises the attribute-remap path the way
    // q56/q81's hash-rank orderBy does
    val base = spark.range(0, 500).select($"id".as("doc_id"),
      ($"id" % 7).as("grp"))
    for (sorted <- Seq(
        base.orderBy($"doc_id".desc),
        base.orderBy(md5($"doc_id".cast("string")), $"doc_id"),
        base.orderBy($"grp", $"doc_id"))) {
      val shared = Materialize.sortShared(sorted)
      assert(shared.collect().toSeq == sorted.collect().toSeq)
    }
  }

  test("plan shape: Sort stays outermost, child is a materialized RDD") {
    val sorted = spark.range(0, 100).select($"id".as("k")).orderBy($"k")
    val shared = Materialize.sortShared(sorted)
    shared.queryExecution.analyzed match {
      case Sort(order, true, child, _) =>
        assert(order.map(_.child.sql) == Seq("k"))
        assert(child.isInstanceOf[LogicalRDD], child.getClass.toString)
      case p => fail(s"expected Sort on top, got $p")
    }
  }

  test("identity on a plan without a global sort") {
    val df = spark.range(0, 10).agg(sum($"id").as("s"))
    assert(Materialize.sortShared(df) eq df)
    // sortWithinPartitions is a LOCAL sort — not the oracle-output shape,
    // must pass through untouched
    val local = spark.range(0, 10).toDF("id").sortWithinPartitions($"id")
    assert(Materialize.sortShared(local).collect().toSeq ==
      local.collect().toSeq)
  }

  test("a declared query is row- and order-identical through sortShared") {
    val q = SparkEntry.queries("q78_repetition_ratio")
    val plain = q(spark, sf0001).collect().toSeq
    val shared = Materialize.sortShared(q(spark, sf0001)).collect().toSeq
    assert(shared == plain)
  }
}
