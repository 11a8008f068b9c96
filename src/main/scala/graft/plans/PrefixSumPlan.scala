package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** PREFIX SUM as a first-class Catalyst operator — the full custom-plan
  * tier: logical node + planner strategy + physical exec, installed via
  * `SparkSessionExtensions.injectPlannerStrategy` (see
  * [[graft.GraftExtensions]]).
  *
  * Semantics: append `outAttr` = exclusive running sum of `value` in
  * ascending `order` order (ties resolved arbitrarily but the SUM of any
  * equal-key run is order-independent, so totals are deterministic; use a
  * unique key for fully deterministic per-row offsets).
  *
  * Why a custom operator instead of `sum().over(Window.orderBy(...))`:
  * the unpartitioned window collapses the dataset into ONE task. Here the
  * physical node declares `requiredChildDistribution =
  * OrderedDistribution`, so ENSUREREQUIREMENTS plants the same
  * range-partition + per-partition sort a global orderBy uses — fully
  * parallel — and the exec stitches partitions together with a two-pass
  * scan (per-partition totals → exclusive offsets → map-side running
  * sum). The totals pass is a KB-sized driver collect at any data scale.
  */
case class PrefixSumNode(
    order: Expression,
    value: Expression,
    outAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): PrefixSumNode =
    copy(child = newChild)
}

/** Plans [[PrefixSumNode]] to [[PrefixSumExec]]. Injected by
  * [[graft.GraftExtensions]]; inert for every other plan shape. */
object PrefixSumStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PrefixSumNode(order, value, outAttr, child) =>
      PrefixSumExec(order, value, outAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class PrefixSumExec(
    order: Expression,
    value: Expression,
    outAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr :: Nil)

  // EnsureRequirements turns these into RangePartitioning + SortExec —
  // the identical machinery a global orderBy plants, nothing hand-rolled.
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(SortOrder(order, Ascending) :: Nil) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(order, Ascending) :: Nil)

  // the scan preserves both the range partitioning and the sort order
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childRdd = child.execute()
    val boundValue = BindReferences.bindReference(value, child.output)

    // pass 1: per-partition totals. Order-independent, so re-running the
    // child's partition sort for pass 2 cannot skew results. The shuffle
    // files below the sort are written once and re-read; cache the child
    // instead if its sort ever dominates the two passes.
    val totals = childRdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach { r =>
          val v = boundValue.eval(r)
          if (v != null) s += v.asInstanceOf[Long]
        }
        Iterator.single((pid, s))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    val bc = sparkContext.broadcast(offsets)

    // pass 2: map-side running sum seeded by this partition's offset
    childRdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(output, child.output :+ outAttr)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      var run = bc.value(pid)
      it.map { r =>
        extra.setLong(0, run)
        val v = boundValue.eval(r)
        if (v != null) run += v.asInstanceOf[Long]
        proj(joined(r, extra))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PrefixSumExec =
    copy(child = newChild)
}

object PrefixSumPlan {

  /** Appends `outCol` = exclusive running sum of the long column
    * `valueCol` in ascending `orderCol` order, as a [[PrefixSumNode]] on
    * the DataFrame's analyzed plan. Requires [[graft.GraftExtensions]]
    * installed (the strategy must be present at planning time). */
  def scan(df: DataFrame, orderCol: String, valueCol: String, outCol: String): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    val order = analyzed.output.find(_.name == orderCol)
      .getOrElse(throw new IllegalArgumentException(s"no column $orderCol"))
    val value = analyzed.output.find(_.name == valueCol)
      .getOrElse(throw new IllegalArgumentException(s"no column $valueCol"))
    require(value.dataType == LongType, s"$valueCol must be LONG, is ${value.dataType}")
    val out = AttributeReference(outCol, LongType, nullable = false)()
    org.apache.spark.sql.graft.GraftShim.ofRows(
      df.sparkSession, PrefixSumNode(order, value, out, analyzed))
  }
}
