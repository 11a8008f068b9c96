package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right-side state at
  * or before the left row's timestamp (per key). The classic operator
  * Spark lacks natively — composed here from built-ins per the
  * preference order (a): union the two sides tagged, sort within key,
  * carry the last seen state forward with `last(ignoreNulls)`, keep the
  * left rows.
  *
  * Scale: ONE shuffle on the key (the window partition). No range
  * self-join, no per-row binary search — the sort-within-partition is
  * O(n log n) per key group and spills. Compare: the naive
  * `l JOIN r ON key AND r.ts <= l.ts` + max-window approach shuffles the
  * cross product of matching pairs; this shuffles each row once.
  *
  * Tie semantics: a right row AT the left timestamp matches ("at or
  * before" inclusive) — right rows sort before left rows at equal ts.
  */
object AsOfJoin {

  /** @param left      event side
    * @param right     state side
    * @param key       join key column name (same name both sides)
    * @param leftTs    left timestamp column
    * @param rightTs   right timestamp column
    * @param stateCols right-side payload columns to carry
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, stateCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    require(stateCols.intersect(leftCols).isEmpty,
      s"state columns collide with left columns: ${stateCols.intersect(leftCols).mkString(", ")}")
    // NOTE: among right rows with IDENTICAL (key, ts) the carried state is
    // frame-order dependent — make rightTs unique per key for determinism
    // (DuckDB's ASOF JOIN has the same ambiguity).
    // tag: 0 = state (sorts first at equal ts → inclusive), 1 = event
    val l = left.select(
      (col(key).as("__k") +: col(leftTs).as("__ts") +: lit(1).as("__tag") +:
        leftCols.filterNot(_ == key).map(c => col(c)) ++:
        stateCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__s_$c"))): _*)
    val r = right.select(
      (col(key).as("__k") +: col(rightTs).cast(left.schema(leftTs).dataType).as("__ts") +:
        lit(0).as("__tag") +:
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        stateCols.map(c => col(c).as(s"__s_$c"))): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .select(col("*") +: stateCols.map(c =>
        last(col(s"__s_$c"), ignoreNulls = true).over(w).as(c)): _*)
    carried.where(col("__tag") === 1)
      .select(col("__k").as(key) +: col("__ts").as(leftTs) +:
        (leftCols.filterNot(c => c == key || c == leftTs).map(col) ++
          stateCols.map(col)): _*)
  }
}
