package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for data-layout clustering.
  *
  * Interleaves the low `bits` bits of two non-negative dimensions into a
  * single long: bit i of x lands at position 2i, bit i of y at 2i+1.
  * Rows close in (x, y) are close in z, so range-partitioning + sorting
  * the WRITE by the z key co-locates 2-D neighborhoods into the same
  * files/partitions — a 2-D box predicate then touches only the few
  * z-ranges that intersect the box (file skipping / partition pruning),
  * where a single-column sort would cluster one dimension and scatter
  * the other.
  *
  * Built by COMPOSITION of shift/mask/multiply built-ins — a static
  * 2·bits-term expression tree, fully whole-stage-codegen'd; no custom
  * Expression needed (the prompt's preference ladder, tier a). The same
  * loop emits the SQL mirror so the oracle is arithmetic-identical.
  */
object Zorder {

  /** Morton key of two non-negative int/long columns, `bits` bits each
    * (result has 2·bits significant bits; bits ≤ 31). */
  def key(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)),
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }
    terms.reduce(_ + _)
  }

  /** SQL mirror of [[key]] — the identical term-by-term arithmetic, for
    * DuckDB oracles (both dialects share `>>`, `&`, `*`, `+`). */
  def keySql(x: String, y: String, bits: Int): String = {
    require(bits > 0 && bits <= 31)
    (0 until bits).flatMap { i =>
      Seq(
        s"((($x) >> $i) & 1) * ${1L << (2 * i)}",
        s"((($y) >> $i) & 1) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")
  }

  /** Reference interleave for specs (bit-by-bit, no arithmetic tricks). */
  def reference(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
