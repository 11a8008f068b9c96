package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Engine-portable, order-independent aggregates over double columns.
  *
  * A plain `sum(double)` is evaluated in partition/merge order, so two
  * engines (or two runs with different partitioning) can disagree in the
  * last few ulps. For oracle-hash parity (and run-to-run determinism at any
  * cluster size) we instead cast each VALUE to an exact DECIMAL(18,4),
  * sum exactly (order-independent), and cast the final total back to
  * double. DuckDB mirror:
  *   CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
  *
  * The per-value decimal quantization (4 fractional digits) is itself
  * deterministic: both engines round the same IEEE double to the same
  * decimal. Inputs here are money/quantity-like values with <= 2 real
  * fractional digits, so no information is lost.
  */
object Exact {
  private val Dec = DecimalType(18, 4)

  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** The cast half of [[dsum]], for pre-projecting BELOW an Expand
    * (grouping sets evaluate agg inputs once per grouping set per row;
    * pre-casting does the decimal conversion once per source row).
    * `dsumPre(decCol(x)) == dsum(x)` exactly. */
  def decCol(c: Column): Column = c.cast(Dec)
  def dsumPre(c: Column): Column = sum(c).cast("double")

  /** Exact sum of an elementwise product of two double columns. */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(Dec) * b.cast(Dec)).cast("double")

  /** Exact mean of a double column (exact sum / count), as double. */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast("double") / count(c)

  /** SQL fragment mirrors, for building DuckDB oracle text.
    *
    * The decimal→double cast goes THROUGH a VARCHAR: DuckDB's direct
    * decimal→double conversion can be 1 ulp off the correctly-rounded
    * value (observed at sf0.1: 4883105738.0862 vs ...086201), while its
    * string→double parse is correctly rounded — matching Spark's
    * BigDecimal.doubleValue. */
  private def decToDouble(sum: String): String =
    s"CAST(CAST($sum AS VARCHAR) AS DOUBLE)"
  def sqlDsum(x: String): String =
    decToDouble(s"SUM(CAST($x AS DECIMAL(18,4)))")
  def sqlDsumProd(a: String, b: String): String =
    decToDouble(s"SUM(CAST($a AS DECIMAL(18,4)) * CAST($b AS DECIMAL(18,4)))")
  def sqlDavg(x: String): String =
    decToDouble(s"SUM(CAST($x AS DECIMAL(18,4)))") + s" / COUNT($x)"
}
