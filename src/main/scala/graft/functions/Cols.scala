package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level let-binding.
  *
  * Spark evaluates higher-order-function lambdas per array element and
  * performs no common-subexpression elimination inside them: a Column
  * expression referenced N times in a lambda body is spliced — and
  * re-evaluated — N times per element. `bind` materializes a value ONCE
  * per row by wrapping it in a single-element array and binding it to a
  * real lambda variable; the body then references the variable, which is
  * a cheap slot read.
  *
  * Turns O(rows × elements × cost(expr)) into O(rows × cost(expr)) for
  * any HOF chain over a derived array — the difference between a scan
  * that shingles 100 TB once and one that re-tokenizes every document
  * per shingle.
  */
object Cols {
  /** let x = value in body(x) — value evaluated once per row. */
  def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), x => body(x)), 1)
}
