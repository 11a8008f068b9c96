package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-key skew audit — the q163 arithmetic as a reusable operator, and
  * the AUTO-SALT hook that closes the loop from diagnosis to remedy
  * (VERDICT r15 item 4: the recommendation used to dead-end in a
  * report; now the salted operators can take it as their salt factor).
  *
  * Single-sourcing: [[graft.queries.RelationalQueries.skewAuditOne]]
  * (the oracle-checked q163 face) delegates here verbatim, so the audit
  * a production job consults and the audit the correctness gate checks
  * are one implementation.
  *
  * Scale: one map-side-combined count aggregation over the audited
  * frame (the same shuffle the production join would pay, minus the
  * payload), then everything is domain-sized — count-of-counts, a KB
  * window, a 1-row broadcast. The 1-row collect in
  * [[recommendedSalt]] follows the audit's own driver-side convention
  * (a diagnosis step, not a per-row operator). */
object SkewAudit {

  /** One (table, key) audit row: exact per-key count distribution
    * statistics from the count-of-counts DOMAIN — rows, keys, hottest
    * count, exact p50/p99, skew = max·keys/rows, and the recommended
    * salt ⌈skew⌉ (errs high on purpose: salt 2 on a uniform key is
    * harmless; an unsalted hot key is not). */
  def auditOne(s: SparkSession, df: DataFrame, table: String,
      key: String): DataFrame = {
    import s.implicits._
    val per = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
    // the KB-sized count-of-counts domain is checkpointed so the
    // quantile window and the totals row both read it — otherwise each
    // branch re-runs the full per-key count over the table
    val cc = per.groupBy($"c").agg(count(lit(1)).as("nk")).localCheckpoint(true)
    // exact p50/p99 of the per-key row count: prefix ranks over the
    // count-of-counts domain (the q149/q158 exact-rank pattern); the
    // unpartitioned window runs over DOMAIN rows (≤ distinct counts,
    // KB at any corpus size), never over keys
    val cum = cc.withColumn("cum", sum($"nk").over(
      Window.orderBy($"c").rowsBetween(Window.unboundedPreceding, 0)))
    val tot = cc.agg(sum($"nk").as("n_keys"),
      sum($"c" * $"nk").as("n_rows"), max($"c").as("max_cnt"))
    val skew = $"max_cnt".cast("double") * $"n_keys".cast("double") /
      $"n_rows".cast("double")
    cum.crossJoin(broadcast(tot))
      .agg(max($"n_keys").as("n_keys"), max($"n_rows").as("n_rows"),
        max($"max_cnt").as("max_cnt"),
        min(when($"cum" * 100L >= $"n_keys" * 50L, $"c")).as("p50_cnt"),
        min(when($"cum" * 100L >= $"n_keys" * 99L, $"c")).as("p99_cnt"))
      .select(lit(table).as("table_name"), lit(key).as("key_name"),
        $"n_rows", $"n_keys", $"max_cnt", $"p50_cnt", $"p99_cnt",
        skew.as("skew"),
        greatest(lit(1L), ceil(skew).cast("long")).as("salt"))
  }

  /** The audit's remedy hook: the recommended salt factor for a
    * shuffle keyed on `key` of `df`. 1 means "don't salt". Costs one
    * count aggregation over `df` — a diagnosis pass the caller runs
    * once per (frame, key), not per query. */
  def recommendedSalt(df: DataFrame, key: String): Int =
    auditOne(df.sparkSession, df, "audit", key)
      .select(col("salt")).head().getLong(0).toInt
}
