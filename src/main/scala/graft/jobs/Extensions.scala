package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.11 — the declared-only PySpark jobs (README.md:94-113), as generic
  * reusable operators (the testdata-bound instances are
  * RelationalQueries q08/q09). */

/** taar_locale — top-k addons per locale (README.md:102-105). */
object LocaleTopK {
  def transform(installs: DataFrame, localeCol: String, guidCol: String,
      k: Int = 10): DataFrame = {
    val counts = installs.groupBy(col(localeCol), col(guidCol))
      .agg(count(lit(1)).as("n_installs"))
    val w = Window.partitionBy(col(localeCol))
      .orderBy(col("n_installs").desc, col(guidCol).asc)
    counts.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}

/** taar_lite — pairwise guid coinstallation counts (README.md:108-113):
  * distinct (client, guid), self-join on client with guid_a < guid_b,
  * count per pair.
  *
  * Scale: the distinct projection is the only pass over the raw events;
  * the self-join shuffles on client. Heavy-hitter clients (thousands of
  * addons) would square — `maxPerClient` caps the contribution per client
  * (standard pair-mining guard); AQE skew-join handles residual skew. */
object Coinstall {
  def transform(clientAddons: DataFrame, clientCol: String, guidCol: String,
      maxPerClient: Int = 200): DataFrame = {
    val ca = clientAddons.select(col(clientCol).as("client"), col(guidCol).as("guid"))
      .distinct()
    val capped = ca
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("client"))))
      .where(col("n") <= maxPerClient)
      .drop("n")
    capped.as("a").join(capped.as("b"),
        col("a.client") === col("b.client") && col("a.guid") < col("b.guid"))
      .groupBy(col("a.guid").as("guid_a"), col("b.guid").as("guid_b"))
      .agg(count(lit(1)).as("n_clients"))
  }

  /** Salted variant for skewed PAIR distributions: when a handful of
    * guid pairs dominate (power-law popularity), the final pair-count
    * groupBy concentrates on few reducers. Salting splits each pair's
    * count across `salts` sub-keys (random-ish salt from the client id —
    * deterministic, no rand()), aggregates, then merges the sub-counts:
    * two short shuffles instead of one hot one. Results are identical to
    * the unsalted transform (proven in ExtensionsSpec). */
  def transformSalted(clientAddons: DataFrame, clientCol: String, guidCol: String,
      maxPerClient: Int = 200, salts: Int = 8): DataFrame = {
    val ca = clientAddons.select(col(clientCol).as("client"), col(guidCol).as("guid"))
      .distinct()
    val capped = ca
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("client"))))
      .where(col("n") <= maxPerClient)
      .drop("n")
    val salted = capped.withColumn("salt", pmod(hash(col("client")), lit(salts)))
    salted.as("a").join(salted.as("b"),
        col("a.client") === col("b.client") && col("a.guid") < col("b.guid"))
      .groupBy(col("a.guid").as("guid_a"), col("b.guid").as("guid_b"), col("a.salt").as("salt"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("guid_a"), col("guid_b"))
      .agg(sum(col("c")).as("n_clients"))
  }

  /** [[transformSalted]] with the salt factor chosen by the q163 skew
    * audit instead of a hand guess (VERDICT r15 item 4 — the audit's
    * recommendation used to dead-end in a report). The audited key is
    * the guid popularity of the capped (client, guid) projection: a hot
    * pair's count is bounded by its hotter guid's count, so the guid
    * audit's ⌈skew⌉ is the fan-out that levels the pair-count shuffle.
    * Costs one extra count-aggregation diagnosis pass; results are
    * identical to [[transform]] at ANY salt (ExtensionsSpec pins
    * audit-chosen ≡ hand-chosen ≡ unsalted on a hot-guid fixture). */
  def transformAutoSalted(clientAddons: DataFrame, clientCol: String,
      guidCol: String, maxPerClient: Int = 200): DataFrame = {
    val ca = clientAddons
      .select(col(clientCol).as("client"), col(guidCol).as("guid")).distinct()
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("client"))))
      .where(col("n") <= maxPerClient)
    val salt = graft.operators.SkewAudit.recommendedSalt(ca, "guid")
    transformSalted(clientAddons, clientCol, guidCol, maxPerClient, salt)
  }
}
