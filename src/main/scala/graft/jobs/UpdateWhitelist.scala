package graft.jobs

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.JsonArtifact

/** Q5 — taar_update_whitelist: editorial shortlist = validity filter →
  * distinct → sort → count guard → artifact
  * (taar_update_whitelist.py:44-90; SURVEY.md F9/A4/O1/F12). */
object UpdateWhitelist {

  val MinCount = 100

  class ShortWhitelistError(n: Int, min: Int)
    extends RuntimeException(s"whitelist too short: $n < $min")

  /** F9 + A4 + O1: valid guids, distinct, lexicographically sorted. */
  def transform(editorial: DataFrame, guidCol: String = "guid"): DataFrame =
    editorial
      .select(col(guidCol).as("guid"))
      .where(col("guid").isNotNull && !col("guid").isin("null", ""))
      .distinct()
      .orderBy("guid")

  /** Full job with the F12 floor guard (allowShort mirrors
    * `--allow-shortlist`, taar_update_whitelist.py:70-73) and the
    * OPT-IN remote liveness probe (F11, mirrors `--validate-guids`,
    * taar_update_whitelist.py:64-67): when `probe` is set, only guids it
    * accepts survive — executor-side fan-out, probe failures = dead. */
  def run(editorial: DataFrame, prefix: String, asOf: LocalDate,
      allowShort: Boolean = false, guidCol: String = "guid",
      probe: Option[String => Boolean] = None): DataFrame = {
    val valid = transform(editorial, guidCol)
    val result = probe match {
      case Some(p) =>
        graft.operators.Liveness.filterLiveDf(valid, "guid", p).orderBy("guid")
      case None => valid
    }
    val n = result.count()
    if (n < MinCount && !allowShort) throw new ShortWhitelistError(n.toInt, MinCount)
    JsonArtifact.writeRows(result, prefix, "only_guids_top_200.json", asOf)
    result
  }
}
