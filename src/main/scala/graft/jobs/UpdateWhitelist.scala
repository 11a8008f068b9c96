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
    * `--allow-shortlist`, taar_update_whitelist.py:70-73). */
  def run(editorial: DataFrame, prefix: String, asOf: LocalDate,
      allowShort: Boolean = false, guidCol: String = "guid"): DataFrame = {
    val result = transform(editorial, guidCol)
    val n = result.count()
    if (n < MinCount && !allowShort) throw new ShortWhitelistError(n.toInt, MinCount)
    JsonArtifact.writeRows(result, prefix, "only_guids_top_200.json", asOf)
    result
  }
}
