package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** F11 — remote-liveness validation (taar_update_whitelist.py:51-54,
  * 64-67: per-guid HTTP 200 probe, opt-in via --validate-guids).
  *
  * This is I/O, not relational algebra: the probe runs where the data is.
  * For small key sets (the editorial shortlist, ~200 guids) a driver-side
  * loop matches the reference; for large sets the same probe function
  * runs inside mapPartitions so the HTTP fan-out scales with executors.
  * The probe is injected (`String => Boolean`) — tests use predicates,
  * production supplies an HTTP HEAD/GET with its own timeout (X5).
  */
object Liveness {

  /** Driver-side probe (reference behavior; keys must be small). */
  def filterLiveDriverSide(guids: Seq[String], probe: String => Boolean): Seq[String] =
    guids.filter(probe)

  /** Distributed probe: same semantics, executor-side fan-out. The probe
    * must be serializable and self-contained (construct clients inside). */
  def filterLive(guids: Dataset[String], probe: String => Boolean): Dataset[String] = {
    import guids.sparkSession.implicits._
    guids.mapPartitions { it =>
      // per-partition client init would go here
      it.filter(probe)
    }
  }

  /** The production probe (F9/F11 + X5): GET of the per-key URL
    * (`{guid}` replaced, URL-encoded) returns 2xx within `timeoutMs`.
    * Serializable: the shared HTTP client lives per-JVM in
    * graft.sources.Http, so this closure captures only two strings. */
  def httpProbe(urlTemplate: String, timeoutMs: Int): String => Boolean =
    guid => graft.sources.Http.ok(
      urlTemplate.replace("{guid}",
        java.net.URLEncoder.encode(guid, java.nio.charset.StandardCharsets.UTF_8)),
      timeoutMs)

  def filterLiveDf(df: DataFrame, guidCol: String, probe: String => Boolean): DataFrame = {
    import df.sparkSession.implicits._
    val live = filterLive(df.select(guidCol).as[String], probe)
    df.join(live.toDF(guidCol), Seq(guidCol), "left_semi")
  }
}
