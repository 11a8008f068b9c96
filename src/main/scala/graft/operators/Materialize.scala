package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.GraftShim

/** Materialization helpers for iterative workloads. */
object Materialize {

  /** One AQE-off companion session per user session, created lazily.
    * `newSession()` shares the SparkContext (and our extensions) but has
    * an ISOLATED SQLConf, so planning a checkpoint there cannot race
    * with — or be observed by — queries planned concurrently in the
    * user's session (the round-4 conf-flip hazard). The companion's conf
    * never changes after creation, so the map itself is the only shared
    * state and ConcurrentHashMap makes its population atomic. */
  private val planners = new ConcurrentHashMap[SparkSession, SparkSession]()

  private def noAqeSession(spark: SparkSession): SparkSession =
    planners.computeIfAbsent(spark, (s: SparkSession) => {
      val ns = s.newSession()
      ns.conf.set("spark.sql.adaptive.enabled", "false")
      ns
    })

  /** `localCheckpoint()` that PRESERVES the frame's hash partitioning.
    *
    * Under AQE, `Dataset.localCheckpoint` captures the adaptive plan's
    * `outputPartitioning` before the final stage layout is surfaced, so
    * the resulting LogicalRDD reports `UnknownPartitioning` and every
    * downstream join/agg on the partition key re-plants an exchange —
    * exactly the per-iteration edge re-shuffle this helper exists to
    * avoid. The checkpoint is therefore PLANNED in the AQE-off companion
    * session (the frames checkpointed here end in an explicit keyed
    * repartition, the one exchange shape AQE could only disturb), and the
    * resulting LogicalRDD — now carrying the true HashPartitioning — is
    * re-wrapped into the caller's session. The analyzed plan re-executes
    * identically: it is fully resolved, so no catalog/temp-function state
    * from the original session is consulted.
    *
    * `eager = false` still truncates lineage per call (the many-iteration
    * requirement) but folds materialization into the next action instead
    * of costing a dedicated job; with AQE off the partitioning is known
    * statically, so laziness does not cost the partitioning capture. */
  def checkpointPartitioned(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val ckpt = GraftShim.ofRows(noAqeSession(spark), df.queryExecution.analyzed)
      .localCheckpoint(eager)
    GraftShim.ofRows(spark, ckpt.queryExecution.analyzed)
  }
}
