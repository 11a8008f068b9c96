package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialization helpers for iterative workloads. */
object Materialize {

  /** `localCheckpoint()` that PRESERVES the frame's hash partitioning.
    *
    * Under AQE, `Dataset.localCheckpoint` captures the adaptive plan's
    * `outputPartitioning` before the final stage layout is surfaced, so
    * the resulting LogicalRDD reports `UnknownPartitioning` and every
    * downstream join/agg on the partition key re-plants an exchange —
    * exactly the per-iteration edge re-shuffle this helper exists to
    * avoid. The materialization therefore runs with AQE off: the frames
    * checkpointed here end in an EXPLICIT keyed repartition, the one
    * exchange shape AQE could only disturb (coalescing it would change
    * the partitioning it exists to pin).
    *
    * The conf flip is scoped and restored; queries run sequentially in
    * a session, and the checkpoint is eager so the window covers exactly
    * this materialization.
    */
  def checkpointPartitioned(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    val prev = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try df.localCheckpoint()
    finally conf.set("spark.sql.adaptive.enabled", prev)
  }
}
