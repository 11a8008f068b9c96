package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared guards for the incremental ingest paths ([[OccIngest]] /
  * [[CodesIngest]] / [[RotIngest]]). */
object IngestGuards {

  /** Intra-batch dedup with a CONFLICT fail-fast (ADVICE r14): a dirty
    * export repeating an id would pass the stored-table anti-join twice
    * and break merged ≡ full re-ingest, so duplicated ids are merged —
    * but only when every copy carries the SAME payload. Conflicting
    * payloads under one id are unresolvable (whichever copy the corpus
    * dir holds, a silent max-merge risks picking the other one and
    * breaking the re-ingest equivalence without any signal), so they
    * fail fast with the offending ids named.
    *
    * Returns the merged (id, payload) frame, EAGERLY checkpointed —
    * batch-sized, and the caller's anti-join/encode pipeline consumes
    * it at least twice. */
  private[jobs] def dedupBatch(df: DataFrame, id: String,
      payload: String): DataFrame = {
    val merged = df.select(col(id), col(payload))
      .groupBy(col(id))
      .agg(max(col(payload)).as(payload),
        countDistinct(col(payload)).as("__np"))
      .localCheckpoint(true)
    val bad = merged.where(col("__np") > 1L).select(col(id)).take(3)
    require(bad.isEmpty,
      s"conflicting intra-batch payloads: $id in " +
        s"{${bad.map(_.get(0)).mkString(", ")}, ...} carries more than one " +
        s"distinct $payload — a duplicated id must repeat ONE payload, or " +
        "merged-vs-full-re-ingest equivalence breaks silently")
    merged.drop("__np")
  }
}
