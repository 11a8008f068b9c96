package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation (the
  * dedup-clustering step: near-dup PAIRS become transitive CLUSTERS, and
  * each cluster's minimum id is its keeper).
  *
  * Each iteration: every node adopts the minimum label among itself and
  * its neighbors; stop when nothing changes. Converges to the unique
  * fixpoint (min node id per component) in O(diameter) iterations —
  * deterministic regardless of execution order.
  *
  * Scale: one shuffle per iteration (join on the edge endpoint);
  * `localCheckpoint` truncates lineage each round so plans do not grow
  * exponentially. Near-dup graphs have tiny diameters (clusters of
  * copies), so 2-4 iterations in practice; GraphX/GraphFrames' large-star
  * algorithm is the >billion-edge alternative.
  */
object ConnectedComponents {

  /** @param pairs DataFrame with two id columns (undirected edges)
    * @return (id, cluster_id = min id in the component); only ids that
    *         appear in at least one pair are returned. */
  def components(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    // Materialize the pair stage ONCE before mirroring: the undirected
    // union reads `pairs` twice, and without this checkpoint the whole
    // upstream pipeline (for q49, the full LSH candidate generation)
    // executes twice before the edges checkpoint even lands.
    val p = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .localCheckpoint(true)
    val edges = p
      .unionByName(p.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint(true)
    var comp = edges.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      val neighborMin = edges.join(comp, edges("v") === comp("id"))
        .groupBy(col("u")).agg(min(col("comp")).as("ncomp"))
      val updated = comp.join(neighborMin, comp("id") === neighborMin("u"), "left_outer")
        .select(comp("id"),
          least(comp("comp"), coalesce(col("ncomp"), comp("comp"))).as("comp"),
          comp("comp").as("prev"))
        .localCheckpoint(true)
      // existence probe, not a full count: the job stops at the first
      // partition that yields an improved label
      changed = !updated.where(col("comp") < col("prev")).isEmpty
      comp = updated.select(col("id"), col("comp"))
      iter += 1
    }
    comp
  }
}
