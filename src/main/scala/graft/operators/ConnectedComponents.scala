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

  /** Connected components by the alternating large-star/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14 — the GraphFrames/GraphX production algorithm).
    *
    * Min-label propagation ([[components]]) needs O(diameter) rounds — a
    * chain of 10k re-posted near-duplicates means 10k shuffles. The star
    * operations contract long paths doubly-logarithmically: O(log² n)
    * rounds on ANY graph shape, each round one groupBy-join shuffle pair
    * over the current edge set:
    *
    *  - large-star: every node links its LARGER neighbors to its smallest
    *    neighbor-or-self (keeps edge count bounded: only smaller→larger
    *    edges are rewritten);
    *  - small-star: every node links its smaller neighbors and itself to
    *    the minimum among them.
    *
    * The fixpoint is a forest of depth-1 stars rooted at each component's
    * minimum id — the same labeling `components` converges to
    * (StarCcSpec pins equality on random graphs and a 512-node path).
    * Use this variant when the pair graph can contain long chains or
    * billions of edges; min-label when diameters are known-tiny. */
  def componentsStar(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): DataFrame = {
    // canonical directed edges big→small, self-loops dropped
    var edges = pairs
      .select(greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    val nodes = edges.select(col("u").as("id"))
      .unionByName(edges.select(col("v").as("id")))
      .distinct()
      .localCheckpoint(true)

    def largeStar(e: DataFrame): DataFrame = {
      val und = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val m = und.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      und.join(m, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // e is already big→small; every group's neighbors are all smaller
      val m = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      e.join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(m.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // exact fixpoint test on the canonical distinct edge sets
      converged = next.count() == edges.count() && next.except(edges).isEmpty
      edges = next
      iter += 1
    }
    // fixpoint edges are depth-1 stars root←member; roots label themselves
    // (least() skips the null min for unmatched roots)
    nodes.join(edges, nodes("id") === edges("u"), "left_outer")
      .groupBy(col("id")).agg(min(col("v")).as("mn"))
      .select(col("id"), least(col("id"), col("mn")).as("comp"))
  }
}
