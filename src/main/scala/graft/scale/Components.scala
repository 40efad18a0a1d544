package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair list — the post-dedup step
  * that turns near-duplicate PAIRS into duplicate CLUSTERS ("keep one doc
  * per cluster"). Transitive closure matters: A~B and B~C must place A and C
  * in one cluster even when (A, C) itself was never emitted as a pair.
  *
  * Algorithm: alternating large-star / small-star rounds (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the canonical
  * shuffle-based CC formulation. Each round is a plain groupBy + join over
  * the edge list (no driver-side graph state), and the edge set converges to
  * one star per component centered at the component's minimum id in
  * O(log^2 n) rounds — unlike naive min-label propagation, whose round count
  * grows with the component DIAMETER (fatal for chain-shaped components at
  * scale).
  */
object Components {

  /** star round: for every node u with neighbor set N(u) and
    * m = min(N(u) ∪ u), rewire the selected neighbors of u straight to m.
    * large-star selects v > u (tall edges shorten), small-star selects
    * v <= u (local edges collapse into the center).
    */
  private def star(e: DataFrame, large: Boolean): DataFrame = {
    val nbrs = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy("u").agg(min(col("v")).as("__mn"))
      .select(col("u"), least(col("__mn"), col("u")).as("m"))
    val j = nbrs.join(mins, Seq("u"))
    val kept = if (large) j.where(col("v") > col("u"))
               else j.where(col("v") <= col("u"))
                 .unionByName(mins.select(col("u"), col("u").as("v"), col("m")))
    kept.select(least(col("v"), col("m")).as("u"),
        greatest(col("v"), col("m")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** (id, rep) for every node of `pairs`, rep = the minimum id reachable in
    * the undirected pair graph. Nodes absent from `pairs` (singletons) are
    * the caller's left join. Each round materializes the (component-bounded,
    * shrinking) edge list via a lazy localCheckpoint; convergence is an
    * exact edge-set comparison. Throws after `maxRounds` non-converged
    * rounds rather than returning a partial closure.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 25): DataFrame = {
    var edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(false)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = star(star(edges, large = true), large = false)
        .localCheckpoint(false)
      // canonical + distinct on both sides, so set equality is two counts
      val (nOld, nNew) = (edges.count(), next.count())
      converged = nOld == nNew &&
        edges.unionByName(next).distinct().count() == nNew
      edges = next
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    // fixpoint = stars centered at the component min: u is the rep side
    edges.select(col("v").as("id"), col("u").as("rep"))
      .unionByName(edges.select(col("u").as("id"), col("u").as("rep")))
      .distinct()
  }

  /** Duplicate clusters straight from a near-dup pair frame (id_a, id_b):
    * (id, rep, cluster size), one row per clustered document.
    */
  def dupClusters(pairs: DataFrame, aCol: String = "id_a",
                  bCol: String = "id_b"): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    cc.join(cc.groupBy("rep").agg(count(lit(1)).as("n")), Seq("rep"))
      .select(col("id"), col("rep"), col("n"))
  }
}
