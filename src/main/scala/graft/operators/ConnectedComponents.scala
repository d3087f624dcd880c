package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected pair list —
  * the step that turns near-dup PAIRS into dedup CLUSTERS (component =
  * min reachable id; keep that doc, drop the rest).
  *
  * Algorithm: iterative min-label propagation with a pointer-jumping
  * step (comp := comp[comp]) per round, so convergence is
  * O(log diameter) rounds rather than O(diameter). Each round is two
  * joins + an aggregate — all distributed, no driver-side graph. The
  * driver only runs the loop and the convergence check; `localCheckpoint`
  * breaks lineage each round so plans don't grow exponentially.
  *
  * Scale: rounds scale with log of the largest cluster's diameter;
  * near-dup clusters are short-diameter by construction. State per
  * round is one (id, comp) table the size of the vertex set.
  */
object ConnectedComponents {

  /** @param pairs DataFrame with columns (id_a, id_b), undirected edges
    * @return (id, component): every vertex appearing in `pairs`, with
    *         component = min id of its connected component */
  def components(pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()

    var round = 0
    var converged = false
    // labels are monotonically non-increasing per vertex, so the fixpoint
    // test is simply "sum(comp) unchanged" — one cheap aggregate per
    // round instead of a self-join diff
    var prevSum = Long.MinValue
    while (!converged && round < maxRounds) {
      // 1) neighbor-min propagation
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("comp").as("dcomp")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("dcomp")).as("ncomp"))
      val propagated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // 2) pointer jumping: comp := comp's comp (halves chain lengths)
      val jumped = propagated
        .join(propagated.select(col("id").as("comp"), col("comp").as("ccomp")), Seq("comp"), "left")
        .select(col("id"), coalesce(col("ccomp"), col("comp")).as("comp"))
        .localCheckpoint()
      val s = jumped.agg(sum(col("comp"))).head().getLong(0)
      converged = s == prevSum
      prevSum = s
      labels = jumped
      round += 1
    }
    labels
  }

  /** Cluster histogram: (component, n_members), smallest id is the
    * cluster representative. */
  def clusterSizes(pairs: DataFrame): DataFrame =
    components(pairs).groupBy("comp").agg(count(lit(1)).as("n_members"))
      .select(col("comp").as("component"), col("n_members"))
}
