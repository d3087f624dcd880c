package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition — the dense-subgraph extractor completing the
  * graph family (components → q64, centrality → q87, clustering →
  * q134/q135): the k-core is the unique maximal subgraph in which
  * every node keeps degree ≥ k. On a near-dup graph it separates the
  * boilerplate CLUSTERS (dense cores that survive peeling) from
  * chains of borderline pairs (which unravel); on co-occurrence
  * graphs it is the classic cohesion filter.
  *
  * Algorithm: synchronous peeling to fixpoint — drop every node with
  * degree < k, delete incident edges, repeat. The result is
  * ORDER-INDEPENDENT (the maximal k-core is unique), so any peeling
  * schedule converges to the same subgraph — which is what makes the
  * operator oracle-checkable: the battery replays a bounded unroll of
  * the same rounds and uniqueness guarantees equality once the unroll
  * reaches the fixpoint.
  *
  * Scale shape: each round is one degree aggregate + two semi-joins
  * over the CURRENT edge set (shrinking monotonically), barriered by
  * `localCheckpoint` like the CC fixpoint so the plan never stacks
  * rounds. Round count is the peeling depth (the graph's
  * "degeneracy cascade" length), typically single-digit; `maxRounds`
  * is a runaway valve that throws rather than silently returning a
  * non-fixpoint.
  */
object KCore {

  /** Nodes of the k-core with their in-core degrees, as
    * `(node, degree)`. Empty result = the graph has no k-core.
    *
    * Peeling is INCREMENTAL (degree-decrement): the full degree
    * aggregate runs ONCE, then each synchronous round marks the
    * sub-k nodes, drops their incident edges in one scan of the live
    * edge set, and DECREMENTS the surviving endpoints' degrees by the
    * (small) per-node count of dropped edges — never re-aggregating
    * degrees over the whole edge set per round, and never re-scanning
    * it for two separate semi-joins (the r17 form paid one E-row
    * degree shuffle + ~3 edge scans per round). The maintained degree
    * table IS the answer at the fixpoint, so the final degree pass
    * disappears too. The k-core's uniqueness makes the schedule
    * invisible in the result. */
  def kCore(pairs: DataFrame, aCol: String, bCol: String, k: Int,
      maxRounds: Int = 50): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    var cur = Triangles.canonicalEdges(pairs, aCol, bCol).localCheckpoint(false)
    var deg = cur.select(col("u").as("node"))
      .union(cur.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
      .localCheckpoint(false)
    var rounds = 0
    var done = false
    while (!done) {
      val removed = deg.filter(col("degree") < k).select("node")
        .localCheckpoint(false)
      if (removed.isEmpty) done = true
      else {
        if (rounds >= maxRounds)
          throw new IllegalStateException(
            s"kCore: no fixpoint after $maxRounds rounds — raise maxRounds")
        // one scan of the live edges: mark removed endpoints, keep the
        // survivor edges, and read the dropped edges' surviving ends
        // for the degree decrements (an edge with BOTH ends removed
        // decrements nobody)
        val marked = cur
          .join(removed.select(col("node").as("u"), lit(1).as("__ru")),
            Seq("u"), "left")
          .join(removed.select(col("node").as("v"), lit(1).as("__rv")),
            Seq("v"), "left")
          .localCheckpoint(false)
        val dropped = marked.filter(col("__ru").isNotNull || col("__rv").isNotNull)
        val decs = dropped.filter(col("__ru").isNull).select(col("u").as("node"))
          .union(dropped.filter(col("__rv").isNull).select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("__dec"))
        val nextDeg = deg.join(removed, Seq("node"), "left_anti")
          .join(decs, Seq("node"), "left")
          .select(col("node"),
            (col("degree") - coalesce(col("__dec"), lit(0L))).as("degree"))
          .localCheckpoint(false)
        val next = marked.filter(col("__ru").isNull && col("__rv").isNull)
          .select("u", "v")
        cur.unpersist(); deg.unpersist()
        cur = next; deg = nextDeg; rounds += 1
      }
    }
    deg
  }
}
