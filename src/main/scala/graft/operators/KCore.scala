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
    * `(node, degree)`. Empty result = the graph has no k-core. */
  def kCore(pairs: DataFrame, aCol: String, bCol: String, k: Int,
      maxRounds: Int = 50): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("node")).union(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
    var cur = Triangles.canonicalEdges(pairs, aCol, bCol).localCheckpoint(false)
    var n = cur.count()
    var rounds = 0
    var done = n == 0L
    while (!done) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"kCore: no fixpoint after $maxRounds rounds ($n edges live) — raise maxRounds")
      val keep = degrees(cur).filter(col("degree") >= k).select("node")
      val next = cur
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint(false)
      val m = next.count()
      done = m == n || m == 0L
      cur.unpersist()
      cur = next; n = m; rounds += 1
    }
    degrees(cur)
  }
}
