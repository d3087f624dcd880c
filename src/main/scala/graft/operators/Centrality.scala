package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph centrality over engine-derived graphs (e.g. the near-dup
  * similarity graph): INTEGER-EXACT PageRank. The training-data use is
  * canonical-representative selection — inside a duplicate cluster, the
  * highest-centrality document is the one most "agreed with" by its
  * near-duplicates, a better keep-choice than min-id when dedup keeps
  * one doc per cluster.
  *
  * Why integer-exact: float PageRank sums are order-dependent, so two
  * runs (or two engines) disagree in the low bits and ranking ties
  * flap. Here every step is integer arithmetic — contributions are
  * `r DIV out-degree` (floor division), damping is `(s·85) DIV 100` —
  * so any engine reproduces the scores bit-for-bit and the DuckDB
  * oracle can unroll the same iterations (battery q87). The floor
  * divisions leak mass (scores are NOT a probability distribution);
  * for a RANKING — the training-data use — only the deterministic
  * total order matters.
  */
object Centrality {

  /** Fixed-iteration integer PageRank over a DIRECTED edge list
    * `(src, dst)` — symmetrize first for an undirected graph. Every
    * node must have at least one out-edge (true by construction for a
    * symmetrized pair list); nodes outside the edge list are not
    * ranked. Returns (v, pr).
    *
    * r₀(v) = scale; rᵢ₊₁(v) = (scale·15) DIV 100 +
    * (Σ_{u→v} rᵢ(u) DIV deg(u)) · 85 DIV 100.
    *
    * Scale shape per iteration: the edge+degree list is persisted
    * HASH-DISTRIBUTED (and sorted) on `src` ONCE before the loop, so
    * the contribution join reuses that partitioning every iteration and
    * only the rank side — |nodes| rows, not |edges| — is exchanged; a
    * naive `edges ⋈ rank` would re-shuffle the edge list iters× (at a
    * 100 TB-derived edge list, iters× avoidable wire volume).
    * Contributions then ride one shuffle keyed by dst (map-side partial
    * sums) and ranks join back to the node list, itself persisted
    * hash-distributed on `v` so that join moves only the sums. Rank
    * state is localCheckpointed (lazy) so the plan stays one-iteration
    * deep instead of nesting the whole history — the same fixpoint
    * discipline as [[ConnectedComponents]]. Overflow: per-node in-sums
    * are bounded by |nodes|·scale — 10⁹ nodes at the default scale stay
    * under 2⁶³ by six orders of magnitude. */
  def integerPageRank(
      edges: DataFrame, iters: Int, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "integerPageRank needs at least one iteration")
    // materialize the edge list ONCE (lazy): it feeds deg, nodes, and
    // every iteration's contribution join — without this, an expensive
    // upstream derivation (q87's LSH+Jaccard front end) re-executes
    // iters+2 times (measured 8.6s -> ~3s at sf0.1)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val (eDeg, nodes) = loopInputs(e)
    val base = lit(scale * 15 / 100)
    var rank = nodes.select(col("v"), lit(scale).as("pr"))
    var i = 0
    while (i < iters) {
      // the LAST iteration checkpoints EAGERLY: materializing the loop
      // here (while eDeg/nodes are still cached) lets the
      // loop-invariant caches be released below instead of leaking two
      // MEMORY_AND_DISK relations per call for the session lifetime;
      // earlier iterations stay lazy as before (one materialization
      // each, at the point the next round reads them)
      rank = iterate(eDeg, nodes, rank, base).localCheckpoint(i == iters - 1)
      i += 1
    }
    eDeg.unpersist(false)
    nodes.unpersist(false)
    rank
  }

  /** The loop-invariant inputs, persisted (NOT checkpointed:
    * localCheckpoint erases partitioning) pre-distributed on their join
    * keys — the cached scans report HashPartitioning, so
    * EnsureRequirements drops the exchange on these sides in every
    * iteration. Exposed for PlanSpec's exchange-count pin. */
  private[graft] def loopInputs(e: DataFrame): (DataFrame, DataFrame) = {
    val deg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    val eDeg = e.join(deg, "src").repartition(col("src"))
      .sortWithinPartitions("src").persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("v")).distinct()
      .repartition(col("v")).persist(StorageLevel.MEMORY_AND_DISK)
    (eDeg, nodes)
  }

  /** One rank update, pre-checkpoint — exposed (not private) only so
    * PlanSpec can pin the loop body's exchange count: the
    * localCheckpoint barrier hides each iteration's plan from the final
    * query's explain. Exchanges per iteration: ONE for the rank side of
    * the contribution join (eDeg's cached HashPartitioning(src) is
    * reused) + ONE for the dst-keyed contribution aggregate (whose
    * output partitioning the nodes join then reuses). */
  private[graft] def iterate(
      eDeg: DataFrame, nodes: DataFrame, rank: DataFrame,
      base: org.apache.spark.sql.Column): DataFrame = {
    val contrib = eDeg.join(rank, eDeg("src") === rank("v"))
      .select(col("dst").as("v"), expr("pr DIV __deg").as("c"))
    val sums = contrib.groupBy("v").agg(sum(col("c")).as("s"))
    nodes.join(sums, Seq("v"), "left")
      .select(col("v"),
        (base + expr("(coalesce(s, CAST(0 AS BIGINT)) * 85) DIV 100")).as("pr"))
  }
}
