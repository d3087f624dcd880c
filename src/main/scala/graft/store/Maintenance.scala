package graft.store

import org.apache.spark.sql.SparkSession

/** Declarative per-table maintenance policy — what [[Maintenance.run]]
  * enforces each time a standing loop calls it. Every action is
  * triggered, bounded, and idempotent, so the call is cheap enough to
  * run EVERY ingest cycle and the table converges to its policy
  * instead of drifting until a human remembers to run OPTIMIZE.
  *
  *  - `layoutCols` nonEmpty → incremental clustering
  *    ([[Manifest.compactClusteredIncremental]] — volume + density
  *    selection over cube provenance, O(selected), exact no-op when
  *    nothing pollutes). When a layout is configured, small-file
  *    bin-packing is DELEGATED to the clustering pass (its undersized-
  *    cube dissolve + density rules): [[Manifest.compactSmall]] knows
  *    nothing of cube provenance, and packing clustered tiles into a
  *    mixed file would strip their `__zcube` marks — the two are
  *    alternatives, never companions.
  *  - `layoutCols` empty → [[Manifest.compactSmall]] when more than
  *    `smallFileLimit` files sit under `smallBytes` (the append debris
  *    every micro-batch loop produces).
  *  - `bloomCols` → [[Manifest.maybeRefreshBloomIndex]] per column —
  *    rebuilds only when sidecar coverage of the current snapshot
  *    decayed below `bloomMinCoverage` (metadata-only check).
  *  - `annListCol` set (the root is a [[graft.similarity.ManifestAnn]]
  *    index) → fold the centroid-sum sidecar back to one row per list
  *    ([[graft.similarity.ManifestAnn.compactCents]]) once it exceeds
  *    `annCentsMaxRows` partial-sum rows.
  *  - `keepVersions` ≥ 1 → [[Manifest.gc]] to that retention depth
  *    (0 = never sweep; time travel keeps every retained version).
  */
final case class MaintenancePolicy(
    layoutCols: Seq[String] = Nil,
    targetBytes: Long = 128L * 1024 * 1024,
    cubeMinBytes: Long = 16L * 1024 * 1024,
    overlapDegree: Int = 8,
    curve: String = "z",
    smallBytes: Long = 8L * 1024 * 1024,
    smallFileLimit: Int = 8,
    bloomCols: Seq[String] = Nil,
    bloomMinCoverage: Double = 0.7,
    annListCol: Option[String] = None,
    annCentsMaxRows: Long = 4096L,
    keepVersions: Int = 0)

/** What one [[Maintenance.run]] actually did — every field `None`/
  * empty/zero when the trigger wasn't met, so a loop can log drift
  * honestly (the CapReport stance: visible valves, no silent work). */
final case class MaintenanceReport(
    packed: Option[Long],
    clustered: Option[Manifest.ClusterIncResult],
    bloomRefreshed: Seq[String],
    annCentsFolded: Boolean,
    gcSweptFiles: Int) {
  def fired: Boolean = packed.nonEmpty ||
    clustered.exists(_.rewrittenFiles > 0) || bloomRefreshed.nonEmpty ||
    annCentsFolded || gcSweptFiles > 0
}

/** ONE-CALL table maintenance — the policy loop the public formats
  * ship as a managed service (OPTIMIZE/VACUUM scheduling, liquid
  * clustering, index refresh), here a library call a standing ingest
  * loop owns: `Maintenance.run(spark, root, policy)` once per cycle.
  * Actions run in dependency order — layout first (it rewrites files),
  * bloom refresh after (its coverage check sees the post-rewrite
  * snapshot), sidecar folds, gc last (it sweeps what the rewrites
  * superseded). Same single-maintainer contract as each underlying
  * primitive: run from the table's maintenance owner, concurrent
  * APPENDS are safe (planned-parent commits re-plan or throw loudly),
  * a second concurrent maintainer is not. */
object Maintenance {

  def run(spark: SparkSession, root: String,
      policy: MaintenancePolicy): MaintenanceReport = {
    val snap0 = Manifest.current(spark, root).getOrElse(
      return MaintenanceReport(None, None, Nil, annCentsFolded = false, 0))

    val clustered =
      if (policy.layoutCols.isEmpty) None
      else Some(Manifest.compactClusteredIncremental(spark, root,
        policy.layoutCols, targetBytes = policy.targetBytes,
        bits = 8, curve = policy.curve,
        cubeMinBytes = policy.cubeMinBytes,
        overlapDegree = policy.overlapDegree))

    val packed =
      if (policy.layoutCols.nonEmpty) None // delegated to clustering
      else {
        val small = snap0.files.count(f =>
          snap0.bytes.get(f).forall(_ < policy.smallBytes))
        if (small <= policy.smallFileLimit) None
        else {
          // an ANN index root bin-packs RANGE-PARTITIONED on the list
          // id, so packed files keep the tight per-file list ranges
          // the probe's file pruning feeds on
          val v = Manifest.compactSmall(spark, root,
            smallBytes = policy.smallBytes,
            targetBytes = policy.targetBytes,
            rangeBy = policy.annListCol.toSeq)
          if (v == snap0.version) None else Some(v)
        }
      }

    val refreshed = policy.bloomCols.filter(c =>
      Manifest.maybeRefreshBloomIndex(spark, root, c,
        minCoverage = policy.bloomMinCoverage))

    val centsFolded = policy.annListCol match {
      case None => false
      case Some(listCol) =>
        val centsRoot = graft.similarity.ManifestAnn.centsRoot(root)
        val rows = Manifest.current(spark, centsRoot)
          .flatMap(Manifest.rowCount)
          .getOrElse(0L)
        if (rows <= policy.annCentsMaxRows) false
        else {
          graft.similarity.ManifestAnn.compactCents(spark, root, listCol)
          true
        }
    }

    val swept =
      if (policy.keepVersions < 1) 0
      else Manifest.gc(spark, root, keepVersions = policy.keepVersions).size

    MaintenanceReport(packed, clustered, refreshed, centsFolded, swept)
  }
}
