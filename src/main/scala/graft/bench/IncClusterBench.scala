package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.Manifest

/** Incremental-clustering campaign: a standing ingest loop appends
  * batches between maintenance cycles; compare paying a FULL
  * `compactClustered` every cycle against the ZCube-provenance
  * `compactClusteredIncremental`. The claims under test are the two
  * sides of the liquid-clustering trade:
  *
  *  1. maintenance COST: the full rewrite is O(table) per cycle —
  *     total bytes rewritten across k cycles grows ~k·table; the
  *     incremental pass rewrites O(new batch) per cycle (plus bounded
  *     cube-merge amortization), so the total is ~k·batch.
  *  2. read QUALITY: the surviving-bytes fraction of a 2-D box probe
  *     on the incremental layout must stay within ~2x of the
  *     fully-rewritten layout's, not drift toward the unmaintained
  *     one.
  *
  * Keys are multiplicative-hash pseudo-random (high cardinality — no
  * dictionary collapse), deterministic, no RNG.
  *
  * Usage: runMain graft.bench.IncClusterBench [baseRows] [cycles]
  * Prints one JSON line per strategy.
  */
object IncClusterBench {
  def main(args: Array[String]): Unit = {
    val baseRows = if (args.length > 0) args(0).toLong else 2000000L
    val cycles = if (args.length > 1) args(1).toInt else 8
    val batchRows = baseRows / 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files
      .createTempDirectory("graft_incbench").toString
    val keySpace = 1000000L

    def rows(from: Long, until: Long): DataFrame =
      spark.range(from, until).select(
        pmod(col("id") * 2654435761L, lit(keySpace)).as("x"),
        pmod(col("id") * 40503L + 7919L, lit(keySpace)).as("y"))

    val targetBytes = 1L * 1024 * 1024
    val lo = 250000L
    val hi = 499999L
    def boxFrac(root: String): Double = {
      val snap = Manifest.current(spark, root).get
      val fx = Manifest.prunedFiles(snap, "x", lo, hi)
      val kept = Manifest.prunedFiles(snap.copy(files = fx), "y", lo, hi)
      val total = snap.files.flatMap(snap.bytes.get).sum
      if (total == 0) 1.0
      else kept.flatMap(snap.bytes.get).sum.toDouble / total
    }

    def campaign(tag: String)(maintain: String => Long): Unit = {
      val root = s"$dir/$tag"
      Manifest.append(rows(0, baseRows), root, statsCols = Seq("x", "y"))
      Manifest.compactClustered(spark, root, Seq("x", "y"),
        targetBytes = targetBytes)
      var rewritten = 0L
      val t0 = System.nanoTime()
      var n = baseRows
      for (_ <- 0 until cycles) {
        Manifest.append(rows(n, n + batchRows).coalesce(2), root,
          statsCols = Seq("x", "y"))
        n += batchRows
        rewritten += maintain(root)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val snap = Manifest.current(spark, root).get
      val tableBytes = snap.files.flatMap(snap.bytes.get).sum
      println(s"""{"campaign":"inc_cluster","strategy":"$tag"""" +
        s""","base_rows":$baseRows,"cycles":$cycles""" +
        s""","rewritten_bytes":$rewritten,"table_bytes":$tableBytes""" +
        f""","box_frac":${boxFrac(root)}%.4f,"wall_s":$wall%.1f""" +
        s""","files":${snap.files.size}}""")
    }

    // no maintenance at all: the drift floor the others must beat
    campaign("none")(_ => 0L)
    campaign("full") { root =>
      val pre = Manifest.current(spark, root).get
      val preBytes = pre.files.flatMap(pre.bytes.get).sum
      Manifest.compactClustered(spark, root, Seq("x", "y"),
        targetBytes = targetBytes)
      preBytes // the full rewrite rewrites the whole table
    }
    campaign("incremental") { root =>
      Manifest.compactClusteredIncremental(spark, root, Seq("x", "y"),
        targetBytes = targetBytes, cubeMinBytes = 4L * 1024 * 1024)
        .rewrittenBytes
    }

    // SAME-BOX STACKING campaign (the density rule's reason to exist):
    // every batch lands the IDENTICAL tight box — per-file volume
    // passes any volume threshold, so a volume-only selector carries
    // the stack forever and a point probe in the box opens every
    // stacked file; the stabbing-depth rule merges the stack once it
    // exceeds overlapDegree. Metric: files a hot-box probe must open,
    // and the bounded rewrite the merges cost.
    val hotLo = 100000L
    val hotSpan = 2000L
    def hotRows(from: Long, until: Long): DataFrame =
      spark.range(from, until).select(
        (pmod(col("id") * 2654435761L, lit(hotSpan)) + hotLo).as("x"),
        (pmod(col("id") * 40503L, lit(hotSpan)) + hotLo).as("y"))
    val stackCycles = 12
    def stackCampaign(tag: String, degree: Int): Unit = {
      val root = s"$dir/stack_$tag"
      Manifest.append(rows(0, baseRows / 2), root, statsCols = Seq("x", "y"))
      Manifest.compactClustered(spark, root, Seq("x", "y"),
        targetBytes = targetBytes)
      var rewritten = 0L
      val t0 = System.nanoTime()
      var n = 0L
      for (_ <- 0 until stackCycles) {
        Manifest.append(hotRows(n, n + batchRows / 10).coalesce(1), root,
          statsCols = Seq("x", "y"))
        n += batchRows / 10
        rewritten += Manifest.compactClusteredIncremental(spark, root,
          Seq("x", "y"), targetBytes = targetBytes,
          cubeMinBytes = 4L * 1024 * 1024, overlapDegree = degree)
          .rewrittenBytes
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val snap = Manifest.current(spark, root).get
      val fx = Manifest.prunedFiles(snap, "x", hotLo, hotLo + hotSpan - 1)
      val hot = Manifest.prunedFiles(snap.copy(files = fx), "y",
        hotLo, hotLo + hotSpan - 1)
      println(s"""{"campaign":"inc_cluster_stack","strategy":"$tag"""" +
        s""","degree":$degree,"cycles":$stackCycles""" +
        s""","hot_probe_files":${hot.size},"files":${snap.files.size}""" +
        f""","rewritten_bytes":$rewritten,"wall_s":$wall%.1f}""")
    }
    stackCampaign("volume_only", 0)
    stackCampaign("density", 4)

    // CROSS-GENERATION stacking campaign (the r16 cube-interval rule):
    // a standing loop that re-clusters its fresh batch every cycle
    // stacks one WELL-FORMED CUBE generation per cycle on the hot box
    // — the unmarked sweep never sees them. Without the cube sweep
    // (cubeStackFactor = 0 disables the merge arm) a hot-box probe
    // opens one cube per generation forever; with it the stack merges
    // every ~overlapDegree cycles, bounding probe cost at ~degree
    // cubes for an amortized rewrite of cycles/degree batches — the
    // L0-compaction trade, same-box-forever being the adversarial
    // case where extent-based finalization cannot kick in.
    def genCampaign(tag: String, factor: Double): Unit = {
      val root = s"$dir/gen_$tag"
      Manifest.append(rows(0, baseRows / 2), root, statsCols = Seq("x", "y"))
      Manifest.compactClustered(spark, root, Seq("x", "y"),
        targetBytes = targetBytes)
      var rewritten = 0L
      val t0 = System.nanoTime()
      var n = 0L
      for (_ <- 0 until stackCycles) {
        Manifest.append(hotRows(n, n + batchRows / 10).coalesce(1), root,
          statsCols = Seq("x", "y"))
        n += batchRows / 10
        // volumeFactor ~0: the fresh batch re-clusters into its own
        // cube every cycle (the generation generator)
        rewritten += Manifest.compactClusteredIncremental(spark, root,
          Seq("x", "y"), targetBytes = targetBytes, cubeMinBytes = 1024,
          volumeFactor = 1e-9, overlapDegree = 4, cubeStackFactor = factor)
          .rewrittenBytes
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val snap = Manifest.current(spark, root).get
      val fx = Manifest.prunedFiles(snap, "x", hotLo, hotLo + hotSpan - 1)
      val hot = Manifest.prunedFiles(snap.copy(files = fx), "y",
        hotLo, hotLo + hotSpan - 1)
      val hotCubes = hot.flatMap(f =>
        snap.stats.get(f).flatMap(_.get(Manifest.ZCubeStatKey)))
        .map(_._1.toString).distinct.size
      println(s"""{"campaign":"inc_cluster_generations","strategy":"$tag"""" +
        s""","stack_factor":$factor,"cycles":$stackCycles""" +
        s""","hot_probe_files":${hot.size},"hot_probe_cubes":$hotCubes""" +
        s""","files":${snap.files.size}""" +
        f""","rewritten_bytes":$rewritten,"wall_s":$wall%.1f}""")
    }
    genCampaign("stack_off", 0.0)
    genCampaign("merge", 4.0)
    spark.stop()
  }
}
