package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.{Maintenance, MaintenancePolicy, Manifest}

/** Steady-state scale proof of the MAINTAIN-WHILE-INGESTING loop
  * (VERDICT r15 item 7): q190 proves the one-call maintenance
  * SEMANTICS at battery scale; this campaign measures the SCALE claim
  * — O(selected) rewrite per cycle — across ≥20 append+maintain
  * cycles at ~100x the battery's batch size. Two claims under
  * measurement:
  *
  *  1. WRITE AMPLIFICATION (total maintenance-rewritten bytes / total
  *     ingested bytes) stays a small constant — the LSM
  *     O(log(cubeMinBytes/batch)) bound — instead of growing with
  *     table size (the full-rewrite loop's O(cycles) curve).
  *  2. CYCLE WALL is FLAT: the median maintain wall of the last 5
  *     cycles ≈ the first 5 (after the warm cycle), because selection
  *     is metadata-driven and rewrite cost follows the fresh batch,
  *     never the accumulated table.
  *
  * Per-cycle JSON lines + a summary line; numbers land in
  * BENCH_SCALE.md. Keys are multiplicative-hash pseudo-random
  * (deterministic, no RNG — resume-safe by construction).
  *
  * Usage: runMain graft.bench.MaintainLoopBench [batchRows] [cycles]
  */
object MaintainLoopBench {
  def main(args: Array[String]): Unit = {
    val batchRows = args.headOption.map(_.toLong).getOrElse(500000L)
    val cycles = args.lift(1).map(_.toInt).getOrElse(24)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files
      .createTempDirectory("graft_maintloop").toString + "/t"
    val keySpace = 10000000L
    def rows(from: Long, until: Long): DataFrame =
      spark.range(from, until).select(
        pmod(col("id") * 2654435761L, lit(keySpace)).as("x"),
        pmod(col("id") * 40503L + 7919L, lit(keySpace)).as("y"),
        col("id").as("payload"))

    val policy = MaintenancePolicy(
      layoutCols = Seq("x", "y"),
      targetBytes = 4L * 1024 * 1024,
      cubeMinBytes = sys.env.get("GRAFT_CUBE_MIN").map(_.toLong).getOrElse(16L * 1024 * 1024),
      keepVersions = 2)

    val lo = keySpace / 4
    val hi = keySpace / 2 - 1
    def boxFrac(): Double = {
      val snap = Manifest.current(spark, root).get
      val fx = Manifest.prunedFiles(snap, "x", lo, hi)
      val kept = Manifest.prunedFiles(snap.copy(files = fx), "y", lo, hi)
      val total = snap.files.flatMap(snap.bytes.get).sum
      if (total == 0) 1.0
      else kept.flatMap(snap.bytes.get).sum.toDouble / total
    }

    var n = 0L
    var ingested = 0L
    var rewritten = 0L
    val walls = scala.collection.mutable.ArrayBuffer[Double]()
    for (c <- 0 until cycles) {
      val pre = Manifest.current(spark, root)
        .map(_.files.toSet).getOrElse(Set.empty[String])
      val tA = System.nanoTime()
      Manifest.append(rows(n, n + batchRows).coalesce(2), root,
        statsCols = Seq("x", "y"))
      n += batchRows
      val appendWall = (System.nanoTime() - tA) / 1e9
      val snapA = Manifest.current(spark, root).get
      val batchBytes = snapA.files.filterNot(pre)
        .flatMap(snapA.bytes.get).sum
      ingested += batchBytes
      val tM = System.nanoTime()
      val report = Maintenance.run(spark, root, policy)
      val maintainWall = (System.nanoTime() - tM) / 1e9
      val rw = report.clustered.map(_.rewrittenBytes).getOrElse(0L)
      rewritten += rw
      walls += maintainWall
      val snap = Manifest.current(spark, root).get
      println(s"""{"campaign":"maintain_loop","cycle":$c""" +
        s""","ingested_bytes":$batchBytes,"rewritten_bytes":$rw""" +
        f""","append_s":$appendWall%.2f,"maintain_s":$maintainWall%.2f""" +
        s""","files":${snap.files.size},"rows":$n""" +
        (if (c % 4 == 3) f""","box_frac":${boxFrac()}%.4f""" else "") +
        "}")
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val first5 = median(walls.slice(1, 6).toSeq) // skip the warm cycle
    val last5 = median(walls.takeRight(5).toSeq)
    val snap = Manifest.current(spark, root).get
    val tableBytes = snap.files.flatMap(snap.bytes.get).sum
    println(s"""{"campaign":"maintain_loop_summary","cycles":$cycles""" +
      s""","batch_rows":$batchRows,"cube_min_bytes":${policy.cubeMinBytes}""" +
      s""","table_bytes":$tableBytes""" +
      s""","ingested_bytes":$ingested,"rewritten_bytes":$rewritten""" +
      f""","write_amp":${rewritten.toDouble / math.max(ingested, 1L)}%.2f""" +
      f""","maintain_s_first5":$first5%.2f,"maintain_s_last5":$last5%.2f""" +
      f""","flatness":${last5 / math.max(first5, 1e-9)}%.2f""" +
      f""","box_frac":${boxFrac()}%.4f,"files":${snap.files.size}}""")
    spark.stop()
  }
}
