package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism valve for CPU-bound narrow stages.
  *
  * A parquet scan's task count is bounded by the file SPLIT count, and
  * a file is only splittable at row-group boundaries — a corpus packed
  * as large single-row-group files (or any input whose splits ≪ cores)
  * feeds its first narrow stage to a handful of tasks no matter what
  * `spark.sql.files.maxPartitionBytes` says. For I/O-bound stages that
  * is fine; for the CPU-bound hash scans of the dedup family (one md5
  * per shingle, simhash bit-counting) it serializes minutes of digest
  * work onto one core while the rest of the executor idles.
  *
  * [[forCpuStage]] inserts a round-robin repartition ONLY when the
  * input's planned partition count is under half the target (default:
  * `sparkContext.defaultParallelism`, override or disable with the
  * `graft.cpuStageParallelism` session conf — 0 disables). When the
  * scan already has enough splits — every healthy 100 TB layout — it
  * is a no-op and no shuffle is added. The shuffle it does add in the
  * starved case moves the raw rows once, which is exactly the trade:
  * one narrow-data exchange buys `target`-way parallelism for a stage
  * whose per-row cost dominates the wire cost. Downstream operators in
  * this engine are partitioning-insensitive by design (deterministic
  * aggregates, per-row hashes), so the round-robin placement never
  * changes results.
  */
object Rebalance {
  def forCpuStage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.conf.getOption("graft.cpuStageParallelism").map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    // rdd.getNumPartitions plans the physical scan but runs no job
    if (target > 0 && df.rdd.getNumPartitions * 2 <= target) df.repartition(target)
    else df
  }
}
