package graft.bench

import org.apache.spark.sql.SparkSession

import graft.store.Manifest

/** Manifest LOG scaling campaign (VERDICT r13 item 2): commit latency
  * and cold snapshot-resolution latency as the table's FILE COUNT
  * grows 10³ → 10⁴ → 10⁵, A/B'd between the incremental log
  * (checkpointEvery = 16, the shipped default) and the always-full
  * pre-r14 behavior (checkpointEvery = 1). Uses synthetic file entries
  * ([[Manifest.appendSynthetic]]) — the measured object is the COMMIT
  * PROTOCOL (JSON render/parse, chain resolution, lock+rename), which
  * at 100 TB is driver-side cost proportional to file count, not data
  * bytes; staging 10⁵ real parquet files would only add noise.
  *
  * What "good" looks like: with deltas, steady-state commit wall is
  * FLAT in file count (O(batch) JSON; the residual O(files) is an
  * in-memory list filter), and cold resolution is bounded by one
  * checkpoint read + ≤15 delta reads. Always-full commits curve
  * linearly in file count (every commit renders the full list).
  *
  * Usage: runMain graft.bench.ManifestLogBench [maxDecade]
  * Prints one JSON line per (mode, fileCount) cell.
  */
object ManifestLogBench {
  def main(args: Array[String]): Unit = {
    val maxFiles = if (args.nonEmpty) args(0).toInt else 100000
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def ms(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    Seq(1 -> "full_every_commit", 16 -> "delta_log").foreach {
      case (every, mode) =>
        Manifest.checkpointEvery = every
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_logbench_$mode").toString + "/t"
        var n = 0
        var next = 1000
        // bulk-grow in 500-entry commits; at each decade, measure the
        // steady-state commit (32-entry batches, median of 9) and the
        // COLD current() resolution (cache cleared each rep)
        while (n < maxFiles) {
          val batch = (0 until 500).map(i => f"g${n + i}%08d")
          Manifest.appendSynthetic(spark, root, batch)
          n += 500
          if (n >= next) {
            val commits = (0 until 9).map { r =>
              val b = (0 until 32).map(i => f"m${n}_${r}_$i%04d")
              val t = ms { Manifest.appendSynthetic(spark, root, b); () }
              n += 32
              t
            }
            val resolves = (0 until 9).map { _ =>
              ms { Manifest.clearSnapshotCache()
                   Manifest.current(spark, root); () }
            }
            val snap = Manifest.current(spark, root).get
            println(s"""{"campaign":"manifest_log","mode":"$mode"""" +
              s""","files":${snap.files.size},"version":${snap.version}""" +
              f""","commit_ms":${median(commits)}%.1f""" +
              f""","cold_resolve_ms":${median(resolves)}%.1f}""")
            next *= 10
            // trim manifest history between decades so the full-mode
            // run doesn't accumulate gigabytes of full manifests on
            // disk; the measured cells above are already recorded
            Manifest.gc(spark, root, keepVersions = 2, orphanMinAgeMs = 0L)
          }
        }
        Manifest.checkpointEvery = 16
    }
    spark.stop()
  }
}
