package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.Manifest
import graft.streaming.StreamOps

/** Materialized-view maintenance scaling: per-step cost of the
  * incremental fold ([[StreamOps.materializedAggStep]]) vs the full
  * recompute as the source table's HISTORY grows 10⁵ → 10⁶ → 10⁷ rows
  * while the per-step delta stays FIXED (100k rows). The IVM claim
  * under test: the incremental step's wall tracks the DELTA (plus the
  * touched-key merge, bounded by |keys|), never the history — at
  * 100 TB that is the difference between folding this hour's partition
  * and re-scanning the table every refresh.
  *
  * Source rows are deterministic arithmetic; the view is the
  * 10k-key (count, sum, min, max) aggregate, so every step touches
  * every key — the WORST case for the touched-key merge (real views
  * with localized deltas merge fewer).
  *
  * Usage: runMain graft.bench.MatViewBench [maxRows]
  * Prints one JSON line per decade.
  */
object MatViewBench {
  def main(args: Array[String]): Unit = {
    val maxRows = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files
      .createTempDirectory("graft_mvbench").toString
    val src = s"$base/src"; val dst = s"$base/mv"
    val step = 100000L
    val aggs = Seq(("n", "count", ""), ("sv", "sum", "v"),
      ("mn", "min", "v"), ("mx", "max", "v"))

    def rows(a: Long, b: Long) = spark.range(a, b).toDF("id")
      .withColumn("k", pmod(col("id") * 2654435761L, lit(10000L)))
      .withColumn("v", col("id") % 1000L)

    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    var n = 0L
    var next = 1000000L
    // bootstrap
    Manifest.append(rows(0L, step), src)
    StreamOps.materializedAggStep(spark, src, dst, "mv", "k", aggs)
    n = step
    while (n < maxRows) {
      val until = math.min(next, maxRows)
      while (n < until) {
        Manifest.append(rows(n, n + step), src)
        StreamOps.materializedAggStep(spark, src, dst, "mv", "k", aggs)
        n += step
      }
      // measured: three more fixed-size deltas folded incrementally,
      // vs the full recompute of the same logical view at this history
      val inc = (0 until 3).map { _ =>
        Manifest.append(rows(n, n + step), src)
        val t = sec {
          StreamOps.materializedAggStep(spark, src, dst, "mv", "k", aggs); ()
        }
        n += step
        t
      }
      val full = (0 until 3).map { _ =>
        sec {
          Manifest.read(spark, src).groupBy("k")
            .agg(count(lit(1)).as("n"), sum("v").as("sv"),
              min("v").as("mn"), max("v").as("mx"))
            .write.mode("overwrite")
            .parquet(s"$base/full_${System.identityHashCode(this)}")
          ()
        }
      }
      // the view must equal the recompute at every decade (hash of sums)
      val v = Manifest.read(spark, dst).agg(sum("sv"), sum("n")).head()
      val r = Manifest.read(spark, src).groupBy("k").agg(sum("v").as("sv"))
        .agg(sum("sv")).head()
      require(v.getLong(0) == r.getLong(0) && v.getLong(1) == n,
        s"view diverged at $n rows: $v vs ($r, $n)")
      println(s"""{"campaign":"matview","src_rows":$n""" +
        f""","inc_step_s":${median(inc)}%.3f,"full_recompute_s":${median(full)}%.3f""" +
        f""","speedup":${median(full) / median(inc)}%.2f}""")
      next *= 10
    }
    spark.stop()
  }
}
