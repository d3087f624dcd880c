package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.CacheReset
import graft.store.Layout

/** Measures what the Z-order layout BUYS at read time — the pruning
  * claim as wall clock, not plan shape. A 4M-row two-dimensional grid
  * with a payload column is written twice into 32 files each: linearly
  * range-sorted on x (what a naive sorted rewrite produces) and
  * Z-clustered on (x, y) ([[Layout.zOrder]]). The probe is a narrow
  * y-slab aggregate — the dimension the linear layout holds no order
  * on, so its parquet row-group stats cannot exclude anything, while
  * the Z layout's per-file boxes bound y and the reader skips most row
  * groups from the footer alone. An x-slab probe is reported too: the
  * price Z-order pays on the dimension a pure sort would have owned.
  * Protocol: deterministic data, min of three timed runs, CacheReset
  * between runs, count+sum aggregate so the scan is real. Results →
  * BENCH_SCALE.md (sixth campaign). */
object LayoutBench {
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_layout")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 6000 // 6000 x 6000 grid = 36M rows (~4 GB written per layout)
    val files = 32
    val linDir = s"$base/linear_x"
    val zDir = s"$base/zorder_xy"
    val hDir = s"$base/hilbert_xy"
    if (!BenchFs.exists(spark, hDir)) {
      System.err.println(s"[layoutbench] writing $n x $n grid, $files files per layout")
      val grid = spark.range(n.toLong * n).select(
        (col("id") / n).cast("int").as("x"),
        (col("id") % n).cast("int").as("y"),
        concat(lit("p"), lpad(col("id") % 1000, 96, "0")).as("payload"))
      grid.repartitionByRange(files, col("x")).sortWithinPartitions("x")
        .write.mode("overwrite").parquet(linDir)
      Layout.zOrder(grid, Seq("x", "y"), partitions = files, bits = 8)
        .write.mode("overwrite").parquet(zDir)
      Layout.hilbertOrder(grid, Seq("x", "y"), partitions = files, bits = 8)
        .write.mode("overwrite").parquet(hDir)
    }

    // (min seconds, scan-emitted rows) — emitted rows are the rows
    // SURVIVING parquet row-group pruning, the direct pruning evidence
    def probe(dir: String, dim: String): (Double, Long) = {
      var rows = 0L
      val times = (0 until 3).map { _ =>
        CacheReset(spark)
        val df = spark.read.parquet(dir)
          .filter(col(dim) >= 2975 && col(dim) <= 3124) // 150 of 6000 = 2.5%
          .agg(count(col("payload")), sum(col("x")), sum(col("y")))
        val t0 = System.nanoTime()
        df.collect()
        val dt = (System.nanoTime() - t0) / 1e9
        rows = org.apache.spark.sql.GraftSqlBridge
          .scanOutputRows(df.queryExecution.executedPlan)
        dt
      }
      (times.min, rows)
    }
    // warm the JVM/codegen on all layouts before timing
    probe(linDir, "y"); probe(zDir, "y"); probe(hDir, "y")

    val (linY, linYRows) = probe(linDir, "y")
    val (zY, zYRows) = probe(zDir, "y")
    val (hY, hYRows) = probe(hDir, "y")
    val (linX, linXRows) = probe(linDir, "x")
    val (zX, zXRows) = probe(zDir, "x")
    val (hX, hXRows) = probe(hDir, "x")
    System.err.println(
      f"[layoutbench] y-slab: linear $linY%.3fs/$linYRows%d — z $zY%.3fs/$zYRows%d — hilbert $hY%.3fs/$hYRows%d; " +
        f"x-slab: linear $linX%.3fs/$linXRows%d — z $zX%.3fs/$zXRows%d — hilbert $hX%.3fs/$hXRows%d")
    println(s"""{"metric":"zorder_slab_probe","unit":"sec","rows":${n.toLong * n},"files":$files,""" +
      s""""y_slab":{"linear_x":${fmt(linY)},"linear_x_scan_rows":$linYRows,"zorder":${fmt(zY)},"zorder_scan_rows":$zYRows,"hilbert":${fmt(hY)},"hilbert_scan_rows":$hYRows},""" +
      s""""x_slab":{"linear_x":${fmt(linX)},"linear_x_scan_rows":$linXRows,"zorder":${fmt(zX)},"zorder_scan_rows":$zXRows,"hilbert":${fmt(hX)},"hilbert_scan_rows":$hXRows}}""")
    spark.stop()
  }
}
