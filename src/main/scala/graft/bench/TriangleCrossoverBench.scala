package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheReset
import graft.operators.Triangles

/** Doulion OPERATING-POINT campaign (VERDICT r13 item 6): at sf0.1 the
  * approx counter (k = 3) measured SLOWER than the exact one — the
  * sampling pass + bookkeeping cost more than the wedge-join shrink
  * saved at 1.2M edges. This main measures exact vs approx at
  * k ∈ {3, 10, 30} on deterministic skewed graphs one and two decades
  * denser (≈1M and ≈10M pair rows before dedup, power-law-ish so the
  * wedge join has real hubs to hurt on), locating the crossover that
  * decides [[Triangles.countsRowAuto]]'s documented threshold.
  *
  * Generation is hash-deterministic (xxhash64 on the row id — a rerun
  * measures the identical graph): endpoints are drawn with density
  * alpha 2.5 toward low ids, the standard quick skewed-graph recipe.
  * Protocol matches ScaleBench: noop sink, CacheReset between runs,
  * min-of-2 per cell.
  *
  * Usage: runMain graft.bench.TriangleCrossoverBench [decades]
  */
object TriangleCrossoverBench {
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Deterministic power-law-ish pair list: `rows` pairs over ~`n`
    * nodes, endpoint = n · u^2.5 with u uniform from a hash — dense
    * toward low ids (hubs), loops filtered by the counters. */
  def skewedPairs(spark: SparkSession, rows: Long, n: Long): DataFrame = {
    def endpoint(salt: Int) = {
      val u = (pmod(xxhash64(col("id"), lit(salt)), lit(1000000L))
        .cast("double") / 1000000.0)
      floor(pow(u, 2.5) * n).cast("long")
    }
    spark.range(rows).select(
      endpoint(1).as("pa"), endpoint(2).as("pb"))
  }

  def main(args: Array[String]): Unit = {
    val decades = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files
      .createTempDirectory("graft_tribench").toString
    (0 until decades).foreach { dec =>
      val rows = 1000000L * math.pow(10, dec).toLong
      val n = 200000L * math.pow(10, dec).toLong
      // materialized, not localCheckpoint: CacheReset between timed
      // runs drops checkpoint blocks
      val path = s"$base/pairs_d$dec"
      skewedPairs(spark, rows, n).write.mode("overwrite").parquet(path)
      val pairs = spark.read.parquet(path)
      val nEdges = Triangles.canonicalEdges(pairs, "pa", "pb").count()

      def time(label: String, once: () => DataFrame): Double = {
        def run(): Double = {
          CacheReset(spark)
          val t0 = System.nanoTime()
          once().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val t1 = run(); val t2 = run()
        val best = math.min(t1, t2)
        System.err.println(f"[tribench] d$dec $label: $best%.2fs ($t1%.2f, $t2%.2f)")
        best
      }

      val tExact = time("exact",
        () => Triangles.countsRow(pairs, "pa", "pb"))
      val cells = Seq(3, 10, 30).map { k =>
        k -> time(s"approx_k$k",
          () => Triangles.approxCountsRow(pairs, "pa", "pb", k, seed = 7L))
      }
      println(s"""{"campaign":"triangle_crossover","decade":$dec""" +
        s""","pair_rows":$rows,"n_edges":$nEdges""" +
        s""","exact_sec":${fmt(tExact)},""" +
        cells.map { case (k, t) => s""""approx_k${k}_sec":${fmt(t)}""" }
          .mkString(",") + "}")
    }
    spark.stop()
  }
}
