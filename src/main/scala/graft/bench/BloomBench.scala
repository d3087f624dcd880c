package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.Manifest

/** Bloom-index scaling: point-lookup wall vs the full equality scan as
  * a HASH-LAYOUT table grows 10⁶ → 10⁷ rows — the layout where every
  * file's [min, max] spans the whole key domain, so the stats skip
  * index provably cannot prune a point probe and the bloom sidecar is
  * the only thing standing between a needle fetch and a full scan.
  * Also times the index build (one pass over the table — the
  * amortized maintenance cost).
  *
  * Usage: runMain graft.bench.BloomBench [maxRows]
  * Prints one JSON line per decade.
  */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val maxRows = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files
      .createTempDirectory("graft_bloombench").toString + "/t"
    val step = 1000000L

    def batch(a: Long, b: Long) = spark.range(a, b).toDF("id")
      .withColumn("v", col("id") % 1000L)
      .repartition(16, col("id")) // hash layout: every file spans the domain

    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    var n = 0L
    var next = 1000000L
    while (n < maxRows) {
      val until = math.min(next, maxRows)
      while (n < until) {
        Manifest.append(batch(n, n + step), root, statsCols = Seq("id"))
        n += step
      }
      val tBuild = sec { Manifest.buildBloomIndex(spark, root, "id"); () }
      val files = Manifest.current(spark, root).get.files.size
      val probe = n / 2 + 1
      def point(): Unit = {
        val r = Manifest.readWhereEquals(spark, root, "id", probe).collect()
        require(r.length == 1, s"lost the needle at $n rows")
      }
      def scan(): Unit = {
        val r = Manifest.read(spark, root)
          .filter(col("id") === lit(probe)).collect()
        require(r.length == 1, s"lost the needle at $n rows")
      }
      point(); scan() // warmup
      val tP = (0 until 5).map(_ => sec(point()))
      val tS = (0 until 5).map(_ => sec(scan()))
      println(s"""{"campaign":"bloom_lookup","rows":$n,"files":$files""" +
        f""","build_s":$tBuild%.2f,"point_s":${median(tP)}%.3f""" +
        f""","scan_s":${median(tS)}%.3f""" +
        f""","point_frac":${median(tP) / median(tS)}%.3f}""")
      next *= 10
    }
    spark.stop()
  }
}
