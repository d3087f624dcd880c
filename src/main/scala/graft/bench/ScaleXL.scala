package graft.bench

import org.apache.spark.sql.SparkSession

import graft.CacheReset

/** The next-decade scale point for the IVF-seeded clustering crossover
  * (VERDICT r10 #7): BENCH_SCALE measured the x94 SemDeDup family
  * through g100x = 200k vectors / k = 800 (k = n/250, the operator's
  * documented scale-knob rule) and set
  * `Similarity.SemDedupSeededKThreshold = 400` from the measured
  * curves. This main adds ONE decade: g1000x = 2M vectors / k = 8000,
  * confirming (or refuting) that the seeded loop's O(n·√k) cost model
  * holds where flat Lloyd's O(n·k) would be ~10¹² multiply-adds — and
  * therefore that the threshold needs no scale-dependent term.
  *
  * Predicted from the model: t ∝ n·√k ⇒ g1000x/g100x = 10·√10 ≈ 31.6×
  * on the clustering-dominated share of x94's g100x time. Protocol
  * matches ScaleBench (noop sink, CacheReset between runs, min of two
  * timed runs); generation is deterministic (seed 43), so a re-run
  * measures the identical corpus. Run with SPARK_DRIVER_MEM=24g —
  * the generator builds the corpus driver-side before parallelizing.
  */
object ScaleXL {
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_scale")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"$base/g1000x"
    if (!BenchFs.exists(spark, s"$dir/embeddings.parquet")) {
      System.err.println(s"[scalexl] generating $dir embeddings (2M x 64)")
      ScaleGen.embeddings(spark, 2000000, seed = 43)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }

    def once(): Double = {
      CacheReset(spark)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val k = math.max(8, (emb.count() / 250).toInt) // the x94 rule: 8000
      val t0 = System.nanoTime()
      graft.similarity.Similarity.semDedup(
          emb, "vec_id", "embedding", k, iters = 2, theta = 0.99)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val t1 = once()
    System.err.println(f"[scalexl] x94@g1000x run1: $t1%.1fs")
    val t2 = once()
    System.err.println(f"[scalexl] x94@g1000x run2: $t2%.1fs")
    println(s"""{"metric":"x94_semdedup_scaledk_g1000x","value":${fmt(math.min(t1, t2))},"unit":"sec","n":2000000,"k":8000,"runs":[${fmt(t1)},${fmt(t2)}]}""")
    spark.stop()
  }
}
