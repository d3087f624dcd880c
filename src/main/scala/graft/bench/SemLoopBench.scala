package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Scale campaign for the SEMANTIC screen-and-admit loop (VERDICT r9
  * #5 / r8 #3): the one 100 TB-claimed loop whose cost had only been
  * argued from plan shape. Bootstraps the semantic index at three
  * corpus decades (the [[ScaleGen]] embeddings tables: 2k / 20k / 200k
  * vectors), then measures the standing transaction —
  * [[Similarity.admitSemanticBatch]] — at each decade for
  *
  *  - FIXED batches (200 vectors): the O(batch + probed clusters)
  *    claim directly — admission time should stay ~flat as the corpus
  *    grows 100×, because the screen reads the k·dims codebook table
  *    (not the corpus), assigns the batch once, and probes only the
  *    batch's assigned clusters;
  *  - PROPORTIONAL batches (n/100): the daily-ingest operating point
  *    at each scale.
  *
  * k follows the corpus (k = n/250, the SemDeDup-regime rule), so the
  * broadcast assignment is O(batch·k) — at fixed batch that term grows
  * with k, but at 64 dims it is ~10⁷ multiply-adds at the 200k decade,
  * noise next to job overhead. Admission batches come from a DISJOINT
  * generator seed with ids offset by 10⁹ (the batch-ids-disjoint
  * contract); each batch is admitted ONCE (admissions mutate the
  * index, so the warm/min-of-2 discipline of [[ScaleBench]] does not
  * apply — instead each group admits several batches and reports the
  * MIN, the same contention defense).
  *
  * Emits a markdown table to stdout and one JSON line to
  * `BENCH_SEMLOOP.json`; BENCH_SCALE.md carries the analyzed table.
  */
object SemLoopBench {

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
    graft.store.Store.ensureDatabase(spark, "graft_bench")

    val scales = Seq(("g1x", 5000), ("g10x", 50000), ("g100x", 500000))
    val results = scales.map { case (g, nDocs) =>
      val dir = s"$base/$g"
      // same deterministic generator + seed as ScaleBench, so either
      // campaign can (re)create the shared scale points
      if (!BenchFs.exists(spark, s"$dir/embeddings.parquet")) {
        System.err.println(s"[semloop] generating $dir embeddings")
        ScaleGen.embeddings(spark, nDocs * 2 / 5, seed = 43)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val k = math.max(8, (n / 250).toInt)
      val table = s"sem_loop_$g"
      Similarity.dropSemanticIndex(spark, table)

      val t0 = System.nanoTime()
      Similarity.writeSemanticIndex(emb, "vec_id", "embedding", k, iters = 2, table)
      val bootstrapSec = (System.nanoTime() - t0) / 1e9

      // disjoint fresh vectors for admission: different seed, ids +10⁹;
      // staged to parquet so each timed admission READS its batch like
      // a real ingest (and so CacheReset between admissions cannot
      // invalidate a held checkpoint — generation cost stays untimed)
      val fixedB = 200
      val propB = math.max(fixedB, (n / 100).toInt)
      val stage = s"$dir/__admit_batches.parquet"
      ScaleGen.embeddings(spark, 3 * fixedB + 2 * propB, seed = 99)
        .withColumn("vec_id", col("vec_id") + lit(1000000000L))
        .write.mode("overwrite").parquet(stage)

      def admit(lo: Long, hi: Long): Double = {
        graft.CacheReset(spark)
        val batch = spark.read.parquet(stage)
          .filter(col("vec_id") >= lit(1000000000L + lo)
            && col("vec_id") < lit(1000000000L + hi))
        val t = System.nanoTime()
        Similarity.admitSemanticBatch(
          batch.select("vec_id", "embedding"), "vec_id", "embedding", table, theta = 0.99)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      val fixedTimes = (0 until 3).map(b => admit(b.toLong * fixedB, (b + 1).toLong * fixedB))
      val propTimes = (0 until 2).map(b =>
        admit(3L * fixedB + b.toLong * propB, 3L * fixedB + (b + 1).toLong * propB))
      Similarity.dropSemanticIndex(spark, table)
      System.err.println(f"[semloop] $g n=$n k=$k bootstrap=$bootstrapSec%.2fs " +
        s"fixed=${fixedTimes.map(fmt).mkString(",")} prop=${propTimes.map(fmt).mkString(",")}")
      (g, n, k, bootstrapSec, fixedTimes.min, propB, propTimes.min)
    }

    val json = results.map { case (g, n, k, boot, fx, pb, pr) =>
      s""""$g":{"n":$n,"k":$k,"bootstrap_sec":${fmt(boot)},""" +
        s""""admit200_sec":${fmt(fx)},"prop_batch":$pb,"admit_prop_sec":${fmt(pr)}}"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SEMLOOP.json"),
      (json + "\n").getBytes("UTF-8"))

    println("| scale | corpus n | k | bootstrap (s) | admit fixed-200 (s) | prop batch | admit prop (s) |")
    println("|---|---|---|---|---|---|---|")
    results.foreach { case (g, n, k, boot, fx, pb, pr) =>
      println(s"| $g | $n | $k | ${fmt(boot)} | ${fmt(fx)} | $pb | ${fmt(pr)} |")
    }
    spark.stop()
  }
}
