package graft.bench

import org.apache.spark.sql.SparkSession

/** A/B for the single-open pooled footer reads on many-file commits
  * (VERDICT r18 item: a 1000-file commit must not pay 1000 serial
  * driver-side footer opens): times `Manifest.append` of an n-file
  * batch with the pooled reader vs GRAFT_FOOTER_SERIAL=1 (pool of 1 =
  * the pre-r18 serial cost). Local-fs opens are ~0.1-0.3 ms so the
  * absolute deltas here are small; the pool's real payoff is object-
  * store footer latency (tens of ms per round trip), where serial
  * opens made the stats step linear in file count.
  *
  *   tools/run_main.sh graft.bench.FooterAb [files] [reps]
  */
object FooterAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(n * 200L)
      .selectExpr("id AS k", "id * 2 AS x", "CAST(id AS STRING) AS s")
      .repartition(n)
    val mode = if (sys.env.contains("GRAFT_FOOTER_SERIAL")) "serial" else "pooled"
    (1 to reps + 1).foreach { i =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_footer_ab").toString + "/t"
      val t0 = System.nanoTime()
      graft.store.Manifest.append(df, root, statsCols = Seq("k", "s"))
      val sec = (System.nanoTime() - t0) / 1e9
      // first rep is the JIT/codegen warm, discarded by the reader
      println(f"[footerab] mode=$mode files=$n rep=$i commit=$sec%.3f warm=${i == 1}")
    }
    spark.stop()
  }
}
