package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeat-timing harness for single battery queries: runs each named
  * query `reps` times in ONE JVM and prints every sample. Host timing
  * noise on this box makes cross-JVM comparisons useless (2-4x
  * swings); within-JVM repeats with a shared warm cache are the only
  * way to A/B an operator change. Usage:
  *   runMain graft.tools.QueryLoop <sfDir> <reps> <query> [query...]
  */
object QueryLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    // mirror Bench's session exactly (same SPARK_GRAFT_CPUS contract) —
    // an A/B timed under a different parallelism than the benchmark it
    // explains would mislead
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val samples = (1 to reps).map { _ =>
        graft.CacheReset(spark)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[loop] $name min=${samples.min}%.3f samples=" +
        samples.map(s => f"$s%.3f").mkString(","))
    }
    spark.stop()
  }
}
