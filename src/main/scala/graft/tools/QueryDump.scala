package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query correctness dump: the per-query slice of
  * [[graft.Verify]], for iterating on ONE oracle without paying for
  * the full battery. Same session config as Verify so results are
  * byte-identical to what the driver's compare will see. Usage:
  *   runMain graft.tools.QueryDump <sfDir> <outDir> <query> [query...]
  */
object QueryDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      graft.CacheReset(spark)
      println(s"[dump] $name -> $outDir/$name")
    }
    spark.stop()
  }
}
