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
      // AQE may right-size cached plan output (see Bench.scala) —
      // verify under the same partitioning rules the bench runs
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // same stale-output discipline as Verify: remove the previous dump
    // BEFORE running, so a query that throws cannot leave old parquet
    // for the oracle compare to "pass" on; and keep going so one broken
    // query doesn't hide the others' results
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    var failed = 0
    names.foreach { name =>
      val dest = new java.io.File(s"$outDir/$name")
      if (dest.exists()) rmrf(dest)
      try {
        graft.SparkEntry.queries(name)(spark, sfDir)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        println(s"[dump] $name -> $outDir/$name")
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[dump] $name FAILED: ${e.getMessage}")
      }
      graft.CacheReset(spark)
    }
    // the selected queries' oracle slice, same shape as Verify's full
    // dump, so tools/xcheck.py works on partial dumps too
    val oracles = graft.SparkEntry.oracleSql.view.filterKeys(names.contains).toMap
    val json = oracles.toSeq.sortBy(_._1).map { case (n, sql) =>
      val esc = sql.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t")
      s""""$n": "$esc""""
    }.mkString("{", ",\n", "}")
    val w = new java.io.PrintWriter(s"$outDir/oracle_sql.json")
    try w.write(json) finally w.close()
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
