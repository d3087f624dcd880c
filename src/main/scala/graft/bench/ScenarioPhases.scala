package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.Manifest
import graft.streaming.StreamOps

/** Phase-timing harness for the heaviest matview scenario (q194's
  * body): per-phase wall, job count, and task seconds, so scenario
  * optimization targets the REAL phase instead of the fixture total.
  * Usage: runMain graft.bench.ScenarioPhases [sfDir] [reps]
  */
object ScenarioPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.split("=", 2))
      .collect { case Array(k, v) => (k.trim, v.trim) }
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          { jobs.incrementAndGet(); () }
        override def onStageCompleted(
            st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          taskMs.addAndGet(st.stageInfo.taskMetrics.executorRunTime)
          if (sys.env.contains("GRAFT_PHASE_STAGES") &&
              st.stageInfo.taskMetrics.executorRunTime > 500) {
            val g = st.stageInfo.details.linesIterator
              .filter(_.contains("graft.")).take(1).mkString.take(120)
            System.err.println(f"[stage] ${st.stageInfo.taskMetrics.executorRunTime / 1e3}%6.1fs " +
              s"tasks=${st.stageInfo.numTasks} ${st.stageInfo.name.take(60)} $g")
          }
          ()
        }
      })

    def phase[T](name: String)(f: => T): T = {
      val (j0, t0m) = (jobs.get(), taskMs.get())
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[phase] $name%-22s wall=$sec%6.2f " +
        s"jobs=${jobs.get() - j0} task_sec=${(taskMs.get() - t0m) / 1e3}")
      r
    }

    (1 to reps).foreach { rep =>
      graft.CacheReset(spark)
      System.err.println(s"[phase] === rep $rep ===")
      val base = java.nio.file.Files
        .createTempDirectory("graft_phases").toString
      val src = s"$base/orders_src"
      val v1 = s"$base/by_cust"; val v2 = s"$base/by_status"
      val v3 = s"$base/count_rollup"
      val orders = graft.Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      val cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
      val views = Seq(
        StreamOps.MatView(src, v1, "p1", "o_custkey",
          Seq(("n", "count", ""), ("cents", "sum", cents))),
        StreamOps.MatView(src, v2, "p2", "o_orderstatus",
          Seq(("n", "count", ""), ("cents", "sum", cents))),
        StreamOps.MatView(v1, v3, "p3", "n",
          Seq(("m", "count", ""), ("cents", "sum", "cents"))))
      val mk = orders.agg(max(col("o_orderkey"))).head().getLong(0)
      phase("append1")(Manifest.append(
        orders.filter(col("o_orderkey") <= mk / 2).coalesce(1),
        src, statsCols = Seq("o_orderkey")))
      phase("pump1_bootstrap")(StreamOps.matviewDagStep(spark, views))
      phase("append2")(Manifest.append(
        orders.filter(col("o_orderkey") > mk / 2).coalesce(1),
        src, statsCols = Seq("o_orderkey")))
      phase("pump2_insert")(StreamOps.matviewDagStep(spark, views))
      phase("upsert")(Manifest.upsert(
        orders.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(100.0)),
        src, "o_orderkey"))
      phase("dv_delete")(Manifest.deleteWhereBetweenDv(
        spark, src, "o_custkey", 1L, 30L))
      phase("pump3_retract")(StreamOps.matviewDagStep(spark, views))
      phase("pump4_noop")(StreamOps.matviewDagStep(spark, views))
      phase("digest") {
        val v2d = Manifest.read(spark, v2).select(lit("by_status").as("ref"),
          col("o_orderstatus").cast("string").as("grp"), col("n"), col("cents"))
        val v3d = Manifest.read(spark, v3).select(lit("rollup").as("ref"),
          col("n").cast("string").as("grp"), col("m").as("n"), col("cents"))
        v2d.unionByName(v3d).orderBy("ref", "grp")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
