package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.operators.Rebalance

/** The scan-parallelism valve: opens only for narrow plans whose leaf
  * splits ≪ the target, stays closed for wide plans, streams, and
  * disabled/garbage conf — and never changes results. */
class RebalanceSpec extends SparkTestBase {
  import spark.implicits._

  private def withConf(k: String, v: String)(body: => Unit): Unit = {
    val was = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body finally was match {
      case Some(x) => spark.conf.set(k, x)
      case None => spark.conf.unset(k)
    }
  }

  private lazy val smallParquet: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rebalance").toString
    spark.range(1000).selectExpr("id", "CAST(id AS STRING) AS t")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("opens for a narrow single-split scan: one round-robin exchange appears") {
    withConf("graft.cpuStageParallelism", "8") {
      val df = Rebalance.forCpuStage(spark.read.parquet(smallParquet).select("id", "t"))
      val p = df.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("roundrobin"), s"valve did not open:\n$p")
      assert(df.count() == 1000)
    }
  }

  test("stays closed for wide plans and when disabled with 0") {
    withConf("graft.cpuStageParallelism", "8") {
      val wide = spark.read.parquet(smallParquet).groupBy("t").count()
      val p = Rebalance.forCpuStage(wide).queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("roundrobin"), s"valve opened above a wide op:\n$p")
    }
    withConf("graft.cpuStageParallelism", "0") {
      val df = Rebalance.forCpuStage(spark.read.parquet(smallParquet))
      assert(!df.queryExecution.executedPlan.toString.toLowerCase.contains("roundrobin"))
    }
  }

  test("streaming inputs pass through untouched (regression: optimizedPlan access threw)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val sdf = stream.toDF().toDF("doc_id", "text")
    // forCpuStage sits inside hashedDocs — building the plan for a
    // streaming input must not throw (it did, via UnsupportedOperationChecker)
    val hashed = Dedup.hashedDocs(sdf, "doc_id", "text", Dedup.CharShingles(3))
    assert(hashed.isStreaming)
  }

  test("malformed graft.cpuStageParallelism degrades to the default instead of throwing") {
    withConf("graft.cpuStageParallelism", "16g") {
      val df = Rebalance.forCpuStage(spark.read.parquet(smallParquet))
      assert(df.count() == 1000) // no NumberFormatException
    }
  }
}
