package graft

import org.apache.spark.sql.functions._

/** AQE skew handling: with a hot key dominating one side, the runtime
  * must split the skewed partition instead of letting one task carry
  * 90% of the join. Thresholds are lowered so the (small) test data
  * triggers the same code path a 100 TB skew would. */
class SkewJoinSpec extends SparkTestBase {

  test("AQE splits a skewed sort-merge join partition (skew=true in final plan)") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of left rows share key 0; right is uniform
      val left = spark.range(200000)
        .select(when(col("id") % 10 =!= 0, 0L).otherwise(col("id")).as("k"),
          concat(lit("padpadpadpadpadpadpad-"), col("id")).as("lv"))
      val right = spark.range(20000)
        .select(col("id").as("k"), concat(lit("r-"), col("id")).as("rv"))
      val joined = left.join(right.hint("merge"), "k")
      // collect() (not count()) so THIS DataFrame's queryExecution is the
      // one that ran — count() builds a separate execution and the
      // inspected plan would still be isFinalPlan=false
      assert(joined.collect().nonEmpty)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"no skew split in final plan:\n${p.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
