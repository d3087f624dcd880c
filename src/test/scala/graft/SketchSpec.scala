package graft

import org.apache.spark.sql.functions._

/** Mergeable HLL sketches (Spark 4 DataSketches integration) — the
  * 100 TB approximate-distinct path: per-partition/per-day sketches are
  * persistable binary columns that union WITHOUT rescanning history,
  * unlike exact countDistinct which reshuffles everything each time. */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  test("per-group sketches union to the same estimate as one global sketch") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    // one sketch per order-year (the "daily sketch" pattern)
    val perYear = orders
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val unioned = perYear
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .as[Long].collect()(0)
    val global = orders
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .as[Long].collect()(0)
    // HLL union is lossless over sketches of the same lgK
    assert(unioned == global, s"union=$unioned global=$global")
    val exact = orders.select(countDistinct(col("o_custkey"))).as[Long].collect()(0)
    assert(math.abs(unioned - exact).toDouble / exact < 0.05,
      s"estimate $unioned vs exact $exact")
  }

  test("sketches are deterministic: same input -> same estimate, any partitioning") {
    val df = spark.range(10000).select((col("id") % 2357).as("v"))
    def est(parts: Int) = df.repartition(parts)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v")))).as[Long].collect()(0)
    assert(est(2) == est(13))
  }
}
