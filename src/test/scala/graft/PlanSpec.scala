package graft

import org.apache.spark.sql.functions._

import graft.analytics.Battery

/** Physical-plan regression checks — the properties that matter at
  * 100 TB: filter pushdown into the parquet scan, column pruning,
  * broadcast joins for dims, partial (map-side) aggregation, and
  * whole-stage codegen coverage. These lock in the plan shape, not
  * just the results. */
class PlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters push into the parquet scan; projection prunes columns") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40"),
      s"no pushed filter:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"column pruning missing:\n$p")
  }

  test("q02 star join broadcasts the small dims") {
    val p = plan(Battery.q02.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("q01 aggregation is partial (map-side combine) + codegen") {
    val df = Battery.q01.run(spark, dir)
    df.collect() // finalize the adaptive plan so codegen stages appear
    val p = plan(df)
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    // "*(n) " operator prefixes mark whole-stage-codegen stages
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"), s"no codegen:\n$p")
  }

  test("q03 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan(Battery.q03.run(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"full sort for top-k:\n$p")
  }

  test("q16 referential-integrity check uses a broadcast anti-join shape") {
    val p = plan(Battery.q16.run(spark, dir))
    assert(p.contains("LeftAnti"), s"no anti-join:\n$p")
  }

  test("q26 LSH candidate join is an equi-join, not a cross product") {
    val p = plan(Battery.q26.run(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH degenerated to cross product:\n$p")
  }
}
