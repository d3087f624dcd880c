package graft

import org.apache.spark.sql.functions._

import graft.store.Store

/** Managed-table catalog: overwrite-idempotence, append, partitioned
  * fact, partition pruning. */
class StoreSpec extends SparkTestBase {
  import spark.implicits._

  test("overwrite is idempotent (the TRUNCATE+reload contract)") {
    Store.ensureDatabase(spark, "graft_test")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Store.overwrite(df, "t_overwrite")
    Store.overwrite(df, "t_overwrite")
    assert(Store.table(spark, "t_overwrite").count() == 2)
    Store.drop(spark, "t_overwrite")
  }

  test("append adds rows") {
    Store.ensureDatabase(spark, "graft_test")
    val df = Seq((1L, "a")).toDF("id", "v")
    Store.overwrite(df, "t_append")
    Store.append(df, "t_append")
    assert(Store.table(spark, "t_append").count() == 2)
    Store.drop(spark, "t_append")
  }

  test("co-bucketed tables join without a shuffle on either side") {
    Store.ensureDatabase(spark, "graft_test")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Store.overwriteBucketed(orders, "b_orders", Seq("o_orderkey"), 4)
    Store.overwriteBucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 4)
    val joined = spark.sql(
      """SELECT /*+ MERGE(b_orders) */ o.o_orderkey, l.l_quantity
        |FROM b_orders o JOIN b_lineitem l USING (o_orderkey)""".stripMargin)
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$p")
    Store.drop(spark, "b_orders"); Store.drop(spark, "b_lineitem")
  }

  test("partitioned fact table gets partition-pruned scans") {
    Store.ensureDatabase(spark, "graft_test")
    val fact = Seq((1L, 2023, 10.0), (2L, 2023, 20.0), (3L, 2024, 30.0))
      .toDF("product_sk", "year", "value")
    Store.overwrite(fact, "fact_part", partitionBy = Seq("year"))
    val pruned = Store.table(spark, "fact_part").filter(col("year") === 2024)
    assert(pruned.count() == 1)
    val plan = pruned.queryExecution.executedPlan.toString
    // the 2023 partition must not be scanned
    assert(plan.contains("PartitionFilters") || !plan.contains("year=2023"),
      s"partition pruning missing in plan:\n$plan")
    Store.drop(spark, "fact_part")
  }
}
