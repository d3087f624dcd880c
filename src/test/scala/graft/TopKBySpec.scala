package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKBy

/** Native per-group top-k aggregate: correctness on ties/small groups/
  * nulls, agreement with the window formulation on real data, and the
  * partial-aggregation plan shape that makes it scale. */
class TopKBySpec extends SparkTestBase {
  import spark.implicits._

  test("keeps the k largest by order, ties broken by payload asc") {
    val df = Seq(
      ("g1", 3.0, 30L), ("g1", 5.0, 50L), ("g1", 4.0, 40L), ("g1", 5.0, 49L),
      ("g2", 1.0, 10L))
      .toDF("g", "o", "p")
    val out = df.groupBy("g").agg(TopKBy.topkBy(col("o"), col("p"), 2).as("top"))
      .orderBy("g").as[(String, Seq[Long])].collect()
    // g1: two order=5.0 rows tie -> payload asc (49 before 50)
    assert(out.toSeq == Seq(("g1", Seq(49L, 50L)), ("g2", Seq(10L))))
  }

  test("null orders and payloads are skipped, not counted") {
    val df = Seq(
      (Some(2.0), Some(20L)), (None, Some(99L)), (Some(1.0), None), (Some(3.0), Some(30L)))
      .toDF("o", "p")
    val out = df.agg(TopKBy.topkBy(col("o"), col("p"), 5)).as[Seq[Long]].collect()(0)
    assert(out == Seq(30L, 20L))
  }

  test("matches the row_number window formulation on the part table") {
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val viaAgg = part.groupBy("p_brand")
      .agg(TopKBy.topkBy(col("p_retailprice"), col("p_partkey"), 3).as("top"))
      .select(col("p_brand"), posexplode(col("top")).as(Seq("i", "p_partkey")))
      .select(col("p_brand"), (col("i") + 1).as("rn"), col("p_partkey"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    val viaWindow = part.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("p_brand"), col("rn").cast("int").as("rn"), col("p_partkey"))
    assert(viaAgg.collect().map(_.toSeq).toSet == viaWindow.collect().map(_.toSeq).toSet)
  }

  test("plans as partial ObjectHashAggregate (map-side k-bounded combine)") {
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val df = part.groupBy("p_brand")
      .agg(TopKBy.topkBy(col("p_retailprice"), col("p_partkey"), 3))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"no object hash aggregate:\n$p")
    assert(p.contains("partial_topk_by") || "ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"no partial (map-side) phase:\n$p")
  }

  test("amortized prune keeps buffers bounded on a large single group") {
    val df = spark.range(100000).select(
      (col("id") % 1000).cast("double").as("o"), col("id").as("p"))
    val out = df.agg(TopKBy.topkBy(col("o"), col("p"), 4)).as[Seq[Long]].collect()(0)
    // order 999.0 rows: ids 999, 1999, 2999, 3999 are the smallest payloads
    assert(out == Seq(999L, 1999L, 2999L, 3999L))
  }
}
