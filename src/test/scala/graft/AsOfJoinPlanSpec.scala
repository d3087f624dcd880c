package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.operators.AsOfJoin
import graft.plans.AsOfJoinPlan

/** The native as-of operator (LogicalPlan + Strategy + SparkPlan) must
  * agree exactly with the union+window composition on every input. */
class AsOfJoinPlanSpec extends SparkTestBase {
  import spark.implicits._

  test("tiny case: matches, inclusive bound, no-match row") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (3L, 1L, 999.0))
      .toDF("rk", "rt", "price")
    val out = AsOfJoinPlan.backward(l, r, "k", "rk", "t", "rt", Seq("price"))
      .orderBy("k", "t").as[(Long, Long, String, Option[Double])].collect()
    assert(out.toSeq == Seq(
      (1L, 10L, "a", Some(100.0)), // inclusive: rt == t matches
      (1L, 20L, "b", Some(150.0)), // latest ≤ 20
      (2L, 5L, "c", None)))        // no right rows for key 2
  }

  test("inner drops unmatched; payload columns come from the same right row") {
    val l = Seq((1L, 30L), (2L, 30L)).toDF("k", "t")
    val r = Seq((1L, 10L, 1.0, "x"), (1L, 20L, 2.0, "y")).toDF("rk", "rt", "v", "s")
    val out = AsOfJoinPlan.backward(l, r, "k", "rk", "t", "rt", Seq("v", "s"), inner = true)
      .as[(Long, Long, Double, String)].collect()
    assert(out.toSeq == Seq((1L, 30L, 2.0, "y")))
  }

  test("native operator == composition on the events/orders tables") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_orderdate", col("o_orderdate").cast("date")) // match event_date's type
    val ded = graft.dedup.Dedup.latestPerKey(
      orders.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
      Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey").desc))
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"),
        expr("CAST(timestamp_seconds(ts DIV 1000000000) AS DATE)").as("event_date"))
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.orderBy("event_id").collect().map(_.toSeq).toSeq
    val viaPlan = run(AsOfJoinPlan.backward(ev, ded, "user_id", "o_custkey",
      "event_date", "o_orderdate", Seq("o_orderkey", "o_totalprice"), inner = true))
    val viaComposition = run(AsOfJoin.backward(ev, ded, "user_id", "o_custkey",
      "event_date", "o_orderdate", Seq("o_orderkey", "o_totalprice"), inner = true))
    assert(viaPlan.nonEmpty)
    assert(viaPlan == viaComposition)
  }

  test("native == composition for arbitrary inputs (property)") {
    val lGen = Gen.listOfN(40, for {
      k <- Gen.chooseNum(0L, 5L); t <- Gen.chooseNum(0L, 30L)
    } yield (k, t))
    val rGen = Gen.listOfN(25, for {
      k <- Gen.chooseNum(0L, 5L); t <- Gen.chooseNum(0L, 30L); v <- Gen.chooseNum(0, 99)
    } yield (k, t, v))
    ScalaCheckSupport.checkProp(Prop.forAll(lGen, rGen) { (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      // ≤1 right row per (key, time): the documented precondition
      val r = rs.groupBy(x => (x._1, x._2)).values.map(_.head).toSeq
        .map { case (k, t, v) => (k, t, v.toLong) }.toDF("rk", "rt", "v")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("lid").collect().map(_.toSeq).toSeq
      rows(AsOfJoinPlan.backward(l, r, "k", "rk", "t", "rt", Seq("v"))) ==
        rows(AsOfJoin.backward(l, r, "k", "rk", "t", "rt", Seq("v")))
    }, minSuccessful = 15)
  }

  test("physical plan is AsOfJoinExec over two sorted exchanges") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v")
    val df = AsOfJoinPlan.backward(l, r, "k", "rk", "t", "rt", Seq("v"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"strategy did not plan the node:\n$p")
    assert("Sort ".r.findAllIn(p).size >= 2, s"missing per-side sorts:\n$p")
  }
}
