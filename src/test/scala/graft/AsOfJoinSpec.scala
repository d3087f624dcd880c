package graft

import graft.operators.AsOfJoin

/** Backward as-of join: match selection, inclusive equal-time bound,
  * no-match behavior (outer nulls vs inner drop), key isolation. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def left = Seq(
    (1L, 100L, 5L), // before any right row for key 100
    (2L, 100L, 10L), // exactly at right t=10 → inclusive match
    (3L, 100L, 17L), // between 10 and 20 → matches t=10
    (4L, 100L, 25L), // after 20 → matches t=20
    (5L, 999L, 50L)) // key with no right rows at all
    .toDF("id", "k", "t")

  private def right = Seq(
    (100L, 10L, "r10"), (100L, 20L, "r20"), (200L, 1L, "other-key"))
    .toDF("k", "t", "payload")

  test("backward as-of picks the latest right row with rt <= lt") {
    val out = AsOfJoin.backward(left, right, "k", "k", "t", "t", Seq("payload"))
      .orderBy("id").select("id", "payload")
      .as[(Long, Option[String])].collect()
    assert(out.toSeq == Seq(
      (1L, None), (2L, Some("r10")), (3L, Some("r10")), (4L, Some("r20")), (5L, None)))
  }

  test("inner = true drops unmatched left rows") {
    val out = AsOfJoin.backward(left, right, "k", "k", "t", "t", Seq("payload"), inner = true)
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 3L, 4L))
  }

  test("as-of matches an in-memory reference for arbitrary data (property)") {
    import org.scalacheck.{Gen, Prop}
    val lGen = Gen.listOfN(40, for {
      k <- Gen.chooseNum(0L, 4L); t <- Gen.chooseNum(0L, 30L)
    } yield (k, t))
    val rGen = Gen.listOfN(15, for {
      k <- Gen.chooseNum(0L, 4L); t <- Gen.chooseNum(0L, 30L); v <- Gen.chooseNum(0, 99)
    } yield (k, t, v))
    ScalaCheckSupport.checkProp(Prop.forAll(lGen, rGen) { (ls, rs) =>
      // dedup right to one row per (k,t) — the operator's precondition
      val rd = rs.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
      val lDf = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "t")
      val rDf = rd.toDF("k", "t", "v")
      val got = AsOfJoin.backward(lDf, rDf, "k", "k", "t", "t", Seq("v"))
        .select("id", "v").as[(Long, Option[Int])].collect().toMap
      ls.zipWithIndex.forall { case ((k, t), i) =>
        val want = rd.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        got(i.toLong) == want
      }
    }, minSuccessful = 10)
  }

  test("multiple right payload columns come from the same right row") {
    val r2 = Seq((100L, 10L, "a", 1.0), (100L, 20L, "b", 2.0))
      .toDF("k", "t", "tag", "v")
    val out = AsOfJoin.backward(left, r2, "k", "k", "t", "t", Seq("tag", "v"), inner = true)
      .orderBy("id").select("id", "tag", "v")
      .as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((2L, "a", 1.0), (3L, "a", 1.0), (4L, "b", 2.0)))
  }
}
