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

  test("multiple right payload columns come from the same right row") {
    val r2 = Seq((100L, 10L, "a", 1.0), (100L, 20L, "b", 2.0))
      .toDF("k", "t", "tag", "v")
    val out = AsOfJoin.backward(left, r2, "k", "k", "t", "t", Seq("tag", "v"), inner = true)
      .orderBy("id").select("id", "tag", "v")
      .as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((2L, "a", 1.0), (3L, "a", 1.0), (4L, "b", 2.0)))
  }
}
