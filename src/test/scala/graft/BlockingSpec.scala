package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.operators.Blocking

/** Blocked self-pairing and its hot-block safety valve. */
class BlockingSpec extends SparkTestBase {
  import spark.implicits._

  // block "hot" has 4 members (6 pairs), block "cold" has 2 (1 pair)
  private def rows = Seq(
    (1L, "hot", "aa"), (2L, "hot", "ab"), (3L, "hot", "ac"), (4L, "hot", "ad"),
    (5L, "cold", "zz"), (6L, "cold", "zy"))
    .toDF("id", "blk", "name")

  test("uncapped selfPairs emits every in-block pair with id_a < id_b") {
    val got = Blocking.selfPairs(rows, "id", Seq("blk"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .as[(Long, Long)].collect().toSet
    val want = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (5L, 6L))
    assert(got == want, s"got $got")
  }

  test("maxBlockSize excludes oversized blocks; oversizedBlocks reports them") {
    val got = Blocking.selfPairs(rows, "id", Seq("blk"), maxBlockSize = 3)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((5L, 6L)), s"hot block leaked pairs: $got")
    val over = Blocking.oversizedBlocks(rows, Seq("blk"), maxBlockSize = 3)
      .as[(String, Long)].collect().toSet
    assert(over == Set(("hot", 4L)), s"got $over")
  }

  test("property: selfPairs == naive in-block pairs; cap == naive over small blocks only") {
    val rowGen = for {
      n <- Gen.chooseNum(0, 30)
      blks <- Gen.listOfN(n, Gen.oneOf("b0", "b1", "b2"))
    } yield blks.zipWithIndex.map { case (b, i) => (i.toLong, b) }
    ScalaCheckSupport.checkProp(Prop.forAll(rowGen, Gen.chooseNum(1, 10)) { (data, cap) =>
      val df = data.toDF("id", "blk")
      def naive(maxN: Int) = {
        val sizes = data.groupBy(_._2).view.mapValues(_.size).toMap
        (for {
          (ia, ba) <- data; (ib, bb) <- data
          if ba == bb && ia < ib && sizes(ba) <= maxN
        } yield (ia, ib)).toSet
      }
      def run(maxN: Int) = Blocking.selfPairs(df, "id", Seq("blk"), maxN)
        .select(col("a.id").as("ia"), col("b.id").as("ib"))
        .as[(Long, Long)].collect().toSet
      run(Int.MaxValue) == naive(Int.MaxValue) && run(cap) == naive(cap)
    }, minSuccessful = 15)
  }

  test("multi-column blocking keys behave like a composite key") {
    val df = Seq((1L, "x", 1, "n1"), (2L, "x", 1, "n2"), (3L, "x", 2, "n3"))
      .toDF("id", "b1", "b2", "name")
    val got = Blocking.selfPairs(df, "id", Seq("b1", "b2"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)), s"got $got")
  }
}
