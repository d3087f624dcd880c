package graft

import org.scalacheck.{Gen, Prop}

import graft.operators.Centrality

/** Integer-exact PageRank: hand-computed fixture + property against a
  * driver-side model using the same floor-division arithmetic. */
class CentralitySpec extends SparkTestBase {
  import spark.implicits._

  test("path graph 1-2-3: hand-computed integer ranks per iteration") {
    val ver = Seq((1L, 2L), (2L, 3L))
    val edges = (ver ++ ver.map(_.swap)).toDF("src", "dst")
    val r1 = Centrality.integerPageRank(edges, iters = 1)
      .orderBy("v").as[(Long, Long)].collect().toSeq
    // r0 = 1e6 each; deg(1)=deg(3)=1, deg(2)=2
    // in-sums: v1 <- 1e6/2 = 500000; v2 <- 1e6 + 1e6; v3 <- 500000
    assert(r1 == Seq(
      (1L, 150000L + 500000L * 85 / 100),
      (2L, 150000L + 2000000L * 85 / 100),
      (3L, 150000L + 500000L * 85 / 100)), r1)
    val r2 = Centrality.integerPageRank(edges, iters = 2)
      .orderBy("v").as[(Long, Long)].collect().toSeq
    // r1 = (575000, 1850000, 575000); 1850000 DIV 2 = 925000
    assert(r2 == Seq(
      (1L, 150000L + 925000L * 85 / 100),
      (2L, 150000L + (575000L + 575000L) * 85 / 100),
      (3L, 150000L + 925000L * 85 / 100)), r2)
  }

  test("property: matches a driver-side integer PageRank model") {
    val pairGen = for {
      a <- Gen.choose(1L, 6L); b <- Gen.choose(1L, 6L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    ScalaCheckSupport.checkProp(Prop.forAll(
      Gen.nonEmptyListOf(pairGen).map(_.distinct), Gen.choose(1, 4)) { (pairs, iters) =>
      val sym = (pairs ++ pairs.map(_.swap)).distinct
      val edges = sym.toDF("src", "dst")
      val nodes = sym.map(_._1).distinct.sorted
      val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var r = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val in = sym.groupBy(_._2).view.mapValues(
          _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
        r = nodes.map(v => v -> (150000L + in.getOrElse(v, 0L) * 85 / 100)).toMap
      }
      val got = Centrality.integerPageRank(edges, iters)
        .orderBy("v").as[(Long, Long)].collect().toSeq
      got == nodes.map(v => (v, r(v)))
    }, minSuccessful = 10)
  }
}
