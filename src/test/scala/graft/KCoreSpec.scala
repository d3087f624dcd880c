package graft

import graft.operators.KCore

/** Unit coverage of k-core peeling (battery q136 checks the co-order
  * graph against a bounded-unroll DuckDB oracle). */
class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def core(k: Int, edges: (Long, Long)*): Map[Long, Long] =
    KCore.kCore(edges.toDF("a", "b"), "a", "b", k)
      .as[(Long, Long)].collect().toMap

  test("triangle with a tail: the 2-core is the triangle; no 3-core exists") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    assert(core(2, g: _*) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(core(3, g: _*).isEmpty)
  }

  test("cascade: a path unravels completely at k=2 even though interior degrees are 2") {
    // peeling the endpoints drops interior degrees below 2, round by round
    val path = (1L to 6L).sliding(2).map(s => (s.head, s.last)).toSeq
    assert(core(2, path: _*).isEmpty)
  }

  test("k=1 keeps every non-isolated node; in-core degrees reported") {
    val g = Seq((1L, 2L), (2L, 3L), (2L, 2L)) // self loop dropped
    assert(core(1, g: _*) == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("property: matches a local iterative reference on random graphs") {
    val rnd = new scala.util.Random(11)
    (1 to 4).foreach { _ =>
      val n = 14
      val edges = (for {
        i <- 1L to n; j <- (i + 1) to n if rnd.nextDouble() < 0.25
      } yield (i, j)).toSeq
      val k = 2 + rnd.nextInt(3)
      // reference: peel until stable over a mutable set
      var live = edges.toSet
      var changed = true
      while (changed) {
        val deg = live.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val next = live.filter(e => keep(e._1) && keep(e._2))
        changed = next != live
        live = next
      }
      val want = live.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(core(k, edges: _*) == want, s"k=$k")
    }
  }

  test("runaway valve: maxRounds exceeded throws instead of returning a non-fixpoint") {
    val path = (1L to 30L).sliding(2).map(s => (s.head, s.last)).toSeq
    intercept[IllegalStateException](
      KCore.kCore(path.toDF("a", "b"), "a", "b", k = 2, maxRounds = 2))
  }
}
