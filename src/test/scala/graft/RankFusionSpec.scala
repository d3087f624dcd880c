package graft

import org.apache.spark.sql.functions._

import graft.operators.RankFusion

/** Unit coverage of reciprocal-rank fusion (battery q169 checks the
  * full hybrid BM25+cosine retriever against the DuckDB oracle). */
class RankFusionSpec extends SparkTestBase {
  import spark.implicits._

  private def c(r: Long): Long = 1000000000L / (60L + r)

  test("rrf sums exact ppb contributions; absent ids contribute nothing") {
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val b = Seq((11L, 1), (13L, 2)).toDF("id", "rank")
    val out = RankFusion.rrf(Seq(a, b), "id")
      .as[(Long, Long, Long)].collect().toSeq
    // 11 is mid-rank in BOTH lists and must beat every single-list id
    assert(out == Seq(
      (11L, 2L, c(2) + c(1)),
      (10L, 1L, c(1)),
      (13L, 1L, c(2)),
      (12L, 1L, c(3))), out.toString)
  }

  test("k bounds the fused list; ties break by id") {
    val a = Seq((7L, 1), (3L, 1)).toDF("id", "rank") // distinct lists
    val b = Seq.empty[(Long, Int)].toDF("id", "rank")
    // same contribution from rank 1 twice: tie → smaller id first
    val out = RankFusion.rrf(Seq(a, b), "id", k = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((3L, 1L, c(1))), out.toString)
  }

  test("rankBy is 1-based in the stated order with id tiebreak") {
    val df = Seq((5L, 90L), (6L, 95L), (7L, 90L)).toDF("id", "score")
    val r = RankFusion.rankBy(df, Seq(col("score").desc, col("id").asc))
      .select("id", "rank").as[(Long, Int)].collect().toMap
    assert(r == Map(6L -> 1, 5L -> 2, 7L -> 3), r.toString)
  }
}
