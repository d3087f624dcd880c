package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for HYBRID retrieval — merging a lexical ranking (BM25)
  * and a vector ranking (embedding cosine) into one result list
  * without score calibration, via reciprocal rank fusion
  * (Cormack, Clarke & Büttcher, SIGIR 2009: `score(d) = Σ_lists
  * 1/(c + rank_list(d))`, c = 60). RRF deliberately ignores the raw
  * scores — BM25 milli-bits and cosine live on incomparable scales —
  * and uses only each list's rank, which makes the fusion exact
  * integer arithmetic here: each contribution is `10⁹ div (c + rank)`
  * (parts-per-billion), so both engines of the oracle gate floor the
  * same rationals and the fused ordering is bit-reproducible.
  *
  * Scale shape: fusion consumes BOUNDED candidate lists (each input is
  * the top-k of an upstream retriever, k in the tens), so the union +
  * groupBy here moves O(lists·k) rows — driver-light, shuffle-trivial —
  * regardless of corpus size. The heavy lifting stays in the
  * retrievers (pruned postings scans, IVF-probed vector scans); this
  * operator is the cheap last mile, which is exactly RRF's production
  * role.
  */
object RankFusion {

  /** Attach a 1-based `rank` column in `orderCols` order. The input
    * MUST be a bounded candidate list (an upstream top-k), not a
    * corpus: ranking uses an unpartitioned window — a deliberate
    * single-partition sort over ≤ k rows, not a scale path. */
  def rankBy(df: DataFrame, orderCols: Seq[Column],
      out: String = "rank"): DataFrame =
    df.withColumn(out, row_number().over(Window.orderBy(orderCols: _*)))

  /** Reciprocal-rank-fuse candidate lists. Each input carries
    * (`idCol`, `rankCol`) with 1-based ranks (see [[rankBy]]); absent
    * ids simply contribute nothing from that list. Returns the fused
    * top-`k` as (`idCol`, `n_lists`, `rrf_ppb`) ordered by fused score
    * then id — `rrf_ppb` is the exact integer Σ 10⁹ div (c + rank). */
  def rrf(lists: Seq[DataFrame], idCol: String, rankCol: String = "rank",
      c: Long = 60L, k: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrf: no candidate lists")
    require(c >= 0, s"rrf: c must be >= 0, got $c")
    require(k >= 1, s"rrf: k must be >= 1, got $k")
    val contribs = lists.map { df =>
      // `div`, not `/`: Spark's slash is DOUBLE division on integers,
      // and the ppb quantization must be an exact integer floor
      df.select(col(idCol),
        expr(s"1000000000L div (${c}L + $rankCol)").as("contrib"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_lists"), sum("contrib").as("rrf_ppb"))
      .orderBy(col("rrf_ppb").desc, col(idCol).asc)
      .limit(k)
  }
}
