package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked self-pairing for entity resolution: emit (a, b) row pairs
  * that share a blocking key, with a < b on the id — the front half of
  * every fuzzy-match pipeline (battery q47 puts Levenshtein on top).
  *
  * Blocking turns the O(n²) all-pairs comparison into per-block work,
  * but pairs per block still grow quadratically IN THE BLOCK, so one
  * hot block (a dominant (brand, size), an empty/default key) can sink
  * a 100 TB run on its own. `maxBlockSize` is the same safety valve as
  * [[graft.dedup.Dedup.candidatePairsFromBanded]]'s `maxBucketSize`:
  * blocks above the cap are excluded from pair generation — their
  * members need a cheaper route (exact dedup, a finer blocking key, or
  * per-block sampling). A capped run reports what it dropped BY
  * DEFAULT via a [[CapReport]] observation on the block-count
  * aggregate (plus the session listener's warning log); use
  * [[oversizedBlocks]] to enumerate the dropped blocks themselves.
  * Disabled by default so small-corpus results stay exhaustive.
  *
  * The pair join is merge-hinted like the LSH self-join: both sides
  * are the same plan, so forcing sort-merge gives them identical
  * exchanges that ReuseExchange collapses — the input is computed and
  * shuffled once, which is also the join a 100 TB run would pick
  * (neither side broadcastable). */
object Blocking {

  /** Pairs within each block, `a.idCol < b.idCol`. Select through the
    * `a`/`b` aliases, e.g. `col("a.p_name")`. */
  def selfPairs(
      df: DataFrame, idCol: String, blockCols: Seq[String],
      maxBlockSize: Int = Int.MaxValue): DataFrame = {
    require(blockCols.nonEmpty, "blocking needs at least one block column")
    val base =
      if (maxBlockSize == Int.MaxValue) df
      else {
        // one agg on the block key — same partitioning as the self-join
        // exchange that exists anyway
        val counts = df.groupBy(blockCols.map(col): _*)
          .agg(count(lit(1)).as("__n"))
        val ok = CapReport
          .observeExclusions(counts, "match_blocks", col("__n"), maxBlockSize)
          .filter(col("__n") <= maxBlockSize)
          .select(blockCols.map(col): _*)
        df.join(ok, blockCols)
      }
    val cond = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
      col(s"a.$idCol") < col(s"b.$idCol")
    base.as("a").hint("merge").join(base.as("b"), cond)
  }

  /** The blocks a given cap would exclude — log/report these when
    * running capped so truncation is visible, never silent. */
  def oversizedBlocks(df: DataFrame, blockCols: Seq[String], maxBlockSize: Int): DataFrame =
    df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > maxBlockSize)
}
