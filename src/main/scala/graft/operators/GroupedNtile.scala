package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.star.Sk

/** Exact, scalable `ntile` over groups — the distributed form of
  * `ntile(n) OVER (PARTITION BY group ORDER BY …)`.
  *
  * The window form moves EVERY row of a group into one task: at corpus
  * scale a 20-source quality-decile pass (battery q84's shape) becomes
  * 20 tasks each sorting corpus/20 rows — the single-partition-window
  * bend, merely sharded. This operator computes the identical bucket
  * assignment with no per-group window at all:
  *
  *  1. ONE global range sort on (group ++ order) feeds the two-phase
  *     dense rank ([[graft.star.Sk.withDistributedSk]]: range exchange
  *     + per-partition counts + broadcast offsets — fully parallel,
  *     the dim_product SK machinery).
  *  2. A group-sized aggregate (min rank, count per group) BROADCASTS
  *     back; each row's in-group rank is `global − group_min + 1` —
  *     pure arithmetic, no second shuffle of the data.
  *  3. The SQL-standard ntile rule as exact integer arithmetic
  *     (front-loaded remainder): with `base = ⌊cnt/n⌋`, `rem = cnt %
  *     n`, rank `r` lands in `⌈r/(base+1)⌉` while `r ≤ rem·(base+1)`,
  *     else `rem + ⌈(r − rem·(base+1))/base⌉`. Matches Spark's and
  *     DuckDB's `ntile` bit-for-bit (spec-pinned parity), so window
  *     callers can swap in place.
  *
  * Determinism: `orderCols` plus the group must be a TOTAL order
  * (append a unique id as the last order column, as every ranking
  * caller here already does) — ties would otherwise land in
  * rank-dependent buckets nondeterministically, in the window form
  * too. Cost: one range sort + one broadcast join; nothing is ever
  * single-task. */
object GroupedNtile {

  def groupedNtile(groupCols: Seq[String], orderCols: Seq[Column], n: Int,
      bucketCol: String = "bucket")(df: DataFrame): DataFrame = {
    require(n >= 1, s"groupedNtile: n must be >= 1, got $n")
    require(groupCols.nonEmpty, "groupedNtile: no group columns (use a lit group for global)")
    val ranked = Sk.withDistributedSk(df, "__gsk",
      groupCols.map(col) ++ orderCols)
    val groups = ranked.groupBy(groupCols.map(col): _*)
      .agg(min(col("__gsk")).as("__g0"), count(lit(1)).as("__gn"))
    val r = col("__gsk") - col("__g0") + lit(1L)
    ranked.join(broadcast(groups), groupCols)
      .withColumn("__base", expr(s"__gn div ${n}L"))
      .withColumn("__rem", col("__gn") % lit(n.toLong))
      .withColumn(bucketCol,
        when(r <= col("__rem") * (col("__base") + 1L),
          expr(s"(__gsk - __g0 + __base + 1) div (__base + 1)"))
          .otherwise(col("__rem") + expr(
            s"(__gsk - __g0 + 1 - __rem * (__base + 1) + __base - 1) div __base")))
      .drop("__gsk", "__g0", "__gn", "__base", "__rem")
  }

  /** Exact per-group discrete percentiles at corpus scale — the true
    * scale path q40's scaladoc deferred ("exact percentile is a
    * per-group sort; the scale path is approx_percentile"): the same
    * two-phase rank as [[groupedNtile]], then `percentile_disc(p)` is
    * the value at in-group rank `⌈p·cnt⌉` — a FILTER on rank, no
    * per-group collect-and-sort buffer anywhere.
    *
    * Probabilities are RATIONALS `(num, den)` (e.g. `(1,2)` =
    * median), so the target rank `⌈num·cnt/den⌉ = (num·cnt + den − 1)
    * div den` is exact integer arithmetic — a double `0.1·n` can land
    * one ulp above an integer and ceil to the WRONG rank; a rational
    * cannot. Requires `0 < num ≤ den`. Ties in the value column are
    * fine (tied rows share the value, so the rank→value map is
    * deterministic without a tiebreak).
    *
    * Returns one row per (group, prob): groupCols ++ `(p_num, p_den,
    * value)`. Cost: one global range sort + a broadcast group-counts
    * join + a narrow filter — nothing single-task. */
  def exactPercentilesDisc(groupCols: Seq[String], valueCol: String,
      probs: Seq[(Long, Long)])(df: DataFrame): DataFrame = {
    require(groupCols.nonEmpty, "exactPercentilesDisc: no group columns")
    require(probs.nonEmpty, "exactPercentilesDisc: no probabilities")
    probs.foreach { case (num, den) =>
      require(num > 0 && num <= den,
        s"exactPercentilesDisc: prob must satisfy 0 < num <= den, got $num/$den")
    }
    val ranked = Sk.withDistributedSk(
      df.select((groupCols :+ valueCol).map(col): _*), "__gsk",
      groupCols.map(col) :+ col(valueCol))
    val groups = ranked.groupBy(groupCols.map(col): _*)
      .agg(min(col("__gsk")).as("__g0"), count(lit(1)).as("__gn"))
    val withRank = ranked.join(broadcast(groups), groupCols)
      .withColumn("__r", col("__gsk") - col("__g0") + lit(1L))
    probs.map { case (num, den) =>
      withRank
        .filter(col("__r") === expr(s"(${num}L * __gn + ${den}L - 1) div ${den}L"))
        .select((groupCols.map(col) :+ lit(num).as("p_num") :+ lit(den).as("p_den") :+
          col(valueCol).as("value")): _*)
    }.reduce(_ unionByName _)
  }
}
