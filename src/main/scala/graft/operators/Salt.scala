package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting. AQE's skew-join handling covers
  * sort-merge joins; salting is the complementary tool for skewed
  * AGGREGATIONS (one hot key overwhelming a single reducer) and for
  * broadcast-ineligible skewed joins.
  *
  * Two-phase aggregate: groupBy(key, salt) partial → groupBy(key)
  * final. Works for any algebraic aggregate (sum/count/min/max);
  * the caller supplies both phases.
  */
object Salt {

  /** Add a deterministic salt column in [0, buckets): hash-based, so
    * re-runs place rows identically (no rand() — nondeterminism breaks
    * retries and oracle checks). */
  def withSalt(df: DataFrame, saltFrom: Seq[String], buckets: Int,
      saltCol: String = "__salt"): DataFrame =
    df.withColumn(saltCol, pmod(xxhash64(saltFrom.map(col): _*), lit(buckets)))

  /** Salted two-phase sum/count: equivalent to
    * df.groupBy(keys).agg(sum(valueCol), count(*)) but the first
    * shuffle spreads each key over `buckets` reducers. */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], valueCol: String, buckets: Int): DataFrame = {
    val salted = withSalt(df, keys :+ valueCol, buckets)
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n_rows"))
  }
}
