package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus relevance scoring for training-data selection: TF-IDF over
  * whitespace tokens — the standard "which documents/terms carry
  * signal" primitive behind quality-weighted sampling and
  * domain-targeted selection (cf. DSIR-style importance resampling,
  * which reduces to ratios of exactly these term statistics).
  *
  * Cross-engine determinism: idf is the RATIONAL form (N+1)/(df+1)
  * rather than ln((N+1)/(df+1)) — libm transcendentals are not
  * bit-portable across engines, and ln is monotone, so rankings and
  * thresholds are unchanged for a fixed corpus while every score stays
  * one IEEE division of exact BIGINT operands (the +1s are the
  * standard smoothing, keeping df = 0 query terms finite).
  */
object Relevance {

  /** Per-(doc, term) TF-IDF: tf = raw in-doc count of the lowercased
    * token, df = number of docs containing it, N = corpus row count.
    * score = tf·(N+1)/(df+1) as one exact-operand IEEE division.
    * Returns (idCol, term, tf, df, score).
    *
    * Shuffle shape (the canonical distributed tf-idf): one exchange for
    * the (doc, term) counts, one for the per-term doc frequency, one to
    * co-locate the tf⋈df join on the term — all with map-side partial
    * aggregation; N rides along as a broadcast scalar. Nothing is
    * collected to the driver and no side is assumed broadcastable (at
    * 100 TB the vocabulary alone can exceed executor memory). */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("__n"))
    tf.join(docFreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        ((col("tf") * (col("__n") + 1L)).cast("double") /
          (col("df") + 1L).cast("double")).as("score"))
  }
}
