package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.FloorLog2Ratio

/** Probabilistic record linkage — Fellegi & Sunter (JASA 1969), the
  * standard model behind production linkers (public: Splink, the US
  * Census Bureau's matching literature): every field comparison
  * contributes a log-likelihood-ratio weight
  * `log2(P(agree | match) / P(agree | non-match))`, a pair's score is
  * the sum over fields, and a threshold splits link / non-link.
  *
  * This implementation is the SUPERVISED counting form (labeled pairs
  * → exact m/u counts; the EM-estimated variant trades exactness for
  * unlabeled data — wrong trade here, where determinism is the
  * contract), with every weight quantized to exact integer bits by
  * the same [[graft.functions.FloorLog2Ratio]] rule as the LM/NB/DSIR
  * family: `w = ⌊log2(num/den)⌋` when the ratio ≥ 1, else
  * `−⌊log2(den/num)⌋` (negative weights quantize toward zero — a
  * stated rule, identical in the SQL oracle). Smoothing is add-one on
  * counts (`(a+1)/(n+2)`), so zero-agreement fields stay finite.
  *
  * Scale shape: candidate pairs come from the blocking family
  * ([[Blocking.selfPairs]] / LSH) — never all-pairs; training is ONE
  * aggregate over the labeled pairs (a fields-sized result); scoring
  * is a narrow per-pair sum with the weights inlined as literals (the
  * bounded driver handoff, fields-count entries). Count products
  * bound: |pairs| ≤ ~3·10⁹ keeps `(a+1)·(n+2) < 2⁶³` with room.
  */
object Linkage {

  /** One comparator: (field label, left column, right column);
    * agreement = null-safe equality of the two columns. */
  type FieldPair = (String, String, String)

  private def agree(f: FieldPair): Column = col(f._2) <=> col(f._3)

  /** Per-field agreement counts over LABELED pairs:
    * `(field, n_match, n_unmatch, a_match, a_unmatch)` — one pass,
    * fields-sized result. */
  def fsCounts(pairs: DataFrame, labelCol: String,
      fields: Seq[FieldPair]): DataFrame = {
    require(fields.nonEmpty, "fsCounts: no comparison fields")
    val rows = fields.map { f =>
      pairs.select(
        lit(f._1).as("field"),
        col(labelCol).as("__m"),
        agree(f).as("__a"))
    }.reduce(_ unionByName _)
    rows.groupBy("field").agg(
      sum(when(col("__m"), 1L).otherwise(0L)).as("n_match"),
      sum(when(col("__m"), 0L).otherwise(1L)).as("n_unmatch"),
      sum(when(col("__m") && col("__a"), 1L).otherwise(0L)).as("a_match"),
      sum(when(!col("__m") && col("__a"), 1L).otherwise(0L)).as("a_unmatch"))
  }

  /** Signed integer-bit quantization of `log2((an/ad) / (bn/bd))` =
    * `log2(an·bd / (ad·bn))` — positive ratios floor, sub-1 ratios
    * negate the floored inverse. */
  private def signedBits(an: Column, ad: Column, bn: Column, bd: Column): Column = {
    val num = an * bd
    val den = ad * bn
    when(num >= den, FloorLog2Ratio.of(num, den).cast(LongType))
      .otherwise(-FloorLog2Ratio.of(den, num).cast(LongType))
  }

  /** Trained per-field weights
    * `(field, w_agree_bits, w_disagree_bits)`:
    * `w_agree = bits(m/u)`, `w_disagree = bits((1−m)/(1−u))` with
    * add-one-smoothed `m = (a_m+1)/(n_m+2)`, `u = (a_u+1)/(n_u+2)`. */
  def fsWeights(pairs: DataFrame, labelCol: String,
      fields: Seq[FieldPair]): DataFrame = {
    // Loud overflow guard (the ~3·10⁹-pair envelope stated above):
    // signedBits multiplies (a+1)·(n+2)-style count pairs in BIGINT,
    // and non-ANSI Spark would WRAP past 2⁶³ — silently wrong weights.
    // Counts are a fields-sized aggregate, so checking costs one tiny
    // pass; localCheckpoint keeps the pairs scan from running twice.
    val counts = fsCounts(pairs, labelCol, fields).localCheckpoint(false)
    val overflow = counts.filter(
        col("n_match") + 2L > lit(Long.MaxValue) / (col("n_unmatch") + 2L))
      .select("field").collect().map(_.getString(0))
    require(overflow.isEmpty,
      s"fsWeights: labeled-pair counts overflow the BIGINT weight arithmetic " +
        s"for fields ${overflow.mkString(",")} (bound: (n_match+2)·(n_unmatch+2) < 2^63)")
    counts.select(
      col("field"),
      signedBits(col("a_match") + 1L, col("n_match") + 2L,
        col("a_unmatch") + 1L, col("n_unmatch") + 2L).as("w_agree_bits"),
      signedBits(col("n_match") - col("a_match") + 1L, col("n_match") + 2L,
        col("n_unmatch") - col("a_unmatch") + 1L, col("n_unmatch") + 2L)
        .as("w_disagree_bits"))
  }

  /** Score pairs under trained weights (the bounded literal handoff —
    * one (w_agree, w_disagree) pair per field): adds
    * `score_bits = Σ_f (agree(f) ? w_a(f) : w_d(f))` — fully narrow,
    * no joins. */
  def scoreFs(pairs: DataFrame, fields: Seq[FieldPair],
      weights: Map[String, (Long, Long)]): DataFrame = {
    val missing = fields.map(_._1).filterNot(weights.contains)
    require(missing.isEmpty, s"scoreFs: no weights for fields $missing")
    val score = fields.map { f =>
      val (wa, wd) = weights(f._1)
      when(agree(f), lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _)
    pairs.withColumn("score_bits", score)
  }

  /** Train-and-score in one call: weights from the labeled pairs,
    * every pair scored, `predicted = score_bits ≥ minScoreBits`.
    * Returns the scored frame; read the weights separately via
    * [[fsWeights]] when auditing the model. */
  def linkFs(pairs: DataFrame, labelCol: String, fields: Seq[FieldPair],
      minScoreBits: Long): DataFrame = {
    val w = fsWeights(pairs, labelCol, fields).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    scoreFs(pairs, fields, w)
      .withColumn("predicted", col("score_bits") >= lit(minScoreBits))
  }
}
