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

  // ------------------------------------------------------------------
  // Unsupervised (EM) estimation — Fellegi & Sunter §3 / Winkler 1988,
  // the label-free path production linkers (Splink) actually run.
  // ------------------------------------------------------------------

  /** Fixed-point scale of the EM parameter lattice: probabilities are
    * integers in [1, 10⁶−1] (ppm). One millionth of probability mass
    * is far below any linkage decision boundary, and the lattice makes
    * every E/M step exact integer arithmetic — replayable bit-for-bit
    * by the SQL oracle (products stay < 10³⁰·|fields| ≪ HUGEINT for
    * ≤ 4 fields; the engine side uses BigInt, so IT is exact at any
    * field count). */
  val EmScale: Long = 1000000L

  /** Agreement-pattern counts over (unlabeled) candidate pairs: one
    * row per observed pattern of per-field agreement booleans plus its
    * pair count — the 2^F-bounded sufficient statistic EM iterates on.
    * ONE aggregate pass over the pairs; everything after is
    * driver-side arithmetic on ≤ 2^F rows (the same bounded-handoff
    * contract as [[linkFs]]'s weight collect). */
  def patternCounts(pairs: DataFrame, fields: Seq[FieldPair]): DataFrame = {
    require(fields.nonEmpty, "patternCounts: no comparison fields")
    pairs.select(fields.map(f => agree(f).as("g_" + f._1)): _*)
      .groupBy(fields.map(f => col("g_" + f._1)): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** EM-estimated model parameters, all on the ppm lattice. */
  final case class EmParams(
      lambdaPpm: Long, mPpm: Map[String, Long], uPpm: Map[String, Long])

  /** Estimate `λ` (match proportion) and per-field `m`/`u`
    * probabilities by EM over the agreement-pattern counts — NO labels.
    *
    * Determinism contract (every step exact integer, every rounding a
    * stated floor):
    *  - init: `λ₀ = S/2`, `m₀ = 0.9·S`, `u₀ = 0.1·S` (S = [[EmScale]];
    *    the classic high-m/low-u symmetric start — EM for this mixture
    *    is label-switching-symmetric, and this init pins the "match"
    *    component to the high-agreement mode).
    *  - E-step, per pattern j: `A_j = λ·Π_f (γ_jf ? m_f : S−m_f)`,
    *    `B_j = (S−λ)·Π_f (γ_jf ? u_f : S−u_f)` (exact BigInt), and the
    *    posterior quantizes ONCE: `w_j = ⌊S·A_j/(A_j+B_j)⌋`.
    *  - M-step: `λ' = ⌊Σ n_j·w_j / N⌋`,
    *    `m_f' = ⌊S·Σ_{γ_jf} n_j·w_j / Σ n_j·w_j⌋`,
    *    `u_f' = ⌊S·Σ_{γ_jf} n_j·(S−w_j) / Σ n_j·(S−w_j)⌋`.
    *  - every parameter clamps to `[1, S−1]` after each M-step (the
    *    add-one analog: no component ever absorbs to 0/1, so A+B ≥ 1
    *    and no division is ever by zero); if a component's posterior
    *    mass vanishes entirely (`Σ n_j·w_j = 0` or the complement),
    *    iteration STOPS with the previous parameters — a degenerate
    *    corpus (e.g. all pairs identical) has no two-class signal.
    *
    * `iters` is deliberately a small fixed bound (default 20): EM on a
    * 2^F-cell multinomial converges in a handful of steps, the cost is
    * driver-side-trivial, and a FIXED iteration count is what the
    * unrolled SQL oracle replays (battery q143) — no data-dependent
    * stopping rule to drift on. */
  def fsEmParams(pairs: DataFrame, fields: Seq[FieldPair],
      iters: Int = 20): EmParams = {
    require(iters >= 1, s"fsEmParams: iters must be >= 1, got $iters")
    val S = BigInt(EmScale)
    val rows = patternCounts(pairs, fields).collect()
    require(rows.nonEmpty, "fsEmParams: no candidate pairs")
    val pats: Array[(Array[Boolean], BigInt)] = rows.map { r =>
      (fields.indices.map(i => r.getBoolean(i)).toArray, BigInt(r.getLong(fields.size)))
    }
    val nTotal = pats.map(_._2).sum
    var lam = S / 2
    var m = Array.fill(fields.size)(S * 9 / 10)
    var u = Array.fill(fields.size)(S / 10)
    var it = 0
    var degenerate = false
    while (it < iters && !degenerate) {
      val w = pats.map { case (g, _) =>
        val a = lam * fields.indices.map(i => if (g(i)) m(i) else S - m(i)).product
        val b = (S - lam) * fields.indices.map(i => if (g(i)) u(i) else S - u(i)).product
        S * a / (a + b)
      }
      val sw = pats.indices.map(j => pats(j)._2 * w(j)).sum
      val su = pats.indices.map(j => pats(j)._2 * (S - w(j))).sum
      if (sw == 0 || su == 0) degenerate = true
      else {
        def clamp(x: BigInt): BigInt = x.max(BigInt(1)).min(S - 1)
        lam = clamp(sw / nTotal)
        m = fields.indices.map { i =>
          clamp(S * pats.indices.filter(j => pats(j)._1(i))
            .map(j => pats(j)._2 * w(j)).sum / sw)
        }.toArray
        u = fields.indices.map { i =>
          clamp(S * pats.indices.filter(j => pats(j)._1(i))
            .map(j => pats(j)._2 * (S - w(j))).sum / su)
        }.toArray
        it += 1
      }
    }
    EmParams(lam.toLong,
      fields.indices.map(i => fields(i)._1 -> m(i).toLong).toMap,
      fields.indices.map(i => fields(i)._1 -> u(i).toLong).toMap)
  }

  /** Driver-side signed-bit twin of [[signedBits]] (same quantization
    * rule: floor toward zero on both sides of 1). */
  private def signedBitsOf(num: Long, den: Long): Long =
    if (num >= den) FloorLog2Ratio.evalBits(num, den).toLong
    else -FloorLog2Ratio.evalBits(den, num).toLong

  /** Unsupervised per-field weights from [[fsEmParams]], shaped like
    * [[fsWeights]] plus the estimated probabilities for audit:
    * `(field, m_ppm, u_ppm, w_agree_bits, w_disagree_bits)` with
    * `w_agree = bits(m/u)`, `w_disagree = bits((S−m)/(S−u))` — feed
    * the bits straight into [[scoreFs]]. */
  def fsEmWeights(pairs: DataFrame, fields: Seq[FieldPair],
      iters: Int = 20): DataFrame = {
    val p = fsEmParams(pairs, fields, iters)
    val spark = pairs.sparkSession
    import spark.implicits._
    fields.map { f =>
      val (mp, up) = (p.mPpm(f._1), p.uPpm(f._1))
      (f._1, mp, up, signedBitsOf(mp, up),
        signedBitsOf(EmScale - mp, EmScale - up))
    }.toDF("field", "m_ppm", "u_ppm", "w_agree_bits", "w_disagree_bits")
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
