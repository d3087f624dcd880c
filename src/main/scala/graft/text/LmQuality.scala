package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.FloorLog2Ratio

/** Model-based quality filtering — the learned complement of
  * [[Curation.qualityFilter]]'s heuristics, covering the three public
  * techniques large-scale pipelines actually run:
  *
  *  - '''n-gram LM perplexity''' (CCNet, Wenzek et al.
  *    arXiv:1911.00359): train a bigram LM on a reference corpus,
  *    score every document's cross-entropy, drop the
  *    high-perplexity tail.
  *  - '''Naive-Bayes quality classifier''' (the GPT-3-style seed
  *    classifier, Brown et al. arXiv:2005.14165 §A; NB instead of
  *    logistic regression so training is one exact counting pass
  *    with no SGD nondeterminism).
  *  - '''DSIR importance resampling''' (Xie et al.
  *    arXiv:2302.03169): hashed-bigram bag-of-features importance
  *    weights `log p_target(f) − log p_raw(f)`, then a top-k
  *    resample toward the target distribution.
  *
  * All three are sums of `log(count ratio)` terms. Floating-point
  * `ln` would put every score one ulp away from the oracle's, so each
  * term is quantized to its EXACT integer bit count
  * `⌊log2(num/den)⌋` via the codegen
  * [[graft.functions.FloorLog2Ratio]] kernel (SQL
  * `floor_log2_ratio`; DuckDB replays it from `length(bin(x))`).
  * Scores are therefore integer "bits" — rankings and thresholds are
  * bit-for-bit reproducible in any engine, which is exactly what a
  * filter that decides what enters a training set needs to be.
  * The ⌊·⌋ quantization loses < 1 bit per term vs the real log — for
  * FILTERING (rank/threshold decisions over hundreds of tokens) the
  * deterministic integer is worth far more than the fraction.
  *
  * Scale shape (the 100 TB contract): tokenize/transition extraction
  * is fully narrow (zero exchanges); training is ONE shuffle on the
  * n-gram key producing a VOCAB-sized model (≪ corpus); scoring joins
  * the corpus against model tables that are broadcast when small, AQE
  * otherwise, then one aggregate on the document id. Nothing pairwise,
  * nothing driver-side except the model's scalar totals (the same
  * bounded-handoff pattern as the semantic codebook).
  */
object LmQuality {

  /** Whitespace tokens, empty-token-free (`trim` + split + filter so
    * leading/trailing/doubled whitespace never mints a '' token —
    * DuckDB's `string_split_regex` has the same edge and the oracles
    * filter it identically). */
  private[text] def toks(textCol: String): Column =
    filter(split(trim(col(textCol)), "\\s+"), t => t =!= lit(""))

  /** Adjacent-token transitions as (prev, w) rows — fully narrow
    * (slice/zip inside the row, no exchange). Docs with < 2 tokens
    * contribute none. */
  private[text] def transitions(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = toks(textCol)
    val n1 = greatest(size(tk) - 1, lit(0))
    df.select(col(idCol), explode(zip_with(
        slice(tk, lit(1), n1), slice(tk, lit(2), n1),
        (a, b) => struct(a.as("prev"), b.as("w")))).as("tr"))
      .select(col(idCol), col("tr.prev").as("prev"), col("tr.w").as("w"))
  }

  /** A trained bigram LM: `bigrams(prev, w, c2)` and
    * `histories(prev, c1)` are vocab-sized count tables
    * (`c1 = Σ_w c2` — the history mass BEFORE any pruning, so pruned
    * models keep honest denominators), `vocabSize` is the add-one
    * smoothing denominator `V = |distinct tokens| + 1` (the +1 is the
    * unseen-word mass). */
  final case class BigramLm(bigrams: DataFrame, histories: DataFrame, vocabSize: Long)

  /** Train a bigram LM on a reference corpus (CCNet trains on
    * Wikipedia; any DataFrame with a text column works). ONE shuffle
    * on (prev, w); `histories` is a second vocab-sized aggregate
    * DERIVED from the bigram table, not a second corpus pass.
    *
    * `minCount` is the scale valve: a 100 TB reference corpus mints
    * billions of singleton bigrams that cost model-table size but
    * carry ~zero scoring signal; pruning `c2 < minCount` AFTER the
    * `c1` roll-up keeps the smoothed distribution well-formed (pruned
    * mass falls into the `+1` smoothing floor, denominators
    * unchanged). Default 1 = exact model. */
  def trainBigramLm(idCol: String, textCol: String, minCount: Long = 1L)(
      train: DataFrame): BigramLm = {
    val trans = transitions(train, idCol, textCol)
    val bigrams = trans.groupBy("prev", "w").agg(count(lit(1)).as("c2"))
    val histories = bigrams.groupBy("prev").agg(sum("c2").as("c1"))
    val vocab = train.select(explode(toks(textCol)).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0) + 1L
    BigramLm(bigrams.filter(col("c2") >= minCount), histories, vocab)
  }

  /** The single-corpus-pass surprisal aggregate: `(id, n_trans,
    * total_bits)` for every document with ≥ 1 transition — the shared
    * core of [[surprisalBits]] and [[perplexityFilter]]. Per
    * transition, `bits = ⌊log2((c1 + V) / (c2 + 1))⌋` — the add-one
    * smoothed `−log2 p(w|prev)` in exact integer bits (unseen history
    * ⇒ `⌊log2 V⌋`).
    *
    * Join shape: corpus transitions (an `(id, text)`-pruned scan,
    * tokenized ONCE) ⋈ vocab-sized model tables (broadcast under AQE
    * at model ≪ corpus) → one groupBy(id). Zero-transition docs are
    * absent here by construction; both callers resurrect them with a
    * left join + coalesce-to-zero, so neither pays a second id scan
    * inside this frame. */
  private def surprisalAgg(idCol: String, textCol: String, lm: BigramLm)(
      docs: DataFrame): DataFrame =
    transitions(docs, idCol, textCol)
      .join(lm.bigrams, Seq("prev", "w"), "left")
      .join(lm.histories, Seq("prev"), "left")
      .select(col(idCol), FloorLog2Ratio.of(
        coalesce(col("c1"), lit(0L)) + lit(lm.vocabSize),
        coalesce(col("c2"), lit(0L)) + lit(1L)).cast(LongType).as("bits"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_trans"), sum("bits").as("total_bits"))

  /** Per-document surprisal scores: returns `(id, n_trans,
    * total_bits)` for EVERY input document (too-short docs score 0
    * over 0 transitions — the caller's threshold policy decides them,
    * not a silent drop). The resurrect join reads only the pruned id
    * column. */
  def surprisalBits(idCol: String, textCol: String, lm: BigramLm)(
      docs: DataFrame): DataFrame =
    docs.select(col(idCol)).join(surprisalAgg(idCol, textCol, lm)(docs),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("total_bits"), lit(0L)).as("total_bits"))

  /** CCNet's filter decision: keep documents whose mean surprisal is
    * at most `maxMilliBitsPerTransition / 1000` bits/transition — as
    * the INTEGER cross-multiplication `1000 · total_bits ≤ max ·
    * n_trans` (no float division, no rounding boundary; milli-bit
    * granularity because a corpus's per-token surprisal distribution
    * is typically narrower than one whole bit). Zero-transition docs
    * pass trivially (0 ≤ 0) — perplexity carries no evidence about
    * them; compose with [[Curation.qualityFilter]]'s length floor to
    * drop them. Adds `total_bits`/`n_trans` columns for audit.
    *
    * Scan shape (single-scan contract, LmQualitySpec-pinned
    * equivalent to the `docs ⋈ surprisalBits(docs)` formulation it
    * replaced): the corpus text is tokenized and scored ONCE
    * ([[surprisalAgg]]'s pruned `(id, text)` scan), then the full doc
    * frame joins that narrow 3-column score frame LEFT with
    * coalesce-to-zero — one join, no second tokenize, no separate
    * id-only resurrect branch. The old form put `surprisalBits`
    * (itself docs-id ⋈ scored) on the probe side of a second
    * corpus-wide join, so the score path cost as much as LM training
    * (BENCH_SCALE g100x: 11.3 s vs 10.0 s); this form pays one
    * score-frame build + one attach join. */
  def perplexityFilter(idCol: String, textCol: String, lm: BigramLm,
      maxMilliBitsPerTransition: Long)(docs: DataFrame): DataFrame =
    docs.join(surprisalAgg(idCol, textCol, lm)(docs), Seq(idCol), "left")
      .select((col(idCol) +:
        docs.columns.filter(_ != idCol).map(col) :+
        coalesce(col("n_trans"), lit(0L)).as("n_trans") :+
        coalesce(col("total_bits"), lit(0L)).as("total_bits")): _*)
      .filter(col("total_bits") * lit(1000L) <=
        lit(maxMilliBitsPerTransition) * col("n_trans"))

  /** A trained NB quality classifier: `wordCounts(w, c_pos, c_neg)`
    * is the vocab-sized per-class unigram table; the scalars are the
    * class token totals, class document counts, and the add-one
    * vocab denominator. */
  final case class NbModel(
      wordCounts: DataFrame,
      totPos: Long, totNeg: Long,
      docsPos: Long, docsNeg: Long,
      vocabSize: Long)

  /** Train the NB quality classifier from a labeled seed
    * (`labelCol`: boolean, true = quality). One counting pass — ONE
    * shuffle on the token — plus a scalar totals row; exactly
    * reproducible, unlike the SGD-trained logistic original. */
  def trainNbQuality(textCol: String, labelCol: String)(train: DataFrame): NbModel = {
    val tok = train.select(col(labelCol).as("y"), explode(toks(textCol)).as("w"))
    val wc = tok.groupBy("w").agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(col("y"), 0L).otherwise(1L)).as("c_neg"))
    val t = wc.agg(
      coalesce(sum("c_pos"), lit(0L)), coalesce(sum("c_neg"), lit(0L)),
      count(lit(1))).head()
    val d = train.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)),
      sum(when(col(labelCol), 0L).otherwise(1L))).head()
    NbModel(wc, t.getLong(0), t.getLong(1),
      d.getLong(0), d.getLong(1), t.getLong(2) + 1L)
  }

  /** Score documents under the NB model: per token,
    * `⌊log2 1/p(w|neg)⌋ − ⌊log2 1/p(w|pos)⌋` (positive when the word
    * is more probable under the quality class), plus the class-prior
    * bits once per document. Returns `(id, n_tokens, score_bits,
    * predicted)`; `predicted = score_bits > 0` — the deterministic
    * integer decision (ties fall to not-quality, the conservative
    * side for a data filter). OOV tokens score the smoothing floor
    * under both classes — near-zero net signal, as they should. */
  def nbScoreBits(idCol: String, textCol: String, m: NbModel)(
      docs: DataFrame): DataFrame = {
    val priorBits: Long = // bits(neg prior) − bits(pos prior), add-one smoothed
      FloorLog2Ratio.evalBits(m.docsPos + m.docsNeg + 2L, m.docsNeg + 1L).toLong -
        FloorLog2Ratio.evalBits(m.docsPos + m.docsNeg + 2L, m.docsPos + 1L).toLong
    val scored = docs.select(col(idCol), explode(toks(textCol)).as("w"))
      .join(m.wordCounts, Seq("w"), "left")
      .select(col(idCol),
        (FloorLog2Ratio.of(lit(m.totNeg + m.vocabSize),
            coalesce(col("c_neg"), lit(0L)) + lit(1L)).cast(LongType) -
          FloorLog2Ratio.of(lit(m.totPos + m.vocabSize),
            coalesce(col("c_pos"), lit(0L)) + lit(1L)).cast(LongType)).as("bits"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("bits").as("word_bits"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("word_bits"), lit(0L)) + lit(priorBits)).as("score_bits"))
      .withColumn("predicted", col("score_bits") > lit(0L))
  }

  /** One batch's bigram count deltas `(prev, w, c)` — the additive
    * unit of the ONLINE trainer: bigram counts are a sum, so a log of
    * per-batch deltas rolls up to the one-pass model of the union
    * ([[lmFromLogs]]), no corpus rescan. */
  def bigramCounts(idCol: String, textCol: String)(batch: DataFrame): DataFrame =
    transitions(batch, idCol, textCol)
      .groupBy("prev", "w").agg(count(lit(1)).as("c"))

  /** One batch's unigram counts `(tok, c)` — logged beside the bigram
    * deltas so the reconstructed model's vocab term counts EVERY
    * token (a single-token doc contributes vocabulary but no
    * transition; without this log the online V would drift from the
    * offline one). */
  def unigramCounts(textCol: String)(batch: DataFrame): DataFrame =
    batch.select(explode(toks(textCol)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))

  /** Reconstruct the exact [[BigramLm]] from count logs (e.g. the
    * per-batch partitions [[graft.streaming.StreamOps.lmCountsSink]]
    * writes): bigrams and histories are groupBy-sums over the delta
    * rows, V is the distinct logged token count + 1 — bit-identical
    * to [[trainBigramLm]] over the union of the logged batches
    * (spec-pinned), because every model ingredient is additive. */
  def lmFromLogs(biLog: DataFrame, uniLog: DataFrame, minCount: Long = 1L): BigramLm = {
    val bigrams = biLog.groupBy("prev", "w").agg(sum("c").as("c2"))
    val histories = bigrams.groupBy("prev").agg(sum("c2").as("c1"))
    val vocab = uniLog.agg(countDistinct(col("tok"))).head().getLong(0) + 1L
    BigramLm(bigrams.filter(col("c2") >= minCount), histories, vocab)
  }

  /** Token-entropy quality signal: per document,
    * `entropy_bits = Σ_types c_w · ⌊log2(n / c_w)⌋` — the exact
    * integer form of `n · H(token distribution)` (total
    * self-surprisal). The repetition/gibberish detector: a doc that
    * is one token over and over scores 0 regardless of length, a
    * diverse doc scores ≈ n·log2(distinct) — the threshold
    * composes with [[Curation.repetitionFilter]]'s n-gram view (this
    * is the unigram-distribution view of the same defect class,
    * needing no window build). Returns `(id, n_tokens, entropy_bits)`
    * for every doc (empty docs: 0 over 0). Two aggregates — (id,
    * token) then (id) — nothing vocab-global, nothing pairwise. */
  def tokenEntropyBits(idCol: String, textCol: String)(docs: DataFrame): DataFrame = {
    val perType = docs.select(col(idCol), explode(toks(textCol)).as("w"))
      .groupBy(idCol, "w").agg(count(lit(1)).as("c"))
    val perDoc = perType
      .withColumn("n", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy(idCol)))
      .select(col(idCol), col("c"),
        (col("c") * FloorLog2Ratio.of(col("n"), col("c")).cast(LongType)).as("b"),
        col("n"))
      .groupBy(idCol)
      .agg(max("n").as("n_tokens"), sum("b").as("entropy_bits"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("entropy_bits"), lit(0L)).as("entropy_bits"))
  }

  /** Hashed-bigram feature bucket (DSIR's feature map): the md5-based
    * 60-bit hash the dedup family already uses, folded modulo
    * `buckets` — deterministic, SQL-replayable, and collision-folding
    * by DESIGN (DSIR's hashing trick: bucket counts approximate the
    * n-gram distribution at fixed model size regardless of corpus
    * vocabulary). */
  private def bucketOf(buckets: Int): Column =
    conv(substring(md5(concat(col("prev"), lit(" "), col("w"))), 1, 15), 16, 10)
      .cast(LongType) % buckets

  /** Per-bucket transition counts of a corpus — the B-row feature
    * histogram (B = `buckets`, a few thousand; always broadcastable). */
  private def bucketCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    transitions(df, idCol, textCol)
      .groupBy(bucketOf(buckets).as("f")).agg(count(lit(1)).as("c"))

  /** The DSIR scoring core shared by [[dsirWeights]] and
    * [[dsirResample]]: the per-doc inner aggregate `(id, n_feats,
    * weight_bits)` over docs with ≥ 1 transition (absent docs are the
    * callers' left-join + coalesce-to-zero, same contract as
    * [[surprisalAgg]]). The two B-row histograms are materialized ONCE
    * (`localCheckpoint`): each previously re-derived its full corpus
    * scan inside the final plan AND a second time for its total — with
    * both histogram totals read off the checkpointed B rows, the raw
    * corpus is scanned once for its histogram and once for scoring,
    * never per-consumer. */
  private def dsirScored(idCol: String, textCol: String,
      target: DataFrame, buckets: Int)(raw: DataFrame): DataFrame = {
    require(buckets >= 2, s"dsirWeights: buckets must be >= 2, got $buckets")
    val tc = bucketCounts(target, idCol, textCol, buckets).localCheckpoint()
    val totT = tc.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
    val rc = bucketCounts(raw, idCol, textCol, buckets).localCheckpoint()
    val totR = rc.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
    transitions(raw, idCol, textCol)
      .select(col(idCol), bucketOf(buckets).as("f"))
      .join(broadcast(rc.withColumnRenamed("c", "c_raw")), Seq("f"), "left")
      .join(broadcast(tc.withColumnRenamed("c", "c_tgt")), Seq("f"), "left")
      .select(col(idCol),
        (FloorLog2Ratio.of(lit(totR + buckets),
            coalesce(col("c_raw"), lit(0L)) + lit(1L)).cast(LongType) -
          FloorLog2Ratio.of(lit(totT + buckets),
            coalesce(col("c_tgt"), lit(0L)) + lit(1L)).cast(LongType)).as("bits"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"), sum("bits").as("weight_bits"))
  }

  /** DSIR importance weights: for each raw document,
    * `weight_bits = Σ_occurrences [⌊log2((tot_raw+B)/(c_raw(f)+1))⌋ −
    * ⌊log2((tot_target+B)/(c_target(f)+1))⌋]` — the exact-integer form
    * of `Σ log p_target(f) − log p_raw(f)`; higher = more
    * target-like. Returns `(id, n_feats, weight_bits)` for every raw
    * doc. The two B-row histograms broadcast; the corpus never
    * shuffles except the final per-doc aggregate. */
  def dsirWeights(idCol: String, textCol: String,
      target: DataFrame, buckets: Int = 4096)(raw: DataFrame): DataFrame =
    raw.select(col(idCol))
      .join(dsirScored(idCol, textCol, target, buckets)(raw), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("weight_bits"), lit(0L)).as("weight_bits"))

  /** Resample the `k` most target-like raw documents by DSIR weight
    * (deterministic top-k: weight desc, id asc — the reproducible
    * variant of DSIR's Gumbel-noise sample; at 100 TB the ranking is
    * a k-bounded TakeOrdered, not a global sort). The paper's
    * stochastic flavor is one `rand(seed)`-keyed order away, but a
    * data filter that cannot be replayed is a provenance hole, so
    * deterministic is the shipped default. */
  def dsirResample(idCol: String, textCol: String, target: DataFrame,
      k: Int, buckets: Int = 4096)(raw: DataFrame): DataFrame =
    // one attach join: `dsirWeights` covers every raw id (left join +
    // coalesce over the scored core), so `raw ⋈inner weights` ≡
    // `raw ⋈left scored` with the same zero-fill — this form skips the
    // weights frame's extra id-only pass over `raw`
    raw.join(dsirScored(idCol, textCol, target, buckets)(raw), Seq(idCol), "left")
      .select((col(idCol) +: raw.columns.filter(_ != idCol).map(col) :+
        coalesce(col("n_feats"), lit(0L)).as("n_feats") :+
        coalesce(col("weight_bits"), lit(0L)).as("weight_bits")): _*)
      .orderBy(col("weight_bits").desc, col(idCol))
      .limit(k)
}
