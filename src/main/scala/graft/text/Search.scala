package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FloorLog2Ratio

/** Full-text search over the corpus — the inverted-index family: a
  * curation pipeline needs exact term/phrase lookup ("which documents
  * contain this contaminated string", "where does this boilerplate
  * occur") and a deterministic relevance ranking, at corpus scale.
  *
  *  - '''Postings''' (`buildPostings`): the classic positional
  *    inverted index as rows `(term, id, pos)` — one narrow
  *    tokenize+posexplode pass. Persist it partitioned/bucketed by
  *    term and every term lookup becomes a pruned scan instead of a
  *    corpus pass; the frame form feeds the operators below directly.
  *  - '''Term stats''' (`termStats`): document frequency + collection
  *    frequency per term (one vocab-sized aggregate) — the IDF side
  *    of ranking and the "rare term first" planning input.
  *  - '''Phrase search''' (`phraseSearch`): exact k-word phrase
  *    occurrences via the standard positional-join: term i of the
  *    phrase at `pos - i` ⇒ k−1 equi-joins on `(id, pos)`. Each side
  *    is a single-term posting list (filter-pushdown scan of the
  *    stored index); AQE broadcasts the rare-term sides. No window
  *    functions, no per-doc re-scan — cost follows the PHRASE terms'
  *    posting sizes, not the corpus.
  *  - '''Ranking''' (`rankByTfIdfBits`): tf·idf with the idf
  *    quantized to exact integer bits (`⌊log2(N/df)⌋` via
  *    [[graft.functions.FloorLog2Ratio]]) — `score = Σ_t tf(t,d) ·
  *    idf_bits(t)` is pure BIGINT arithmetic, so the ranking is
  *    bit-for-bit reproducible (the float tf·idf lives in
  *    [[graft.text.Relevance]]; this is the deterministic-ordering
  *    twin for provenance-bearing pipelines).
  *
  * Tokenizer: [[LmQuality.toks]] (trim, whitespace split, ''-free) —
  * one tokenizer across the model/search family so a phrase found
  * here is the phrase the LM scored. */
object Search {

  /** Positional postings `(term, id, pos)` — `pos` is the 0-based
    * token offset. Fully narrow (no exchange); write it bucketed by
    * `term` for pruned lookups at rest. */
  def buildPostings(idCol: String, textCol: String)(docs: DataFrame): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(LmQuality.toks(textCol)).as(Seq("pos", "term")))
      .select(col("term"), col("id"), col("pos"))

  /** Per-term document frequency (`df`) and collection frequency
    * (`cf`) — ONE shuffle on the term, vocab-sized result. */
  def termStats(postings: DataFrame): DataFrame =
    postings.groupBy("term")
      .agg(countDistinct(col("id")).as("df"), count(lit(1)).as("cf"))

  /** Exact phrase occurrences: `(id, pos)` of every start position
    * where `phrase` appears contiguously. k−1 equi-joins on
    * `(id, pos)`, each probing one term's posting list; overlapping
    * matches all report (a phrase "a a" in "a a a" matches at 0 AND
    * 1). Empty phrase is a contract error (throw) — "match
    * everything" silently is never what a screen meant. */
  def phraseSearch(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    val first = postings.filter(col("term") === phrase.head)
      .select(col("id"), col("pos"))
    phrase.tail.zipWithIndex.foldLeft(first) { case (acc, (term, i)) =>
      acc.join(postings.filter(col("term") === term)
          .select(col("id"), (col("pos") - lit(i + 1)).as("pos")),
        Seq("id", "pos"))
    }
  }

  /** Deterministic tf·idf ranking of the corpus for a term-set query:
    * `score_bits(d) = Σ_t tf(t,d) · ⌊log2(N/df(t))⌋` over the query
    * terms present in the corpus (absent terms carry no evidence and
    * drop out; a corpus-wide term has idf_bits 0 and ranks nothing,
    * exactly as idf intends). Returns the top `k` as
    * `(id, score_bits)`, ties broken by id — a k-bounded TakeOrdered,
    * not a global sort. `nDocs` is the caller's corpus size (pass
    * `docs.count()` or the catalog stat — not recomputed here so the
    * stored-postings path needs no extra corpus pass). */
  def rankByTfIdfBits(postings: DataFrame, query: Seq[String], nDocs: Long,
      k: Int): DataFrame = {
    require(query.nonEmpty, "rankByTfIdfBits: empty query")
    require(nDocs >= 1, s"rankByTfIdfBits: nDocs must be >= 1, got $nDocs")
    val qterms = postings.filter(col("term").isin(query.distinct: _*))
    val idf = qterms.groupBy("term")
      .agg(countDistinct(col("id")).as("df"))
      .select(col("term"),
        FloorLog2Ratio.of(lit(nDocs), col("df")).cast("long").as("idf_bits"))
    qterms.groupBy("term", "id").agg(count(lit(1)).as("tf"))
      .join(broadcast(idf), Seq("term"))
      .groupBy("id")
      .agg(sum(col("tf") * col("idf_bits")).as("score_bits"))
      .orderBy(col("score_bits").desc, col("id"))
      .limit(k)
  }

  /** Deterministic BM25 ranking (Robertson–Spärck Jones; the Okapi
    * form with Lucene's non-negative idf) — the saturation/
    * length-normalized upgrade of [[rankByTfIdfBits]], quantized so
    * the whole computation is exact BIGINT arithmetic with three
    * STATED floor points (each replayed by the SQL oracle, battery
    * q144):
    *
    *  1. `avg_len_milli = ⌊1000·T/N⌋` — corpus mean doc length in
    *     milli-tokens (T = total tokens = |postings|, N = `nDocs`).
    *  2. `len_factor_milli(d) = ⌊((1000−b)·avgm + b·1000·dl(d)) /
    *     avgm⌋` — `1000·(1−b′+b′·dl/avgdl)` with `b′ = b/1000`.
    *  3. `sat_milli(t,d) = ⌊10⁶·tf·(k1+1000) / (10⁶·tf +
    *     k1·len_factor_milli)⌋` — `1000·tf(k1′+1)/(tf+k1′·lf)` with
    *     `k1′ = k1/1000`; the classic saturation curve, ≤ k1+1000.
    *
    * `idf_bits(t) = ⌊log2((2N+2)/(2df+1))⌋` — Lucene's
    * `log(1 + (N−df+½)/(df+½))` reduced to one exact integer ratio
    * (never negative, zero only for terms in > half the corpus).
    * `score_milli_bits(d) = Σ_t idf_bits(t) · sat_milli(t,d)`;
    * ranking is (score desc, id), a k-bounded TakeOrdered.
    *
    * Defaults `k1 = 1.2, b = 0.75` as milli-integers. Shuffle shape:
    * doc lengths are ONE postings aggregate on the id (at rest, store
    * them beside the stored index and this becomes a colocated probe);
    * idf is a query-terms-only aggregate broadcast to the tf rows; the
    * only corpus-sized join is tf ⋈ doc-lengths on the id. Overflow
    * envelope: `10⁶·tf·(k1+1000) < 2⁶³` ⇔ `tf < 4·10⁹` at the default
    * k1 — documents beyond 4 billion occurrences of one term are not
    * documents. */
  def rankByBm25Bits(postings: DataFrame, query: Seq[String], nDocs: Long,
      k: Int, k1Milli: Long = 1200L, bMilli: Long = 750L): DataFrame = {
    require(query.nonEmpty, "rankByBm25Bits: empty query")
    require(nDocs >= 1, s"rankByBm25Bits: nDocs must be >= 1, got $nDocs")
    require(k1Milli >= 0 && bMilli >= 0 && bMilli <= 1000,
      s"rankByBm25Bits: k1Milli >= 0 and bMilli in [0, 1000], got $k1Milli/$bMilli")
    val dls = postings.groupBy("id").agg(count(lit(1)).as("dl"))
    val totTokens = dls.agg(coalesce(sum("dl"), lit(0L))).head().getLong(0)
    val avgm = 1000L * totTokens / nDocs
    require(avgm >= 1,
      s"rankByBm25Bits: corpus averages < 1/1000 token per doc (T=$totTokens, N=$nDocs)")
    val qterms = postings.filter(col("term").isin(query.distinct: _*))
    val idf = qterms.groupBy("term")
      .agg(countDistinct(col("id")).as("df"))
      .select(col("term"),
        FloorLog2Ratio.of(lit(2L * nDocs + 2L), lit(2L) * col("df") + lit(1L))
          .cast("long").as("idf_bits"))
    qterms.groupBy("term", "id").agg(count(lit(1)).as("tf"))
      .join(broadcast(idf), Seq("term"))
      .join(dls, Seq("id"))
      // `div`, not `/`: Spark's slash is DOUBLE division on BIGINTs,
      // and the three quantization points must be exact integer floors
      .withColumn("lf", expr(
        s"(((1000 - $bMilli) * ${avgm}L + $bMilli * 1000 * dl) div ${avgm}L)"))
      .withColumn("sat", expr(
        s"((1000000 * tf * (${k1Milli}L + 1000)) div (1000000 * tf + $k1Milli * lf))"))
      .groupBy("id")
      .agg(sum(col("idf_bits") * col("sat")).as("score_milli_bits"))
      .orderBy(col("score_milli_bits").desc, col("id"))
      .limit(k)
  }

  /** Bootstrap the STORED postings index: the corpus's postings as a
    * managed table bucketed AND sorted by `term`, so every term
    * lookup (phrase search, stats) is a bucket-pruned, row-group-
    * skipping scan instead of a corpus pass, and term-keyed
    * aggregates/joins run exchange-free against other tables bucketed
    * the same way — the same catalog layout contract as the near-dup
    * and semantic index loops. */
  def writePostingsIndex(docs: DataFrame, idCol: String, textCol: String,
      table: String, numBuckets: Int = 32): Unit =
    graft.store.Store.overwriteBucketed(
      buildPostings(idCol, textCol)(docs), table, Seq("term"), numBuckets)

  /** The standing search-index ingest transaction: append a new
    * batch's postings under the table's bucket spec, EXACTLY ONCE per
    * document — postings of ids the index already holds are skipped
    * (left-anti against the stored ids restricted to the batch), so a
    * foreachBatch replay after a crash re-appends nothing. Returns
    * the postings actually appended.
    *
    * Cost note: the id probe scans the term-bucketed index (bucketing
    * by term cannot prune an id predicate) — one index scan per
    * admitted batch. At corpus scales where that dominates, keep a
    * doc-id registry table beside the index and probe that instead;
    * the append path here is unchanged. */
  def admitPostingsBatch(batch: DataFrame, idCol: String, textCol: String,
      table: String): DataFrame = {
    val spark = batch.sparkSession
    val batchPost = buildPostings(idCol, textCol)(batch)
    val already = spark.table(table)
      .join(batchPost.select("id").distinct(), Seq("id"), "left_semi")
      .select("id").distinct()
    val fresh = batchPost.join(already, Seq("id"), "left_anti")
      .localCheckpoint(false) // pin membership BEFORE the append mutates the table
    graft.store.Store.appendBucketed(fresh, table)
    fresh
  }

  /** [[phraseSearch]] against the stored index — each term filter
    * reaches the parquet scan as a pushed predicate over the
    * term-sorted buckets. */
  def phraseSearchStored(spark: org.apache.spark.sql.SparkSession,
      table: String, phrase: Seq[String]): DataFrame =
    phraseSearch(spark.table(table), phrase)

  /** The corpus's most frequent `n`-gram (ties to the binary-smallest
    * gram string) — the deterministic "what boilerplate should I
    * search for" helper battery q131 seeds its phrase from. One
    * narrow window pass + one gram-keyed aggregate + a 1-row
    * TakeOrdered. */
  def topNgram(idCol: String, textCol: String, n: Int)(docs: DataFrame): Seq[String] = {
    require(n >= 1, s"topNgram: n must be >= 1, got $n")
    // gram strings built narrowly: transform over window start indexes
    val g = docs
      .select(LmQuality.toks(textCol).as("tk"))
      .select(explode(when(size(col("tk")) >= n,
        expr(s"transform(sequence(0, size(tk) - $n), i -> " +
          s"array_join(slice(tk, i + 1, $n), ' '))"))
        .otherwise(array().cast("array<string>"))).as("g"))
    g.groupBy("g").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("g"))
      .limit(1)
      .head().getString(0).split(' ').toSeq
  }
}
