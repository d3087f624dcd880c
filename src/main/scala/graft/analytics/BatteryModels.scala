package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables
import graft.clean.TextClean
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.operators.AsOfJoin
import graft.quality.QualitySuite
import graft.similarity.Similarity
import graft.star.Sk

/** Model-based quality, sketches, search ranking, graph and linkage families (q124-q142).
  *
  * One link of the [[Battery]] mixin chain — the battery is split by
  * family for reviewability; the chain preserves the original single-
  * object member order (and with it val-initialization order) exactly.
  */
trait BatteryModels extends BatteryMultimodal {

  /** Bigram-LM TRAINING ([[graft.text.LmQuality.trainBigramLm]],
    * CCNet arXiv:1911.00359): one corpus pass → vocab-sized
    * (prev, w, n_pair) counts with the history roll-up n_hist = Σ n_pair
    * derived from the bigram table (not a second pass). The oracle
    * recomputes both counts from raw transitions, so a tokenizer or
    * roll-up drift hash-mismatches. */
  val q124 = Q("q124_lm_train",
    (s, dir) => {
      val lm = graft.text.LmQuality.trainBigramLm("doc_id", "text")(
        t(s, dir, "documents"))
      lm.bigrams.join(lm.histories, Seq("prev"))
        .select(col("prev"), col("w"),
          col("c2").as("n_pair"), col("c1").as("n_hist"))
        .orderBy("prev", "w")
    },
    Some(s"""WITH $lmToksCte,
      ${lmTransSql("lmtk", "tr")},
      big AS (SELECT prev, w, COUNT(*) AS n_pair FROM tr GROUP BY 1, 2),
      hist AS (SELECT prev, SUM(n_pair) AS n_hist FROM big GROUP BY 1)
      SELECT prev, w, CAST(n_pair AS BIGINT) AS n_pair,
        CAST(n_hist AS BIGINT) AS n_hist
      FROM big JOIN hist USING (prev) ORDER BY prev, w"""))

  /** LM surprisal scoring + the CCNet perplexity cut
    * ([[graft.text.LmQuality.surprisalBits]]/`perplexityFilter`):
    * train on the EN slice, score every document as exact integer
    * bits `Σ ⌊log2((c_hist+V)/(c_bigram+1))⌋`, keep docs at ≤ 4.4
    * bits/transition (4400 milli-bits — near the corpus median, so
    * the cut genuinely splits) via the integer cross-multiplication
    * (no float division anywhere). The oracle replays tokenize →
    * train → V → smoothed lookup → floor-log2 → threshold. */
  val q125 = Q("q125_lm_surprisal",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = graft.text.LmQuality.trainBigramLm("doc_id", "text")(
        docs.filter(col("lang") === "en"))
      val kept = graft.text.LmQuality.perplexityFilter(
          "doc_id", "text", lm, maxMilliBitsPerTransition = 4400L)(docs)
        .select(col("doc_id"), lit(true).as("kept"))
      graft.text.LmQuality.surprisalBits("doc_id", "text", lm)(docs)
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_trans"), col("total_bits"),
          coalesce(col("kept"), lit(false)).as("kept"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $lmToksCte,
      entk AS (SELECT * FROM lmtk WHERE lang = 'en'),
      ${lmTransSql("entk", "trtr")},
      big AS (SELECT prev, w, COUNT(*) AS n_pair FROM trtr GROUP BY 1, 2),
      hist AS (SELECT prev, SUM(n_pair) AS n_hist FROM big GROUP BY 1),
      vq AS (SELECT COUNT(DISTINCT tok) + 1 AS v
             FROM (SELECT unnest(tk) AS tok FROM entk)),
      ${lmTransSql("lmtk", "sctr")},
      terms AS (SELECT s.doc_id,
          CAST(COALESCE(h.n_hist, 0) + v AS BIGINT) AS nm,
          CAST(COALESCE(b.n_pair, 0) + 1 AS BIGINT) AS dn
        FROM sctr s
        LEFT JOIN big b ON b.prev = s.prev AND b.w = s.w
        LEFT JOIN hist h ON h.prev = s.prev
        CROSS JOIN vq),
      bits AS (SELECT doc_id, ${fl2rSql("nm", "dn")} AS b FROM terms),
      agg AS (SELECT doc_id, COUNT(*) AS n_trans, SUM(b) AS total_bits
        FROM bits GROUP BY 1)
      SELECT d.doc_id,
        CAST(COALESCE(n_trans, 0) AS BIGINT) AS n_trans,
        CAST(COALESCE(total_bits, 0) AS BIGINT) AS total_bits,
        COALESCE(total_bits, 0) * 1000 <= 4400 * COALESCE(n_trans, 0) AS kept
      FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""))

  /** Naive-Bayes quality classifier
    * ([[graft.text.LmQuality.trainNbQuality]]/`nbScoreBits`, the
    * exact-counting stand-in for GPT-3's logistic seed classifier):
    * label = the EN slice, one counting pass trains per-class unigram
    * tables, scores are integer log-likelihood-ratio bits including
    * the class-prior term, decision = `score_bits > 0`. Self-scored
    * over the corpus; the oracle replays counts, totals, smoothing,
    * priors, and the tie rule. */
  val q126 = Q("q126_nb_quality",
    (s, dir) => {
      val docs = t(s, dir, "documents").withColumn("is_en", col("lang") === "en")
      val m = graft.text.LmQuality.trainNbQuality("text", "is_en")(docs)
      graft.text.LmQuality.nbScoreBits("doc_id", "text", m)(docs)
        .orderBy("doc_id")
    },
    Some(s"""WITH $lmToksCte,
      tok AS (SELECT doc_id, lang = 'en' AS y, unnest(tk) AS w FROM lmtk),
      wc AS (SELECT w,
          SUM(CASE WHEN y THEN 1 ELSE 0 END) AS c_pos,
          SUM(CASE WHEN y THEN 0 ELSE 1 END) AS c_neg
        FROM tok GROUP BY 1),
      tots AS (SELECT SUM(c_pos) AS tp, SUM(c_neg) AS tn,
          COUNT(*) + 1 AS v FROM wc),
      dcts AS (SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS dp,
          SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS dn
        FROM documents),
      terms AS (SELECT doc_id,
          CAST(tn + v AS BIGINT) AS nm_n,
          CAST(COALESCE(c_neg, 0) + 1 AS BIGINT) AS dn_n,
          CAST(tp + v AS BIGINT) AS nm_p,
          CAST(COALESCE(c_pos, 0) + 1 AS BIGINT) AS dn_p
        FROM tok LEFT JOIN wc USING (w) CROSS JOIN tots),
      bits AS (SELECT doc_id,
          ${fl2rSql("nm_n", "dn_n")} - ${fl2rSql("nm_p", "dn_p")} AS b
        FROM terms),
      agg AS (SELECT doc_id, COUNT(*) AS n_tokens, SUM(b) AS word_bits
        FROM bits GROUP BY 1),
      pr AS (SELECT CAST(dp + dn + 2 AS BIGINT) AS nm,
          CAST(dn + 1 AS BIGINT) AS dnn, CAST(dp + 1 AS BIGINT) AS dnp
        FROM dcts),
      pbits AS (SELECT ${fl2rSql("nm", "dnn")} - ${fl2rSql("nm", "dnp")} AS pb
        FROM pr)
      SELECT d.doc_id,
        CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
        CAST(COALESCE(word_bits, 0) + pb AS BIGINT) AS score_bits,
        (COALESCE(word_bits, 0) + pb) > 0 AS predicted
      FROM documents d LEFT JOIN agg USING (doc_id) CROSS JOIN pbits
      ORDER BY doc_id"""))

  /** DSIR importance resampling ([[graft.text.LmQuality.dsirResample]],
    * arXiv:2302.03169): hashed-bigram bucket histograms of the EN
    * target slice vs the whole raw corpus (B = 512 buckets, the md5
    * feature hash the dedup family uses), per-doc importance weight
    * in exact integer bits, deterministic top-100 resample. The
    * oracle replays the feature hash, both histograms, the smoothed
    * bit terms, and the (weight desc, id) cut. */
  val q127 = Q("q127_dsir_resample",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.text.LmQuality.dsirResample("doc_id", "text",
          target = docs.filter(col("lang") === "en"),
          k = 100, buckets = 512)(docs)
        .select(col("doc_id"), col("n_feats"), col("weight_bits"))
        .orderBy(col("weight_bits").desc, col("doc_id"))
    },
    Some(s"""WITH $lmToksCte,
      ${lmTransSql("lmtk", "rawtr")},
      feats AS (SELECT doc_id,
          ('0x' || substr(md5(prev || ' ' || w), 1, 15))::BIGINT % 512 AS f
        FROM rawtr),
      entk AS (SELECT * FROM lmtk WHERE lang = 'en'),
      ${lmTransSql("entk", "tgttr")},
      tfeats AS (SELECT doc_id,
          ('0x' || substr(md5(prev || ' ' || w), 1, 15))::BIGINT % 512 AS f
        FROM tgttr),
      rc AS (SELECT f, COUNT(*) AS c_raw FROM feats GROUP BY 1),
      tc AS (SELECT f, COUNT(*) AS c_tgt FROM tfeats GROUP BY 1),
      tots AS (SELECT (SELECT COUNT(*) FROM feats) AS tot_r,
          (SELECT COUNT(*) FROM tfeats) AS tot_t),
      terms AS (SELECT doc_id,
          CAST(tot_r + 512 AS BIGINT) AS nm_r,
          CAST(COALESCE(c_raw, 0) + 1 AS BIGINT) AS dn_r,
          CAST(tot_t + 512 AS BIGINT) AS nm_t,
          CAST(COALESCE(c_tgt, 0) + 1 AS BIGINT) AS dn_t
        FROM feats LEFT JOIN rc USING (f) LEFT JOIN tc USING (f)
        CROSS JOIN tots),
      bits AS (SELECT doc_id,
          ${fl2rSql("nm_r", "dn_r")} - ${fl2rSql("nm_t", "dn_t")} AS b
        FROM terms),
      agg AS (SELECT doc_id, COUNT(*) AS n_feats, SUM(b) AS weight_bits
        FROM bits GROUP BY 1),
      full_ AS (SELECT d.doc_id,
          CAST(COALESCE(n_feats, 0) AS BIGINT) AS n_feats,
          CAST(COALESCE(weight_bits, 0) AS BIGINT) AS weight_bits
        FROM documents d LEFT JOIN agg USING (doc_id))
      SELECT doc_id, n_feats, weight_bits FROM full_
      ORDER BY weight_bits DESC, doc_id LIMIT 100"""))

  /** Count-Min sketch cells ([[graft.functions.CountMinSketch]]):
    * the full 4×64 counter matrix over the corpus's tokens. CMS
    * merge is elementwise add — commutative/associative — so unlike
    * Misra-Gries (q88) the final matrix is bit-identical under any
    * partitioning, and the oracle recomputes every cell as a plain
    * GROUP BY over the same md5 32-bit slices. */
  val q128 = Q("q128_cms_cells",
    (s, dir) => t(s, dir, "documents")
      .select(explode(filter(split(trim(col("text")), "\\s+"),
        x => x =!= lit(""))).as("w"))
      .agg(graft.functions.CountMinSketch.sketch(col("w"), 4, 64).as("sk"))
      .select(posexplode(col("sk")).as(Seq("pos", "cell")))
      .orderBy("pos"),
    Some(s"""WITH $lmToksCte,
      tok AS (SELECT unnest(tk) AS w FROM lmtk),
      cells AS (SELECT i, ('0x' || substr(md5(w), 1 + 8*i, 8))::BIGINT % 64 AS b,
          COUNT(*) AS c
        FROM tok CROSS JOIN range(0, 4) r(i) GROUP BY 1, 2),
      grid AS (SELECT i, b FROM range(0, 4) r(i) CROSS JOIN range(0, 64) g(b))
      SELECT CAST(i*64 + b AS INT) AS pos, CAST(COALESCE(c, 0) AS BIGINT) AS cell
      FROM grid LEFT JOIN cells USING (i, b) ORDER BY pos"""))

  /** The CMS point-estimate rule next to ground truth: for a fixed
    * probe set (present + absent tokens), `est = min_i cell[i][h_i]`
    * vs the exact count — est ≥ exact ALWAYS (overcount, never
    * undercount), and the oracle replays buckets, min, and truth, so
    * a slice-indexing or row-offset bug hash-mismatches. The probe
    * lookup is engine-side md5 arithmetic (same slices the kernel
    * reads), cross-joined against the ONE-row sketch. */
  val q129 = Q("q129_cms_estimates",
    (s, dir) => {
      val probes = Seq("key", "agg", "row", "scan", "table", "value",
        "hash", "spark", "the", "nosuchword")
      val toks = t(s, dir, "documents")
        .select(explode(filter(split(trim(col("text")), "\\s+"),
          x => x =!= lit(""))).as("w"))
      val sk = toks.agg(graft.functions.CountMinSketch.sketch(col("w"), 4, 64).as("sk"))
      val exact = toks.groupBy("w").agg(count(lit(1)).as("exact_count"))
      def bucket(i: Int): Column =
        (conv(substring(md5(col("w")), 1 + 8 * i, 8), 16, 10)
          .cast(LongType) % 64).cast("int")
      val est = least((0 until 4).map(i =>
        element_at(col("sk"), lit(i * 64 + 1) + bucket(i))): _*)
      import s.implicits._
      probes.toDF("w")
        .crossJoin(broadcast(sk))
        .join(exact, Seq("w"), "left")
        .select(col("w").as("probe"), est.as("est"),
          coalesce(col("exact_count"), lit(0L)).as("exact_count"))
        .orderBy("probe")
    },
    Some(s"""WITH $lmToksCte,
      tok AS (SELECT unnest(tk) AS w FROM lmtk),
      cells AS (SELECT i, ('0x' || substr(md5(w), 1 + 8*i, 8))::BIGINT % 64 AS b,
          COUNT(*) AS c
        FROM tok CROSS JOIN range(0, 4) r(i) GROUP BY 1, 2),
      probes(w) AS (VALUES ('key'), ('agg'), ('row'), ('scan'), ('table'),
        ('value'), ('hash'), ('spark'), ('the'), ('nosuchword')),
      est AS (SELECT p.w, MIN(COALESCE(c.c, 0)) AS est
        FROM probes p CROSS JOIN range(0, 4) r(i)
        LEFT JOIN cells c ON c.i = r.i
          AND c.b = ('0x' || substr(md5(p.w), 1 + 8*r.i, 8))::BIGINT % 64
        GROUP BY p.w),
      exact AS (SELECT w, COUNT(*) AS exact_count FROM tok GROUP BY 1)
      SELECT w AS probe, CAST(est AS BIGINT) AS est,
        CAST(COALESCE(exact_count, 0) AS BIGINT) AS exact_count
      FROM est LEFT JOIN exact USING (w) ORDER BY probe"""))

  /** DuckDB positional-postings CTE (mirrors
    * [[graft.text.Search.buildPostings]]: 0-based token offsets). */
  protected val postingsCte =
    """post AS (SELECT doc_id AS id, p AS pos, tk[p + 1] AS term
       FROM (SELECT doc_id, tk, unnest(range(0, len(tk))) AS p FROM lmtk))"""

  /** Inverted-index term statistics ([[graft.text.Search.termStats]]):
    * df + cf per term from the positional postings — the IDF side of
    * ranking. The oracle recomputes both from raw token offsets. */
  val q130 = Q("q130_term_stats",
    (s, dir) => graft.text.Search.termStats(
        graft.text.Search.buildPostings("doc_id", "text")(t(s, dir, "documents")))
      .orderBy("term"),
    Some(s"""WITH $lmToksCte,
      $postingsCte
      SELECT term, CAST(COUNT(DISTINCT id) AS BIGINT) AS df,
        CAST(COUNT(*) AS BIGINT) AS cf
      FROM post GROUP BY 1 ORDER BY term"""))

  /** Exact phrase search ([[graft.text.Search.phraseSearch]]) seeded
    * by the corpus's own most-frequent trigram
    * ([[graft.text.Search.topNgram]] — deterministic tie-to-smallest),
    * so the phrase has matches at every scale and nothing is
    * hand-pinned to one dataset. The oracle replays gram selection,
    * postings, and the positional join chain; an off-by-one in any
    * position offset hash-mismatches. */
  val q131 = Q("q131_phrase_search",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val phrase = graft.text.Search.topNgram("doc_id", "text", 3)(docs)
      graft.text.Search.phraseSearch(
          graft.text.Search.buildPostings("doc_id", "text")(docs), phrase)
        .orderBy("id", "pos")
    },
    Some(s"""WITH $lmToksCte,
      grams AS (SELECT array_to_string(list_slice(tk, i + 1, i + 3), ' ') AS g
        FROM (SELECT tk, unnest(range(0, len(tk) - 2)) AS i FROM lmtk)),
      top AS (SELECT string_split(g, ' ') AS ph FROM (
        SELECT g, COUNT(*) AS c FROM grams GROUP BY 1
        ORDER BY c DESC, g LIMIT 1)),
      $postingsCte
      SELECT p0.id, CAST(p0.pos AS INT) AS pos
      FROM post p0
      JOIN post p1 ON p1.id = p0.id AND p1.pos = p0.pos + 1
      JOIN post p2 ON p2.id = p0.id AND p2.pos = p0.pos + 2
      CROSS JOIN top
      WHERE p0.term = ph[1] AND p1.term = ph[2] AND p2.term = ph[3]
      ORDER BY p0.id, p0.pos"""))

  /** Deterministic tf·idf ranking ([[graft.text.Search.rankByTfIdfBits]]):
    * top-20 documents for a 3-term query with idf quantized to exact
    * integer bits (⌊log2(N/df)⌋) — the provenance-grade twin of the
    * float tf-idf (q89). The oracle replays df, the bit quantization,
    * the tf·bits sum, and the (score desc, id) cut. */
  val q132 = Q("q132_tfidf_bits_rank",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.text.Search.rankByTfIdfBits(
          graft.text.Search.buildPostings("doc_id", "text")(docs),
          query = Seq("table", "hash", "scan"), nDocs = docs.count(), k = 20)
        .orderBy(col("score_bits").desc, col("id"))
    },
    Some(s"""WITH $lmToksCte,
      $postingsCte,
      qt AS (SELECT * FROM post WHERE term IN ('table', 'hash', 'scan')),
      nd AS (SELECT COUNT(*) AS n FROM documents),
      idf AS (SELECT term, CAST(COUNT(DISTINCT id) AS BIGINT) AS df
        FROM qt GROUP BY 1),
      idfb AS (SELECT term, ${fl2rSql("n", "df")} AS ib
        FROM idf CROSS JOIN nd),
      tf AS (SELECT term, id, COUNT(*) AS tf FROM qt GROUP BY 1, 2),
      sc AS (SELECT id, SUM(tf * ib) AS score_bits
        FROM tf JOIN idfb USING (term) GROUP BY 1)
      SELECT id, CAST(score_bits AS BIGINT) AS score_bits
      FROM sc ORDER BY score_bits DESC, id LIMIT 20"""))

  /** Token-entropy quality signal
    * ([[graft.text.LmQuality.tokenEntropyBits]]): exact integer
    * `n·H(token distribution)` per document — the
    * repetition/gibberish detector in its unigram-distribution form.
    * The oracle replays per-type counts, the windowed doc total, and
    * the c·⌊log2(n/c)⌋ sum. */
  val q133 = Q("q133_token_entropy",
    (s, dir) => graft.text.LmQuality.tokenEntropyBits("doc_id", "text")(
        t(s, dir, "documents"))
      .orderBy("doc_id"),
    Some(s"""WITH $lmToksCte,
      ct AS (SELECT doc_id, w, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(tk) AS w FROM lmtk) GROUP BY 1, 2),
      wn AS (SELECT doc_id, c,
          CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n FROM ct),
      eb AS (SELECT doc_id, MAX(n) AS n_tokens,
          SUM(c * ${fl2rSql("n", "c")}) AS entropy_bits
        FROM wn GROUP BY 1)
      SELECT d.doc_id,
        CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
        CAST(COALESCE(entropy_bits, 0) AS BIGINT) AS entropy_bits
      FROM documents d LEFT JOIN eb USING (doc_id) ORDER BY doc_id"""))

  /** Exact triangle counting ([[graft.operators.Triangles]]) on the
    * parts-co-ordered-together graph (edges = distinct part pairs
    * sharing an order): degree-oriented node-iterator — each triangle
    * once, hub out-degrees bounded by orientation. The oracle replays
    * canonicalization, degrees, orientation, the wedge self-join, and
    * the closing join. */
  val q134 = Q("q134_triangle_count",
    (s, dir) =>
      graft.operators.Triangles.countsRow(coOrderPairs(s, dir), "pa", "pb"),
    Some("""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      deg AS (SELECT n, COUNT(*) AS d FROM (
        SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs) GROUP BY 1),
      o AS (SELECT
          CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND u < v) THEN u ELSE v END AS src,
          CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND u < v) THEN v ELSE u END AS dst,
          CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND u < v) THEN d2.d ELSE d1.d END AS ddst
        FROM pairs JOIN deg d1 ON d1.n = u JOIN deg d2 ON d2.n = v),
      wedges AS (SELECT a.src, a.dst AS y, b.dst AS z
        FROM o a JOIN o b ON a.src = b.src
        WHERE a.ddst < b.ddst OR (a.ddst = b.ddst AND a.dst < b.dst)),
      tri AS (SELECT 1 FROM wedges w JOIN o e ON e.src = w.y AND e.dst = w.z)
      SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
        CAST((SELECT COUNT(*) FROM wedges) AS BIGINT) AS n_wedges,
        CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles"""))

  /** Per-node triangle membership ([[graft.operators.Triangles.perNode]]):
    * the local-clustering ingredients (node, degree, n_triangles) on
    * the co-order graph, top-50 by triangle count. Each closed
    * triangle credits its three corners; the oracle replays the
    * corner explode and the (count desc, node) cut on top of q134's
    * chain. */
  val q135 = Q("q135_local_clustering",
    (s, dir) =>
      graft.operators.Triangles.perNode(coOrderPairs(s, dir), "pa", "pb")
        .orderBy(col("n_triangles").desc, col("node"))
        .limit(50),
    Some("""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      deg AS (SELECT n, COUNT(*) AS d FROM (
        SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs) GROUP BY 1),
      o AS (SELECT
          CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND u < v) THEN u ELSE v END AS src,
          CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND u < v) THEN v ELSE u END AS dst,
          CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND u < v) THEN d2.d ELSE d1.d END AS ddst
        FROM pairs JOIN deg d1 ON d1.n = u JOIN deg d2 ON d2.n = v),
      tri AS (SELECT w.src, w.y, w.z FROM (
          SELECT a.src, a.dst AS y, b.dst AS z
          FROM o a JOIN o b ON a.src = b.src
          WHERE a.ddst < b.ddst OR (a.ddst = b.ddst AND a.dst < b.dst)) w
        JOIN o e ON e.src = w.y AND e.dst = w.z),
      pc AS (SELECT node, COUNT(*) AS n_triangles FROM (
        SELECT unnest([src, y, z]) AS node FROM tri) GROUP BY 1)
      SELECT n AS node, CAST(d AS BIGINT) AS degree,
        CAST(COALESCE(n_triangles, 0) AS BIGINT) AS n_triangles
      FROM deg LEFT JOIN pc ON pc.node = deg.n
      ORDER BY n_triangles DESC, node LIMIT 50"""))

  /** k-core decomposition ([[graft.operators.KCore]]): the 80-core of
    * the co-order graph — 5 peeling rounds cascade 143 nodes out at
    * sf0.01, a genuine unravel, not a no-op cut. The engine peels to
    * FIXPOINT; the oracle unrolls 10 rounds of the same
    * degree-filter-semijoin stage, and the k-core's uniqueness (the
    * maximal subgraph is order-independent) makes the two equal
    * whenever the unroll reaches the fixpoint — the same
    * bounded-unroll pattern as the q87 PageRank oracle. */
  val q136 = Q("q136_kcore",
    (s, dir) =>
      graft.operators.KCore.kCore(coOrderPairs(s, dir), "pa", "pb", k = 80)
        .orderBy("node"),
    Some {
      val stages = (1 to 10).map { i =>
        s"""kp$i AS MATERIALIZED (SELECT n FROM (SELECT n, COUNT(*) AS d FROM (
             SELECT u AS n FROM s${i - 1} UNION ALL SELECT v FROM s${i - 1})
             GROUP BY 1) WHERE d >= 80),
           s$i AS MATERIALIZED (SELECT u, v FROM s${i - 1}
             WHERE u IN (SELECT n FROM kp$i) AND v IN (SELECT n FROM kp$i))"""
      }.mkString(",\n")
      s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      s0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      $stages
      SELECT n AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT u AS n FROM s10 UNION ALL SELECT v FROM s10)
      GROUP BY 1 ORDER BY node"""
    })

  /** k-anonymity audit ([[graft.quality.QualitySuite.kAnonymity]]):
    * quasi-identifier groups smaller than k — the re-identifiable
    * combinations a privacy release must generalize or suppress. */
  val q137 = Q("q137_k_anonymity",
    (s, dir) => QualitySuite.kAnonymity(
        t(s, dir, "customer"), Seq("c_mktsegment", "c_nationkey"), k = 7L)
      .orderBy("c_mktsegment", "c_nationkey"),
    Some("""SELECT c_mktsegment, c_nationkey,
        CAST(COUNT(*) AS BIGINT) AS group_size
      FROM customer GROUP BY 1, 2 HAVING COUNT(*) < 7
      ORDER BY c_mktsegment, c_nationkey"""))

  /** Keyed snapshot diff ([[graft.store.Store.tableDiff]]): orders vs
    * a deterministically mutated copy (drop every 97th key, rewrite
    * priority on every 31st, add negated copies of every 113th) —
    * added/removed/changed/unchanged per key via one full-outer join
    * with column-wise null-safe equality (no rendering, no hashing).
    * The oracle rebuilds the mutation and replays the join and the
    * IS DISTINCT FROM chain. */
  val q138 = Q("q138_table_diff",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val right = o.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 31 === 0, lit("X-DIFF"))
            .otherwise(col("o_orderpriority")))
        .unionByName(o.filter(col("o_orderkey") % 113 === 0)
          .withColumn("o_orderkey", -col("o_orderkey")))
      graft.store.Store.tableDiff(o, right, Seq("o_orderkey"))
        .groupBy("status").agg(count(lit(1)).as("n_keys"))
        .orderBy("status")
    },
    Some("""WITH r AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
          CASE WHEN o_orderkey % 31 = 0 THEN 'X-DIFF' ELSE o_orderpriority END
            AS o_orderpriority
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
          o_orderpriority
        FROM orders WHERE o_orderkey % 113 = 0),
      d AS (SELECT CASE WHEN l.o_orderkey IS NULL THEN 'added'
          WHEN r.o_orderkey IS NULL THEN 'removed'
          WHEN (l.o_custkey IS DISTINCT FROM r.o_custkey)
            OR (l.o_orderstatus IS DISTINCT FROM r.o_orderstatus)
            OR (l.o_totalprice IS DISTINCT FROM r.o_totalprice)
            OR (l.o_orderdate IS DISTINCT FROM r.o_orderdate)
            OR (l.o_orderpriority IS DISTINCT FROM r.o_orderpriority)
          THEN 'changed' ELSE 'unchanged' END AS status
        FROM orders l FULL OUTER JOIN r
          ON l.o_orderkey IS NOT DISTINCT FROM r.o_orderkey)
      SELECT status, CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM d GROUP BY 1 ORDER BY status"""))

  /** The record-linkage fixture shared by q139/q140 (Spark side): a
    * corrupted twin of every customer (key+1e6; name perturbed on
    * every 5th key, balance negated on every 3rd, segment kept),
    * blocked into candidate pairs on nationkey, labeled by key
    * correspondence. ~90k labeled pairs at sf0.01. */
  protected def fsPairs(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val dup = cust.select(
      (col("c_custkey") + 1000000L).as("c_custkey"),
      when(col("c_custkey") % 5 === 0, concat(col("c_name"), lit("~x")))
        .otherwise(col("c_name")).as("c_name"),
      col("c_nationkey"),
      when(col("c_custkey") % 3 === 0, -col("c_acctbal"))
        .otherwise(col("c_acctbal")).as("c_acctbal"),
      col("c_mktsegment"))
    cust.as("a").join(dup.as("b"), col("a.c_nationkey") === col("b.c_nationkey"))
      .select(col("a.c_custkey").as("id_a"), col("b.c_custkey").as("id_b"),
        col("a.c_name").as("name_a"), col("b.c_name").as("name_b"),
        col("a.c_acctbal").as("bal_a"), col("b.c_acctbal").as("bal_b"),
        col("a.c_mktsegment").as("seg_a"), col("b.c_mktsegment").as("seg_b"))
      .withColumn("is_match", col("id_b") === col("id_a") + 1000000L)
  }

  protected val fsFields: Seq[graft.operators.Linkage.FieldPair] = Seq(
    ("acctbal", "bal_a", "bal_b"),
    ("name", "name_a", "name_b"),
    ("segment", "seg_a", "seg_b"))

  /** The SQL twin of [[fsPairs]] + per-field agreement counts. */
  protected val fsPairsSql =
    """dup AS (SELECT c_custkey + 1000000 AS c_custkey,
        CASE WHEN c_custkey % 5 = 0 THEN c_name || '~x' ELSE c_name END AS c_name,
        c_nationkey,
        CASE WHEN c_custkey % 3 = 0 THEN -c_acctbal ELSE c_acctbal END AS c_acctbal,
        c_mktsegment
      FROM customer),
      prs AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        a.c_name AS name_a, b.c_name AS name_b,
        a.c_acctbal AS bal_a, b.c_acctbal AS bal_b,
        a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
        b.c_custkey = a.c_custkey + 1000000 AS is_match
      FROM customer a JOIN dup b ON a.c_nationkey = b.c_nationkey),
      fc AS (SELECT field,
        SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS n_m,
        SUM(CASE WHEN is_match THEN 0 ELSE 1 END) AS n_u,
        SUM(CASE WHEN is_match AND ag THEN 1 ELSE 0 END) AS a_m,
        SUM(CASE WHEN NOT is_match AND ag THEN 1 ELSE 0 END) AS a_u
      FROM (
        SELECT 'name' AS field, is_match, name_a IS NOT DISTINCT FROM name_b AS ag FROM prs
        UNION ALL
        SELECT 'acctbal', is_match, bal_a IS NOT DISTINCT FROM bal_b FROM prs
        UNION ALL
        SELECT 'segment', is_match, seg_a IS NOT DISTINCT FROM seg_b FROM prs)
      GROUP BY field)"""

  /** The SQL twin of the weight computation (add-one m/u, signed
    * floor-log2 bits). */
  protected val fsWeightsSql =
    s"""wn AS (SELECT field,
        CAST((a_m + 1) * (n_u + 2) AS BIGINT) AS na_n,
        CAST((n_m + 2) * (a_u + 1) AS BIGINT) AS na_d,
        CAST((n_m - a_m + 1) * (n_u + 2) AS BIGINT) AS nd_n,
        CAST((n_m + 2) * (n_u - a_u + 1) AS BIGINT) AS nd_d
      FROM fc),
      wts AS (SELECT field,
        CASE WHEN na_n >= na_d THEN ${fl2rSql("na_n", "na_d")}
             ELSE -${fl2rSql("na_d", "na_n")} END AS w_agree_bits,
        CASE WHEN nd_n >= nd_d THEN ${fl2rSql("nd_n", "nd_d")}
             ELSE -${fl2rSql("nd_d", "nd_n")} END AS w_disagree_bits
      FROM wn)"""

  /** Fellegi–Sunter weight TRAINING ([[graft.operators.Linkage]],
    * JASA 1969 — the Splink/Census model, supervised counting form):
    * per-field log-likelihood-ratio weights in exact signed integer
    * bits from add-one-smoothed m/u counts over ~90k labeled blocked
    * pairs. The oracle replays corruption, blocking, counts, and the
    * signed quantization. */
  val q139 = Q("q139_fs_weights",
    (s, dir) => graft.operators.Linkage.fsWeights(
        fsPairs(s, dir), "is_match", fsFields)
      .orderBy("field"),
    Some(s"""WITH $fsPairsSql,
      $fsWeightsSql
      SELECT field, CAST(w_agree_bits AS BIGINT) AS w_agree_bits,
        CAST(w_disagree_bits AS BIGINT) AS w_disagree_bits
      FROM wts ORDER BY field"""))

  /** End-to-end linkage ([[graft.operators.Linkage.linkFs]]): train on
    * the labeled pairs, score every pair as Σ field weights, decide at
    * ≥ 10 bits — the confusion matrix (predicted × truth) is the
    * output, so a drift in ANY weight, the score sum, or the
    * threshold rule hash-mismatches. */
  val q140 = Q("q140_fs_linkage",
    (s, dir) => graft.operators.Linkage.linkFs(
        fsPairs(s, dir), "is_match", fsFields, minScoreBits = 10L)
      .groupBy("predicted", "is_match")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("predicted", "is_match"),
    Some(s"""WITH $fsPairsSql,
      $fsWeightsSql,
      w AS (SELECT
        MAX(CASE WHEN field = 'name' THEN w_agree_bits END) AS name_wa,
        MAX(CASE WHEN field = 'name' THEN w_disagree_bits END) AS name_wd,
        MAX(CASE WHEN field = 'acctbal' THEN w_agree_bits END) AS bal_wa,
        MAX(CASE WHEN field = 'acctbal' THEN w_disagree_bits END) AS bal_wd,
        MAX(CASE WHEN field = 'segment' THEN w_agree_bits END) AS seg_wa,
        MAX(CASE WHEN field = 'segment' THEN w_disagree_bits END) AS seg_wd
      FROM wts),
      sc AS (SELECT is_match,
        (CASE WHEN name_a IS NOT DISTINCT FROM name_b THEN name_wa ELSE name_wd END
         + CASE WHEN bal_a IS NOT DISTINCT FROM bal_b THEN bal_wa ELSE bal_wd END
         + CASE WHEN seg_a IS NOT DISTINCT FROM seg_b THEN seg_wa ELSE seg_wd END)
          AS score
      FROM prs CROSS JOIN w)
      SELECT score >= 10 AS predicted, is_match,
        CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM sc GROUP BY 1, 2 ORDER BY predicted, is_match"""))

  /** Exact-integer weighted systematic sampling
    * ([[graft.text.Curation.systematicWeightedSample]]): ~500 orders
    * drawn ∝ integer cents of o_totalprice by the PPS threshold walk
    * (heavy orders can repeat; Σ n_copies = 500 exactly). The engine
    * computes the global cumsum as the two-level bucket scan; the
    * oracle as one window cumsum — identical integers, so the
    * bucketing seam is proven invisible. */
  val q141 = Q("q141_weighted_sample",
    (s, dir) => graft.text.Curation.systematicWeightedSample(
        "o_orderkey", "wt", n = 500L)(
        t(s, dir, "orders").select(col("o_orderkey"), cents(col("o_totalprice")).as("wt")))
      .select(col("o_orderkey"), col("n_copies"))
      .orderBy("o_orderkey"),
    Some(s"""WITH w AS (SELECT o_orderkey AS id,
        ${centsSql("o_totalprice")} AS wt FROM orders),
      c AS (SELECT id, wt, SUM(wt) OVER (ORDER BY id) AS cum FROM w),
      t AS (SELECT SUM(wt) AS tot FROM w)
      SELECT id AS o_orderkey,
        CAST((cum * 500) // tot - ((cum - wt) * 500) // tot AS BIGINT) AS n_copies
      FROM c CROSS JOIN t
      WHERE (cum * 500) // tot - ((cum - wt) * 500) // tot > 0
      ORDER BY o_orderkey"""))

  /** MODEL-BASED curation funnel capstone — the learned twin of q54's
    * heuristic funnel, composing the session's quality models as ONE
    * oracle-checked pipeline: perplexity cut (bigram LM trained on
    * the EN slice, ≤ 4.4 bits/transition — 500 → 308 docs) → token-
    * entropy floor (≥ 3.8 bits/token, the repetition gate — cuts near
    * the survivor median) → DSIR top-100 resample toward the EN
    * target. A drift in ANY stage's model, threshold rule, or
    * survivor set reshapes the final ranking and hash-mismatches. */
  val q142 = Q("q142_model_funnel",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = graft.text.LmQuality.trainBigramLm("doc_id", "text")(
        docs.filter(col("lang") === "en"))
      val kept1 = graft.text.LmQuality.perplexityFilter(
          "doc_id", "text", lm, maxMilliBitsPerTransition = 4400L)(docs)
        .select(docs.columns.map(col): _*)
      val entOk = graft.text.LmQuality.tokenEntropyBits("doc_id", "text")(kept1)
        .filter(col("entropy_bits") * 10 >= lit(38L) * col("n_tokens"))
        .select("doc_id")
      // survivors materialized ONCE: dsirResample evaluates its raw
      // frame in three subtrees (bucket histogram, scored transitions,
      // attach join) — un-checkpointed, the whole perplexity ⋈ LM ⋈
      // entropy funnel re-ran under each (the before plan carried 98
      // parquet scans / 214 exchanges). Only (doc_id, text) flows into
      // DSIR, so the checkpoint carries exactly those two columns.
      val kept2 = kept1.join(entOk, Seq("doc_id"), "left_semi")
        .select("doc_id", "text").localCheckpoint()
      graft.text.LmQuality.dsirResample("doc_id", "text",
          target = docs.filter(col("lang") === "en"), k = 100, buckets = 512)(kept2)
        .select(col("doc_id"), col("n_feats"), col("weight_bits"))
        .orderBy(col("weight_bits").desc, col("doc_id"))
    },
    Some(s"""WITH $lmToksCte,
      entk AS (SELECT * FROM lmtk WHERE lang = 'en'),
      ${lmTransSql("entk", "trtr")},
      big AS (SELECT prev, w, COUNT(*) AS n_pair FROM trtr GROUP BY 1, 2),
      hist AS (SELECT prev, SUM(n_pair) AS n_hist FROM big GROUP BY 1),
      vq AS (SELECT COUNT(DISTINCT tok) + 1 AS v
             FROM (SELECT unnest(tk) AS tok FROM entk)),
      ${lmTransSql("lmtk", "sctr")},
      pterms AS (SELECT s.doc_id,
          CAST(COALESCE(h.n_hist, 0) + v AS BIGINT) AS nm,
          CAST(COALESCE(b.n_pair, 0) + 1 AS BIGINT) AS dn
        FROM sctr s
        LEFT JOIN big b ON b.prev = s.prev AND b.w = s.w
        LEFT JOIN hist h ON h.prev = s.prev
        CROSS JOIN vq),
      pbits AS (SELECT doc_id, ${fl2rSql("nm", "dn")} AS b FROM pterms),
      pagg AS (SELECT doc_id, COUNT(*) AS n_trans, SUM(b) AS total_bits
        FROM pbits GROUP BY 1),
      k1 AS (SELECT d.doc_id FROM documents d LEFT JOIN pagg USING (doc_id)
        WHERE COALESCE(total_bits, 0) * 1000 <= 4400 * COALESCE(n_trans, 0)),
      k1tk AS (SELECT * FROM lmtk WHERE doc_id IN (SELECT doc_id FROM k1)),
      ct AS (SELECT doc_id, w, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(tk) AS w FROM k1tk) GROUP BY 1, 2),
      wn AS (SELECT doc_id, c,
          CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n FROM ct),
      eb AS (SELECT doc_id, MAX(n) AS n_tokens,
          SUM(c * ${fl2rSql("n", "c")}) AS entropy_bits
        FROM wn GROUP BY 1),
      k2 AS (SELECT k1.doc_id FROM k1 LEFT JOIN eb USING (doc_id)
        WHERE COALESCE(entropy_bits, 0) * 10 >= 38 * COALESCE(n_tokens, 0)),
      k2tk AS (SELECT * FROM lmtk WHERE doc_id IN (SELECT doc_id FROM k2)),
      ${lmTransSql("k2tk", "rawtr")},
      feats AS (SELECT doc_id,
          ('0x' || substr(md5(prev || ' ' || w), 1, 15))::BIGINT % 512 AS f
        FROM rawtr),
      ${lmTransSql("entk", "tgttr")},
      tfeats AS (SELECT doc_id,
          ('0x' || substr(md5(prev || ' ' || w), 1, 15))::BIGINT % 512 AS f
        FROM tgttr),
      rc AS (SELECT f, COUNT(*) AS c_raw FROM feats GROUP BY 1),
      tc AS (SELECT f, COUNT(*) AS c_tgt FROM tfeats GROUP BY 1),
      tots AS (SELECT (SELECT COUNT(*) FROM feats) AS tot_r,
          (SELECT COUNT(*) FROM tfeats) AS tot_t),
      dterms AS (SELECT doc_id,
          CAST(tot_r + 512 AS BIGINT) AS nm_r,
          CAST(COALESCE(c_raw, 0) + 1 AS BIGINT) AS dn_r,
          CAST(tot_t + 512 AS BIGINT) AS nm_t,
          CAST(COALESCE(c_tgt, 0) + 1 AS BIGINT) AS dn_t
        FROM feats LEFT JOIN rc USING (f) LEFT JOIN tc USING (f)
        CROSS JOIN tots),
      dbits AS (SELECT doc_id,
          ${fl2rSql("nm_r", "dn_r")} - ${fl2rSql("nm_t", "dn_t")} AS b
        FROM dterms),
      dagg AS (SELECT doc_id, COUNT(*) AS n_feats, SUM(b) AS weight_bits
        FROM dbits GROUP BY 1)
      SELECT k2.doc_id,
        CAST(COALESCE(n_feats, 0) AS BIGINT) AS n_feats,
        CAST(COALESCE(weight_bits, 0) AS BIGINT) AS weight_bits
      FROM k2 LEFT JOIN dagg USING (doc_id)
      ORDER BY weight_bits DESC, doc_id LIMIT 100"""))

  /** The unrolled-iteration EM oracle (q143): replays
    * [[graft.operators.Linkage.fsEmParams]]'s exact fixed-point E/M
    * steps in SQL — pattern counts, the HUGEINT posterior products,
    * the single ⌊S·A/(A+B)⌋ posterior quantization, the floored
    * M-step ratios, and the [1, S−1] clamp — for a FIXED `iters`,
    * via one CTE pair (e_k, p_k) per iteration (the q81/q87
    * unrolled-loop oracle pattern). Returns a WITH prefix ending in
    * the `emw` weights CTE (and the `prs` pairs CTE), so q143 selects
    * the weights and q148 scores pairs under them. */
  protected def emOracleSql(iters: Int): String = {
    val S = "1000000"
    val fieldsG = Seq("bal", "name", "seg") // pattern-agreement flags
    def prodM(p: String) = fieldsG.map(f =>
      s"(CASE WHEN g_$f THEN $p.m_$f ELSE $S - $p.m_$f END)").mkString(" * ")
    def prodU(p: String) = fieldsG.map(f =>
      s"(CASE WHEN g_$f THEN $p.u_$f ELSE $S - $p.u_$f END)").mkString(" * ")
    def clamp(e: String) = s"GREATEST(CAST(1 AS HUGEINT), LEAST(CAST(${S}-1 AS HUGEINT), $e))"
    val pat =
      s"""pat AS (SELECT bal_a IS NOT DISTINCT FROM bal_b AS g_bal,
         name_a IS NOT DISTINCT FROM name_b AS g_name,
         seg_a IS NOT DISTINCT FROM seg_b AS g_seg,
         CAST(COUNT(*) AS HUGEINT) AS n FROM prs GROUP BY 1, 2, 3)"""
    val p0 =
      s"""p0 AS (SELECT CAST(500000 AS HUGEINT) AS lam,
         ${fieldsG.map(f => s"CAST(900000 AS HUGEINT) AS m_$f, CAST(100000 AS HUGEINT) AS u_$f").mkString(", ")})"""
    val steps = (1 to iters).map { k =>
      val prev = s"p${k - 1}"
      val e =
        s"""e$k AS (SELECT g_bal, g_name, g_seg, n,
           ($S * ($prev.lam * ${prodM(prev)})) //
             ($prev.lam * ${prodM(prev)} + ($S - $prev.lam) * ${prodU(prev)}) AS w
           FROM pat CROSS JOIN $prev)"""
      val mT = fieldsG.map(f =>
        s"""${clamp(s"($S * SUM(CASE WHEN g_$f THEN n * w ELSE CAST(0 AS HUGEINT) END)) // SUM(n * w)")} AS m_$f,
           ${clamp(s"($S * SUM(CASE WHEN g_$f THEN n * ($S - w) ELSE CAST(0 AS HUGEINT) END)) // SUM(n * ($S - w))")} AS u_$f""")
        .mkString(", ")
      val p = s"""p$k AS (SELECT ${clamp(s"SUM(n * w) // SUM(n)")} AS lam, $mT FROM e$k)"""
      s"$e,\n      $p"
    }.mkString(",\n      ")
    s"""WITH $fsPairsSql,
      $pat,
      $p0,
      $steps,
      mu AS (
        SELECT 'acctbal' AS field, CAST(m_bal AS BIGINT) AS m_ppm,
          CAST(u_bal AS BIGINT) AS u_ppm FROM p$iters
        UNION ALL SELECT 'name', CAST(m_name AS BIGINT), CAST(u_name AS BIGINT) FROM p$iters
        UNION ALL SELECT 'segment', CAST(m_seg AS BIGINT), CAST(u_seg AS BIGINT) FROM p$iters),
      muc AS (SELECT field, m_ppm, u_ppm,
        $S - m_ppm AS dm, $S - u_ppm AS du FROM mu),
      emw AS (SELECT field, m_ppm, u_ppm,
        CAST(CASE WHEN m_ppm >= u_ppm THEN ${fl2rSql("m_ppm", "u_ppm")}
             ELSE -${fl2rSql("u_ppm", "m_ppm")} END AS BIGINT) AS w_agree_bits,
        CAST(CASE WHEN dm >= du THEN ${fl2rSql("dm", "du")}
             ELSE -${fl2rSql("du", "dm")} END AS BIGINT) AS w_disagree_bits
      FROM muc)"""
  }
}
