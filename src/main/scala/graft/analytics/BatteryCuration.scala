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

/** Text-curation, sampling, clustering and semantic-index families (q65-q99).
  *
  * One link of the [[Battery]] mixin chain — the battery is split by
  * family for reviewability; the chain preserves the original single-
  * object member order (and with it val-initialization order) exactly.
  */
trait BatteryCuration extends BatteryDedup {

  /** Benchmark DECONTAMINATION (training-data op): count distinct word
    * 5-grams each corpus doc shares with an "eval set" (here: doc_id %
    * 20 == 0). Grams compared as broadcast 60-bit hashes — the corpus
    * side never shuffles until the per-doc count
    * (Curation.contaminationCounts). */
  val q65 = Q("q65_decontamination",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.text.Curation.contaminationCounts(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          "doc_id", "text", n = 5)
        .orderBy("doc_id")
    },
    Some(s"""WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
      sh AS (SELECT doc_id, ${wordShingleSql(5, "toks")} AS s FROM tk),
      $hashSetCte,
      ev AS (SELECT DISTINCT unnest(h) AS g FROM shh WHERE doc_id % 20 = 0),
      cg AS (SELECT doc_id, unnest(h) AS g FROM shh WHERE doc_id % 20 <> 0)
      SELECT cg.doc_id, COUNT(DISTINCT cg.g) AS n_shared_grams
      FROM cg JOIN ev ON cg.g = ev.g
      GROUP BY cg.doc_id ORDER BY cg.doc_id"""))

  /** PII redaction (training-data op): ordered regex rewrite (phone →
    * digit-run catch-all) + per-pattern hit counts over a
    * deterministically synthesized log line (the testdata carries no
    * natural PII; concat/lpad build the same bytes in both engines).
    * Narrow, codegen'd, zero shuffle — graft.text.Redact. */
  val q66 = Q("q66_pii_redact",
    (s, dir) => {
      import graft.text.Redact
      val phone = concat_ws("-",
        lpad((col("c_custkey") % 1000).cast("string"), 3, "0"),
        lpad((col("c_custkey") * 7 % 1000).cast("string"), 3, "0"),
        lpad((col("c_custkey") * 13 % 10000).cast("string"), 4, "0"))
      val line = concat(lit("reach "), col("c_name"), lit(" at "), phone,
        lit(" acct "), cents(col("c_acctbal")).cast("string"))
      val phoneRedacted = regexp_replace(line, Redact.PhonePattern, "[PHONE]")
      t(s, dir, "customer")
        .filter(col("c_custkey") % 50 === 0)
        .select(col("c_custkey"),
          Redact.redact(line,
            Seq(Redact.PhonePattern -> "[PHONE]", Redact.DigitRunPattern -> "[NUM]"))
            .as("redacted"),
          Redact.hits(line, Redact.PhonePattern).as("n_phone"),
          Redact.hits(phoneRedacted, Redact.DigitRunPattern).as("n_num"))
        .orderBy("c_custkey")
    },
    Some("""WITH lines AS (SELECT c_custkey,
        'reach ' || c_name || ' at ' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
          || '-' || lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0')
          || '-' || lpad(CAST(c_custkey * 13 % 10000 AS VARCHAR), 4, '0')
          || ' acct ' || CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR) AS line
      FROM customer WHERE c_custkey % 50 = 0)
      SELECT c_custkey,
        regexp_replace(regexp_replace(line, '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
          '[0-9]{3,}', '[NUM]', 'g') AS redacted,
        CAST(len(regexp_extract_all(line, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
        CAST(len(regexp_extract_all(
          regexp_replace(line, '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
          '[0-9]{3,}')) AS BIGINT) AS n_num
      FROM lines ORDER BY c_custkey"""))

  /** Intra-doc repetition stats (Gopher-style quality signal): total vs
    * distinct word trigrams + repeated fraction and keep flag. Narrow
    * scan — Curation.repetitionStats. */
  val q67 = Q("q67_intradoc_repetition",
    (s, dir) => graft.text.Curation.repetitionStats("text", n = 3)(
        t(s, dir, "documents"))
      .select(col("doc_id"), col("n_ngrams"), col("n_distinct_ngrams"), col("rep_ratio"),
        (col("rep_ratio") <= 0.2).cast("int").as("keep"))
      .orderBy("doc_id"),
    Some(s"""WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
      st AS (SELECT doc_id,
        greatest(CAST(len(toks) AS BIGINT) - 2, 1) AS n_ngrams,
        CAST(len(${wordShingleSql(3, "toks")}) AS BIGINT) AS n_distinct_ngrams
      FROM tk)
      SELECT doc_id, n_ngrams, n_distinct_ngrams,
        1.0 - CAST(n_distinct_ngrams AS DOUBLE) / CAST(n_ngrams AS DOUBLE) AS rep_ratio,
        CAST((1.0 - CAST(n_distinct_ngrams AS DOUBLE) / CAST(n_ngrams AS DOUBLE)) <= 0.2 AS INT) AS keep
      FROM st ORDER BY doc_id"""))

  /** Deterministic stratified sample: first 20 docs per language in
    * md5(id) order (Curation.stratifiedSample — the reproducible twin
    * of reservoir sampling; scale path pre-thins with hashSample or
    * uses the k-bounded TopKBy aggregate, see q53). */
  val q68 = Q("q68_stratified_sample",
    (s, dir) => graft.text.Curation.stratifiedSample(
        "lang", "doc_id", 20, rankCol = Some("rn"))(t(s, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("rn").cast(LongType).as("rn"))
      .orderBy("lang", "rn"),
    Some("""WITH r AS (SELECT doc_id, lang,
        row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
      SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 20
      ORDER BY lang, rn"""))

  /** Embedding outlier screen: top-20 vectors by squared deviation
    * from their label centroid, computed in EXACT integer arithmetic
    * (Σ(n·x − S)², all BIGINT, no float centroid) and ranked on the
    * group-size-normalized dev2 = dist2/n² so groups of unequal size
    * compete fairly (Similarity.centroidDeviations). Ranking is
    * order-independent at any partitioning. */
  val q69 = Q("q69_centroid_outliers",
    (s, dir) => Similarity.centroidDeviations(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label")
      .orderBy(col("dev2").desc, col("vec_id"))
      .limit(20),
    Some("""WITH base AS (SELECT vec_id, label,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
      FROM embeddings),
      ex AS (SELECT vec_id, label, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS x
             FROM base, range(1, 65) t(i)),
      cent AS (SELECT label, pos, SUM(x) AS s, COUNT(*) AS n FROM ex GROUP BY label, pos)
      SELECT vec_id, label, dist2, CAST(dist2 AS DOUBLE) / CAST(n * n AS DOUBLE) AS dev2
      FROM (SELECT vec_id, ex.label, CAST(SUM((n*x - s)*(n*x - s)) AS BIGINT) AS dist2,
              MAX(n) AS n
            FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
            GROUP BY vec_id, ex.label)
      ORDER BY dev2 DESC, vec_id LIMIT 20"""))

  /** Repeated-span discovery (the scan behind substring-level dedup,
    * Lee et al. 2021): word 8-grams appearing in ≥2 distinct docs,
    * top-20 by doc frequency. Per-doc distinct grams explode to one
    * shuffle on the gram — at 100 TB this is the job you run to find
    * boilerplate. */
  val q70 = Q("q70_repeated_ngrams",
    (s, dir) => t(s, dir, "documents")
      .select(explode(Dedup.wordShingles(col("text"), 8)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("gram"))
      .limit(20),
    Some(s"""WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
      g AS (SELECT doc_id, unnest(${wordShingleSql(8, "toks")}) AS gram FROM tk)
      SELECT gram, COUNT(*) AS n_docs FROM g GROUP BY gram HAVING COUNT(*) >= 2
      ORDER BY n_docs DESC, gram LIMIT 20"""))

  /** Training-mixture sampling: per-source deterministic Bernoulli
    * rates (src0 keep-all, src1 half, src2 quarter, rest 10%) —
    * Curation.mixtureSample, the data-mixing step of corpus assembly.
    * Narrow scan-local filter; per-source kept counts verified. */
  val q71 = Q("q71_mixture_sample",
    (s, dir) => graft.text.Curation.mixtureSample(
        "source", "doc_id",
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25), default = 0.1)(
        t(s, dir, "documents"))
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
      .orderBy("source"),
    Some("""WITH b AS (SELECT source,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 AS bucket
      FROM documents)
      SELECT source, COUNT(*) AS n_kept FROM b
      WHERE bucket < CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
                                 WHEN 'src2' THEN 2500 ELSE 1000 END
      GROUP BY source ORDER BY source"""))

  /** Sequence packing (Curation.packSequences): greedy token-budget
    * bins over a deterministic intra-shard order — corpus → training
    * sequences. The shard key IS the parallelism, so the demo derives
    * a high-cardinality md5(id)-mod-8 shard (portable to the oracle)
    * rather than sharding by the 20-value source column; at 100 TB the
    * same derivation with k ≈ cores keeps every window task-sized.
    * Per-(shard, bin) doc and token counts are the verified output. */
  val q72 = Q("q72_sequence_packing",
    (s, dir) => graft.text.Curation.packSequences("shard", "doc_id", "text", 512L)(
        t(s, dir, "documents").withColumn("shard",
          expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 8")))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy("shard", "bin"),
    Some("""WITH tk AS (SELECT doc_id,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard,
        CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      FROM documents),
      b AS (SELECT doc_id, shard, n_tokens,
        CAST((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens) // 512
          AS BIGINT) AS bin
      FROM tk)
      SELECT shard, bin, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      FROM b GROUP BY shard, bin ORDER BY shard, bin"""))

  /** Unigram-frequency quality scoring (Curation.unigramQuality):
    * corpus vocab aggregate → broadcast join over the exploded token
    * stream → per-doc exact mean token frequency. Raw mean (not mean
    * log-prob) keeps the score an integer-exact sum / count, so it
    * hash-matches across engines where ln() differs in the last ulp. */
  val q73 = Q("q73_unigram_quality",
    (s, dir) => graft.text.Curation.unigramQuality("doc_id", "text")(
        t(s, dir, "documents"))
      .orderBy("doc_id"),
    Some("""WITH ex AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents),
      vocab AS (SELECT tok, COUNT(*) AS tok_freq FROM ex GROUP BY tok)
      SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(tok_freq) AS BIGINT) AS freq_sum,
        CAST(SUM(tok_freq) AS DOUBLE) / COUNT(*) AS mean_tok_freq
      FROM ex JOIN vocab USING (tok)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Training-mixture composition report: per-source doc/token counts,
    * token share (exact long sums → one IEEE division), and cumulative
    * share over a deterministic source order — the table you read
    * before choosing mixtureSample weights. Cumulative doubles sum in
    * the same window order in both engines, so even the running share
    * is bit-identical. */
  val q74 = Q("q74_domain_mix",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perSource = t(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(trim(col("text")), "\\s+")).cast(LongType)).as("n_tokens"))
      // full-frame window for the grand total: single-partition, but
      // over the ALREADY-AGGREGATED |sources| rows, not the corpus —
      // fine at any scale (sources ≪ data), and keeps the query one
      // declarative plan instead of a driver-side collect
      val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wCum = Window.orderBy("source")
        .rowsBetween(Window.unboundedPreceding, 0)
      perSource
        .withColumn("token_share",
          col("n_tokens").cast("double") / sum(col("n_tokens")).over(wAll).cast("double"))
        .withColumn("cum_share", sum(col("token_share")).over(wCum))
        .orderBy("source")
    },
    Some("""WITH ps AS (SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
      tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM ps)
      SELECT source, n_docs, n_tokens,
        CAST(n_tokens AS DOUBLE) / CAST(t AS DOUBLE) AS token_share,
        SUM(CAST(n_tokens AS DOUBLE) / CAST(t AS DOUBLE))
          OVER (ORDER BY source ROWS UNBOUNDED PRECEDING) AS cum_share
      FROM ps, tot ORDER BY source"""))

  /** Substring-level dedup, remove phase (Curation.dedupSpans — the
    * transform half of Lee-et-al-style span dedup; q70 is the discovery
    * half): 25-token non-overlapping chunks, keep each span's global
    * first occurrence (min (doc_id, pos)), reassemble surviving spans
    * in order. The oracle re-derives the chunks with DuckDB list
    * slicing and hash-verifies the reassembled TEXT byte-for-byte —
    * the strongest possible check on a text-transform operator. */
  val q75 = Q("q75_span_dedup",
    (s, dir) => graft.text.Curation.dedupSpans("doc_id", "text", chunkTokens = 25)(
        t(s, dir, "documents"))
      .orderBy("doc_id"),
    Some("""WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents),
      ch AS (SELECT doc_id, CAST(i AS INT) AS pos,
          array_to_string(toks[(CAST(i AS INT)*25+1):(CAST(i AS INT)*25+25)], ' ') AS chunk
        FROM (SELECT doc_id, toks,
                unnest(range(0, CAST(ceil(len(toks)/25.0) AS BIGINT))) AS i
              FROM tk)),
      k AS (SELECT doc_id, pos, chunk,
          row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
        FROM ch)
      SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS text,
        COUNT(*) AS n_spans_kept
      FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id"""))

  /** Tokenizer merge-pair scoring / collocation lift
    * (Curation.mergePairScores): adjacent-pair counts vs unigram
    * margins, score = n_pair·N/(n_left·n_right) as one identical
    * double expression tree over exact BIGINTs in both engines.
    * Top-20 by score — the pairs a BPE trainer would merge first. */
  val q76 = Q("q76_merge_pairs",
    (s, dir) => graft.text.Curation.mergePairScores("doc_id", "text", minPairFreq = 3L)(
        t(s, dir, "documents"))
      .orderBy(col("score").desc, col("pair"))
      .limit(20),
    Some("""WITH tk AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents),
      p AS (SELECT toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT)+1] AS pair
        FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM tk WHERE len(toks) >= 2)),
      pc AS (SELECT pair, COUNT(*) AS n_pair FROM p GROUP BY pair HAVING COUNT(*) >= 3),
      uc AS (SELECT tok, COUNT(*) AS n_tok
        FROM (SELECT unnest(toks) AS tok FROM tk) GROUP BY tok),
      tot AS (SELECT COUNT(*) AS n_total FROM p)
      SELECT pair, n_pair, l.n_tok AS n_left, r.n_tok AS n_right,
        (CAST(n_pair AS DOUBLE) * CAST(n_total AS DOUBLE)) /
          (CAST(l.n_tok AS DOUBLE) * CAST(r.n_tok AS DOUBLE)) AS score
      FROM pc
      JOIN uc l ON l.tok = string_split(pair, ' ')[1]
      JOIN uc r ON r.tok = string_split(pair, ' ')[2], tot
      ORDER BY score DESC, pair LIMIT 20"""))

  /** k-means assignment step (Similarity.kmeansAssign): 8 smallest-id
    * seed centroids, exact integer squared distances over ×1000-
    * quantized components, ties to the smaller centroid id; per-cluster
    * sizes and total distortion verified. Plus listCentroidSums this is
    * a full deterministic Lloyd iteration. */
  val q77 = Q("q77_kmeans_assign",
    (s, dir) => Similarity.kmeansAssign(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 8)
      .groupBy("cid")
      .agg(count(lit(1)).as("n_assigned"), sum(col("dist2")).as("total_dist2"))
      .orderBy("cid"),
    Some("""WITH base AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
      FROM embeddings),
      c AS (SELECT vec_id AS cid, qv AS cqv FROM base ORDER BY vec_id LIMIT 8),
      ex AS (SELECT vec_id, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS x
             FROM base, range(1, 65) t(i)),
      cx AS (SELECT cid, CAST(i AS INT) AS pos, cqv[CAST(i AS INT)] AS cv
             FROM c, range(1, 65) t(i)),
      d AS (SELECT vec_id, cid, CAST(SUM((x-cv)*(x-cv)) AS BIGINT) AS dist2
            FROM ex JOIN cx USING (pos) GROUP BY vec_id, cid),
      a AS (SELECT vec_id, cid, dist2,
              row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
            FROM d)
      SELECT cid, COUNT(*) AS n_assigned, CAST(SUM(dist2) AS BIGINT) AS total_dist2
      FROM a WHERE rn = 1 GROUP BY cid ORDER BY cid"""))

  /** Lexical-diversity report: per-source token count, vocabulary size,
    * and type-token ratio (one IEEE division of exact BIGINTs) — the
    * corpus-richness signal read next to q74's domain mix when choosing
    * mixture weights (boilerplate-heavy sources score low). Shuffle
    * shape: countDistinct plans two-level aggregation — one exchange on
    * (source, tok), a second on source — plus the final sort's range
    * exchange over |sources| rows. */
  val q78 = Q("q78_lexical_diversity",
    (s, dir) => t(s, dir, "documents")
      .select(col("source"), explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("tok")).as("n_distinct_tokens"))
      .withColumn("ttr",
        col("n_distinct_tokens").cast("double") / col("n_tokens").cast("double"))
      .orderBy("source"),
    Some("""WITH ex AS (SELECT source,
        unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok FROM documents)
      SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct_tokens,
        CAST(COUNT(DISTINCT tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ttr
      FROM ex GROUP BY source ORDER BY source"""))

  /** Near-dup cluster-size histogram: the distribution you read to
    * calibrate dedup aggressiveness (a fat tail of big clusters means
    * boilerplate; all-pairs means the threshold is too loose). Same
    * LSH→verify→connected-components front end as q64, then two tiny
    * aggregates: per-component size, then clusters per size. */
  val q79 = Q("q79_cluster_size_histogram",
    (s, dir) => neardupComponents(s, dir)
      .groupBy("comp").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .orderBy("cluster_size"),
    Some(s"""$neardupCompCte,
      sizes AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component)
      SELECT cluster_size, COUNT(*) AS n_clusters FROM sizes
      GROUP BY cluster_size ORDER BY cluster_size"""))

  /** The 100 TB form of q75: winners elected on 8-byte xxhash64(span)
    * keys instead of the span text (one text shuffle instead of two —
    * see Curation.dedupSpans scaladoc). Previously spec-pinned only;
    * this runs it against the SAME byte-for-byte text oracle as q75,
    * hash-verifying that the hashed election reproduces the parity
    * form's output exactly (modulo the documented 2⁻⁶⁴ collision
    * class, which the fixed corpus does not exhibit). */
  val q80 = Q("q80_span_dedup_hashed",
    (s, dir) => graft.text.Curation.dedupSpans(
        "doc_id", "text", chunkTokens = 25, hashedWinners = true)(
        t(s, dir, "documents"))
      .orderBy("doc_id"),
    q75.oracle)

  /** Full Lloyd k-means (Similarity.kmeans): 2 assignment rounds with
    * an exact integer centroid update between them — the composition
    * the q77 scaladoc promises. Centroids are carried UNDIVIDED as
    * (Σ-vector, n); distance-to-mean compares the exact BIGINT
    * numerator ‖n·x − S‖² over n² via one IEEE division, identical in
    * both engines. Output: final cluster sizes + exact id range per
    * cluster (membership-determined, no floats in the result). */
  val q81 = Q("q81_kmeans_lloyd",
    (s, dir) => Similarity.kmeans(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 8, iters = 2)
      .groupBy("cid")
      .agg(count(lit(1)).as("n_assigned"),
        min(col("vec_id")).as("min_id"), max(col("vec_id")).as("max_id"))
      .orderBy("cid"),
    Some("""WITH base AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
      FROM embeddings),
      ex AS (SELECT vec_id, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS x
             FROM base, range(1, 65) t(i)),
      c0 AS (SELECT vec_id AS cid, qv FROM base ORDER BY vec_id LIMIT 8),
      cx0 AS (SELECT cid, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS s,
                CAST(1 AS BIGINT) AS n
              FROM c0, range(1, 65) t(i)),
      d1 AS (SELECT vec_id, cid,
               CAST(SUM((n*x - s)*(n*x - s)) AS BIGINT) AS num, MAX(n) AS n
             FROM ex JOIN cx0 USING (pos) GROUP BY vec_id, cid),
      a1 AS (SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(num AS DOUBLE)/CAST(n*n AS DOUBLE), cid) AS rn
             FROM d1),
      m1 AS (SELECT vec_id, cid FROM a1 WHERE rn = 1),
      cx1 AS (SELECT cid, pos, CAST(SUM(x) AS BIGINT) AS s,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM ex JOIN m1 USING (vec_id) GROUP BY cid, pos),
      d2 AS (SELECT vec_id, cid,
               CAST(SUM((n*x - s)*(n*x - s)) AS BIGINT) AS num, MAX(n) AS n
             FROM ex JOIN cx1 USING (pos) GROUP BY vec_id, cid),
      a2 AS (SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(num AS DOUBLE)/CAST(n*n AS DOUBLE), cid) AS rn
             FROM d2)
      SELECT cid, COUNT(*) AS n_assigned, MIN(vec_id) AS min_id, MAX(vec_id) AS max_id
      FROM a2 WHERE rn = 1 GROUP BY cid ORDER BY cid"""))

  /** TF-IDF relevance scoring (Relevance.tfIdf): per-(doc, term) raw
    * tf, corpus df, and the ln-free rational score tf·(N+1)/(df+1) —
    * one IEEE division of exact BIGINTs (libm ln is not bit-portable
    * across engines; ln is monotone, so ranking is unchanged). Top 20
    * by score with total-order tiebreaks. */
  val q82 = Q("q82_tfidf",
    (s, dir) => graft.text.Relevance.tfIdf(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("score").desc, col("term"), col("doc_id"))
      .limit(20),
    Some("""WITH ex AS (SELECT doc_id,
        unnest(string_split_regex(trim(lower(text)), '\s+')) AS term FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ex WHERE term <> ''
             GROUP BY doc_id, term),
      dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      n AS (SELECT COUNT(*) AS nd FROM documents)
      SELECT doc_id, term, tf, df,
        CAST(tf * (nd + 1) AS DOUBLE) / CAST(df + 1 AS DOUBLE) AS score
      FROM tf JOIN dfreq USING (term), n
      ORDER BY score DESC, term, doc_id LIMIT 20"""))

  /** Bloom-prefiltered decontamination
    * (Curation.contaminationCountsBloom): the eval gram set folded
    * into ONE BloomFilter blob, the corpus-gram stream prefiltered by
    * a narrow might_contain predicate, exact sort-merge verification
    * after — the shape for an eval set too big to broadcast exactly.
    * Same oracle as q65: the bloom pass must change NOTHING. */
  val q83 = Q("q83_bloom_decontamination",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.text.Curation.contaminationCountsBloom(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          "doc_id", "text", n = 5)
        .orderBy("doc_id")
    },
    q65.oracle)

  /** Per-source quality deciles (NTILE) — curriculum/difficulty
    * binning: rank each source's docs by mean token length (an exact-
    * operand IEEE ratio) and cut into 10 equal-depth buckets. The
    * order carries a doc_id tiebreak so the cut is a total order —
    * NTILE on ties is otherwise engine-arbitrary. Since round 12 the
    * engine side rides [[graft.operators.GroupedNtile]] — the
    * two-phase-rank form with NO per-group window (a window here is
    * one task per source at corpus scale); bucket assignment is
    * spec-pinned identical to `ntile(10) OVER (...)`, which is
    * exactly what the unchanged oracle still computes. */
  val q84 = Q("q84_quality_deciles",
    (s, dir) => {
      val toks = split(trim(lower(col("text"))), "\\s+")
      val nTok = size(toks).cast(LongType)
      val nonSpace = length(regexp_replace(col("text"), "\\s", "")).cast(LongType)
      val meanTokLen = nonSpace.cast("double") / nTok.cast("double")
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), nTok.as("n_tokens"),
          meanTokLen.as("mean_token_len"))
      graft.operators.GroupedNtile.groupedNtile(
          Seq("source"), Seq(col("mean_token_len"), col("doc_id")), 10,
          bucketCol = "decile")(base)
        .select("doc_id", "source", "n_tokens", "mean_token_len", "decile")
        .orderBy("doc_id")
    },
    Some("""WITH q AS (SELECT doc_id, source,
        CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
        CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
          / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) AS mean_token_len
      FROM documents)
      SELECT doc_id, source, n_tokens, mean_token_len,
        CAST(ntile(10) OVER (PARTITION BY source
          ORDER BY mean_token_len, doc_id) AS BIGINT) AS decile
      FROM q ORDER BY doc_id"""))

  /** REAL WAV decode verified cross-engine: each doc synthesizes a
    * deterministic PCM16 waveform, Spark encodes it into genuine RIFF
    * bytes and DECODES THEM BACK (Codec.decodeWavPcm16 — chunk walking,
    * LE samples) before computing exact integer window energies; the
    * oracle recomputes the energies arithmetically from the synthesis
    * formula, never touching bytes. Any header/endianness/chunk bug
    * hash-mismatches. 400 samples @ 8 kHz, 160-sample windows, 80 hop
    * ⇒ 4 windows/doc; |s| ≤ 1001 ⇒ energy ≤ 1.6·10⁸ — exact BIGINT. */
  val q85 = Q("q85_wav_window_energy",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val samples = Array.tabulate(400)(i =>
            (((id * 31 + i * 17) % 2003) - 1001).toShort)
          val (sr, decoded) =
            graft.multimodal.Codec.decodeWavPcm16(
              graft.multimodal.Codec.encodeWavPcm16(samples, 8000))
          require(sr == 8000 && decoded.length == 400, "WAV round-trip lost data")
          val win = 160; val hop = 80
          (0 to decoded.length - win by hop).zipWithIndex.map { case (start, wi) =>
            var e = 0L; var k = 0
            while (k < win) { val v = decoded(start + k).toLong; e += v * v; k += 1 }
            (id, wi.toLong, e)
          }
        }
        .toDF("media_id", "window_idx", "energy")
        .orderBy("media_id", "window_idx")
    },
    Some("""WITH s AS (SELECT doc_id AS media_id, CAST(wi AS BIGINT) AS window_idx,
        ((doc_id*31 + (wi*80 + k)*17) % 2003) - 1001 AS v
      FROM documents, range(0, 4) t(wi), range(0, 160) u(k))
      SELECT media_id, window_idx, CAST(SUM(v*v) AS BIGINT) AS energy
      FROM s GROUP BY media_id, window_idx ORDER BY media_id, window_idx"""))

  /** REAL BMP decode verified cross-engine, same scheme as q85: a
    * deterministic 15×10 grayscale image is encoded into genuine
    * 24 bpp BMP bytes (BGR, 4-byte row padding — width 15 forces a
    * 3-byte pad — bottom-up rows) and decoded back before 5×5 block
    * pixel sums; the oracle recomputes the sums from the pixel
    * formula. Padding/row-order/channel-order bugs hash-mismatch. */
  val q86 = Q("q86_bmp_block_sums",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val gray = Array.tabulate(10, 15)((r, c) =>
            ((id * 7 + r * 13 + c * 29) % 256).toInt)
          val g = graft.multimodal.Codec.decodeBmp24(
            graft.multimodal.Codec.encodeBmp24(gray))
          for (br <- 0 until 2; bc <- 0 until 3) yield {
            var sum = 0L
            var r = br * 5
            while (r < br * 5 + 5) {
              var c = bc * 5
              while (c < bc * 5 + 5) { sum += g(r)(c); c += 1 }
              r += 1
            }
            (id, br.toLong, bc.toLong, sum)
          }
        }
        .toDF("media_id", "block_r", "block_c", "pixel_sum")
        .orderBy("media_id", "block_r", "block_c")
    },
    Some("""WITH p AS (SELECT doc_id AS media_id,
        CAST(br AS BIGINT) AS block_r, CAST(bc AS BIGINT) AS block_c,
        (doc_id*7 + (br*5 + r)*13 + (bc*5 + c)*29) % 256 AS v
      FROM documents, range(0, 2) t(br), range(0, 3) u(bc),
           range(0, 5) rr(r), range(0, 5) cc(c))
      SELECT media_id, block_r, block_c, CAST(SUM(v) AS BIGINT) AS pixel_sum
      FROM p GROUP BY media_id, block_r, block_c
      ORDER BY media_id, block_r, block_c"""))

  /** Integer-exact PageRank over the near-dup similarity graph
    * (Centrality.integerPageRank, 3 iterations): centrality-based
    * canonical-representative selection — the highest-ranked doc in a
    * duplicate cluster is the one its near-duplicates "agree with"
    * most. Same verified-pair front end as q64/q79; every step is
    * floor-division integer arithmetic, so the DuckDB oracle unrolls
    * the identical iterations with `//`. Top 20 by (pr, doc_id). */
  val q87 = Q("q87_neardup_pagerank",
    (s, dir) => {
      val ver = Dedup.verifiedNearDupPairs(
          t(s, dir, "documents"), "doc_id", "text", Dedup.CharShingles(5), 8, 4)
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b")
      val edges = ver.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(ver.select(col("id_b").as("src"), col("id_a").as("dst")))
      graft.operators.Centrality.integerPageRank(edges, iters = 3)
        .select(col("v").as("doc_id"), col("pr"))
        .orderBy(col("pr").desc, col("doc_id"))
        .limit(20)
    },
    Some {
      def step(prev: String, out: String): String =
        s"""c$out AS (SELECT e.dst AS v, CAST(SUM(r.pr // d.d) AS BIGINT) AS s
              FROM edges e JOIN r$prev r ON r.v = e.src
              JOIN deg d ON d.src = e.src GROUP BY e.dst),
           r$out AS (SELECT n.v, CAST(150000 + (COALESCE(c.s, 0) * 85) // 100 AS BIGINT) AS pr
              FROM nodes n LEFT JOIN c$out c ON c.v = n.v)"""
      s"""$neardupEdgesCte,
        deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        nodes AS (SELECT DISTINCT src AS v FROM edges),
        r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS pr FROM nodes),
        ${step("0", "1")},
        ${step("1", "2")},
        ${step("2", "3")}
        SELECT v AS doc_id, pr FROM r3 ORDER BY pr DESC, doc_id LIMIT 20"""
    })

  /** Heavy hitters via the two-pass Misra-Gries pattern
    * (functions.HeavyHitters): ONE bounded-summary pass (capacity 199
    * counters per partial aggregate — guaranteed superset of every
    * token with frequency > N/200) + an exact recount pruned to the
    * candidates, instead of a full-vocabulary groupBy shuffle. Final
    * filter freq·100 > N is exact, so the plain GROUP BY/HAVING oracle
    * doubles as proof that the sketch never dropped a heavy hitter. */
  val q88 = Q("q88_heavy_hitters",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
      val cands = toks
        .agg(graft.functions.HeavyHitters.candidates(col("tok"), 199).as("cands"))
        .select(explode(col("cands")).as("tok"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      toks.join(broadcast(cands), Seq("tok"))
        .groupBy("tok").agg(count(lit(1)).as("freq"))
        .crossJoin(broadcast(total))
        .filter(col("freq") * 100 > col("n_total"))
        .select(col("tok"), col("freq"))
        .orderBy(col("freq").desc, col("tok"))
    },
    Some("""WITH ex AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents),
      tk AS (SELECT tok FROM ex WHERE tok <> ''),
      n AS (SELECT COUNT(*) AS n_total FROM tk),
      c AS (SELECT tok, COUNT(*) AS freq FROM tk GROUP BY tok)
      SELECT tok, freq FROM c, n WHERE freq * 100 > n_total
      ORDER BY freq DESC, tok"""))

  /** Vocabulary coverage curve — the tokenizer-sizing report: rank
    * tokens by frequency (ties by token — total order, NTILE-style
    * determinism), emit each rank's cumulative share of all token
    * occurrences. Read to choose a vocab size ("top 10k tokens cover
    * 97% of the corpus"). Shuffle shape: one vocab aggregate, then a
    * single-partition window over |vocab| rows — the one deliberate
    * single-partition sort in the battery, legitimate because the
    * VOCAB (not the corpus) is the input and top-30 is the output;
    * a 10⁹-token vocab run would cap ranks first (the limit pushes
    * into TakeOrdered below). */
  val q89 = Q("q89_vocab_coverage",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      val w = Window.orderBy(col("freq").desc, col("tok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      vocab
        .withColumn("rank", row_number().over(Window.orderBy(col("freq").desc, col("tok"))))
        .withColumn("cum_freq", sum(col("freq")).over(w))
        .crossJoin(broadcast(total))
        .filter(col("rank") <= 30)
        .select(col("rank").cast(LongType).as("rank"), col("tok"), col("freq"),
          (col("cum_freq").cast("double") / col("n_total").cast("double")).as("cum_share"))
        .orderBy("rank")
    },
    Some("""WITH ex AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents),
      tk AS (SELECT tok FROM ex WHERE tok <> ''),
      n AS (SELECT COUNT(*) AS n_total FROM tk),
      v AS (SELECT tok, COUNT(*) AS freq FROM tk GROUP BY tok),
      r AS (SELECT tok, freq,
          row_number() OVER (ORDER BY freq DESC, tok) AS rank,
          SUM(freq) OVER (ORDER BY freq DESC, tok
            ROWS UNBOUNDED PRECEDING) AS cum_freq
        FROM v)
      SELECT CAST(rank AS BIGINT) AS rank, tok, freq,
        CAST(cum_freq AS DOUBLE) / CAST(n_total AS DOUBLE) AS cum_share
      FROM r, n WHERE rank <= 30 ORDER BY rank"""))

  /** Incremental near-dup screen — the standing ingest job: docs
    * arriving in a NEW batch (doc_id ≡ 0 mod 4 here) verified against
    * the EXISTING corpus's stored LSH signature index + fingerprints,
    * without re-shingling the corpus. The bucket probe is a plain
    * equi-join on (band, bandsig) — batch-side broadcastable when the
    * daily batch ≪ corpus — and verification touches only corpus
    * fingerprints that matched a bucket. The oracle replays the split
    * as a filter on the bipartite banded join. */
  val q90 = Q("q90_incremental_neardup",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val batch = docs.filter(col("doc_id") % 4 === 0)
      val corpus = docs.filter(col("doc_id") % 4 =!= 0)
      // stands in for the stored index: in production these two are
      // Store tables written when each prior batch was admitted
      val corpusHashed = Dedup.hashedDocs(corpus, "doc_id", "text", Dedup.CharShingles(5))
        .localCheckpoint(false)
      val corpusBanded = Dedup.bandedSigs(corpusHashed, 8, 4)
      Dedup.incrementalNearDupPairs(batch, "doc_id", "text", Dedup.CharShingles(5), 8, 4,
          corpusBanded, corpusHashed)
        .filter(col("jaccard") >= 0.25)
        .orderBy("batch_id", "corpus_id")
    },
    Some(s"""WITH sh AS (SELECT doc_id, ${shingleSql(5)} AS s FROM documents),
      $hashSetCte,
      ${sigBandedSql(8, 4)},
      cand AS (SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
               FROM banded a JOIN banded b
               ON a.band = b.band AND a.bandsig = b.bandsig
               AND a.doc_id % 4 = 0 AND b.doc_id % 4 <> 0)
      SELECT batch_id, corpus_id, jaccard FROM (
        SELECT batch_id, corpus_id, ${jaccardSql("sa.h", "sb.h")} AS jaccard
        FROM cand JOIN shh sa ON sa.doc_id = batch_id JOIN shh sb ON sb.doc_id = corpus_id)
      WHERE jaccard >= 0.25 ORDER BY batch_id, corpus_id"""))

  /** Single-pass column profile (QualitySuite.columnProfile) — the
    * profiling report a curation run starts from: nulls, distinct
    * count, min/max per column, ONE scan via Expand-planned
    * multi-countDistinct. Doubles are deliberately absent from the
    * profiled set: min/max travel as strings and double→string
    * rendering is the one cast the two engines don't share bit-for-bit
    * guarantees on. */
  val q91 = Q("q91_column_profile",
    (s, dir) => QualitySuite.columnProfile(
        t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate", "o_orderpriority"))
      .orderBy("col_name"),
    Some {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate", "o_orderpriority")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
            CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
            COUNT(DISTINCT $c) AS n_distinct,
            CAST(MIN($c) AS VARCHAR) AS min_value,
            CAST(MAX($c) AS VARCHAR) AS max_value FROM orders"""
      }.mkString("", " UNION ALL ", " ORDER BY col_name")
    })

  /** Leakage-safe train/val/test assignment: the whole near-dup
    * cluster (same verified-pair + CC front end as q64/q79/q87) lands
    * in ONE split, decided by md5(cluster key) mod 100 — a doc can
    * never train while its near-duplicate evaluates. Singletons key on
    * their own id. Oracle: the q64 recursive-CTE components + the same
    * md5 bucket arithmetic. */
  val q92 = Q("q92_leakage_safe_splits",
    (s, dir) => graft.text.Curation.leakageSafeSplits(
        t(s, dir, "documents").select("doc_id", "source"),
        "doc_id", neardupComponents(s, dir),
        Seq(("train", 80), ("val", 10), ("test", 10)))
      .select("doc_id", "source", "component", "split")
      .orderBy("doc_id"),
    Some(s"""$neardupCompCte,
      asg AS (SELECT d.doc_id, d.source,
          COALESCE(c.component, d.doc_id) AS component
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
      SELECT doc_id, source, component,
        CASE WHEN ('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 15))::BIGINT % 100 < 80
               THEN 'train'
             WHEN ('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 15))::BIGINT % 100 < 90
               THEN 'val'
             ELSE 'test' END AS split
      FROM asg ORDER BY doc_id"""))

  /** 64-bit simhash near-dup — the corpus-scale form of q29
    * ([[Dedup.simhashNearDupPairs64]]): 4 bands × 16 bits instead of
    * 4 × 8, same pigeonhole-exact recall at hamming ≤ 3, but 65,536
    * bucket values per band instead of 256 — the band-occupancy fix for
    * the super-linear simhash outlier BENCH_SCALE.md measured at 10×.
    * Oracle rebuilds the 64-bit hash from two md5 halves (DuckDB BIGINT
    * is signed: bit 63 re-attaches as -2⁶³; band extraction is
    * shift+mask, identical bits under signed or unsigned shift). */
  val q93 = Q("q93_simhash64_neardup",
    (s, dir) => Dedup.simhashNearDupPairs64(
        t(s, dir, "documents"), "doc_id", "text", radius = 3)
      .orderBy("id_a", "id_b"),
    Some {
      val bitSum = (0 until 64).map { b =>
        val half = if (b >= 32) "p[1]" else "p[2]"
        val weight = if (b == 63) "-9223372036854775808" else (1L << b).toString
        s"CASE WHEN 2*list_sum(list_transform(hl, p -> (${half} >> ${b % 32}) & 1)) > n THEN $weight ELSE 0 END"
      }.mkString(" + ")
      s"""WITH tk AS (SELECT doc_id,
          list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) AS toks
          FROM documents),
        hs AS (SELECT doc_id,
          list_transform(toks, t -> [('0x' || substr(md5(t), 1, 8))::BIGINT,
                                     ('0x' || substr(md5(t), 9, 8))::BIGINT]) AS hl,
          len(toks) AS n FROM tk),
        sh64 AS (SELECT doc_id, $bitSum AS h FROM hs),
        banded AS (SELECT doc_id, h, band, (h >> (16*band)) & 65535 AS bv
                   FROM sh64, (SELECT unnest([0,1,2,3]) AS band)),
        pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
                  FROM banded a JOIN banded b
                  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b"""
    })

  /** SemDeDup — semantic dedup over embeddings (training-data op,
    * Similarity.semDedup): k-means bounds the pairwise-cosine search to
    * within-cluster pairs, ≥ θ pairs connect into duplicate groups, one
    * representative per group survives (farthest from centroid — the
    * paper's retention policy — on the EXACT integer distance
    * numerator). θ = 0.35 fits the synthetic embeddings' similarity
    * range (max pairwise cosine ≈ 0.51; a production 0.99 would be
    * vacuously all-kept here). Oracle: q81's integer-exact Lloyd CTE
    * carrying the distance numerator, within-cluster cosine pairs,
    * recursive-CTE components, window-ranked representatives. */
  val q94 = Q("q94_semdedup",
    (s, dir) => graft.similarity.Similarity.semDedup(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2, theta = 0.35)
      .orderBy("vec_id"),
    Some("""WITH RECURSIVE base AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
      FROM embeddings),
      ex AS (SELECT vec_id, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS x
             FROM base, range(1, 65) t(i)),
      c0 AS (SELECT vec_id AS cid, qv FROM base ORDER BY vec_id LIMIT 8),
      cx0 AS (SELECT cid, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS s,
                CAST(1 AS BIGINT) AS n
              FROM c0, range(1, 65) t(i)),
      d1 AS (SELECT vec_id, cid,
               CAST(SUM((n*x - s)*(n*x - s)) AS BIGINT) AS num, MAX(n) AS n
             FROM ex JOIN cx0 USING (pos) GROUP BY vec_id, cid),
      a1 AS (SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(num AS DOUBLE)/CAST(n*n AS DOUBLE), cid) AS rn
             FROM d1),
      m1 AS (SELECT vec_id, cid FROM a1 WHERE rn = 1),
      cx1 AS (SELECT cid, pos, CAST(SUM(x) AS BIGINT) AS s,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM ex JOIN m1 USING (vec_id) GROUP BY cid, pos),
      d2 AS (SELECT vec_id, cid,
               CAST(SUM((n*x - s)*(n*x - s)) AS BIGINT) AS num, MAX(n) AS n
             FROM ex JOIN cx1 USING (pos) GROUP BY vec_id, cid),
      a2 AS (SELECT vec_id, cid, num,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(num AS DOUBLE)/CAST(n*n AS DOUBLE), cid) AS rn
             FROM d2),
      mem AS (SELECT vec_id, cid, num FROM a2 WHERE rn = 1),
      pr AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
               CAST(list_sum(list_transform(list_zip(qa.qv, qb.qv), p -> p[1]*p[2])) AS DOUBLE)
               / (sqrt(CAST(list_sum(list_transform(qa.qv, x -> x*x)) AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(qb.qv, x -> x*x)) AS DOUBLE))) AS cosine
             FROM mem a JOIN mem b ON a.cid = b.cid AND a.vec_id < b.vec_id
             JOIN base qa ON qa.vec_id = a.vec_id
             JOIN base qb ON qb.vec_id = b.vec_id),
      ed AS (SELECT ia, ib FROM pr WHERE cosine >= 0.35),
      edges AS (SELECT ia AS src, ib AS dst FROM ed UNION SELECT ib, ia FROM ed),
      walk(src, reach) AS (
        SELECT src, src FROM (SELECT DISTINCT src FROM edges)
        UNION
        SELECT w.src, e.dst FROM walk w JOIN edges e ON w.reach = e.src),
      comp AS (SELECT src AS vec_id, MIN(reach) AS component FROM walk GROUP BY src),
      rep AS (SELECT component, vec_id,
                row_number() OVER (PARTITION BY component
                  ORDER BY num DESC, vec_id) AS rn2
              FROM comp JOIN mem USING (vec_id))
      SELECT m.vec_id, m.cid, COALESCE(c.component, m.vec_id) AS component,
        (c.component IS NULL OR r.vec_id IS NOT NULL) AS kept
      FROM mem m LEFT JOIN comp c USING (vec_id)
      LEFT JOIN (SELECT vec_id FROM rep WHERE rn2 = 1) r ON r.vec_id = m.vec_id
      ORDER BY m.vec_id"""))

  /** Overlapping token-window chunking (RAG/embedding prep,
    * Curation.chunkWithStride): 40-token windows advancing by 30 (10
    * tokens of overlap), tail kept. Fully narrow — generate + project,
    * no shuffle; chunk count from non-negative integer arithmetic only
    * (engine-exact, see the operator scaladoc). */
  val q95 = Q("q95_chunk_stride",
    (s, dir) => graft.text.Curation.chunkWithStride("text", window = 40, stride = 30)(
        t(s, dir, "documents").select("doc_id", "text"))
      .orderBy("doc_id", "chunk_idx"),
    Some("""WITH tk AS (SELECT doc_id,
        list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
      FROM documents),
      nc AS (SELECT doc_id, toks,
               1 + (greatest(len(toks) - 40, 0) + 29) // 30 AS nch FROM tk),
      ch AS (SELECT doc_id, unnest(list_transform(range(0, nch), i ->
               {'idx': i, 'c': list_slice(toks, CAST(i*30+1 AS INT), CAST(i*30+40 AS INT))})) AS u
             FROM nc)
      SELECT doc_id, CAST(u.idx AS BIGINT) AS chunk_idx,
        array_to_string(u.c, ' ') AS chunk_text,
        CAST(len(u.c) AS BIGINT) AS n_tokens
      FROM ch ORDER BY doc_id, chunk_idx"""))

  /** Per-source cap (domain balancing, Curation.capPerGroup): at most 5
    * docs per source by 52-bit md5(id) order — the k-bounded TopKBy
    * aggregate form whose exchange carries ≤ k ids per group per map
    * partition, vs q68's rank-every-row window form. Oracle: the window
    * form — proving the two shapes select the identical set. */
  val q96 = Q("q96_source_cap",
    (s, dir) => graft.text.Curation.capPerGroup("source", "doc_id", k = 5)(
        t(s, dir, "documents").select("doc_id", "source"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, source FROM (
        SELECT doc_id, source,
          row_number() OVER (PARTITION BY source
            ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT,
                     doc_id) AS rn
        FROM documents)
      WHERE rn <= 5 ORDER BY doc_id"""))

  /** ANN recall evaluation (Similarity.recallAtK): IVF@nprobe=2 top-10
    * vs brute-force ground truth for a probe set of query vectors —
    * the measured-recall loop that tunes an ANN index. Both sides
    * k-bound per query via TopKBy (≤ k·|queries| ids cross any
    * shuffle); identical tie rule (cosine desc, id asc) so the
    * comparison is like-for-like. */
  val q97 = Q("q97_ann_recall",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val base = emb.select(col("vec_id").as("id"), col("label"),
        Similarity.quantize(col("embedding")).as("qv"))
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), Similarity.quantize(col("embedding")).as("qqv"))
      val exact = Similarity.bruteTopKNeighbors(base.select("id", "qv"), queries, 10)
      val approx = Similarity.ivfTopKNeighbors(base, "label", queries, 10, nprobe = 2)
      Similarity.recallAtK(exact, approx, "qid", "id", 10).orderBy("qid")
    },
    Some(s"""WITH base AS (SELECT vec_id, label, $quantSql AS qv FROM embeddings),
      qs AS (SELECT vec_id AS qid, qv AS qqv FROM base WHERE vec_id % 100 = 0),
      ex0 AS (SELECT q.qid, b.vec_id AS id, ${cosSql("b.qv", "q.qqv")} AS cosine
              FROM base b, qs q WHERE b.vec_id <> q.qid),
      exk AS (SELECT qid, id FROM (
                SELECT qid, id, row_number() OVER (PARTITION BY qid
                  ORDER BY cosine DESC, id) AS rn FROM ex0) WHERE rn <= 10),
      expl AS (SELECT label, unnest(qv) AS v, generate_subscripts(qv, 1) AS pos FROM base),
      cent AS (SELECT label, list(sv ORDER BY pos) AS cvec FROM
                 (SELECT label, pos, SUM(v) AS sv FROM expl GROUP BY label, pos)
               GROUP BY label),
      pr0 AS (SELECT q.qid, c.label, ${cosSql("c.cvec", "q.qqv")} AS cscore
              FROM cent c, qs q),
      prb AS (SELECT qid, label FROM (
                SELECT qid, label, row_number() OVER (PARTITION BY qid
                  ORDER BY cscore DESC, label) AS rn FROM pr0) WHERE rn <= 2),
      ap0 AS (SELECT q.qid, b.vec_id AS id, ${cosSql("b.qv", "q.qqv")} AS cosine
              FROM base b JOIN prb p ON b.label = p.label
              JOIN qs q ON q.qid = p.qid
              WHERE b.vec_id <> q.qid),
      apk AS (SELECT qid, id FROM (
                SELECT qid, id, row_number() OVER (PARTITION BY qid
                  ORDER BY cosine DESC, id) AS rn FROM ap0) WHERE rn <= 10),
      hit AS (SELECT e.qid, COUNT(*) AS n_hit FROM exk e
              JOIN apk a ON a.qid = e.qid AND a.id = e.id GROUP BY e.qid)
      SELECT q.qid, COALESCE(h.n_hit, 0) AS n_hit,
        CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(10 AS DOUBLE) AS recall
      FROM (SELECT DISTINCT qid FROM exk) q
      LEFT JOIN hit h USING (qid) ORDER BY qid"""))

  /** Incremental semantic screen (Similarity.semanticScreen) — the
    * embedding twin of q90: which batch vectors (vec_id % 3 == 0)
    * duplicate a stored-corpus vector at cosine ≥ 0.35, probing ONLY
    * the batch vector's assigned k-means cluster. The in-query
    * corpus/batch split stands in for the Store tables exactly as in
    * q90; the codebook is re-derived from the index (per-(cid,pos)
    * integer sums), so the oracle rebuilds the identical state. */
  val q98 = Q("q98_semantic_screen",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = emb.filter(col("vec_id") % 3 =!= 0)
      val batch = emb.filter(col("vec_id") % 3 === 0)
      // stands in for the stored index (writeSemanticIndex output)
      val corpusAssigned = Similarity.kmeans(corpus, "vec_id", "embedding", k = 8, iters = 2)
        .join(corpus.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv")),
          "vec_id")
        .select(col("vec_id").as("id"), col("cid"), col("qv"))
        .localCheckpoint(false)
      Similarity.semanticScreen(batch, "vec_id", "embedding", corpusAssigned, theta = 0.35)
        .orderBy("batch_id", "corpus_id")
    },
    Some(s"""WITH RECURSIVE base AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
      FROM embeddings),
      corp AS (SELECT * FROM base WHERE vec_id % 3 <> 0),
      ex AS (SELECT vec_id, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS x
             FROM corp, range(1, 65) t(i)),
      c0 AS (SELECT vec_id AS cid, qv FROM corp ORDER BY vec_id LIMIT 8),
      cx0 AS (SELECT cid, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS s,
                CAST(1 AS BIGINT) AS n
              FROM c0, range(1, 65) t(i)),
      d1 AS (SELECT vec_id, cid,
               CAST(SUM((n*x - s)*(n*x - s)) AS BIGINT) AS num, MAX(n) AS n
             FROM ex JOIN cx0 USING (pos) GROUP BY vec_id, cid),
      a1 AS (SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(num AS DOUBLE)/CAST(n*n AS DOUBLE), cid) AS rn
             FROM d1),
      m1 AS (SELECT vec_id, cid FROM a1 WHERE rn = 1),
      cx1 AS (SELECT cid, pos, CAST(SUM(x) AS BIGINT) AS s,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM ex JOIN m1 USING (vec_id) GROUP BY cid, pos),
      d2 AS (SELECT vec_id, cid,
               CAST(SUM((n*x - s)*(n*x - s)) AS BIGINT) AS num, MAX(n) AS n
             FROM ex JOIN cx1 USING (pos) GROUP BY vec_id, cid),
      a2 AS (SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(num AS DOUBLE)/CAST(n*n AS DOUBLE), cid) AS rn
             FROM d2),
      mem AS (SELECT vec_id, cid FROM a2 WHERE rn = 1),
      cx2 AS (SELECT cid, pos, CAST(SUM(x) AS BIGINT) AS s,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM ex JOIN mem USING (vec_id) GROUP BY cid, pos),
      bt AS (SELECT vec_id, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS x
             FROM base, range(1, 65) t(i) WHERE vec_id % 3 = 0),
      d3 AS (SELECT vec_id, cid,
               CAST(SUM((n*x - s)*(n*x - s)) AS BIGINT) AS num, MAX(n) AS n
             FROM bt JOIN cx2 USING (pos) GROUP BY vec_id, cid),
      a3 AS (SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(num AS DOUBLE)/CAST(n*n AS DOUBLE), cid) AS rn
             FROM d3),
      basg AS (SELECT vec_id, cid FROM a3 WHERE rn = 1)
      SELECT b.vec_id AS batch_id, m.vec_id AS corpus_id,
        ${cosSql("qb.qv", "qc.qv")} AS cosine
      FROM basg b JOIN mem m ON m.cid = b.cid
      JOIN base qb ON qb.vec_id = b.vec_id
      JOIN base qc ON qc.vec_id = m.vec_id
      WHERE ${cosSql("qb.qv", "qc.qv")} >= 0.35
      ORDER BY batch_id, corpus_id"""))

  /** The IVF-SEEDED two-level Lloyd
    * ([[Similarity.kmeansIvfSeededDetailed]]) oracle-checked at its
    * structural core (iters = 1, k = 25 → kc = 5 coarse lists, kf = 5
    * fine seeds per list): coarse smallest-id-seeded assignment,
    * per-list smallest-id fine seeding, fine assignment restricted to
    * the member's OWN list. Row-level (vec_id, cid, dist_num) pin —
    * the same exact integer distance arithmetic as q77/q81, so DuckDB
    * rebuilds the whole two-level argmin as a CTE chain. This is the
    * large-k clustering path semDedup/writeSemanticIndex route through
    * above the measured k = 400 crossover (BENCH_SCALE.md). */
  val q99 = Q("q99_kmeans_ivf_seeded",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val base = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
        .localCheckpoint(false)
      Similarity.kmeansIvfSeededDetailed(base, "vec_id", k = 25, iters = 1)
        .orderBy("vec_id")
    },
    Some("""WITH base AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qv
      FROM embeddings),
      ex AS (SELECT vec_id, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS x
             FROM base, range(1, 65) t(i)),
      cs AS (SELECT vec_id AS lcid, qv AS cqv FROM base ORDER BY vec_id LIMIT 5),
      csx AS (SELECT lcid, CAST(i AS INT) AS pos, cqv[CAST(i AS INT)] AS s
              FROM cs, range(1, 65) t(i)),
      cd AS (SELECT e.vec_id, c.lcid, CAST(SUM((x - s)*(x - s)) AS BIGINT) AS num
             FROM ex e JOIN csx c USING (pos) GROUP BY e.vec_id, c.lcid),
      ca AS (SELECT vec_id, lcid FROM (
               SELECT vec_id, lcid,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY CAST(num AS DOUBLE), lcid) AS rn
               FROM cd) WHERE rn = 1),
      fs AS (SELECT lcid, vec_id AS cid FROM (
               SELECT ca.lcid, b.vec_id,
                 row_number() OVER (PARTITION BY ca.lcid ORDER BY b.vec_id) AS rn
               FROM base b JOIN ca USING (vec_id)) WHERE rn <= 5),
      fsx AS (SELECT f.lcid, f.cid, CAST(i AS INT) AS pos,
                b.qv[CAST(i AS INT)] AS s
              FROM fs f JOIN base b ON b.vec_id = f.cid, range(1, 65) t(i)),
      fd AS (SELECT e.vec_id, f.cid, CAST(SUM((x - s)*(x - s)) AS BIGINT) AS num
             FROM ex e JOIN ca ON ca.vec_id = e.vec_id
             JOIN fsx f ON f.lcid = ca.lcid AND f.pos = e.pos
             GROUP BY e.vec_id, f.cid),
      fa AS (SELECT vec_id, cid, num,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(num AS DOUBLE), cid) AS rn
             FROM fd)
      SELECT vec_id, cid, num AS dist_num FROM fa WHERE rn = 1 ORDER BY vec_id"""))
}
