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

/** Near-dup dedup families and the relational long tail (q26-q64).
  *
  * One link of the [[Battery]] mixin chain — the battery is split by
  * family for reviewability; the chain preserves the original single-
  * object member order (and with it val-initialization order) exactly.
  */
trait BatteryDedup extends BatteryCore {

  /** MinHash-LSH candidate pairs over char-5-gram shingles: the
    * banding replaces the O(n²) all-pairs cross product with an
    * equi-join on (band, band-signature) — the core scale move.
    * Permutation minhash: one md5 per shingle, k=32 linear maps.
    * (8,4) banding puts the LSH threshold at (1/8)^(1/4)≈0.59, so
    * candidates ≈ true near-dups, not 10% of all pairs. */
  val q26 = Q("q26_minhash_lsh_pairs",
    (s, dir) => Dedup.minhashCandidatePairs(
        t(s, dir, "documents"), "doc_id", "text", shingleN = 5, bands = 8, rowsPerBand = 4)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH sh AS (SELECT doc_id, ${shingleSql(5)} AS s FROM documents),
      $hashSetCte,
      ${lshCandSql(8, 4)}
      SELECT id_a, id_b FROM cand ORDER BY id_a, id_b"""))

  /** LSH candidates → exact char-5-gram Jaccard verification ≥ 0.25:
    * the full two-stage near-dup dedup pipeline, via the shared-pass
    * operator (one persisted shingle-hash scan feeds both stages). */
  val q27 = Q("q27_lsh_jaccard_neardup",
    (s, dir) => Dedup.verifiedNearDupPairs(
        t(s, dir, "documents"), "doc_id", "text", Dedup.CharShingles(5), 8, 4)
      .filter(col("jaccard") >= 0.25)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH sh AS (SELECT doc_id, ${shingleSql(5)} AS s FROM documents),
      $hashSetCte,
      ${lshCandSql(8, 4)}
      SELECT id_a, id_b, jaccard FROM (
        SELECT id_a, id_b, ${jaccardSql("sa.h", "sb.h")} AS jaccard
        FROM cand JOIN shh sa ON sa.doc_id = id_a JOIN shh sb ON sb.doc_id = id_b)
      WHERE jaccard >= 0.25 ORDER BY id_a, id_b"""))

  /** Word-bigram Jaccard near-dup (n-gram Jaccard over tokens instead
    * of chars), LSH-prefiltered with the same banding. */
  val q28 = Q("q28_word_jaccard_neardup",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val mode = Dedup.WordShingles(2)
      val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text", mode, 8, 4)
      Dedup.jaccardOnPairs(pairs, docs, "doc_id", "text", mode)
        .filter(col("jaccard") >= 0.2)
        .orderBy("id_a", "id_b")
    },
    Some(s"""WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
      sh AS (SELECT doc_id, ${wordShingleSql(2, "toks")} AS s FROM tk),
      $hashSetCte,
      ${lshCandSql(8, 4)}
      SELECT id_a, id_b, jaccard FROM (
        SELECT id_a, id_b, ${jaccardSql("sa.h", "sb.h")} AS jaccard
        FROM cand JOIN shh sa ON sa.doc_id = id_a JOIN shh sb ON sb.doc_id = id_b)
      WHERE jaccard >= 0.2 ORDER BY id_a, id_b"""))

  /** 32-bit md5-SimHash near-dup: byte-band bucket join (4 bands of
    * 8 bits) → hamming ≤ 3. With 4 bands, any pair at distance ≤ 3
    * shares at least one unchanged band (pigeonhole), so recall is
    * EXACT at this radius — and the tight radius keeps the verified
    * result near-linear instead of half of all pairs on a templated
    * corpus. */
  val q29 = Q("q29_simhash_neardup",
    (s, dir) => {
      // NOTE: deliberately NOT behind Rebalance.forCpuStage — the
      // 32-bit simhash pass is one md5 per TOKEN (not per shingle),
      // measured cheaper than the rebalance exchange it would buy
      val withH = t(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash32Md5(col("text")).as("h"))
        .localCheckpoint(false)
      val banded = withH.select(col("doc_id"), col("h"),
        explode(array((0 until 4).map { i =>
          struct(lit(i).as("band"),
            shiftrightunsigned(col("h"), 8 * i).bitwiseAND(lit(255L)).as("bv"))
        }: _*)).as("bk"))
        .select(col("doc_id"), col("h"), col("bk.band"), col("bk.bv"))
      // merge-hinted self-join: identical exchanges on both sides are
      // computed once (ReuseExchange) — see Dedup.candidatePairsFromBanded
      val a = banded.as("a").hint("merge"); val b = banded.as("b")
      a.join(b, col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast(LongType).as("hamming"))
        // hamming is FUNCTIONAL on the pair, so filtering before the
        // distinct is result-identical and cuts the dedup shuffle to the
        // ≤3-distance survivors (~2% of candidates on this corpus)
        // instead of every multi-band duplicate of every candidate pair
        .filter(col("hamming") <= 3)
        .distinct()
        .orderBy("id_a", "id_b")
    },
    Some {
      val bitSum = (0 until 32).map(bit =>
        s"CASE WHEN 2*list_sum(list_transform(hl, h -> (h >> $bit) & 1)) > n THEN ${1L << bit} ELSE 0 END")
        .mkString(" + ")
      s"""WITH tk AS (SELECT doc_id,
          list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) AS toks
          FROM documents),
        hs AS (SELECT doc_id,
          list_transform(toks, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS hl,
          len(toks) AS n FROM tk),
        sh2 AS (SELECT doc_id, $bitSum AS h FROM hs),
        banded AS (SELECT doc_id, h, band, (h >> (8*band)) & 255 AS bv
                   FROM sh2, (SELECT unnest([0,1,2,3]) AS band)),
        pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
                  FROM banded a JOIN banded b
                  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b"""
    })

  protected def cosSql(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(list_zip($a, $b), p -> p[1]*p[2])) AS DOUBLE)
        / (sqrt(CAST(list_sum(list_transform($a, x -> x*x)) AS DOUBLE))
         * sqrt(CAST(list_sum(list_transform($b, x -> x*x)) AS DOUBLE)))"""
  protected val quantSql =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT))"

  /** Embedding-cosine near-dup via sign-LSH buckets (8 bits): bucket
    * equi-join instead of all-pairs, then exact cosine ≥ 0.3. */
  val q30 = Q("q30_embedding_neardup",
    (s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
        .withColumn("bucket", Similarity.signBucket(col("qv"), 8))
      val a = base.select(col("vec_id").as("id_a"), col("qv").as("qa"), col("bucket"))
      val b = base.select(col("vec_id").as("id_b"), col("qv").as("qb"), col("bucket"))
      a.join(b, "bucket").filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), Similarity.cosineQ(col("qa"), col("qb")).as("cosine"))
        .filter(col("cosine") >= 0.3)
        .orderBy("id_a", "id_b")
    },
    Some {
      val bucket = (0 until 8).map(i =>
        s"CASE WHEN qv[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
      s"""WITH base AS (SELECT vec_id, $quantSql AS qv FROM embeddings),
        bk AS (SELECT vec_id, qv, $bucket AS bucket FROM base)
        SELECT id_a, id_b, cosine FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosSql("a.qv", "b.qv")} AS cosine
          FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        WHERE cosine >= 0.3 ORDER BY id_a, id_b"""
    })

  /** IVF-style ANN: per-label integer centroid sums → probe the top-2
    * lists by query-centroid cosine → exact top-10 within the probed
    * lists only. The scan cost drops from N to N·(probed/lists). */
  val q31 = Q("q31_ivf_topk",
    (s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), Similarity.quantize(col("embedding")).as("qv"))
      val query = base.filter(col("vec_id") === 0).select(col("qv").as("qqv"))
      val cents = Similarity.listCentroidSums(base, "label", "qv")
      val top2 = cents.crossJoin(broadcast(query))
        .select(col("label"), Similarity.cosineQ(col("cvec"), col("qqv")).as("cscore"))
        .orderBy(col("cscore").desc, col("label").asc).limit(2).select("label")
      base.join(broadcast(top2), Seq("label")).filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(query))
        .select(col("vec_id"), col("label"), Similarity.cosineQ(col("qv"), col("qqv")).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc).limit(10)
    },
    Some(s"""WITH base AS (SELECT vec_id, label, $quantSql AS qv FROM embeddings),
      q AS (SELECT qv AS qqv FROM base WHERE vec_id = 0),
      expl AS (SELECT label, unnest(qv) AS v, generate_subscripts(qv, 1) AS pos FROM base),
      cent AS (SELECT label, list(sv ORDER BY pos) AS cvec FROM
                 (SELECT label, pos, SUM(v) AS sv FROM expl GROUP BY label, pos)
               GROUP BY label),
      top2 AS (SELECT label FROM cent, q
               ORDER BY ${cosSql("cvec", "qqv")} DESC, label ASC LIMIT 2)
      SELECT b.vec_id, b.label, ${cosSql("b.qv", "q.qqv")} AS cosine
      FROM base b, q
      WHERE b.label IN (SELECT label FROM top2) AND b.vec_id <> 0
      ORDER BY cosine DESC, b.vec_id LIMIT 10"""))

  /** BPE-ish regex tokenization stats per language (letters / digit
    * runs / punctuation runs, GPT-2-pattern flavor). */
  val q32 = Q("q32_bpe_token_stats",
    (s, dir) => {
      val toks = expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]+', 0)")
      t(s, dir, "documents")
        .select(col("lang"), size(toks).cast(LongType).as("n"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n")).as("total_bpe_tokens"),
          (sum(col("n")).cast("double") / count(lit(1)).cast("double")).as("avg_bpe_per_doc"))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
      CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+'))) AS BIGINT) AS total_bpe_tokens,
      CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+'))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS avg_bpe_per_doc
      FROM documents GROUP BY lang ORDER BY lang"""))

  /** Karp-Rabin polynomial rolling-hash document fingerprint
    * (base 257 mod 1e9+7 over char codes) — exact in both engines. */
  val q33 = Q("q33_rolling_fingerprint",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"),
        aggregate(transform(split(col("text"), ""), c => ascii(c).cast(LongType)),
          lit(0L), (acc, x) => (acc * 257 + x) % 1000000007L).as("fp"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split_regex(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        (acc, x) -> (acc * 257 + x) % 1000000007) AS fp
      FROM documents ORDER BY doc_id"""))

  /** Multimodal binary-column plumbing, oracle-checked half: documents
    * as opaque payloads → byte length + content hash per kind (pure
    * built-ins over a binary column; scan-friendly). */
  val q34 = Q("q34_media_payload_stats",
    (s, dir) => {
      val media = Multimodal.mediaFromDocuments(s, t(s, dir, "documents"))
      Multimodal.payloadStats(media.toDF())
        .groupBy("kind")
        .agg(count(lit(1)).as("n_media"),
          sum(col("n_bytes").cast(LongType)).as("total_bytes"),
          countDistinct(col("content_md5")).as("n_distinct_payloads"))
        .orderBy("kind")
    },
    Some("""SELECT CASE WHEN doc_id % 3 = 0 THEN 'video'
                 WHEN doc_id % 3 = 1 THEN 'image' ELSE 'audio' END AS kind,
      COUNT(*) AS n_media,
      CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      COUNT(DISTINCT md5(text)) AS n_distinct_payloads
      FROM documents GROUP BY 1 ORDER BY kind"""))

  /** REAL video decode→frame-sample→embed path
    * ([[graft.multimodal.Multimodal.decodeVideoAndEmbed]] over
    * MOTION-COMPENSATED MCV8 streams — round 12 retired the last
    * decode fake), HARD oracle-checked: per document a 16×16 scene
    * translating `(1+id%3, id%2)` px/frame is MCV8-encoded
    * (keyframes every 3, so sampling crosses GOPs), frames 0,2,4,…
    * are seek-decoded through the motion-vector chain, resized 16→8
    * (nearest neighbor: out(r,c)=in(2r,2c)) and 2×2-mean-pooled into
    * the 16-dim embedding. Each embedding value is pool_sum/4f/255f
    * with pool_sum an integer ≤ 1020, so round(x·1020) inverts the
    * float normalization EXACTLY and the check is pure integer math
    * end to end — a wrong motion prediction, residual, seek, resize,
    * pooling, or normalization all shift the recovered integers. The
    * DuckDB side computes every sampled pixel from the closed-form
    * translation formula. */
  val q35 = Q("q35_media_frame_features",
    (s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val dx0 = (1 + id % 3).toInt; val dy0 = (id % 2).toInt
          val total = (1 + id % 7).toInt
          def px(f: Int, r: Int, c: Int) =
            ((id * 11 + (r + f * dy0).toLong * 31 + (c + f * dx0).toLong * 17) % 256).toInt
          val frames = (0 until total).map(f => Array.tabulate(16, 16)((r, c) => px(f, r, c)))
          Multimodal.MediaRow(id,
            Multimodal.MediaMeta("video", 16, 16, 0, total.toLong * 1000L),
            graft.multimodal.Codec.encodeAviMcv(frames, fps = 1, keyframeInterval = 3))
        }
      Multimodal.decodeVideoAndEmbed(media, stride = 2, maxFrames = 4).toDF()
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(aggregate(
            transform(col("embedding"), x => round(x.cast("double") * 1020d).cast(LongType)),
            lit(0L), (acc, v) => acc + v * v)).as("sum_sq_pool"))
        .orderBy("media_id")
    },
    Some("""WITH m AS (SELECT doc_id AS media_id, 1 + doc_id % 7 AS total,
        1 + doc_id % 3 AS dx0, doc_id % 2 AS dy0 FROM documents),
      fr AS (SELECT media_id, dx0, dy0, CAST(f AS BIGINT) AS f
        FROM m, unnest(generate_series(0, CAST(least(total - 1, 6) AS BIGINT), 2)) t(f)),
      smp AS (SELECT media_id, f, pr, pc,
          SUM((media_id*11 + (4*pr + 2*i + f*dy0)*31 + (4*pc + 2*j + f*dx0)*17) % 256) AS s
        FROM fr, range(0, 4) a(pr), range(0, 4) b(pc), range(0, 2) ii(i), range(0, 2) jj(j)
        GROUP BY media_id, f, pr, pc),
      persq AS (SELECT media_id, f, SUM(s * s) AS ssq FROM smp GROUP BY media_id, f)
      SELECT media_id, COUNT(*) AS n_frames, CAST(SUM(ssq) AS BIGINT) AS sum_sq_pool
      FROM persq GROUP BY media_id ORDER BY media_id"""))

  /** Backward as-of join (events ← latest prior order per user) —
    * a single-shuffle union+window composition; oracle via DuckDB's
    * native ASOF JOIN. Right side pre-deduped to one row per
    * (key, date) so both engines break ties identically. */
  val q36 = Q("q36_asof_join",
    (s, dir) => {
      val ded = Dedup.latestPerKey(
        t(s, dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey").desc))
      val ev = t(s, dir, "events").filter(col("event_id") % 20 === 0)
        .select(col("event_id"), col("user_id"),
          expr("CAST(timestamp_seconds(ts DIV 1000000000) AS DATE)").as("event_date"))
      AsOfJoin.backward(ev, ded, "user_id", "o_custkey", "event_date", "o_orderdate",
          Seq("o_orderkey", "o_totalprice"), inner = true)
        .withColumn("event_date", col("event_date").cast("string"))
        .orderBy("event_id")
    },
    Some("""WITH ded AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
               max_by(o_totalprice, o_orderkey) AS o_totalprice
             FROM orders GROUP BY o_custkey, o_orderdate),
      ev AS (SELECT event_id, user_id, CAST(ts AS DATE) AS event_date
             FROM events WHERE event_id % 20 = 0)
      SELECT event_id, user_id, CAST(event_date AS VARCHAR) AS event_date,
        o_orderkey, o_totalprice
      FROM ev ASOF JOIN ded
        ON ev.user_id = ded.o_custkey AND ev.event_date >= ded.o_orderdate
      ORDER BY event_id"""))

  /** JSON scalar extraction over the events props column (JSON family
    * beyond the reference's single JSON_TABLE explode). */
  val q37 = Q("q37_json_extract",
    (s, dir) => t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        (sum(col("k")).cast("double") / count(col("k")).cast("double")).as("avg_k"))
      .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(*) AS n_events,
      CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
      MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
      CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE)
        / CAST(COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE) AS avg_k
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------- //
  // D. Wider relational/analytic coverage block (round 2): pivot,     //
  // cube, exact percentiles, moment-based stats, batch sessions,      //
  // semi/anti, range joins, map/struct, date math, fuzzy matching,    //
  // deterministic sampling, unpivot, top-k per group, vocabulary.     //
  // ---------------------------------------------------------------- //

  /** Pivot (wide aggregation): returnflag columns per linestatus.
    * Explicit pivot values keep the schema static — at scale an
    * inferred pivot would need an extra distinct-values job. */
  val q38 = Q("q38_pivot_returnflag",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum(col("l_quantity")))
      .withColumnsRenamed(Map("A" -> "qty_a", "N" -> "qty_n", "R" -> "qty_r"))
      .orderBy("l_linestatus"),
    Some(s"""SELECT l_linestatus,
      ${dsumSql("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qty_a,
      ${dsumSql("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qty_n,
      ${dsumSql("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qty_r
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** CUBE: all grouping-set combinations (completes the grouping-sets
    * family next to q17's ROLLUP). */
  val q39 = Q("q39_cube",
    (s, dir) => t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(grouping_id().cast(LongType).as("gid"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"))
      .orderBy(col("gid").asc, col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first),
    Some(s"""SELECT o_orderstatus, o_orderpriority,
      CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total_price
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  /** Exact percentiles over integer cents: interpolation operands are
    * exact, binary-fraction quantiles (.25/.5/.75) keep every product
    * representable, so Spark's (1−d)·lo + d·hi and DuckDB's
    * lo + d·(hi−lo) land on the same double. This aggregate form is a
    * per-group collect-and-sort buffer — since round 12 the EXACT
    * scale path is q149's rank-filter
    * ([[graft.operators.GroupedNtile.exactPercentilesDisc]]); this
    * stays as the interpolated (CONT) parity form. */
  val q40 = Q("q40_percentiles",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(CAST(round(l_extendedprice*100) AS BIGINT), array(0.25, 0.5, 0.75))")
          .as("ps"),
        count(lit(1)).as("n"))
      // one percentile buffer per group, not three — the collect-all
      // sort happens once and the three quantiles read from it
      .select(col("l_returnflag"),
        (element_at(col("ps"), 1) / 100.0).as("p25"),
        (element_at(col("ps"), 2) / 100.0).as("p50"),
        (element_at(col("ps"), 3) / 100.0).as("p75"),
        col("n"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
      quantile_cont(CAST(round(l_extendedprice*100) AS BIGINT), 0.25) / 100.0 AS p25,
      quantile_cont(CAST(round(l_extendedprice*100) AS BIGINT), 0.5) / 100.0 AS p50,
      quantile_cont(CAST(round(l_extendedprice*100) AS BIGINT), 0.75) / 100.0 AS p75,
      COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Variance/stddev/correlation via exact integer moments: one
    * map-side-combinable pass collecting (n, Σx, Σy, Σx², Σy², Σxy) in
    * exact decimal, then the closed-form stats as IEEE expressions of
    * exactly-determined operands. Spark's builtin stddev/corr are
    * Welford-style and ORDER-DEPENDENT in the last ulp across
    * partitionings — moments are the deterministic-at-scale form. */
  val q41 = Q("q41_exact_moments",
    (s, dir) => {
      val big = DecimalType(38, 0)
      val x = cents(col("l_quantity")).cast(big)
      val y = cents(col("l_discount")).cast(big)
      val agged = t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      val n = col("n").cast(big)
      val dx = (n * col("sxx") - col("sx") * col("sx")).cast("double")
      val dy = (n * col("syy") - col("sy") * col("sy")).cast("double")
      val num = (n * col("sxy") - col("sx") * col("sy")).cast("double")
      val denom = (col("n") * (col("n") - 1)).cast("double")
      agged.select(col("l_returnflag"), col("n"),
          (dx / denom / 1e4).as("var_qty"),
          (sqrt(dx / denom) / 100.0).as("stddev_qty"),
          (num / (sqrt(dx) * sqrt(dy))).as("corr_qty_disc"))
        .orderBy("l_returnflag")
    },
    Some {
      val x = s"CAST(${centsSql("l_quantity")} AS HUGEINT)"
      val y = s"CAST(${centsSql("l_discount")} AS HUGEINT)"
      s"""WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
          SUM($x) AS sx, SUM($y) AS sy,
          SUM($x * $x) AS sxx, SUM($y * $y) AS syy, SUM($x * $y) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) / 10000.0 AS var_qty,
        sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) / 100.0 AS stddev_qty,
        CAST(n * sxy - sx * sy AS DOUBLE)
          / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_qty_disc
      FROM m ORDER BY l_returnflag"""
    })

  /** Batch sessionization (gaps-and-islands): lag to mark session
    * starts, running sum to number sessions, per-user rollup — the
    * batch twin of StreamOps.sessionize, single shuffle on user_id
    * shared by both windows and the final groupBy. `ts` is read as
    * nanos-since-epoch (LongType), so the 30-min gap is integer math. */
  val q42 = Q("q42_batch_sessions",
    (s, dir) => {
      val gapNs = 30L * 60 * 1000000000L
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val prev = lag(col("ts"), 1).over(w)
      val marked = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("new_sess",
          when(prev.isNull || col("ts") - prev > gapNs, 1L).otherwise(0L))
      marked
        .withColumn("sess_id", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id")
        .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"),
          (count(lit(1)).cast("double") / max(col("sess_id")).cast("double"))
            .as("events_per_session"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (SELECT user_id, epoch_ns(ts) AS tns, event_id FROM events),
      m AS (SELECT user_id, tns, event_id,
        CASE WHEN lag(tns) OVER w IS NULL OR tns - lag(tns) OVER w > 1800000000000
             THEN 1 ELSE 0 END AS new_sess
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
      s AS (SELECT user_id, CAST(SUM(new_sess) OVER (PARTITION BY user_id
              ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id FROM m)
      SELECT user_id, MAX(sess_id) AS n_sessions, COUNT(*) AS n_events,
        CAST(COUNT(*) AS DOUBLE) / CAST(MAX(sess_id) AS DOUBLE) AS events_per_session
      FROM s GROUP BY user_id ORDER BY user_id"""))

  /** Left-semi + left-anti joins (EXISTS / NOT EXISTS family). */
  val q43 = Q("q43_semi_anti_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      def cnt(df: DataFrame, op: String) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      cnt(c.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi"), "semi")
        .unionByName(cnt(c.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti"), "anti"))
        .orderBy("op")
    },
    Some("""SELECT 'anti' AS op, (SELECT COUNT(*) FROM customer WHERE NOT EXISTS
        (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')) AS n
      UNION ALL SELECT 'semi', (SELECT COUNT(*) FROM customer WHERE EXISTS
        (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'))
      ORDER BY op"""))

  /** Range (band) join: tiny literal tier table broadcast against the
    * fact, non-equi predicate. BroadcastNestedLoopJoin is exactly the
    * right physical plan when one side is a handful of rows — no
    * shuffle of the big side at all. */
  val q44 = Q("q44_range_band_join",
    (s, dir) => {
      val sp = s; import sp.implicits._
      val tiers = Seq((0.0, 10.0, "t1_low"), (10.0, 25.0, "t2_mid"),
        (25.0, 40.0, "t3_high"), (40.0, 1e9, "t4_top")).toDF("lo", "hi", "tier")
      t(s, dir, "lineitem")
        .join(broadcast(tiers), col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("tier")
    },
    Some(s"""SELECT tier, COUNT(*) AS n_items, ${dsumSql("l_quantity")} AS sum_qty
      FROM lineitem JOIN (VALUES (0.0, 10.0, 't1_low'), (10.0, 25.0, 't2_mid'),
        (25.0, 40.0, 't3_high'), (40.0, 1000000000.0, 't4_top')) AS tiers(lo, hi, tier)
      ON l_quantity >= lo AND l_quantity < hi
      GROUP BY tier ORDER BY tier"""))

  /** Map/struct ops: per-status priority histogram built as a map
    * (collect_list → struct → map_from_entries), scalar lookups out.
    * The map is engine-internal; the oracle checks the extracted
    * scalars. */
  val q45 = Q("q45_map_struct_ops",
    (s, dir) => t(s, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("o_orderstatus")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("o_orderpriority"), col("cnt"))))).as("m"))
      .select(col("o_orderstatus"),
        element_at(col("m"), "1-URGENT").as("n_urgent"),
        element_at(col("m"), "5-LOW").as("n_low"),
        size(col("m")).cast(LongType).as("n_priorities"))
      .orderBy("o_orderstatus"),
    Some("""WITH c AS (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2)
      SELECT o_orderstatus,
        MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN cnt END) AS n_urgent,
        MAX(CASE WHEN o_orderpriority = '5-LOW' THEN cnt END) AS n_low,
        CAST(COUNT(*) AS BIGINT) AS n_priorities
      FROM c GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Date-math battery: quarter, day-of-week (normalized to DuckDB's
    * Sunday=0), month boundaries via date_trunc/last_day, day diffs. */
  val q46 = Q("q46_date_math",
    (s, dir) => t(s, dir, "orders")
      .select(
        quarter(col("o_orderdate")).cast(LongType).as("q"),
        (dayofweek(col("o_orderdate")) - 1).cast(LongType).as("dow"),
        date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("month_start"),
        last_day(col("o_orderdate")).cast("string").as("month_end"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast(LongType).as("days_since"))
      .groupBy("q", "dow")
      .agg(count(lit(1)).as("n"), min(col("month_start")).as("min_month_start"),
        max(col("month_end")).as("max_month_end"), max(col("days_since")).as("max_days_since"))
      .orderBy("q", "dow"),
    Some("""SELECT CAST(quarter(o_orderdate) AS BIGINT) AS q,
        CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
        COUNT(*) AS n,
        MIN(CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)) AS min_month_start,
        MAX(CAST(last_day(o_orderdate) AS VARCHAR)) AS max_month_end,
        MAX(CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)) AS max_days_since
      FROM orders GROUP BY 1, 2 ORDER BY q, dow"""))

  /** Fuzzy matching: Levenshtein edit distance over blocking buckets
    * (p_brand, p_size) — blocking turns O(n²) distance computation
    * into per-bucket work, the classic entity-resolution shape. Runs
    * through [[graft.operators.Blocking.selfPairs]], which carries the
    * hot-block quadratic-blowup valve (`maxBlockSize`) for real
    * corpora; uncapped here so the oracle comparison stays exhaustive. */
  val q47 = Q("q47_levenshtein_pairs",
    (s, dir) => {
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name"))
      graft.operators.Blocking.selfPairs(p, "p_partkey", Seq("p_brand", "p_size"))
        .select(col("a.p_partkey").as("id_a"), col("b.p_partkey").as("id_b"),
          levenshtein(col("a.p_name"), col("b.p_name")).cast(LongType).as("dist"))
        .filter(col("dist") <= 8)
        .orderBy("id_a", "id_b")
    },
    Some("""SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 8 ORDER BY id_a, id_b"""))

  /** Deterministic hash sampling: md5(id) mod 100 < 7 — a reproducible
    * 7% Bernoulli sample with no RNG state, the only sampling that is
    * stable across engines, retries, and partitionings at 100 TB. */
  val q48 = Q("q48_hash_sample",
    (s, dir) => t(s, dir, "documents")
      .filter(expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
        % 100 < 7)
      .select("doc_id", "lang", "source")
      .orderBy("doc_id"),
    Some("""SELECT doc_id, lang, source FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 7
      ORDER BY doc_id"""))

  /** Unpivot (long-form measures) via stack + per-measure aggregate. */
  val q49 = Q("q49_unpivot_measures",
    (s, dir) => t(s, dir, "lineitem")
      .select(expr("stack(3, 'quantity', l_quantity, 'price', l_extendedprice, " +
        "'discount', l_discount) AS (measure, v)"))
      .groupBy("measure")
      .agg(count(lit(1)).as("n"), dsum(col("v")).as("total"))
      .orderBy("measure"),
    Some(s"""SELECT measure, COUNT(*) AS n, ${dsumSql("v")} AS total FROM (
        SELECT 'quantity' AS measure, l_quantity AS v FROM lineitem
        UNION ALL SELECT 'price', l_extendedprice FROM lineitem
        UNION ALL SELECT 'discount', l_discount FROM lineitem)
      GROUP BY measure ORDER BY measure"""))

  /** Top-k per group (row_number + filter): the distributed top-k that
    * TakeOrderedAndProject can't do (per-group limits). */
  val q50 = Q("q50_topk_per_group",
    (s, dir) => {
      val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      t(s, dir, "part")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("p_brand"), col("rn").cast(LongType).as("rn"),
          col("p_partkey"), col("p_retailprice"))
        .orderBy("p_brand", "rn")
    },
    Some("""SELECT p_brand, CAST(rn AS BIGINT) AS rn, p_partkey, p_retailprice FROM (
        SELECT p_brand, p_partkey, p_retailprice,
          row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part)
      WHERE rn <= 3 ORDER BY p_brand, rn"""))

  /** Vocabulary build: tokenize, frequency-filter, top-k — the
    * token-count side of a training-data tokenizer pipeline. */
  val q51 = Q("q51_vocab_topk",
    (s, dir) => t(s, dir, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .filter(length(col("token")) >= 3)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= 5)
      .orderBy(col("freq").desc, col("token").asc)
      .limit(50),
    Some("""SELECT token, COUNT(*) AS freq FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token FROM documents)
      WHERE length(token) >= 3
      GROUP BY token HAVING COUNT(*) >= 5
      ORDER BY freq DESC, token LIMIT 50"""))

  /** Document frequency + IDF as an exact ratio (N/df — no
    * transcendental log, so cross-engine parity is exact). */
  val q52 = Q("q52_doc_frequency",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val total = docs.agg(count(lit(1)).as("n_total"))
      docs.select(explode(array_distinct(split(trim(lower(col("text"))), "\\s+"))).as("token"))
        .filter(length(col("token")) >= 3)
        .groupBy("token").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 20)
        .crossJoin(broadcast(total))
        .select(col("token"), col("df"),
          (col("n_total").cast("double") / col("df").cast("double")).as("idf_ratio"))
        .orderBy(col("df").desc, col("token").asc)
        .limit(30)
    },
    Some("""WITH tot AS (SELECT COUNT(*) AS n_total FROM documents),
      tk AS (SELECT doc_id, unnest(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS token
             FROM documents)
      SELECT token, COUNT(*) AS df,
        CAST((SELECT n_total FROM tot) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS idf_ratio
      FROM tk WHERE length(token) >= 3
      GROUP BY token HAVING COUNT(*) >= 20
      ORDER BY df DESC, token LIMIT 30"""))

  /** Per-group top-k via the native TypedImperativeAggregate
    * (graft.functions.TopKBy): map-side keeps ≤k candidates per group,
    * so only k·|groups| rows cross the shuffle — the scale-correct form
    * of q50's window pattern (which shuffles every row). Same result,
    * same oracle shape. */
  val q53 = Q("q53_topk_agg",
    (s, dir) => t(s, dir, "part")
      .groupBy("p_brand")
      .agg(graft.functions.TopKBy.topkBy(col("p_retailprice"), col("p_partkey"), 3).as("top"))
      .select(col("p_brand"), posexplode(col("top")).as(Seq("i", "p_partkey")))
      .select(col("p_brand"), (col("i") + 1).cast(LongType).as("rn"), col("p_partkey"))
      .orderBy("p_brand", "rn"),
    Some("""SELECT p_brand, CAST(rn AS BIGINT) AS rn, p_partkey FROM (
        SELECT p_brand, p_partkey,
          row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part)
      WHERE rn <= 3 ORDER BY p_brand, rn"""))

  /** The composite training-data curation pipeline, as one funnel
    * query: quality filter → language-consistency filter → exact dedup
    * (keep min id per content hash) → near-dup removal (LSH + Jaccard
    * ≥ 0.5, drop the larger id of each pair) → deterministic 50% hash
    * sample. Emits per-stage surviving counts. Every stage is the
    * battery operator it reuses (q22, q23, q20, q26/q27, q48) — this is
    * the end-to-end shape a 100 TB corpus actually runs. */
  val q54 = Q("q54_corpus_curation",
    (s, dir) => {
      val stages = graft.text.Curation.funnel(t(s, dir, "documents"), "doc_id", "text", "lang")
      stages.map { case (st, df) =>
        df.agg(count(lit(1)).as("n_docs")).select(lit(st).as("stage"), col("n_docs"))
      }.reduce(_ unionByName _).orderBy("stage")
    },
    Some(s"""WITH toks0 AS (SELECT doc_id, text, lang,
          string_split_regex(trim(lower(text)), '\\s+') AS tk FROM documents),
      qf AS (SELECT doc_id, text, lang, tk, CAST(len(tk) AS BIGINT) AS n_tok,
          CAST(len(list_filter(tk, x -> x IN ('the','a','and','of','to'))) AS DOUBLE)
            / CAST(len(tk) AS DOUBLE) AS stop_ratio FROM toks0),
      s1 AS (SELECT * FROM qf WHERE n_tok >= 20 AND stop_ratio < 0.5),
      lf AS (SELECT *,
          CAST(len(list_filter(tk, x -> x IN ('the','a','and','of'))) AS BIGINT) AS c_en,
          CAST(len(list_filter(tk, x -> x IN ('der','die','das','und'))) AS BIGINT) AS c_de,
          CAST(len(list_filter(tk, x -> x IN ('le','la','et','les'))) AS BIGINT) AS c_fr,
          CAST(len(list_filter(tk, x -> x IN ('el','los','y','es'))) AS BIGINT) AS c_es
        FROM s1),
      s2 AS (SELECT doc_id, text FROM lf WHERE
          (CASE WHEN c_en = greatest(c_en, c_de, c_fr, c_es) THEN 'en'
                WHEN c_de = greatest(c_en, c_de, c_fr, c_es) THEN 'de'
                WHEN c_fr = greatest(c_en, c_de, c_fr, c_es) THEN 'fr'
                ELSE 'es' END) = lang),
      s3 AS (SELECT doc_id, text FROM (SELECT doc_id, text,
            row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM s2)
          WHERE rn = 1),
      sh AS (SELECT doc_id, ${shingleSql(5)} AS s FROM s3),
      $hashSetCte,
      ${lshCandSql(8, 4)},
      drops AS (SELECT DISTINCT id_b AS doc_id FROM (
          SELECT id_a, id_b, ${jaccardSql("sa.h", "sb.h")} AS j
          FROM cand JOIN shh sa ON sa.doc_id = id_a JOIN shh sb ON sb.doc_id = id_b)
        WHERE j >= 0.5),
      s4 AS (SELECT doc_id, text FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
      s5 AS (SELECT * FROM s4 WHERE
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0)
      SELECT 's0_all' AS stage, COUNT(*) AS n_docs FROM documents
      UNION ALL SELECT 's1_quality', COUNT(*) FROM s1
      UNION ALL SELECT 's2_lang', COUNT(*) FROM s2
      UNION ALL SELECT 's3_exact_dedup', COUNT(*) FROM s3
      UNION ALL SELECT 's4_near_dedup', COUNT(*) FROM s4
      UNION ALL SELECT 's5_sample', COUNT(*) FROM s5
      ORDER BY stage"""))

  /** The frame-sampling SCHEDULE of the multimodal path over REAL
    * containers: per document an AVI with `1 + id%11` DIB frames, the
    * stream length read back from the container itself
    * (`aviFrameCount` inside
    * [[graft.multimodal.Multimodal.decodeVideoAndEmbed]]), sampled at
    * stride 2 capped at 4 — the cap BINDS here (streams up to 11
    * frames), unlike q35. Output is the schedule histogram; the
    * oracle recomputes `least(4, ceil(total/2))` per doc, so a
    * container frame-count, stride, or cap bug shifts the histogram. */
  val q55 = Q("q55_media_frame_schedule",
    (s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val total = (1 + id % 11).toInt
          val frames = (0 until total).map(f =>
            Array.tabulate(8, 8)((r, c) => ((id + f * 7 + r * 3 + c) % 256).toInt))
          Multimodal.MediaRow(id,
            Multimodal.MediaMeta("video", 8, 8, 0, total.toLong * 1000L),
            graft.multimodal.Codec.encodeAvi(frames, fps = 4))
        }
      Multimodal.decodeVideoAndEmbed(media, stride = 2, maxFrames = 4).toDF()
        .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
        .groupBy("n_frames").agg(count(lit(1)).as("n_media"))
        .orderBy("n_frames")
    },
    Some("""SELECT least(4, (doc_id % 11 + 2) // 2) AS n_frames,
      COUNT(*) AS n_media
      FROM documents GROUP BY 1 ORDER BY n_frames"""))

  /** The NATIVE as-of join operator (custom LogicalPlan + Strategy +
    * SparkPlan, graft.plans.AsOfJoinPlan) on the q36 workload shape —
    * one streaming merge over two sorted co-partitioned sides instead
    * of the union+window composition. Oracle: DuckDB's ASOF JOIN. */
  val q56 = Q("q56_asof_native",
    (s, dir) => {
      val ded = Dedup.latestPerKey(
        t(s, dir, "orders").withColumn("o_orderdate", col("o_orderdate").cast("date"))
          .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey").desc))
      val ev = t(s, dir, "events").filter(col("event_id") % 10 === 0)
        .select(col("event_id"), col("user_id"),
          expr("CAST(timestamp_seconds(ts DIV 1000000000) AS DATE)").as("event_date"))
      graft.plans.AsOfJoinPlan.backward(ev, ded, "user_id", "o_custkey",
          "event_date", "o_orderdate", Seq("o_orderkey", "o_totalprice"), inner = true)
        .withColumn("event_date", col("event_date").cast("string"))
        .orderBy("event_id")
    },
    Some("""WITH ded AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate,
               max(o_orderkey) AS o_orderkey,
               max_by(o_totalprice, o_orderkey) AS o_totalprice
             FROM orders GROUP BY 1, 2),
      ev AS (SELECT event_id, user_id, CAST(ts AS DATE) AS event_date
             FROM events WHERE event_id % 10 = 0)
      SELECT event_id, user_id, CAST(event_date AS VARCHAR) AS event_date,
        o_orderkey, o_totalprice
      FROM ev ASOF JOIN ded
        ON ev.user_id = ded.o_custkey AND ev.event_date >= ded.o_orderdate
      ORDER BY event_id"""))

  /** Multiset (ALL) set operations — completes q19's distinct family. */
  val q57 = Q("q57_set_ops_all",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val su = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      def cnt(df: DataFrame, op: String) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      cnt(c.exceptAll(su), "except_all")
        .unionByName(cnt(c.intersectAll(su), "intersect_all"))
        .unionByName(cnt(c.unionAll(su), "union_all"))
        .orderBy("op")
    },
    Some("""SELECT 'except_all' AS op, (SELECT COUNT(*) FROM
        (SELECT c_nationkey FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier)) AS n
      UNION ALL SELECT 'intersect_all', (SELECT COUNT(*) FROM
        (SELECT c_nationkey FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier))
      UNION ALL SELECT 'union_all', (SELECT COUNT(*) FROM
        (SELECT c_nationkey FROM customer UNION ALL SELECT s_nationkey FROM supplier))
      ORDER BY op"""))

  /** Calendar-series zero-fill: generate the full day range with
    * `sequence`, left-join daily counts — the generated-dimension
    * pattern (no day silently missing from a trend). */
  val q58 = Q("q58_calendar_zero_fill",
    (s, dir) => {
      val o = t(s, dir, "orders").withColumn("d", col("o_orderdate").cast("date"))
      val days = o.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
      val daily = o.groupBy("d").agg(count(lit(1)).as("n_orders"))
      days.join(daily, Seq("d"), "left")
        .select(col("d").cast("string").as("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("day")
    },
    Some("""WITH b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
               MAX(CAST(o_orderdate AS DATE)) AS hi FROM orders),
      days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM b),
      daily AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
                FROM orders GROUP BY 1)
      SELECT CAST(days.d AS VARCHAR) AS day, coalesce(daily.n_orders, 0) AS n_orders
      FROM days LEFT JOIN daily ON days.d = daily.d
      ORDER BY day"""))

  /** Skewed aggregation via deterministic two-phase salting
    * (graft.operators.Salt): groupBy(key, salt) partial → groupBy(key)
    * final, spreading a hot key over `buckets` reducers. The oracle is
    * the PLAIN aggregation — proving the salted plan computes the
    * identical result. */
  val q59 = Q("q59_skew_salted_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("price_cents", cents(col("l_extendedprice")))
      graft.operators.Salt.saltedSumCount(li, Seq("l_suppkey"), "price_cents", buckets = 8)
        .select(col("l_suppkey"),
          (col("sum_price_cents").cast("double") / 100.0).as("total_price"),
          col("n_rows"))
        .orderBy("l_suppkey")
    },
    Some(s"""SELECT l_suppkey,
      CAST(SUM(${centsSql("l_extendedprice")}) AS DOUBLE) / 100.0 AS total_price,
      COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey"""))

  /** Array-function battery: sort/distinct/position/slice over token
    * arrays, scalar outputs for cross-engine parity. */
  val q60 = Q("q60_array_ops",
    (s, dir) => {
      val toks = split(col("p_name"), " ")
      t(s, dir, "part").select(col("p_partkey"),
          array_join(array_sort(toks), "|").as("sorted_tokens"),
          size(array_distinct(toks)).cast(LongType).as("n_distinct"),
          coalesce(array_position(toks, "tan"), lit(0L)).as("tan_pos"),
          array_join(slice(array_sort(toks), 1, 2), "|").as("first_two"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey,
      array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_tokens,
      CAST(len(list_distinct(string_split(p_name, ' '))) AS BIGINT) AS n_distinct,
      CAST(coalesce(list_position(string_split(p_name, ' '), 'tan'), 0) AS BIGINT) AS tan_pos,
      array_to_string(list_slice(list_sort(string_split(p_name, ' ')), 1, 2), '|') AS first_two
      FROM part ORDER BY p_partkey"""))

  /** Regex group extraction + conditional/boolean aggregates. */
  val q61 = Q("q61_regex_conditional_agg",
    (s, dir) => t(s, dir, "part")
      .groupBy(regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"))
      .agg(count(lit(1)).as("n"),
        expr("count_if(p_size > 25)").as("n_large"),
        expr("bool_or(p_size > 45)").as("has_huge"),
        expr("bool_and(p_size >= 1)").as("all_positive"))
      .orderBy("type_head"),
    Some("""SELECT regexp_extract(p_type, '^(\w+)', 1) AS type_head,
      COUNT(*) AS n,
      COUNT(*) FILTER (WHERE p_size > 25) AS n_large,
      bool_or(p_size > 45) AS has_huge,
      bool_and(p_size >= 1) AS all_positive
      FROM part GROUP BY 1 ORDER BY type_head"""))

  /** Ranking-family windows: ntile, percent_rank, cume_dist, nth_value
    * (completes q18's rank/lag/lead/frames coverage). percent_rank and
    * cume_dist are exact rational doubles — same integer operands, same
    * IEEE division in any engine. */
  val q62 = Q("q62_rank_family",
    (s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      t(s, dir, "orders").filter(col("o_custkey") % 50 === 0)
        .select(col("o_orderpriority"), col("o_orderkey"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          nth_value(col("o_orderkey"), 2)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("second_key"))
        .orderBy("o_orderpriority", "o_orderkey")
    },
    Some("""SELECT o_orderpriority, o_orderkey,
      CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      percent_rank() OVER w AS pr,
      cume_dist() OVER w AS cd,
      nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
        ORDER BY o_totalprice, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
      FROM orders WHERE o_custkey % 50 = 0
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderpriority, o_orderkey"""))

  /** Sliding time windows in BATCH (`window(ts, "7 days", "1 day")`):
    * every order contributes to 7 overlapping windows — the batch twin
    * of the streaming windowed aggregation, and a Generator the oracle
    * reproduces by expanding each row to its 7 window starts. Windows
    * are epoch-aligned at UTC midnight (session TZ pinned UTC). */
  val q63 = Q("q63_sliding_windows",
    (s, dir) => t(s, dir, "orders")
      .filter(col("o_custkey") % 10 === 0)
      .groupBy(window(col("o_orderdate"), "7 days", "1 day").as("w"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .select(col("w.start").cast("date").cast("string").as("window_start"),
        col("n_orders"), col("total_price"))
      .orderBy("window_start"),
    Some(s"""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS od, o_totalprice
          FROM orders WHERE o_custkey % 10 = 0),
      w AS (SELECT od - CAST(unnest(range(0, 7)) AS INT) * INTERVAL 1 DAY AS ws, o_totalprice
            FROM d)
      SELECT CAST(CAST(ws AS DATE) AS VARCHAR) AS window_start,
        COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total_price
      FROM w GROUP BY 1 ORDER BY window_start"""))

  /** Shared q64/q79 front end: LSH + Jaccard ≥ 0.5 pairs → distributed
    * connected components → (id, comp). ONE definition of "cluster" —
    * a threshold or banding change edits exactly here and both queries
    * (and both oracles, via [[neardupCompCte]]) stay in lockstep. */
  protected def neardupComponents(s: SparkSession, dir: String): DataFrame = {
    val verified = Dedup.verifiedNearDupPairs(
        t(s, dir, "documents"), "doc_id", "text", Dedup.CharShingles(5), 8, 4)
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b")
    graft.operators.ConnectedComponents.components(verified)
  }

  /** WITH-chain deriving the symmetrized near-dup `edges(src, dst)` CTE
    * — the shared oracle front end of q64/q79 (components) and q87
    * (centrality). */
  protected def neardupEdgesCte: String =
    s"""WITH RECURSIVE sh AS (SELECT doc_id, ${shingleSql(5)} AS s FROM documents),
      $hashSetCte,
      ${lshCandSql(8, 4)},
      ver AS (SELECT id_a, id_b FROM (
          SELECT id_a, id_b, ${jaccardSql("sa.h", "sb.h")} AS j
          FROM cand JOIN shh sa ON sa.doc_id = id_a JOIN shh sb ON sb.doc_id = id_b)
        WHERE j >= 0.5),
      edges AS (SELECT id_a AS src, id_b AS dst FROM ver
                UNION SELECT id_b, id_a FROM ver)"""

  /** The oracle twin of [[neardupComponents]]: WITH-chain ending in a
    * `comp(doc_id, component)` CTE (recursive transitive closure). */
  protected def neardupCompCte: String =
    s"""$neardupEdgesCte,
      walk(src, reach) AS (
        SELECT src, src FROM (SELECT DISTINCT src FROM edges)
        UNION
        SELECT w.src, e.dst FROM walk w JOIN edges e ON w.reach = e.src),
      comp AS (SELECT src AS doc_id, MIN(reach) AS component FROM walk GROUP BY src)"""

  /** Near-dup CLUSTERING: LSH + Jaccard ≥ 0.5 pairs → distributed
    * connected components (min-label propagation + pointer jumping,
    * graft.operators.ConnectedComponents) → (doc, component). The step
    * that turns pairwise near-dups into "keep one doc per cluster".
    * Oracle: recursive-CTE transitive closure. */
  val q64 = Q("q64_neardup_clusters",
    (s, dir) => neardupComponents(s, dir)
      .select(col("id").as("doc_id"), col("comp").as("component"))
      .orderBy("doc_id"),
    Some(s"""$neardupCompCte
      SELECT doc_id, component FROM comp ORDER BY doc_id"""))
}
