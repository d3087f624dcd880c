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

/** One driver-checkable query: a Spark DataFrame builder over the
  * testdata tables plus (where ANSI-SQL-expressible) a DuckDB oracle
  * producing identical rows, column names, and values.
  *
  * Cross-engine determinism rules used throughout:
  *  - SUM/AVG over doubles go through DECIMAL(18,6) (exact, order-
  *    independent) and only then cast to DOUBLE — both engines round the
  *    same exact decimal to the same double.
  *  - ratios/averages are IEEE double divisions of exactly-determined
  *    operands (identical bit patterns on both sides).
  *  - no `round()` on raw doubles (HALF_UP vs half-away divergence).
  *  - every result set carries a total-order ORDER BY.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The operator-coverage battery over the driver testdata (TESTDATA.md).
  * Each query is keyed to the SURVEY §2 operator(s) it exercises; the
  * training-data extensions (dedup/similarity/text analysis) are the
  * q2x block.
  */
object Battery {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)
  private val dec = DecimalType(18, 6)
  private def d(c: Column): Column = c.cast(dec)
  /** Exact decimal sum rendered as double — bit-identical across engines. */
  private def dsum(c: Column): Column = sum(d(c)).cast("double")
  private def dsumSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"

  /** Money columns live on the cent grid (2 decimals). Quantize to
    * integer cents so products/sums are exact BIGINT arithmetic, then
    * divide once at the end: one correctly-rounded IEEE division of
    * identical exact operands ⇒ bit-identical doubles in any engine.
    * (A DECIMAL-product path differs by 1 ulp between Spark and DuckDB
    * because their wide-decimal→double casts round differently.) */
  private def cents(c: Column): Column = round(c * 100, 0).cast(LongType)
  private def centsSql(e: String): String = s"CAST(round($e * 100) AS BIGINT)"
  /** SUM(price×(1−discount)) as exact integer 1e-4-dollar units / 1e4. */
  private def discRevenue: Column =
    (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
      .cast("double") / lit(1e4))
  private def discRevenueSql: String =
    s"CAST(SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS DOUBLE) / 10000.0"

  // ---------------------------------------------------------------- //
  // A. Aggregation / join / window parity block (SURVEY §2.C, §2.D)  //
  // ---------------------------------------------------------------- //

  /** O-29/O-31/O-34: grouped aggregation pricing summary (flagship). */
  val q01 = Q("q01_pricing_summary",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        discRevenue.as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${dsumSql("l_quantity")} AS sum_qty,
      ${dsumSql("l_extendedprice")} AS sum_base_price,
      $discRevenueSql AS sum_disc_price,
      ${dsumSql("l_quantity")} / COUNT(l_quantity) AS avg_qty,
      COUNT(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** O-30/O-33: 5-way star join + top-k (TakeOrderedAndProject). */
  val q02 = Q("q02_top_nations_revenue",
    (s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          discRevenue.as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name").asc)
        .limit(10)
    },
    Some(s"""SELECT r_name, n_name,
      $discRevenueSql AS revenue,
      COUNT(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY revenue DESC, n_name LIMIT 10"""))

  /** O-31/O-32/O-33: conditional distinct-count ratio + HAVING + top-k —
    * the shape of the reference's Q1 (requetes_analytiques.sql:1-16). */
  val q03 = Q("q03_brand_large_share",
    (s, dir) => {
      val li = t(s, dir, "lineitem"); val p = t(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(
          (countDistinct(when(col("p_size") >= 25, col("p_partkey"))).cast("double") /
            countDistinct(col("p_partkey")).cast("double")).as("proportion_large"),
          countDistinct(col("p_partkey")).as("nb_parts"))
        .filter(col("nb_parts") >= 10)
        .orderBy(col("proportion_large").desc, col("p_brand").asc)
        .limit(10)
    },
    Some("""SELECT p_brand,
      CAST(COUNT(DISTINCT CASE WHEN p_size >= 25 THEN p_partkey END) AS DOUBLE)
        / CAST(COUNT(DISTINCT p_partkey) AS DOUBLE) AS proportion_large,
      COUNT(DISTINCT p_partkey) AS nb_parts
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand HAVING COUNT(DISTINCT p_partkey) >= 10
      ORDER BY proportion_large DESC, p_brand LIMIT 10"""))

  /** O-34: multi-column group + multi-key sort. */
  val q04 = Q("q04_priority_distribution",
    (s, dir) => t(s, dir, "orders")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("nb_orders"))
      .orderBy("o_orderpriority", "o_orderstatus"),
    Some("""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS nb_orders
      FROM orders GROUP BY o_orderpriority, o_orderstatus
      ORDER BY o_orderpriority, o_orderstatus"""))

  /** O-35: lateral array explode (Generator) — word frequencies. */
  val q05 = Q("q05_explode_words",
    (s, dir) => t(s, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc),
    Some("""SELECT word, COUNT(*) AS n
      FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
      GROUP BY word ORDER BY n DESC, word"""))

  /** O-36: AVG heatmap over a join — nation × returnflag. */
  val q06 = Q("q06_avg_price_heatmap",
    (s, dir) => {
      val li = t(s, dir, "lineitem"); val su = t(s, dir, "supplier"); val n = t(s, dir, "nation")
      li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy("n_name", "l_returnflag")
        .agg((dsum(col("l_extendedprice")) / count(col("l_extendedprice"))).as("avg_price"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name", "l_returnflag")
    },
    Some(s"""SELECT n_name, l_returnflag,
      ${dsumSql("l_extendedprice")} / COUNT(l_extendedprice) AS avg_price,
      COUNT(*) AS n_items
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name, l_returnflag ORDER BY n_name, l_returnflag"""))

  /** O-37: boolean-to-int completeness-style arithmetic. */
  val q07 = Q("q07_acctbal_tiers",
    (s, dir) => {
      val score =
        when(col("c_acctbal") > 0, 1).otherwise(0) +
        when(col("c_acctbal") > 1000, 1).otherwise(0) +
        when(col("c_acctbal") > 5000, 1).otherwise(0) +
        when(col("c_acctbal") > 9000, 1).otherwise(0)
      t(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg((sum(score).cast("double") / (count(lit(1)) * 4).cast("double")).as("tier_rate"),
          count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
      CAST(SUM((CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) + (CASE WHEN c_acctbal > 1000 THEN 1 ELSE 0 END)
         + (CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) + (CASE WHEN c_acctbal > 9000 THEN 1 ELSE 0 END)) AS DOUBLE)
        / CAST(COUNT(*) * 4 AS DOUBLE) AS tier_rate,
      COUNT(*) AS n_customers
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** O-38: disjunctive anomaly filter + multi-key desc sort. */
  val q08 = Q("q08_anomaly_scan",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_extendedprice") > 90000 || col("l_quantity") > 49)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_returnflag
      FROM lineitem WHERE l_extendedprice > 90000 OR l_quantity > 49
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber"""))

  /** O-39/O-26: weekly time rollup (ISO week in both engines). */
  val q09 = Q("q09_weekly_trend",
    (s, dir) => t(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast(LongType).as("o_year"),
        weekofyear(col("o_orderdate")).cast(LongType).as("o_week"))
      .agg(count(lit(1)).as("nb_orders"),
        (dsum(col("o_totalprice")) / count(col("o_totalprice"))).as("avg_totalprice"))
      .orderBy("o_year", "o_week"),
    Some(s"""SELECT year(o_orderdate) AS o_year, weekofyear(o_orderdate) AS o_week,
      COUNT(*) AS nb_orders,
      ${dsumSql("o_totalprice")} / COUNT(o_totalprice) AS avg_totalprice
      FROM orders GROUP BY year(o_orderdate), weekofyear(o_orderdate)
      ORDER BY o_year, o_week"""))

  /** O-23: canonical latest-per-key window dedup (on events). */
  val q10 = Q("q10_latest_event_per_user",
    (s, dir) => Dedup.latestPerKey(t(s, dir, "events"), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id"),
    Some("""SELECT user_id, event_id, event_type, value FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
      ORDER BY user_id"""))

  /** O-24 + O-13: distinct over a semantically-filled column. */
  val q11 = Q("q11_distinct_filled_segments",
    (s, dir) => {
      val filled = coalesce(
        when(col("c_mktsegment").isNotNull &&
          !lower(col("c_mktsegment")).isin("undefined", "null", "unknown", "none", "n/a", ""),
          col("c_mktsegment")),
        lit("segment inconnu"))
      t(s, dir, "customer").select(filled.as("segment")).distinct().orderBy("segment")
    },
    Some("""SELECT DISTINCT coalesce(CASE WHEN c_mktsegment IS NOT NULL
        AND lower(c_mktsegment) NOT IN ('undefined','null','unknown','none','n/a','')
        THEN c_mktsegment END, 'segment inconnu') AS segment
      FROM customer ORDER BY segment"""))

  /** O-25: deterministic first-per-key (replaces dropDuplicates). */
  val q12 = Q("q12_first_event_per_type",
    (s, dir) => Dedup.firstPerKey(t(s, dir, "events"), Seq("event_type"),
        Seq(col("event_id").asc))
      .select("event_type", "event_id", "user_id")
      .orderBy("event_type"),
    Some("""SELECT event_type, event_id, user_id FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
        FROM events) WHERE rn = 1
      ORDER BY event_type"""))

  /** O-10 text-clean chain (built-in variant) + O-11 first-segment
    * extraction. */
  val q13 = Q("q13_text_clean",
    (s, dir) => t(s, dir, "part")
      .select(col("p_partkey"),
        TextClean.cleanTextAscii(col("p_name")).as("clean_name"),
        regexp_replace(split(col("p_name"), "-").getItem(0), "^[a-z]{2}:", "").as("first_segment"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
      regexp_replace(lower(trim(regexp_replace(p_name, '[^a-zA-Z0-9 ]', '', 'g'))), '\s+', ' ', 'g') AS clean_name,
      regexp_replace(split_part(p_name, '-', 1), '^[a-z]{2}:', '') AS first_segment
      FROM part ORDER BY p_partkey"""))

  /** O-16/O-17/O-18: range-validation null-out + derived arithmetic +
    * coalesce estimation fill. */
  val q14 = Q("q14_bounds_and_derive",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") >= 0 && col("l_quantity") <= 30, col("l_quantity"))
          .otherwise(lit(null)).as("qty_valid"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
        coalesce(
          when(col("l_quantity") >= 0 && col("l_quantity") <= 30, col("l_quantity")),
          col("l_quantity") / lit(2.5)).as("qty_filled"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
      CASE WHEN l_quantity BETWEEN 0 AND 30 THEN l_quantity END AS qty_valid,
      l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS net_price,
      coalesce(CASE WHEN l_quantity BETWEEN 0 AND 30 THEN l_quantity END,
               l_quantity / CAST(2.5 AS DOUBLE)) AS qty_filled
      FROM lineitem WHERE l_orderkey % 100 = 0
      ORDER BY l_orderkey, l_linenumber"""))

  /** In-plan surrogate keys + FK-lookup join (O-27/O-28 analog, §7.1
    * step 5): dim_customer SK via the scalable two-phase rank (range-
    * partitioned sort + per-partition offsets — no single-partition
    * global window), orders as fact. */
  val q15 = Q("q15_star_sk_roundtrip",
    (s, dir) => {
      val dim = Sk.withDistributedSk(
        t(s, dir, "customer").select("c_custkey", "c_nationkey"),
        "customer_sk", Seq(col("c_custkey").asc))
      val fact = t(s, dir, "orders")
        .join(dim, col("o_custkey") === col("c_custkey"), "inner")
      fact.groupBy("c_nationkey")
        .agg(countDistinct(col("customer_sk")).as("n_customers"),
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .orderBy("c_nationkey")
    },
    Some(s"""WITH dim AS (SELECT c_custkey, c_nationkey,
        row_number() OVER (ORDER BY c_custkey) AS customer_sk FROM customer)
      SELECT c_nationkey, COUNT(DISTINCT customer_sk) AS n_customers,
        COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total_price
      FROM orders JOIN dim ON o_custkey = c_custkey
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** Left-anti referential-integrity check as a query (QualitySuite). */
  val q16 = Q("q16_ref_integrity",
    (s, dir) => {
      val orphans = t(s, dir, "orders")
        .join(t(s, dir, "lineitem").select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_anti")
      orphans.agg(count(lit(1)).as("n_childless_orders"))
    },
    Some("""SELECT COUNT(*) AS n_childless_orders FROM orders
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)"""))

  /** Hierarchy rollup + grouping_id (beyond-reference coverage:
    * grouping sets family). */
  val q17 = Q("q17_rollup",
    (s, dir) => t(s, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(grouping_id().cast(LongType).as("gid"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"))
      .orderBy(col("gid").asc, col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first),
    Some(s"""SELECT o_orderstatus, o_orderpriority,
      CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total_price
      FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  /** Ranking + lag/lead + frame-bounded moving sum (window-function
    * family; money math in integer cents for cross-engine exactness). */
  val q18 = Q("q18_window_funcs",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wf = w.rowsBetween(-2, Window.currentRow)
      t(s, dir, "orders").filter(col("o_custkey") % 20 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          rank().over(w).cast(LongType).as("rnk"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          (sum(cents(col("o_totalprice"))).over(wf).cast("double") / 100.0).as("moving3"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some(s"""SELECT o_custkey, o_orderkey,
      CAST(rank() OVER w AS BIGINT) AS rnk,
      lag(o_totalprice, 1) OVER w AS prev_price,
      lead(o_totalprice, 1) OVER w AS next_price,
      CAST(SUM(${centsSql("o_totalprice")}) OVER
        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS moving3
      FROM orders WHERE o_custkey % 20 = 0
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""))

  /** Set operations: INTERSECT / EXCEPT / UNION over nation keys. */
  val q19 = Q("q19_set_ops",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k")).distinct()
      val su = t(s, dir, "supplier").select(col("s_nationkey").as("k")).distinct()
      def cnt(df: DataFrame, op: String) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      cnt(c.intersect(su), "intersect")
        .unionByName(cnt(c.except(su), "except"))
        .unionByName(cnt(c.union(su).distinct(), "union"))
        .orderBy("op")
    },
    Some("""SELECT 'intersect' AS op, (SELECT COUNT(*) FROM
        (SELECT DISTINCT c_nationkey FROM customer INTERSECT SELECT DISTINCT s_nationkey FROM supplier)) AS n
      UNION ALL SELECT 'except', (SELECT COUNT(*) FROM
        (SELECT DISTINCT c_nationkey FROM customer EXCEPT SELECT DISTINCT s_nationkey FROM supplier))
      UNION ALL SELECT 'union', (SELECT COUNT(*) FROM
        (SELECT DISTINCT c_nationkey FROM customer UNION SELECT DISTINCT s_nationkey FROM supplier))
      ORDER BY op"""))

  // ---------------------------------------------------------------- //
  // B. Training-data extension block (dedup / text / similarity)     //
  // ---------------------------------------------------------------- //

  /** Exact dedup by content hash (extension: Dedup.exactDupGroups). */
  val q20 = Q("q20_exact_dup_docs",
    (s, dir) => Dedup.exactDupGroups(t(s, dir, "documents"), "text", "doc_id")
      .orderBy("content_hash"),
    Some("""SELECT md5(text) AS content_hash, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
      FROM documents GROUP BY md5(text) ORDER BY content_hash"""))

  /** Token counting + length stats per language (text analysis). */
  val q21 = Q("q21_token_stats",
    (s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      t(s, dir, "documents")
        .select(col("lang"), col("n_chars"), size(toks).cast(LongType).as("n_tokens"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_tokens")).cast("double") / count(lit(1)).cast("double")).as("avg_tokens"))
        .orderBy("lang")
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
      CAST(SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)) AS BIGINT) AS total_tokens,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      CAST(SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS avg_tokens
      FROM documents GROUP BY lang ORDER BY lang"""))

  /** Quality scoring: token count, stopword ratio, mean token length,
    * keep-flag (text analysis). All ratios are IEEE divisions of exact
    * integer counts. */
  val q22 = Q("q22_quality_score",
    (s, dir) => {
      val toks = split(trim(lower(col("text"))), "\\s+")
      val nTok = size(toks).cast(LongType)
      val nStop = size(filter(toks, tk =>
        tk.isInCollection(Seq("the", "a", "and", "of", "to")))).cast(LongType)
      val nonSpace = length(regexp_replace(col("text"), "\\s", "")).cast(LongType)
      val stopRatio = nStop.cast("double") / nTok.cast("double")
      val meanTokLen = nonSpace.cast("double") / nTok.cast("double")
      t(s, dir, "documents")
        .select(col("doc_id"), nTok.as("n_tokens"), stopRatio.as("stop_ratio"),
          meanTokLen.as("mean_token_len"),
          (nTok >= 20 && stopRatio < lit(0.5)).cast("int").as("keep"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
      CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
           x -> x IN ('the','a','and','of','to'))) AS DOUBLE)
        / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) AS stop_ratio,
      CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) AS mean_token_len,
      CAST(CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) >= 20
        AND (CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             x -> x IN ('the','a','and','of','to'))) AS DOUBLE)
           / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE)) < 0.5 AS INT) AS keep
      FROM documents ORDER BY doc_id"""))

  /** Heuristic language ID by stopword hits (text analysis). */
  val q23 = Q("q23_langid",
    (s, dir) => {
      val toks = split(trim(lower(col("text"))), "\\s+")
      def hits(words: Seq[String]) =
        size(filter(toks, tk => tk.isInCollection(words))).cast(LongType)
      val cEn = hits(Seq("the", "a", "and", "of"))
      val cDe = hits(Seq("der", "die", "das", "und"))
      val cFr = hits(Seq("le", "la", "et", "les"))
      val cEs = hits(Seq("el", "los", "y", "es"))
      val best = greatest(cEn, cDe, cFr, cEs)
      val pred = when(cEn === best, "en").when(cDe === best, "de")
        .when(cFr === best, "fr").otherwise("es")
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), pred.as("predicted_lang"),
          cEn.as("c_en"), cDe.as("c_de"), cFr.as("c_fr"), cEs.as("c_es"))
        .orderBy("doc_id")
    },
    Some("""WITH scored AS (
        SELECT doc_id, lang,
          CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x IN ('the','a','and','of'))) AS BIGINT) AS c_en,
          CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x IN ('der','die','das','und'))) AS BIGINT) AS c_de,
          CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x IN ('le','la','et','les'))) AS BIGINT) AS c_fr,
          CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x IN ('el','los','y','es'))) AS BIGINT) AS c_es
        FROM documents)
      SELECT doc_id, lang,
        CASE WHEN c_en = greatest(c_en, c_de, c_fr, c_es) THEN 'en'
             WHEN c_de = greatest(c_en, c_de, c_fr, c_es) THEN 'de'
             WHEN c_fr = greatest(c_en, c_de, c_fr, c_es) THEN 'fr'
             ELSE 'es' END AS predicted_lang,
        c_en, c_de, c_fr, c_es
      FROM scored ORDER BY doc_id"""))

  /** Document fingerprinting: md5 of normalized text, distinct count per
    * source (text analysis). */
  val q24 = Q("q24_fingerprint",
    (s, dir) => t(s, dir, "documents")
      .select(col("source"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_distinct_fp"))
      .orderBy("source"),
    Some("""SELECT source, COUNT(*) AS n_docs,
      COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_distinct_fp
      FROM documents GROUP BY source ORDER BY source"""))

  /** Brute-force cosine top-k against a fixed query vector, on
    * quantized (×1000, rounded-to-long) embeddings so dot products are
    * exact integers and the cosine is a deterministic IEEE expression in
    * both engines (similarity-search baseline). */
  val q25 = Q("q25_cosine_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val quant = transform(col("embedding"), x =>
        round(x.cast("double") * 1000, 0).cast(LongType))
      val base = emb.select(col("vec_id"), col("label"), quant.as("qv"))
      val query = base.filter(col("vec_id") === 0)
        .select(col("qv").as("query_qv"))
      val dot = aggregate(zip_with(col("qv"), col("query_qv"), (a, b) => a * b),
        lit(0L), (acc, v) => acc + v)
      val norm = (c: Column) => sqrt(aggregate(transform(c, x => x * x),
        lit(0L), (acc, v) => acc + v).cast("double"))
      base.filter(col("vec_id") =!= 0).crossJoin(broadcast(query))
        .select(col("vec_id"), col("label"),
          (dot.cast("double") / (norm(col("qv")) * norm(col("query_qv")))).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(10)
    },
    Some("""WITH q AS (
        SELECT list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS query_qv
        FROM embeddings WHERE vec_id = 0),
      base AS (
        SELECT vec_id, label,
          list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings WHERE vec_id <> 0)
      SELECT vec_id, label,
        CAST(list_sum(list_zip(qv, query_qv).list_transform(p -> p[1] * p[2])) AS DOUBLE)
          / (sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE))
           * sqrt(CAST(list_sum(list_transform(query_qv, x -> x * x)) AS DOUBLE))) AS cosine
      FROM base, q
      ORDER BY cosine DESC, vec_id LIMIT 10"""))

  // ---------------------------------------------------------------- //
  // C. Near-dup dedup + similarity-search block (SURVEY §2.E north-   //
  // star: MinHash-LSH, n-gram Jaccard, SimHash, embedding near-dup,   //
  // IVF probing, BPE tokens, rolling-hash fingerprints)               //
  // ---------------------------------------------------------------- //

  /** DuckDB char-n-gram shingle-set expression (matches
    * Dedup.shingles). */
  private def shingleSql(n: Int, textExpr: String = "text"): String =
    s"""CASE WHEN len($textExpr) >= $n
       THEN list_distinct(list_transform(range(1, len($textExpr)-$n+2),
            i -> substr($textExpr, CAST(i AS INT), $n)))
       ELSE [$textExpr] END"""

  /** DuckDB word-n-gram shingle-set (matches Dedup.wordShingles);
    * `toks` must name a token-list column. */
  private def wordShingleSql(n: Int, toks: String): String =
    s"""CASE WHEN len($toks) >= $n
       THEN list_distinct(list_transform(range(0, len($toks)-$n+1),
            i -> array_to_string(list_slice($toks, CAST(i+1 AS INT), CAST(i+$n AS INT)), ' ')))
       ELSE [array_to_string($toks, ' ')] END"""

  /** DuckDB CTEs `sig` + `banded` + `cand` replicating
    * Dedup.minhashCandidatePairs over the hash-set CTE `shh(doc_id, h)`
    * — permutation minhash (a_i·(x mod P)+b_i) mod P with the exact
    * constants from Dedup.permConsts interpolated as literals. */
  private def sigBandedSql(bands: Int, rpb: Int): String = {
    val k = bands * rpb
    val cs = Dedup.permConsts(k)
    val p = Dedup.MinhashP
    val mins = (0 until k).map(i =>
      s"list_min(list_transform(h, x -> (${cs(i)._1} * (x % $p) + ${cs(i)._2}) % $p)) AS m$i")
      .mkString(", ")
    val bandRows = (0 until bands).map { b =>
      val sig = (0 until rpb).map(r => s"m${b * rpb + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $sig AS bandsig FROM sig"
    }.mkString(" UNION ALL ")
    s"""sig AS (SELECT doc_id, $mins FROM shh),
       banded AS ($bandRows)"""
  }

  private def lshCandSql(bands: Int, rpb: Int): String =
    s"""${sigBandedSql(bands, rpb)},
       cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM banded a JOIN banded b
                ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id)"""

  /** CTE turning shingle-string lists `sh(doc_id, s)` into 60-bit md5
    * hash sets (mirrors Dedup.shingleHash60). */
  private val hashSetCte =
    """shh AS (SELECT doc_id,
       list_distinct(list_transform(s, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS h
       FROM sh)"""

  private def jaccardSql(ha: String, hb: String): String =
    s"""CAST(len(list_intersect($ha, $hb)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat($ha, $hb))) AS DOUBLE)"""

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

  private def cosSql(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(list_zip($a, $b), p -> p[1]*p[2])) AS DOUBLE)
        / (sqrt(CAST(list_sum(list_transform($a, x -> x*x)) AS DOUBLE))
         * sqrt(CAST(list_sum(list_transform($b, x -> x*x)) AS DOUBLE)))"""
  private val quantSql =
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
  private def neardupComponents(s: SparkSession, dir: String): DataFrame = {
    val verified = Dedup.verifiedNearDupPairs(
        t(s, dir, "documents"), "doc_id", "text", Dedup.CharShingles(5), 8, 4)
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b")
    graft.operators.ConnectedComponents.components(verified)
  }

  /** WITH-chain deriving the symmetrized near-dup `edges(src, dst)` CTE
    * — the shared oracle front end of q64/q79 (components) and q87
    * (centrality). */
  private def neardupEdgesCte: String =
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
  private def neardupCompCte: String =
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

  /** REAL compressed-format (PNG/DEFLATE) image decode verified
    * cross-engine, closing the last DecodeStub gap for still images:
    * a deterministic 12×17 grayscale image is encoded into genuine
    * PNG bytes through the JDK's pure-Java ImageIO codec (zlib
    * DEFLATE, PNG row filters) and decoded back before 4×4-block
    * pixel sums (ceil-partial edge blocks — width 17 forces one).
    * PNG is lossless, so the oracle recomputes the sums straight from
    * the pixel formula — any filter, zlib, channel or row-order bug
    * hash-mismatches. JPEG (lossy by design) is spec-checked with an
    * error bound instead (CodecSpec). */
  val q100 = Q("q100_png_block_sums",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val gray = Array.tabulate(12, 17)((r, c) =>
            ((id * 11 + r * 19 + c * 23) % 256).toInt)
          val g = graft.multimodal.Codec.decodePng(
            graft.multimodal.Codec.encodePng(gray))
          for (br <- 0 until 3; bc <- 0 until 5) yield {
            var sum = 0L
            var r = br * 4
            while (r < math.min(br * 4 + 4, 12)) {
              var c = bc * 4
              while (c < math.min(bc * 4 + 4, 17)) { sum += g(r)(c); c += 1 }
              r += 1
            }
            (id, br.toLong, bc.toLong, sum)
          }
        }
        .toDF("media_id", "block_row", "block_col", "pixel_sum")
        .orderBy("media_id", "block_row", "block_col")
    },
    Some("""WITH px AS (SELECT doc_id AS media_id,
        CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
        (doc_id*11 + r*19 + c*23) % 256 AS v
      FROM documents, range(0, 12) t(r), range(0, 17) u(c))
      SELECT media_id, r // 4 AS block_row, c // 4 AS block_col,
        CAST(SUM(v) AS BIGINT) AS pixel_sum
      FROM px GROUP BY media_id, r // 4, c // 4
      ORDER BY media_id, block_row, block_col"""))

  /** The FULL image-dedup pipeline as ONE oracle-checked query —
    * decode → embed → SemDeDup, no fake anywhere: each selected doc
    * renders a deterministic 16×16 grayscale image into genuine PNG
    * bytes, [[Multimodal.decodeImageAndEmbed]] decodes them back
    * (real DEFLATE/zlib through the JDK codec) behind
    * [[graft.operators.Rebalance.forCpuStage]] (ImageIO decode is real
    * CPU work — the valve spreads a split-starved scan across cores;
    * PlanSpec pins the exchange), resizes 16×16 → 8×8 and pools to the
    * 16-dim embedding, and [[Similarity.semDedup]] dedups the result
    * (k = 8, iters = 2, θ = 0.99). Images repeat with period 256 in
    * doc_id (11 is invertible mod 256), so identical-image classes
    * exist at every SF and θ = 0.99 selects exactly them. PNG is
    * lossless and the pooled quantization is boundary-safe (pooled
    * sums s ∈ [0, 1020] give embedding grid points s·50/51 — never
    * within 1/102 of a rounding boundary, vs ≤ 6·10⁻⁵ float error),
    * so the oracle recomputes the embeddings arithmetically from the
    * pixel formula and replays q94's integer-exact Lloyd + cosine +
    * recursive-CC + representative chain. doc_id % 8 bounds the
    * pairwise stage, not the decode-path coverage. */
  /** GIF decode verified cross-engine — same scheme as q100 for the
    * THIRD compressed still format: a deterministic 9×13 grayscale
    * image goes through the indexed-gray GIF encoder (real LZW, and
    * lossless ONLY because the palette is explicit — Codec scaladoc)
    * and the magic-dispatch decoder before 3×3-block sums (width 13
    * forces a partial edge block). The oracle recomputes from the
    * pixel formula; any palette, LZW, or dispatch bug hash-mismatches. */
  val q103 = Q("q103_gif_block_sums",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val gray = Array.tabulate(9, 13)((r, c) =>
            ((id * 13 + r * 29 + c * 7) % 256).toInt)
          val g = graft.multimodal.Codec.decodePng(
            graft.multimodal.Codec.encodeGif(gray))
          for (br <- 0 until 3; bc <- 0 until 5) yield {
            var sum = 0L
            var r = br * 3
            while (r < math.min(br * 3 + 3, 9)) {
              var c = bc * 3
              while (c < math.min(bc * 3 + 3, 13)) { sum += g(r)(c); c += 1 }
              r += 1
            }
            (id, br.toLong, bc.toLong, sum)
          }
        }
        .toDF("media_id", "block_row", "block_col", "pixel_sum")
        .orderBy("media_id", "block_row", "block_col")
    },
    Some("""WITH px AS (SELECT doc_id AS media_id,
        CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
        (doc_id*13 + r*29 + c*7) % 256 AS v
      FROM documents, range(0, 9) t(r), range(0, 13) u(c))
      SELECT media_id, r // 3 AS block_row, c // 3 AS block_col,
        CAST(SUM(v) AS BIGINT) AS pixel_sum
      FROM px GROUP BY media_id, r // 3, c // 3
      ORDER BY media_id, block_row, block_col"""))

  /** TIFF decode verified cross-engine — the FOURTH still format, same
    * scheme: 8×11 indexed-gray TIFF (the JDK's TIFF plugin) → decode →
    * 4×4-block sums (width 11 forces a partial edge block); oracle
    * from the pixel formula. */
  val q104 = Q("q104_tiff_block_sums",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val gray = Array.tabulate(8, 11)((r, c) =>
            ((id * 17 + r * 5 + c * 19) % 256).toInt)
          val g = graft.multimodal.Codec.decodePng(
            graft.multimodal.Codec.encodeTiff(gray))
          for (br <- 0 until 2; bc <- 0 until 3) yield {
            var sum = 0L
            var r = br * 4
            while (r < math.min(br * 4 + 4, 8)) {
              var c = bc * 4
              while (c < math.min(bc * 4 + 4, 11)) { sum += g(r)(c); c += 1 }
              r += 1
            }
            (id, br.toLong, bc.toLong, sum)
          }
        }
        .toDF("media_id", "block_row", "block_col", "pixel_sum")
        .orderBy("media_id", "block_row", "block_col")
    },
    Some("""WITH px AS (SELECT doc_id AS media_id,
        CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
        (doc_id*17 + r*5 + c*19) % 256 AS v
      FROM documents, range(0, 8) t(r), range(0, 11) u(c))
      SELECT media_id, r // 4 AS block_row, c // 4 AS block_col,
        CAST(SUM(v) AS BIGINT) AS pixel_sum
      FROM px GROUP BY media_id, r // 4, c // 4
      ORDER BY media_id, block_row, block_col"""))

  /** q101's decode input, split out (like [[Similarity.withinClusterPairs]])
    * so PlanSpec can pin the CPU-stage rebalance exchange — semDedup's
    * checkpoint barrier hides the decode fragment from the end-to-end
    * explain. */
  private[graft] def q101MediaRebalanced(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = t(s, dir, "documents").select(col("doc_id"))
      .filter(col("doc_id") % 8 === 0).as[Long]
      .map { id =>
        val gray = Array.tabulate(16, 16)((r, c) =>
          ((id * 11 + r * 19 + c * 23) % 256).toInt)
        Multimodal.MediaRow(id, Multimodal.MediaMeta("image", 16, 16, 0, 0L),
          graft.multimodal.Codec.encodePng(gray))
      }
    graft.operators.Rebalance.forCpuStage(media.toDF())
  }

  val q101 = Q("q101_image_semdedup",
    (s, dir) => {
      import s.implicits._
      val feats = Multimodal.decodeImageAndEmbed(
        q101MediaRebalanced(s, dir).as[Multimodal.MediaRow])
      Similarity.semDedup(
          feats.select(col("media_id").as("vec_id"), col("embedding")),
          "vec_id", "embedding", k = 8, iters = 2, theta = 0.99)
        .orderBy("vec_id")
    },
    Some("""WITH RECURSIVE px AS (SELECT doc_id, pr, pc,
        SUM((doc_id*11 + (4*pr + 2*dr)*19 + (4*pc + 2*dc)*23) % 256) AS s
      FROM documents, range(0, 4) t(pr), range(0, 4) u(pc),
           range(0, 2) v(dr), range(0, 2) w(dc)
      WHERE doc_id % 8 = 0
      GROUP BY doc_id, pr, pc),
      base AS (SELECT doc_id AS vec_id,
        list(CAST(round(CAST(s*50 AS DOUBLE)/51) AS BIGINT) ORDER BY pr, pc) AS qv
      FROM px GROUP BY doc_id),
      ex AS (SELECT vec_id, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS x
             FROM base, range(1, 17) t(i)),
      c0 AS (SELECT vec_id AS cid, qv FROM base ORDER BY vec_id LIMIT 8),
      cx0 AS (SELECT cid, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS s,
                CAST(1 AS BIGINT) AS n
              FROM c0, range(1, 17) t(i)),
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
      ed AS (SELECT ia, ib FROM pr WHERE cosine >= 0.99),
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

  /** REAL compressed-AUDIO decode verified cross-engine — IMA-ADPCM
    * WAV (format tag 0x11), the codec that closes the DecodeStub's
    * audio half: each doc synthesizes deterministic PCM16 samples,
    * Spark encodes them into a genuine one-block IMA WAV (state
    * header, low-nibble-first packing, fact chunk) and DECODES IT BACK
    * (Codec.decodeWavImaAdpcm) before exact integer window energies
    * over the RECONSTRUCTION. ADPCM is lossy, so the oracle cannot use
    * the synthesis formula directly — instead it replays the
    * ENCODER+DECODER integer recurrence itself (successive-
    * approximation quantizer, step/index tables, int16 clamps) as a
    * recursive CTE over the inlined step table. Any container,
    * nibble-order, table, or clamp bug hash-mismatches. 65 samples =
    * exactly one blockAlign-36 block; |s| ≤ 32768 ⇒ window energy
    * ≤ 1.7·10¹⁰ — exact BIGINT. */
  val q102 = Q("q102_adpcm_window_energy",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val samples = Array.tabulate(65)(i =>
            (((id * 31 + i * 17) % 2003) - 1001).toShort)
          val wav = graft.multimodal.Codec.encodeWavImaAdpcm(samples, 8000, blockAlign = 36)
          val (sr, rec) = graft.multimodal.Codec.decodeWavImaAdpcm(wav)
          require(sr == 8000 && rec.length == 65, "ADPCM round-trip lost data")
          (0 until 4).map { w =>
            var e = 0L
            var k = 0
            while (k < 16) { val v = rec(w * 16 + k).toLong; e += v * v; k += 1 }
            (id, w.toLong, e)
          }
        }
        .toDF("media_id", "window_idx", "energy")
        .orderBy("media_id", "window_idx")
    },
    Some {
      val stepsVals = graft.multimodal.Codec.ImaStepTable.zipWithIndex
        .map { case (st, i) => s"($i,$st)" }.mkString(",")
      s"""WITH RECURSIVE steps(six, st) AS (SELECT * FROM (VALUES $stepsVals) v(six, st)),
        rec AS (
          SELECT doc_id, CAST(0 AS BIGINT) AS i,
                 CAST((doc_id*31) % 2003 - 1001 AS BIGINT) AS pred,
                 CAST(0 AS BIGINT) AS ix
          FROM documents
          UNION ALL
          SELECT doc_id, i + 1,
            greatest(-32768, least(32767,
              pred + CASE WHEN sgn = 8 THEN -diff ELSE diff END)),
            greatest(0, least(88,
              ix + CASE nib3 WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6
                             WHEN 7 THEN 8 ELSE -1 END))
          FROM (
            SELECT l3.*,
              (st // 8) + f4*st + f2*(st // 2) + f1*(st // 4) AS diff,
              4*f4 + 2*f2 + f1 AS nib3
            FROM (
              SELECT l2.*, CASE WHEN ad3 >= st // 4 THEN 1 ELSE 0 END AS f1
              FROM (
                SELECT l1.*,
                  CASE WHEN ad2 >= st // 2 THEN 1 ELSE 0 END AS f2,
                  ad2 - (CASE WHEN ad2 >= st // 2 THEN 1 ELSE 0 END)*(st // 2) AS ad3
                FROM (
                  SELECT l0.*,
                    CASE WHEN ad >= st THEN 1 ELSE 0 END AS f4,
                    ad - (CASE WHEN ad >= st THEN 1 ELSE 0 END)*st AS ad2
                  FROM (
                    SELECT r.doc_id, r.i, r.pred, r.ix, s.st,
                      CASE WHEN r.smp < r.pred THEN 8 ELSE 0 END AS sgn,
                      abs(r.smp - r.pred) AS ad
                    FROM (SELECT *, (doc_id*31 + (i+1)*17) % 2003 - 1001 AS smp
                          FROM rec WHERE i < 64) r
                    JOIN steps s ON s.six = r.ix
                  ) l0
                ) l1
              ) l2
            ) l3
          )
        )
        SELECT doc_id AS media_id, CAST(i // 16 AS BIGINT) AS window_idx,
          CAST(SUM(pred*pred) AS BIGINT) AS energy
        FROM rec WHERE i < 64
        GROUP BY doc_id, i // 16
        ORDER BY media_id, window_idx"""
    })

  /** VIDEO decode verified cross-engine — the AVI RIFF container with
    * uncompressed-DIB frames (Codec.decodeAvi), same scheme as
    * q100/q103/q104 but through a real CONTAINER walk: per document a
    * deterministic 3-frame 10×7 video is muxed (odd width 7 forces the
    * DIB 4-byte row pad; positive height forces bottom-up rows),
    * demuxed, frame-sampled with the real scheduler
    * (sampleFrameIndices stride 2 → frames 0 and 2 — the sampled
    * frame INDEX is part of the verified contract), and 4×4-block
    * summed (partial edge blocks both axes). The oracle replays the
    * pixel formula; any avih/strh/strf offset, chunk-padding,
    * row-order, or frame-ordering bug hash-mismatches. fps and frame
    * count round-trip is asserted in-flight. */
  val q105 = Q("q105_avi_frame_block_sums",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val frames = Seq.tabulate(3) { f =>
            Array.tabulate(10, 7)((r, c) =>
              ((id * 7 + f * 31 + r * 11 + c * 3) % 256).toInt)
          }
          val avi = graft.multimodal.Codec.encodeAvi(frames, fps = 4)
          val (fps, dec) = graft.multimodal.Codec.decodeAvi(avi)
          require(fps == 4 && dec.length == 3, "AVI round-trip lost stream metadata")
          for {
            fi <- Multimodal.sampleFrameIndices(dec.length, stride = 2, maxFrames = 8)
            br <- 0 until 3; bc <- 0 until 2
          } yield {
            val g = dec(fi)
            var sum = 0L
            var r = br * 4
            while (r < math.min(br * 4 + 4, 10)) {
              var c = bc * 4
              while (c < math.min(bc * 4 + 4, 7)) { sum += g(r)(c); c += 1 }
              r += 1
            }
            (id, fi.toLong, br.toLong, bc.toLong, sum)
          }
        }
        .toDF("media_id", "frame_idx", "block_row", "block_col", "pixel_sum")
        .orderBy("media_id", "frame_idx", "block_row", "block_col")
    },
    Some("""WITH px AS (SELECT doc_id AS media_id, CAST(f AS BIGINT) AS f,
        CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
        (doc_id*7 + f*31 + r*11 + c*3) % 256 AS v
      FROM documents, (VALUES (0),(2)) t(f), range(0, 10) u(r), range(0, 7) w(c))
      SELECT media_id, f AS frame_idx, r // 4 AS block_row, c // 4 AS block_col,
        CAST(SUM(v) AS BIGINT) AS pixel_sum
      FROM px GROUP BY media_id, f, r // 4, c // 4
      ORDER BY media_id, frame_idx, block_row, block_col"""))

  /** INTER-frame video decode verified cross-engine — BI_RLE8, the AVI
    * delta codec (Codec.encodeAviRle8): per document a 4-frame 9×12
    * video where frame 0 is a keyframe (base formula) and each delta
    * frame f ∈ {1,2,3} rewrites ONLY row band {2f, 2f+1}; every other
    * pixel is carried from the previous frame by the codec's skip
    * escapes, never re-sent. Sampling frames 0 and 2 through the GOP
    * seek path means frame 2's output contains band 1 — pixels written
    * solely by frame 1's delta — so a decoder that restarts mid-GOP,
    * drops a delta, or misapplies a skip offset hash-mismatches. The
    * oracle computes each pixel's LAST writer arithmetically
    * (band b visible at frame f iff 1 ≤ b ≤ f). fps and frame count
    * round-trip asserted in-flight. */
  val q106 = Q("q106_avi_rle8_delta_sums",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          def base(r: Int, c: Int) = ((id * 5 + r * 7 + c * 11) % 256).toInt
          def d(f: Int, r: Int, c: Int) = ((id * 3 + f * 41 + r * 13 + c * 17) % 256).toInt
          val frames = scala.collection.mutable.ArrayBuffer(
            Array.tabulate(9, 12)(base))
          (1 to 3).foreach { f =>
            val next = frames.last.map(_.clone())
            (2 * f to 2 * f + 1).foreach(r => (0 until 12).foreach(c => next(r)(c) = d(f, r, c)))
            frames += next
          }
          val avi = graft.multimodal.Codec.encodeAviRle8(
            frames.toSeq, fps = 6, keyframeInterval = 4)
          require(graft.multimodal.Codec.aviFrameCount(avi) == 4, "RLE8 stream lost frames")
          val (fps, picked) = graft.multimodal.Codec.decodeAviFrames(
            avi, Multimodal.sampleFrameIndices(4, stride = 2, maxFrames = 8))
          require(fps == 6, "RLE8 round-trip lost fps")
          for {
            (fi, g) <- picked
            br <- 0 until 3; bc <- 0 until 4
          } yield {
            var sum = 0L
            var r = br * 3
            while (r < br * 3 + 3) {
              var c = bc * 3
              while (c < bc * 3 + 3) { sum += g(r)(c); c += 1 }
              r += 1
            }
            (id, fi.toLong, br.toLong, bc.toLong, sum)
          }
        }
        .toDF("media_id", "frame_idx", "block_row", "block_col", "pixel_sum")
        .orderBy("media_id", "frame_idx", "block_row", "block_col")
    },
    Some("""WITH px AS (SELECT doc_id AS media_id, CAST(f AS BIGINT) AS f,
        CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
        CASE WHEN r // 2 >= 1 AND r // 2 <= f
             THEN (doc_id*3 + (r // 2)*41 + r*13 + c*17) % 256
             ELSE (doc_id*5 + r*7 + c*11) % 256 END AS v
      FROM documents, (VALUES (0),(2)) t(f), range(0, 9) u(r), range(0, 12) w(c))
      SELECT media_id, f AS frame_idx, r // 3 AS block_row, c // 3 AS block_col,
        CAST(SUM(v) AS BIGINT) AS pixel_sum
      FROM px GROUP BY media_id, f, r // 3, c // 3
      ORDER BY media_id, frame_idx, block_row, block_col"""))

  /** Z-order layout arithmetic verified cross-engine — the bucket-rank
    * (codegen'd aggregate over literal boundaries) and Morton
    * bit-interleave expressions behind `Layout.cluster` (SURVEY
    * §2-ext data layout): two derived dimensions of the documents
    * table are bucketed against FIXED quantile boundaries and
    * interleaved at 4 bits; the oracle replays the same comparison
    * sums and shift/mask arithmetic in SQL. The curve value must match
    * bit-for-bit — file pruning decisions at 100 TB ride on it.
    * (The CLUSTERING effect itself — per-file min-max tightness — is
    * proven by LayoutSpec, which is a layout property, not a
    * row-value oracle can check.) */
  val q107 = Q("q107_zorder_values",
    (s, dir) => {
      import graft.store.Layout
      val xb = Seq(100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)
      val yb = (1 to 15).map(_ * 62.0)
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          (col("doc_id") * 37 % 1000).as("y"))
      d.select(
          col("doc_id"),
          Layout.bucketOf(col("n_chars"), xb).as("bkt_x"),
          Layout.bucketOf(col("y"), yb).as("bkt_y"),
          Layout.zValue(
            Seq(Layout.bucketOf(col("n_chars"), xb),
                Layout.bucketOf(col("y"), yb)), bits = 4).as("zval"))
        .orderBy("doc_id")
    },
    Some {
      val xb = Seq(100, 200, 300, 400, 500, 600, 700, 800)
      val yb = (1 to 15).map(_ * 62)
      def bucketSql(v: String, bs: Seq[Int]): String =
        bs.map(b => s"(CASE WHEN $v >= $b THEN 1 ELSE 0 END)").mkString(" + ")
      val interleave = (0 until 4).flatMap { j =>
        Seq(s"(((bkt_x >> $j) & 1) << ${2 * j})", s"(((bkt_y >> $j) & 1) << ${2 * j + 1})")
      }.mkString(" | ")
      s"""WITH dims AS (SELECT doc_id, n_chars, (doc_id * 37) % 1000 AS y FROM documents),
        bk AS (SELECT doc_id,
          CAST(${bucketSql("n_chars", xb)} AS BIGINT) AS bkt_x,
          CAST(${bucketSql("y", yb)} AS BIGINT) AS bkt_y
        FROM dims)
        SELECT doc_id, bkt_x, bkt_y, CAST($interleave AS BIGINT) AS zval
        FROM bk ORDER BY doc_id"""
    })

  /** Hilbert curve index verified cross-engine — the codegen'd native
    * expression behind `Layout.hilbertOrder`
    * (graft.functions.HilbertIndexExpression): q107's bucket dims
    * linearized on the order-4 Hilbert curve. The oracle replays the
    * rotate-and-accumulate recurrence itself as a recursive CTE
    * (4 bit-levels of state (x, y, s, d): quadrant contribution
    * s²·(3rx XOR ry), masked reflect-and-swap rotation) — any
    * rotation, reflection, or accumulation bug in the kernel OR its
    * generated code hash-mismatches. */
  val q108 = Q("q108_hilbert_values",
    (s, dir) => {
      import graft.store.Layout
      val xb = Seq(100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)
      val yb = (1 to 15).map(_ * 62.0)
      t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          (col("doc_id") * 37 % 1000).as("y"))
        .select(
          col("doc_id"),
          graft.functions.HilbertIndexExpression.hilbertIndex(
            Layout.bucketOf(col("n_chars"), xb),
            Layout.bucketOf(col("y"), yb), bits = 4).as("hval"))
        .orderBy("doc_id")
    },
    Some {
      val xb = Seq(100, 200, 300, 400, 500, 600, 700, 800)
      val yb = (1 to 15).map(_ * 62)
      def bucketSql(v: String, bs: Seq[Int]): String =
        bs.map(b => s"(CASE WHEN $v >= $b THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH RECURSIVE dims AS (
        SELECT doc_id, n_chars, (doc_id * 37) % 1000 AS y FROM documents),
      bk AS (SELECT doc_id,
        CAST(${bucketSql("n_chars", xb)} AS BIGINT) AS bkt_x,
        CAST(${bucketSql("y", yb)} AS BIGINT) AS bkt_y
      FROM dims),
      h(doc_id, x, y, s, d) AS (
        SELECT doc_id, bkt_x, bkt_y, CAST(8 AS BIGINT), CAST(0 AS BIGINT) FROM bk
        UNION ALL
        SELECT doc_id,
          CASE WHEN ry = 1 THEN xm WHEN rx = 0 THEN ym ELSE s - 1 - ym END,
          CASE WHEN ry = 1 THEN ym WHEN rx = 0 THEN xm ELSE s - 1 - xm END,
          s // 2,
          d + s * s * xor(3 * rx, ry)
        FROM (SELECT doc_id, x, y, s, d,
                CASE WHEN (x & s) != 0 THEN 1 ELSE 0 END AS rx,
                CASE WHEN (y & s) != 0 THEN 1 ELSE 0 END AS ry,
                x & (s - 1) AS xm, y & (s - 1) AS ym
              FROM h WHERE s >= 1) t
      )
      SELECT doc_id, CAST(d AS BIGINT) AS hval FROM h WHERE s = 0
      ORDER BY doc_id"""
    })

  /** q109/q110's FIXED PQ codebook: m = 4 subspaces of 16 dims, 8
    * codes each, centroid components from a formula in quantized
    * units — fixed so the DuckDB oracle can replay encode and ADC
    * without re-running Lloyd (the TRAINING loop is already
    * oracle-proven by the kmeans family q77/q81/q99; what q109/q110
    * pin is the PQ-specific arithmetic: per-subspace integer argmin
    * with tie-to-smaller-code, and the LUT-sum ADC scan). */
  private def pqFixedCodebook(s: SparkSession): DataFrame = {
    import s.implicits._
    (for { sub <- 0 until 4; code <- 0 until 8 } yield {
      (sub, code.toLong,
        Seq.tabulate(16)(j => (((sub * 131 + code * 17 + j * 7) % 41) - 20) * 10L))
    }).toDF("sub", "code", "cvec")
  }

  /** PQ encode verified cross-engine — `Similarity.pqEncode` against
    * the fixed codebook, one row per (vector, subspace): the oracle
    * recomputes every integer subspace distance and takes the same
    * (dist, code) argmin. Any slicing, quantization, distance, or
    * tie-break bug hash-mismatches. */
  val q109 = Q("q109_pq_codes",
    (s, dir) => {
      Similarity.pqEncode(t(s, dir, "embeddings"), "vec_id", "embedding",
          pqFixedCodebook(s))
        .select(col("id").as("vec_id"),
          posexplode(col("codes")).as(Seq("sub", "code")))
        .select(col("vec_id"), col("sub").cast("long").as("sub"), col("code"))
        .orderBy("vec_id", "sub")
    },
    Some("""WITH qv AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
      FROM embeddings),
      diffs AS (SELECT vec_id, s, c, j,
          v[CAST(s*16 + j + 1 AS INT)] - (((s*131 + c*17 + j*7) % 41) - 20) * 10 AS df
        FROM qv, range(0, 4) t(s), range(0, 8) u(c), range(0, 16) w(j)),
      d AS (SELECT vec_id, s, c, CAST(SUM(df * df) AS BIGINT) AS dist
        FROM diffs GROUP BY vec_id, s, c),
      best AS (SELECT vec_id, s, c,
          row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
        FROM d)
      SELECT vec_id, CAST(s AS BIGINT) AS sub, CAST(c AS BIGINT) AS code
      FROM best WHERE rn = 1 ORDER BY vec_id, sub"""))

  /** PQ asymmetric-distance top-k verified cross-engine — the full
    * compressed-index read path: encode (as q109), LUT the fixed
    * query against every (sub, code) centroid, score every vector as
    * the integer LUT sum, take the top 10 by (adc DESC, vec_id). The
    * oracle replays codes, LUT, and sum — all BIGINT, so the ranking
    * has no float ambiguity. */
  val q110 = Q("q110_pq_adc_topk",
    (s, dir) => {
      import s.implicits._
      val cb = pqFixedCodebook(s)
      val codes = Similarity.pqEncode(t(s, dir, "embeddings"), "vec_id", "embedding", cb)
      val query = Seq((-1L, Seq.tabulate(64)(j => ((j * 13) % 29 - 14) * 10L)))
        .toDF("qid", "qqv")
      Similarity.pqAdcScores(codes, cb, query)
        .select(col("id").as("vec_id"), col("adc"))
        .orderBy(desc("adc"), col("vec_id")).limit(10)
    },
    Some("""WITH qv AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
      FROM embeddings),
      diffs AS (SELECT vec_id, s, c, j,
          v[CAST(s*16 + j + 1 AS INT)] - (((s*131 + c*17 + j*7) % 41) - 20) * 10 AS df
        FROM qv, range(0, 4) t(s), range(0, 8) u(c), range(0, 16) w(j)),
      d AS (SELECT vec_id, s, c, CAST(SUM(df * df) AS BIGINT) AS dist
        FROM diffs GROUP BY vec_id, s, c),
      best AS (SELECT vec_id, s, c,
          row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
        FROM d),
      codes AS (SELECT vec_id, s, c FROM best WHERE rn = 1),
      lut AS (SELECT s, c,
          CAST(SUM((((j*13) % 29) - 14) * 10
                   * (((s*131 + c*17 + ((j % 16))*7) % 41) - 20) * 10) AS BIGINT) AS l
        FROM range(0, 4) t(s), range(0, 8) u(c), range(0, 64) w(j)
        WHERE j // 16 = s
        GROUP BY s, c),
      adc AS (SELECT vec_id, CAST(SUM(l) AS BIGINT) AS adc
        FROM codes JOIN lut USING (s, c) GROUP BY vec_id)
      SELECT vec_id, adc FROM adc ORDER BY adc DESC, vec_id LIMIT 10"""))

  /** IVFADC verified cross-engine — `Similarity.ivfPqTopKNeighbors`,
    * the composed production read path: coarse routing by integer
    * centroid-sum cosine picks nprobe = 2 of the label lists (as q31),
    * then the ADC scan (as q110) scores ONLY the probed lists'
    * members from their PQ codes. The oracle replays routing, encode,
    * LUT, and sum; ranking ties follow the engine's (adc DESC, id ASC)
    * rule, so the id set is deterministic. Any bug in the
    * routing/pruning composition — scoring an unprobed list, dropping
    * a probed one, coarse/fine disagreement — changes the id set and
    * hash-mismatches. */
  val q111 = Q("q111_ivfpq_topk",
    (s, dir) => {
      import s.implicits._
      val cb = pqFixedCodebook(s)
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), Similarity.quantize(col("embedding")).as("qv"))
      val codes = Similarity.pqEncode(t(s, dir, "embeddings"), "vec_id", "embedding", cb)
        .join(base.select(col("vec_id").as("id"), col("label")), "id")
      val query = Seq((-1L, Seq.tabulate(64)(j => ((j * 13) % 29 - 14) * 10L)))
        .toDF("qid", "qqv")
      Similarity.ivfPqTopKNeighbors(codes, "label", base, cb, query, k = 10, nprobe = 2)
        .select(col("id").as("vec_id"))
        .orderBy("vec_id")
    },
    Some("""WITH qv AS (SELECT vec_id, label,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
      FROM embeddings),
      q AS (SELECT list(CAST((((j*13) % 29) - 14) * 10 AS BIGINT) ORDER BY j) AS qqv
            FROM range(0, 64) t(j)),
      expl AS (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM qv),
      cent AS (SELECT label, list(sv ORDER BY pos) AS cvec FROM
                 (SELECT label, pos, SUM(x) AS sv FROM expl GROUP BY label, pos)
               GROUP BY label),
      top2 AS (SELECT label FROM cent, q
               ORDER BY CAST(list_sum(list_transform(list_zip(cvec, qqv), p -> p[1]*p[2])) AS DOUBLE)
                 / (sqrt(CAST(list_sum(list_transform(cvec, x -> x*x)) AS DOUBLE))
                  * sqrt(CAST(list_sum(list_transform(qqv, x -> x*x)) AS DOUBLE))) DESC,
                 label ASC LIMIT 2),
      diffs AS (SELECT vec_id, s, c, j,
          v[CAST(s*16 + j + 1 AS INT)] - (((s*131 + c*17 + j*7) % 41) - 20) * 10 AS df
        FROM qv, range(0, 4) t(s), range(0, 8) u(c), range(0, 16) w(j)),
      d AS (SELECT vec_id, s, c, CAST(SUM(df * df) AS BIGINT) AS dist
        FROM diffs GROUP BY vec_id, s, c),
      best AS (SELECT vec_id, s, c,
          row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
        FROM d),
      codes AS (SELECT vec_id, s, c FROM best WHERE rn = 1),
      lut AS (SELECT s, c,
          CAST(SUM((((j*13) % 29) - 14) * 10
                   * (((s*131 + c*17 + ((j % 16))*7) % 41) - 20) * 10) AS BIGINT) AS l
        FROM range(0, 4) t(s), range(0, 8) u(c), range(0, 64) w(j)
        WHERE j // 16 = s
        GROUP BY s, c),
      adc AS (SELECT cd.vec_id, CAST(SUM(l.l) AS BIGINT) AS adc
        FROM codes cd JOIN qv b USING (vec_id) JOIN lut l USING (s, c)
        WHERE b.label IN (SELECT label FROM top2)
        GROUP BY cd.vec_id)
      SELECT vec_id FROM (SELECT vec_id FROM adc ORDER BY adc DESC, vec_id LIMIT 10)
      ORDER BY vec_id"""))

  /** Residual IVFADC (IVFADC-R) verified cross-engine —
    * `Similarity.ivfPqResidualTopKNeighbors` over
    * [[Similarity.residualFrame]] codes: per-label FLOORED-MEAN coarse
    * centroids, residual rv = qv − mvec, residual PQ encode against
    * the fixed codebook, routing by mvec cosine (nprobe = 2), and the
    * EXACT integer score decomposition ⟨q,mvec⟩ + Σ LUT[sub][code].
    * The oracle replays every stage — floored means, residual argmin
    * encode, coarse dot, LUT sum, (adc DESC, id ASC) ranking. Any bug
    * in the mean flooring, residual subtraction, or coarse+fine score
    * assembly changes the id set and hash-mismatches. */
  val q112 = Q("q112_ivfpq_residual_topk",
    (s, dir) => {
      import s.implicits._
      val cb = pqFixedCodebook(s)
      val emb = t(s, dir, "embeddings")
      val rf = Similarity.residualFrame(emb, "vec_id", "label", "embedding")
      val codes = Similarity.pqEncodeQ(rf, "id", "rv", cb)
        .join(rf.select(col("id"), col("label")), "id")
      val means = Similarity.listCentroidMeans(
        emb.select(col("label"), Similarity.quantize(col("embedding")).as("qv")),
        "label", "qv")
      val query = Seq((-1L, Seq.tabulate(64)(j => ((j * 13) % 29 - 14) * 10L)))
        .toDF("qid", "qqv")
      Similarity.ivfPqResidualTopKNeighbors(codes, "label", means, cb, query,
          k = 10, nprobe = 2)
        .select(col("id").as("vec_id"))
        .orderBy("vec_id")
    },
    Some("""WITH qv AS (SELECT vec_id, label,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
      FROM embeddings),
      q AS (SELECT list(CAST((((j*13) % 29) - 14) * 10 AS BIGINT) ORDER BY j) AS qqv
            FROM range(0, 64) t(j)),
      expl AS (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM qv),
      mexp AS (SELECT label, pos,
          CAST(floor(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mv
        FROM expl GROUP BY label, pos),
      mcent AS (SELECT label, list(mv ORDER BY pos) AS mvec FROM mexp GROUP BY label),
      top2 AS (SELECT label FROM mcent, q
               ORDER BY CAST(list_sum(list_transform(list_zip(mvec, qqv), p -> p[1]*p[2])) AS DOUBLE)
                 / (sqrt(CAST(list_sum(list_transform(mvec, x -> x*x)) AS DOUBLE))
                  * sqrt(CAST(list_sum(list_transform(qqv, x -> x*x)) AS DOUBLE))) DESC,
                 label ASC LIMIT 2),
      coarse AS (SELECT label,
          CAST(list_sum(list_transform(list_zip(mvec, qqv), p -> p[1]*p[2])) AS BIGINT) AS coarse
        FROM mcent, q),
      diffs AS (SELECT b.vec_id, t.s, u.c, w.j,
          b.v[CAST(t.s*16 + w.j + 1 AS INT)] - m.mv
            - (((t.s*131 + u.c*17 + w.j*7) % 41) - 20) * 10 AS df
        FROM qv b
        CROSS JOIN range(0, 4) t(s)
        CROSS JOIN range(0, 8) u(c)
        CROSS JOIN range(0, 16) w(j)
        JOIN mexp m ON m.label = b.label AND m.pos = t.s*16 + w.j + 1),
      d AS (SELECT vec_id, s, c, CAST(SUM(df * df) AS BIGINT) AS dist
        FROM diffs GROUP BY vec_id, s, c),
      best AS (SELECT vec_id, s, c,
          row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
        FROM d),
      codes AS (SELECT vec_id, s, c FROM best WHERE rn = 1),
      lut AS (SELECT s, c,
          CAST(SUM((((j*13) % 29) - 14) * 10
                   * (((s*131 + c*17 + ((j % 16))*7) % 41) - 20) * 10) AS BIGINT) AS l
        FROM range(0, 4) t(s), range(0, 8) u(c), range(0, 64) w(j)
        WHERE j // 16 = s
        GROUP BY s, c),
      adc AS (SELECT cd.vec_id, CAST(SUM(l.l) AS BIGINT) + MIN(co.coarse) AS adc
        FROM codes cd JOIN qv b USING (vec_id)
        JOIN coarse co ON co.label = b.label
        JOIN lut l USING (s, c)
        WHERE b.label IN (SELECT label FROM top2)
        GROUP BY cd.vec_id)
      SELECT vec_id FROM (SELECT vec_id FROM adc ORDER BY adc DESC, vec_id LIMIT 10)
      ORDER BY vec_id"""))

  /** G.711 μ-law + A-law decode verified cross-engine — the telephony
    * companding codecs (WAV format tags 7/6, Codec.decodeWavG711),
    * same scheme as the ADPCM q102: per document a deterministic
    * 64-sample signal spanning ±30000 (all eight G.711 segments) is
    * companded, expanded, and 16-sample-window energy-summed; the
    * oracle replays BOTH closed-form integer expansions (μ-law
    * complement-bias-shift, A-law even-bit-inversion segment fold) and
    * the encoder's nearest-reconstruction argmin (ties to the smaller
    * code) in SQL. Any mantissa, segment, bias, sign-convention, or
    * fact-chunk bug hash-mismatches. */
  val q113 = Q("q113_g711_window_energy",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val samples = Array.tabulate(64)(i =>
            (((id * 257 + i * 997) % 60001) - 30000).toShort)
          Seq(false, true).flatMap { aLaw =>
            val wav = graft.multimodal.Codec.encodeWavG711(samples, 8000, aLaw)
            val (sr, rec) = graft.multimodal.Codec.decodeWavG711(wav)
            require(sr == 8000 && rec.length == 64, "G.711 round-trip lost data")
            (0 until 4).map { w =>
              var e = 0L
              var k = 0
              while (k < 16) { val v = rec(w * 16 + k).toLong; e += v * v; k += 1 }
              (id, if (aLaw) "alaw" else "ulaw", w.toLong, e)
            }
          }
        }
        .toDF("media_id", "codec", "window_idx", "energy")
        .orderBy("media_id", "codec", "window_idx")
    },
    Some("""WITH dec AS (
        SELECT c, 'ulaw' AS codec,
          CASE WHEN ((255 - c) & 128) != 0
            THEN 132 - ((((255 - c) & 15) * 8 + 132) << (((255 - c) & 112) >> 4))
            ELSE ((((255 - c) & 15) * 8 + 132) << (((255 - c) & 112) >> 4)) - 132 END AS v
        FROM range(0, 256) t(c)
        UNION ALL
        SELECT c, 'alaw',
          CASE WHEN (xor(c, 85) & 128) != 0 THEN seg_val ELSE -seg_val END
        FROM (SELECT c,
            CASE WHEN ((xor(c, 85) & 112) >> 4) = 0 THEN ((xor(c, 85) & 15) << 4) + 8
                 WHEN ((xor(c, 85) & 112) >> 4) = 1 THEN ((xor(c, 85) & 15) << 4) + 264
                 ELSE (((xor(c, 85) & 15) << 4) + 264) << (((xor(c, 85) & 112) >> 4) - 1)
            END AS seg_val
          FROM range(0, 256) t(c)) a),
      smp AS (SELECT doc_id, i, (doc_id*257 + i*997) % 60001 - 30000 AS s
        FROM documents, range(0, 64) t(i)),
      enc AS (SELECT doc_id, i, codec, v,
          row_number() OVER (PARTITION BY doc_id, i, codec
                             ORDER BY abs(v - s), c) AS rn
        FROM smp CROSS JOIN dec)
      SELECT doc_id AS media_id, codec, CAST(i // 16 AS BIGINT) AS window_idx,
        CAST(SUM(v*v) AS BIGINT) AS energy
      FROM enc WHERE rn = 1
      GROUP BY doc_id, codec, i // 16
      ORDER BY media_id, codec, window_idx"""))

  /** Exact substring dedup verified cross-engine — repeated 5-token
    * spans (Dedup.repeatedSpans, the Lee et al. 2107.06499 operator at
    * token-window granularity): every verbatim 5-gram occurring twice
    * anywhere in the corpus flags its non-keeper occurrences; flagged
    * windows merge into maximal spans. The oracle replays windowing
    * (md5-keyed), the corpus-wide (id, pos) keeper rule, and the
    * running-max span coalescing. Any off-by-one in window positions,
    * keeper selection, or adjacent-span merging hash-mismatches. */
  val q114 = Q("q114_repeated_spans",
    (s, dir) => Dedup.repeatedSpans(t(s, dir, "documents"), "doc_id", "text",
        n = 5, minOccurrences = 2)
      .orderBy("doc_id", "span_start"),
    Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        FROM documents),
      wins AS (SELECT doc_id, p AS pos,
          md5(array_to_string(list_slice(tk, p + 1, p + 5), ' ')) AS h
        FROM (SELECT doc_id, tk, unnest(range(0, len(tk) - 4)) AS p FROM toks)),
      occ AS (SELECT doc_id, pos,
          row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
          COUNT(*) OVER (PARTITION BY h) AS cnt
        FROM wins),
      flagged AS (SELECT doc_id, pos FROM occ WHERE cnt >= 2 AND rn > 1),
      m AS (SELECT doc_id, pos,
          CASE WHEN pos > COALESCE(MAX(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS ns
        FROM flagged),
      g AS (SELECT doc_id, pos, SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM m)
      SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
        CAST(MAX(pos) + 5 AS BIGINT) AS span_end
      FROM g GROUP BY doc_id, grp ORDER BY doc_id, span_start"""))

  /** The cut half of exact substring dedup verified cross-engine —
    * Dedup.cutRepeatedSpans drops flagged tokens and rejoins survivors
    * single-spaced (fully-cut docs survive EMPTY). The oracle rebuilds
    * every cleaned text token-by-token and compares md5s — position
    * bookkeeping, keeper survival, span-boundary, and reassembly-order
    * bugs all hash-mismatch. */
  val q115 = Q("q115_cut_repeated_spans",
    (s, dir) => Dedup.cutRepeatedSpans(t(s, dir, "documents"), "doc_id", "text",
        n = 5, minOccurrences = 2)
      .select(col("doc_id"), md5(col("text")).as("clean_md5"))
      .orderBy("doc_id"),
    Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        FROM documents),
      wins AS (SELECT doc_id, p AS pos,
          md5(array_to_string(list_slice(tk, p + 1, p + 5), ' ')) AS h
        FROM (SELECT doc_id, tk, unnest(range(0, len(tk) - 4)) AS p FROM toks)),
      occ AS (SELECT doc_id, pos,
          row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
          COUNT(*) OVER (PARTITION BY h) AS cnt
        FROM wins),
      flagged AS (SELECT doc_id, pos FROM occ WHERE cnt >= 2 AND rn > 1),
      cov AS (SELECT DISTINCT doc_id, pos + v.d AS tpos
        FROM flagged CROSS JOIN range(0, 5) v(d)),
      tok2 AS (SELECT doc_id, p AS tpos, tk[CAST(p + 1 AS INT)] AS tok
        FROM (SELECT doc_id, tk, unnest(range(0, len(tk))) AS p FROM toks)),
      kept AS (SELECT t.doc_id, t.tpos, t.tok
        FROM tok2 t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.tpos = t.tpos
        WHERE c.doc_id IS NULL),
      joined AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS txt
        FROM kept GROUP BY doc_id)
      SELECT d.doc_id, md5(COALESCE(j.txt, '')) AS clean_md5
      FROM documents d LEFT JOIN joined j USING (doc_id)
      ORDER BY d.doc_id"""))

  /** The WAV-auto PIPELINE verified cross-engine — the capstone of the
    * audio stack: a MIXED-codec corpus (doc_id%3 routes PCM16 /
    * IMA-ADPCM / μ-law G.711, one signal formula) through
    * `Multimodal.decodeAudioAndFeature` — format-tag routing
    * (Codec.decodeWavAuto), three REAL decoders, exact-sample window
    * scheduling, integer window energies — while the oracle replays
    * ALL THREE decode paths in SQL (identity; the q102 ADPCM
    * encode+decode recursion; the q113 argmin+expansion) and unions
    * them. A routing bug, any single decoder bug, or a window-
    * scheduling off-by-one hash-mismatches. */
  val q116 = Q("q116_wav_auto_pipeline",
    (s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val samples = Array.tabulate(64)(i =>
            (((id * 31 + i * 17) % 2003) - 1001).toShort)
          val payload = (id % 3) match {
            case 0 => graft.multimodal.Codec.encodeWavPcm16(samples, 8000)
            case 1 => graft.multimodal.Codec.encodeWavImaAdpcm(samples, 8000, blockAlign = 36)
            case _ => graft.multimodal.Codec.encodeWavG711(samples, 8000, aLaw = false)
          }
          Multimodal.MediaRow(id, Multimodal.MediaMeta("audio", 0, 0, 8000, 8L), payload)
        }
      Multimodal.decodeAudioAndFeature(media, windowMs = 2, hopMs = 2)
        .toDF()
        .select(col("media_id"), col("window_idx").cast("long").as("window_idx"),
          col("energy"))
        .orderBy("media_id", "window_idx")
    },
    Some {
      val stepsVals = graft.multimodal.Codec.ImaStepTable.zipWithIndex
        .map { case (st, i) => s"($i,$st)" }.mkString(",")
      s"""WITH RECURSIVE steps(six, st) AS (SELECT * FROM (VALUES $stepsVals) v(six, st)),
        pcm AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
            CAST((doc_id*31 + i*17) % 2003 - 1001 AS BIGINT) AS v
          FROM documents, range(0, 64) t(i) WHERE doc_id % 3 = 0),
        rec AS (
          SELECT doc_id, CAST(0 AS BIGINT) AS i,
                 CAST((doc_id*31) % 2003 - 1001 AS BIGINT) AS pred,
                 CAST(0 AS BIGINT) AS ix
          FROM documents WHERE doc_id % 3 = 1
          UNION ALL
          SELECT doc_id, i + 1,
            greatest(-32768, least(32767,
              pred + CASE WHEN sgn = 8 THEN -diff ELSE diff END)),
            greatest(0, least(88,
              ix + CASE nib3 WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6
                             WHEN 7 THEN 8 ELSE -1 END))
          FROM (
            SELECT l3.*,
              (st // 8) + f4*st + f2*(st // 2) + f1*(st // 4) AS diff,
              4*f4 + 2*f2 + f1 AS nib3
            FROM (
              SELECT l2.*, CASE WHEN ad3 >= st // 4 THEN 1 ELSE 0 END AS f1
              FROM (
                SELECT l1.*,
                  CASE WHEN ad2 >= st // 2 THEN 1 ELSE 0 END AS f2,
                  ad2 - (CASE WHEN ad2 >= st // 2 THEN 1 ELSE 0 END)*(st // 2) AS ad3
                FROM (
                  SELECT l0.*,
                    CASE WHEN ad >= st THEN 1 ELSE 0 END AS f4,
                    ad - (CASE WHEN ad >= st THEN 1 ELSE 0 END)*st AS ad2
                  FROM (
                    SELECT r.doc_id, r.i, r.pred, r.ix, s.st,
                      CASE WHEN r.smp < r.pred THEN 8 ELSE 0 END AS sgn,
                      abs(r.smp - r.pred) AS ad
                    FROM (SELECT *, (doc_id*31 + (i+1)*17) % 2003 - 1001 AS smp
                          FROM rec WHERE i < 63) r
                    JOIN steps s ON s.six = r.ix
                  ) l0
                ) l1
              ) l2
            ) l3
          )
        ),
        adp AS (SELECT doc_id, i, pred AS v FROM rec),
        dec AS (SELECT c,
            CASE WHEN ((255 - c) & 128) != 0
              THEN 132 - ((((255 - c) & 15) * 8 + 132) << (((255 - c) & 112) >> 4))
              ELSE ((((255 - c) & 15) * 8 + 132) << (((255 - c) & 112) >> 4)) - 132
            END AS dv
          FROM range(0, 256) t(c)),
        usmp AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
            (doc_id*31 + i*17) % 2003 - 1001 AS s
          FROM documents, range(0, 64) t(i) WHERE doc_id % 3 = 2),
        uenc AS (SELECT doc_id, i, dv,
            row_number() OVER (PARTITION BY doc_id, i ORDER BY abs(dv - s), c) AS rn
          FROM usmp CROSS JOIN dec),
        ul AS (SELECT doc_id, i, CAST(dv AS BIGINT) AS v FROM uenc WHERE rn = 1),
        allv AS (SELECT * FROM pcm UNION ALL SELECT * FROM adp UNION ALL SELECT * FROM ul)
        SELECT doc_id AS media_id, CAST(i // 16 AS BIGINT) AS window_idx,
          CAST(SUM(v*v) AS BIGINT) AS energy
        FROM allv GROUP BY doc_id, i // 16
        ORDER BY media_id, window_idx"""
    })

  // ---------------------------------------------------------------- //
  // BPE tokenizer training / encoding (Curation.trainBpe/bpeEncode)  //
  // ---------------------------------------------------------------- //

  /** Shared DuckDB replay of the BPE vocabulary init: corpus →
    * word-frequency table → code-point symbol lists (the exact mirror
    * of [[graft.text.Curation.bpeWordTable]]). */
  private def bpeInitSql: String =
    """w0 AS (
      SELECT word, COUNT(*) AS n FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        FROM documents) u
      WHERE len(word) > 0 GROUP BY word),
    s0 AS (SELECT word, n,
      list_transform(range(1, len(word)+1),
        i -> substring(word, CAST(i AS INT), 1)) AS syms
      FROM w0)"""

  /** One unrolled BPE round in SQL: winner CTE (supplied — either a
    * pair-count argmax for training or a literal for encoding) plus
    * the greedy left-to-right non-overlapping apply. The apply mirrors
    * [[graft.functions.BpeExpressions.mergeStep]] exactly: for
    * `left ≠ right` adjacent matches never overlap, so every match
    * merges; for `left = right` a maximal run of length L merges at
    * even offsets only (floor(L/2) pairs) — expressed as
    * gaps-and-islands run detection + in-run parity, no sequential
    * scan needed. */
  private def bpeStageSql(k: Int, winCte: String): String = {
    val p = k - 1
    s"""$winCte,
    ex$k AS (SELECT word, n, CAST(i AS INT) AS i, syms[CAST(i AS INT)] AS sym
      FROM (SELECT word, n, syms, unnest(range(1, len(syms)+1)) AS i FROM s$p) x),
    mk$k AS (SELECT e.word, e.n, e.i, e.sym, w.l AS wl, w.r AS wr,
        COALESCE(e.sym = w.l AND
          lead(e.sym) OVER (PARTITION BY e.word ORDER BY e.i) = w.r, FALSE) AS rawm
      FROM ex$k e CROSS JOIN win$k w),
    isl$k AS (SELECT *, CASE WHEN sym = wl
        THEN i - ROW_NUMBER() OVER (PARTITION BY word, sym = wl ORDER BY i) END AS island
      FROM mk$k),
    par$k AS (SELECT *, CASE WHEN island IS NOT NULL
        THEN (ROW_NUMBER() OVER (PARTITION BY word, island ORDER BY i) - 1) % 2 = 0
        END AS evenoff
      FROM isl$k),
    fin$k AS (SELECT word, n, i,
        CASE WHEN m THEN wl || wr ELSE sym END AS sym,
        COALESCE(lag(m) OVER (PARTITION BY word ORDER BY i), FALSE) AS consumed
      FROM (SELECT *, rawm AND (wl <> wr OR COALESCE(evenoff, FALSE)) AS m
            FROM par$k) y),
    s$k AS (SELECT word, n, list(sym ORDER BY i) AS syms
      FROM fin$k WHERE NOT consumed GROUP BY word, n)"""
  }

  /** Training-round winner: adjacent-pair counts weighted by word
    * frequency (overlaps counted — the classic Sennrich formulation),
    * argmax with ties to the binary-smallest (left, right). */
  private def bpeTrainWinSql(k: Int): String = {
    val p = k - 1
    s"""pc$k AS (
      SELECT syms[CAST(i AS INT)] AS l, syms[CAST(i AS INT)+1] AS r, SUM(n) AS cnt
      FROM (SELECT n, syms, unnest(range(1, len(syms))) AS i
            FROM s$p WHERE len(syms) >= 2) x
      GROUP BY 1, 2),
    win$k AS (SELECT l, r, cnt FROM pc$k ORDER BY cnt DESC, l, r LIMIT 1)"""
  }

  /** Full distributed BPE tokenizer training (arXiv:1508.07909):
    * 6 rounds of pair-count argmax → greedy merge apply over the
    * word-frequency table. The corpus is read ONCE (tokenize →
    * groupBy word); each round then costs one pair-count exchange
    * over |vocab| rows plus a narrow codegen'd merge map — the shape
    * that trains a tokenizer on a 100 TB corpus without ever
    * re-reading it. The oracle replays all 6 rounds unrolled,
    * including the greedy-apply parity rule on identical-symbol runs,
    * so a drift between the counted pairs and the actually-produced
    * vocabulary (the classic BPE implementation bug) hash-mismatches. */
  val q117 = Q("q117_bpe_train",
    (s, dir) => graft.text.Curation.trainBpe("text", nMerges = 6)(
        t(s, dir, "documents"))
      .orderBy("merge_rank"),
    Some {
      val stages = (1 to 6).map(k => bpeStageSql(k, bpeTrainWinSql(k))).mkString(",\n")
      val unions = (1 to 6).map(k =>
        s"SELECT CAST($k AS INT) AS merge_rank, l, r, cnt FROM win$k")
        .mkString("\n      UNION ALL ")
      s"""WITH $bpeInitSql,
      $stages,
      merges AS (
      $unions)
      SELECT merge_rank, l AS left_sym, r AS right_sym, CAST(cnt AS BIGINT) AS n_pair
      FROM merges ORDER BY merge_rank"""
    })

  /** The q118 fixed merge list: rank-ordered, with a cascading third
    * merge (`th` is only producible by rank 2) and a self-pair would-
    * overlap case exercised wherever the corpus has letter runs. */
  private val bpeFixedMerges: Seq[(String, String)] =
    Seq(("e", "r"), ("t", "h"), ("th", "e"), ("a", "n"))

  /** BPE ENCODE with an already-learned (here: literal) merge table —
    * the inference-side twin of q117. Narrow until the final count:
    * the whole encoder is one codegen kernel call per word inside a
    * higher-order transform (zero exchanges before the token
    * aggregate). The oracle replays the same 4 merges through the
    * unrolled apply template with literal winners. */
  val q118 = Q("q118_bpe_encode",
    (s, dir) => graft.text.Curation.bpeEncode("text", bpeFixedMerges)(
        t(s, dir, "documents"))
      .select(explode(col("bpe_tokens")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(30),
    Some {
      val stages = bpeFixedMerges.zipWithIndex.map { case ((l, r), i) =>
        bpeStageSql(i + 1, s"win${i + 1} AS (SELECT '$l' AS l, '$r' AS r)")
      }.mkString(",\n")
      s"""WITH $bpeInitSql,
      $stages
      SELECT sym AS token, CAST(SUM(n) AS BIGINT) AS n_occurrences
      FROM (SELECT n, unnest(syms) AS sym FROM s${bpeFixedMerges.size}) x
      GROUP BY sym ORDER BY n_occurrences DESC, token LIMIT 30"""
    })

  /** DuckDB mirror of [[graft.functions.OphBandSigs]]: one permutation
    * over the 60-bit hash set, k equal value-range bins keeping their
    * min, empty bins densified from the nearest occupied bin rightward
    * (circular, offset t shifts by t·P), then the same "m|m|..." band
    * strings as the k-permutation family. The fill step expresses the
    * rotation as a (grid × occupied-slots) rank on circular distance —
    * offset 0 IS the occupied case, so one rule covers both. */
  private def ophBandedSql(bands: Int, rpb: Int): String = {
    val k = bands * rpb
    val (a, b) = Dedup.permConsts(1).head
    val p = Dedup.MinhashP
    s"""vals AS (SELECT doc_id, ($a * (x % $p) + $b) % $p AS v
         FROM (SELECT doc_id, unnest(h) AS x FROM shh) u),
       slots AS (SELECT doc_id, CAST((v * $k) // $p AS INT) AS j, MIN(v) AS mv
         FROM vals GROUP BY 1, 2),
       grid AS (SELECT doc_id, CAST(gj AS INT) AS j
         FROM (SELECT DISTINCT doc_id FROM shh) d, range(0, $k) t(gj)),
       fill AS (SELECT g.doc_id, g.j,
           s.mv + $p * CAST((s.j - g.j + $k) % $k AS BIGINT) AS cand,
           row_number() OVER (PARTITION BY g.doc_id, g.j
             ORDER BY (s.j - g.j + $k) % $k) AS rn
         FROM grid g JOIN slots s ON s.doc_id = g.doc_id),
       osig AS (SELECT doc_id, j, cand AS m FROM fill WHERE rn = 1),
       banded AS (SELECT doc_id, CAST(j // $rpb AS INT) AS band,
           string_agg(CAST(m AS VARCHAR), '|' ORDER BY j) AS bandsig
         FROM osig GROUP BY doc_id, j // $rpb)"""
  }

  /** Near-dup candidates via densified one-permutation hashing
    * (Shrivastava & Li ICML 2014) — the O(|shingles|) signature scan,
    * vs q26's O(k·|shingles|) k-permutation family, with the identical
    * (8,4) banding and bucket join downstream. The oracle replays the
    * whole construction including the rotation densification, so a
    * bin-split or borrow-direction bug hash-mismatches. */
  val q119 = Q("q119_oph_neardup",
    (s, dir) => Dedup.ophCandidatePairs(
        t(s, dir, "documents"), "doc_id", "text", Dedup.CharShingles(5),
        bands = 8, rowsPerBand = 4)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH sh AS (SELECT doc_id, ${shingleSql(5)} AS s FROM documents),
      $hashSetCte,
      ${ophBandedSql(8, 4)},
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM banded a JOIN banded b
               ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id)
      SELECT id_a, id_b FROM cand ORDER BY id_a, id_b"""))

  /** JL sign-projection prefilter + exact re-rank
    * ([[Similarity.jlPrefilterTopK]]): the corpus is scored in a
    * deterministic ±1-projected 16-dim space (4× fewer multiply-adds
    * than the 64-dim brute scan), a generous top-50 candidate set
    * survives, and the exact full-dimension cosine re-ranks it to the
    * final top-10. The oracle replays the ENTIRE construction — LCG
    * sign stream, projected sums, projected cosine, candidate cut,
    * exact re-rank — so a sign-stream index bug or a prefilter/re-rank
    * tie-rule drift hash-mismatches. */
  val q120 = Q("q120_jl_prefilter_topk",
    (s, dir) => {
      import s.implicits._
      val base = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Similarity.quantize(col("embedding")).as("qv"))
      val query = Seq((-1L, Seq.tabulate(64)(j => ((j * 13) % 29 - 14) * 10L)))
        .toDF("qid", "qqv")
      Similarity.jlPrefilterTopK(base, query, k = 10, outDims = 16, candidateFactor = 5)
        .select(col("id").as("vec_id"))
        .orderBy("vec_id")
    },
    Some {
      val (a, b, p) = (graft.functions.SignProjectLongs.A,
        graft.functions.SignProjectLongs.B, graft.functions.SignProjectLongs.P)
      val signCase = s"CASE WHEN ($a*((pos-1)*16 + j) + $b) % $p < ${p / 2} " +
        "THEN x ELSE -x END"
      s"""WITH qv AS (SELECT vec_id AS id,
          list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
        FROM embeddings),
        q AS (SELECT list(CAST((((j*13) % 29) - 14) * 10 AS BIGINT) ORDER BY j) AS qqv
              FROM range(0, 64) t(j)),
        px AS (SELECT id, j, CAST(SUM($signCase) AS BIGINT) AS pj
          FROM (SELECT id, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM qv) e,
               range(0, 16) t(j)
          GROUP BY id, j),
        qx AS (SELECT j, CAST(SUM($signCase) AS BIGINT) AS qj
          FROM (SELECT unnest(qqv) AS x, generate_subscripts(qqv, 1) AS pos FROM q) e,
               range(0, 16) t(j)
          GROUP BY j),
        pc AS (SELECT p2.id,
            CAST(SUM(p2.pj * q2.qj) AS DOUBLE) /
              (sqrt(CAST(SUM(p2.pj * p2.pj) AS DOUBLE)) *
               sqrt(CAST((SELECT SUM(qj*qj) FROM qx) AS DOUBLE))) AS pcos
          FROM px p2 JOIN qx q2 USING (j) GROUP BY p2.id),
        cand AS (SELECT id FROM pc ORDER BY pcos DESC, id LIMIT 50),
        fin AS (SELECT bq.id,
            CAST(list_sum(list_transform(list_zip(bq.v, q.qqv), pr -> pr[1]*pr[2])) AS DOUBLE) /
              (sqrt(CAST(list_sum(list_transform(bq.v, x -> x*x)) AS DOUBLE)) *
               sqrt(CAST(list_sum(list_transform(q.qqv, x -> x*x)) AS DOUBLE))) AS cosine
          FROM qv bq JOIN cand USING (id), q)
        SELECT id AS vec_id FROM (SELECT id FROM fin ORDER BY cosine DESC, id LIMIT 10)
        ORDER BY vec_id"""
    })

  /** Shared DuckDB replay of [[Multimodal.blockhashGrid]] over pixel
    * rows `px(media_id, r, c, v)` on a 32×32 grid: 2×2 block sums,
    * lower-median threshold (rank 128 of 256 — the value at a rank is
    * tie-stable), strict-above bits, row-major packing into 4 signed
    * BIGINTs via HUGEINT (bit 63 would overflow checked BIGINT
    * arithmetic). */
  private val blockhashSql =
    """bs AS (SELECT media_id, CAST((r//2)*16 + (c//2) AS BIGINT) AS b,
        CAST(SUM(v) AS BIGINT) AS s
      FROM px GROUP BY media_id, (r//2)*16 + (c//2)),
    med AS (SELECT media_id, s AS m FROM
      (SELECT media_id, s, row_number() OVER (PARTITION BY media_id ORDER BY s) AS rn
       FROM bs) x WHERE rn = 128),
    bits AS (SELECT bs.media_id, bs.b,
        CASE WHEN bs.s > med.m THEN 1 ELSE 0 END AS bit
      FROM bs JOIN med USING (media_id)),
    packed AS (SELECT media_id, CAST(b // 64 AS INT) AS band,
        SUM(CAST(bit AS HUGEINT) * (CAST(1 AS HUGEINT) << CAST(b % 64 AS INT))) AS h
      FROM bits GROUP BY media_id, b // 64),
    bh AS (SELECT media_id, band,
        CAST(CASE WHEN h >= (CAST(1 AS HUGEINT) << 63)
             THEN h - (CAST(1 AS HUGEINT) << 64) ELSE h END AS BIGINT) AS bh_value
      FROM packed)"""

  /** Block-mean perceptual image hash ([[Multimodal.blockhashGrid]] —
    * the public blockhash construction): real BMP decode → 2×2 block
    * sums → lower-median threshold → 256 bits packed into 4 longs.
    * All integer and rank-deterministic, so the oracle replays the
    * hash BIT-FOR-BIT — the DCT-based pHash alternative can't cross
    * engines exactly, which is why this is the engine's image hash. */
  val q121 = Q("q121_image_blockhash",
    (s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val gray = Array.tabulate(32, 32)((r, c) =>
            ((id * 11 + (id % 7 + 1) * r * c + r * 17 + c * 23) % 256).toInt)
          Multimodal.MediaRow(id, Multimodal.MediaMeta("image", 32, 32, 0, 0L),
            graft.multimodal.Codec.encodeBmp24(gray))
        }
      Multimodal.imageBlockhash(media)
        .select(col("media_id"), posexplode(col("bh")).as(Seq("band", "bh_value")))
        .orderBy("media_id", "band")
    },
    Some(s"""WITH px AS (SELECT doc_id AS media_id, r, c,
        (doc_id*11 + (doc_id%7+1)*r*c + r*17 + c*23) % 256 AS v
      FROM documents, range(0, 32) rr(r), range(0, 32) cc(c)),
      $blockhashSql
      SELECT media_id, band, bh_value FROM bh ORDER BY media_id, band"""))

  /** Blockhash near-dup pairs: every 5th doc's image is a copy of its
    * predecessor's with ONE pixel shifted by +128 — a real small edit,
    * so the pair's hashes differ in a few bits. The banded hamming
    * join ([[Multimodal.blockhashNearDupPairs]], 4 bands of 64 bits —
    * exact recall ≤ distance 3 by pigeonhole, the q93 calculus) finds
    * exactly the copy pairs; the oracle replays hash, banding, bucket
    * join, and bit_count verification. */
  val q122 = Q("q122_blockhash_neardup",
    (s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val src = if (id % 5 == 0 && id >= 5) id - 1 else id
          val gray = Array.tabulate(32, 32) { (r, c) =>
            val base = ((src * 11 + (src % 7 + 1) * r * c + r * 17 + c * 23) % 256).toInt
            if (id != src && r == 0 && c == 0) (base + 128) % 256 else base
          }
          Multimodal.MediaRow(id, Multimodal.MediaMeta("image", 32, 32, 0, 0L),
            graft.multimodal.Codec.encodeBmp24(gray))
        }
      Multimodal.blockhashNearDupPairs(
          Multimodal.imageBlockhash(media), maxHamming = 16)
        .orderBy("id_a", "id_b")
    },
    Some(s"""WITH imgs AS (SELECT doc_id AS media_id,
        CASE WHEN doc_id % 5 = 0 AND doc_id >= 5 THEN doc_id - 1 ELSE doc_id END AS src
      FROM documents),
      px AS (SELECT media_id, r, c,
        CASE WHEN media_id <> src AND r = 0 AND c = 0
          THEN ((src*11 + (src%7+1)*r*c + r*17 + c*23) % 256 + 128) % 256
          ELSE (src*11 + (src%7+1)*r*c + r*17 + c*23) % 256 END AS v
      FROM imgs, range(0, 32) rr(r), range(0, 32) cc(c)),
      $blockhashSql,
      hams AS (SELECT a.media_id AS id_a, b.media_id AS id_b,
          CAST(SUM(bit_count(CAST(xor(a.bh_value, b.bh_value) AS BIGINT))) AS BIGINT) AS hamming
        FROM bh a JOIN bh b ON a.band = b.band AND a.media_id < b.media_id
        GROUP BY a.media_id, b.media_id),
      cand AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        FROM bh a JOIN bh b
        ON a.band = b.band AND a.bh_value = b.bh_value AND a.media_id < b.media_id)
      SELECT id_a, id_b, hamming FROM cand JOIN hams USING (id_a, id_b)
      WHERE hamming <= 16 ORDER BY id_a, id_b"""))

  /** Containment near-dup ([[Dedup.overlapPairs]]): rare-shingle
    * prefix filtering generates the candidates (per-hash fan-out
    * bounded by maxDf² — the quadratic valve, frequent shingles
    * excluded and cap-reported), exact overlap coefficient
    * |A∩B|/min(|A|,|B|) verifies. The subsumption class the
    * Jaccard-tuned LSH (q26) deliberately does not target. The oracle
    * replays df computation, the rare cut, the candidate join, and
    * both verification metrics. */
  val q123 = Q("q123_containment_pairs",
    (s, dir) => Dedup.overlapPairs(
        t(s, dir, "documents"), "doc_id", "text", Dedup.WordShingles(2),
        minOverlap = 0.8, maxDf = 10)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
      sh AS (SELECT doc_id, ${wordShingleSql(2, "toks")} AS s FROM tk),
      $hashSetCte,
      ex AS (SELECT doc_id, unnest(h) AS hv FROM shh),
      dfc AS (SELECT hv, COUNT(*) AS dfn FROM ex GROUP BY hv),
      rd AS (SELECT doc_id, hv FROM ex JOIN (SELECT hv FROM dfc WHERE dfn <= 10) r USING (hv)),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM rd a JOIN rd b ON a.hv = b.hv AND a.doc_id < b.doc_id)
      SELECT id_a, id_b, overlap, jaccard FROM (
        SELECT id_a, id_b,
          CAST(len(list_intersect(sa.h, sb.h)) AS DOUBLE)
            / CAST(least(len(sa.h), len(sb.h)) AS DOUBLE) AS overlap,
          ${jaccardSql("sa.h", "sb.h")} AS jaccard
        FROM cand JOIN shh sa ON sa.doc_id = id_a JOIN shh sb ON sb.doc_id = id_b) x
      WHERE overlap >= 0.8 ORDER BY id_a, id_b"""))

  // ---------------------------------------------------------------- //
  // Model-based quality filtering (LmQuality: CCNet / NB / DSIR)     //
  // ---------------------------------------------------------------- //

  /** DuckDB replay of [[graft.functions.FloorLog2Ratio]]: exact
    * `⌊log2(num/den)⌋` from binary-string lengths — `num`/`den` must
    * be simple BIGINT column refs (each is referenced three times). */
  private def fl2rSql(num: String, den: String): String =
    s"""((length(bin($num)) - length(bin($den))) -
        CASE WHEN ($num >> (length(bin($num)) - length(bin($den)))) < $den
        THEN 1 ELSE 0 END)"""

  /** Whitespace tokens + adjacent-transition CTEs shared by the
    * LmQuality oracles (mirrors [[graft.text.LmQuality.toks]] /
    * `transitions`: trim, split, ''-token filter, 1-based zip). */
  private val lmToksCte =
    """lmtk AS (SELECT doc_id, lang, source,
       list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
       FROM documents)"""
  private def lmTransSql(from: String, as_ : String): String =
    s"""$as_ AS (SELECT doc_id, tk[i] AS prev, tk[i+1] AS w
       FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM $from))"""

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
  private val postingsCte =
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
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("pa"), col("b.pk").as("pb"))
      graft.operators.Triangles.countsRow(pairs, "pa", "pb")
    },
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
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("pa"), col("b.pk").as("pb"))
      graft.operators.Triangles.perNode(pairs, "pa", "pb")
        .orderBy(col("n_triangles").desc, col("node"))
        .limit(50)
    },
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
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("pa"), col("b.pk").as("pb"))
      graft.operators.KCore.kCore(pairs, "pa", "pb", k = 80)
        .orderBy("node")
    },
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
  private def fsPairs(s: SparkSession, dir: String): DataFrame = {
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

  private val fsFields: Seq[graft.operators.Linkage.FieldPair] = Seq(
    ("acctbal", "bal_a", "bal_b"),
    ("name", "name_a", "name_b"),
    ("segment", "seg_a", "seg_b"))

  /** The SQL twin of [[fsPairs]] + per-field agreement counts. */
  private val fsPairsSql =
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
  private val fsWeightsSql =
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
      val kept2 = kept1.join(entOk, Seq("doc_id"), "left_semi")
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
  private def emOracleSql(iters: Int): String = {
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

  /** UNSUPERVISED Fellegi–Sunter weight estimation
    * ([[graft.operators.Linkage.fsEmParams]]/`fsEmWeights` — FS §3 /
    * Winkler 1988, the label-free path real linkage runs): EM over the
    * 2^F agreement-pattern counts of the q139 blocked candidate pairs,
    * every E/M step exact fixed-point integer arithmetic on the ppm
    * lattice, 10 iterations. The labels exist in the fixture but are
    * NOT given to the estimator; the oracle unrolls all ten iterations
    * (pattern counts → HUGEINT posterior → floored M-step → clamp), so
    * any drift in init, quantization order, or the clamp rule
    * hash-mismatches. */
  val q143 = Q("q143_fs_em_weights",
    (s, dir) => graft.operators.Linkage.fsEmWeights(
        fsPairs(s, dir), fsFields, iters = 10)
      .orderBy("field"),
    Some(s"""${emOracleSql(10)}
      SELECT field, m_ppm, u_ppm, w_agree_bits, w_disagree_bits
      FROM emw ORDER BY field"""))

  /** Deterministic BM25 ranking ([[graft.text.Search.rankByBm25Bits]],
    * Robertson–Spärck Jones with Lucene's non-negative idf): top-20
    * documents for the q132 query under the exact-integer
    * quantization (avg-length milli-tokens, length factor, saturation
    * — three stated floors, k1=1.2/b=0.75 as milli-integers). The
    * oracle replays every floor with `//` integer division, so a
    * drift in ANY quantization point, the idf ratio, or the tiebreak
    * hash-mismatches. */
  val q144 = Q("q144_bm25_rank",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.text.Search.rankByBm25Bits(
          graft.text.Search.buildPostings("doc_id", "text")(docs),
          query = Seq("table", "hash", "scan"), nDocs = docs.count(), k = 20)
        .orderBy(col("score_milli_bits").desc, col("id"))
    },
    Some(s"""WITH $lmToksCte,
      $postingsCte,
      dls AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS dl FROM post GROUP BY 1),
      nd AS (SELECT COUNT(*) AS n FROM documents),
      am AS (SELECT (1000 * (SELECT SUM(dl) FROM dls)) // n AS avgm
        FROM nd),
      qt AS (SELECT * FROM post WHERE term IN ('table', 'hash', 'scan')),
      idf AS (SELECT term, CAST(COUNT(DISTINCT id) AS BIGINT) AS df
        FROM qt GROUP BY 1),
      idfb AS (SELECT term, ${fl2rSql("(2*n+2)", "(2*df+1)")} AS ib
        FROM idf CROSS JOIN nd),
      tf AS (SELECT term, id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM qt GROUP BY 1, 2),
      lfx AS (SELECT t.term, t.id, t.tf,
          ((1000 - 750) * avgm + 750 * 1000 * dl) // avgm AS lf
        FROM tf t JOIN dls USING (id) CROSS JOIN am),
      sc AS (SELECT id,
          SUM(ib * ((1000000 * tf * (1200 + 1000)) //
            (1000000 * tf + 1200 * lf))) AS score
        FROM lfx JOIN idfb USING (term) GROUP BY 1)
      SELECT id, CAST(score AS BIGINT) AS score_milli_bits
      FROM sc ORDER BY score_milli_bits DESC, id LIMIT 20"""))

  /** Phrase search against the STORED postings index
    * ([[graft.text.Search.writePostingsIndex]] →
    * [[graft.text.Search.phraseSearchStored]] — the production path
    * q131 only proxied): the corpus's postings land as a managed
    * table bucketed+sorted by term, then the corpus's top BIGRAM is
    * searched by probing THAT table, so each term filter is a pruned
    * scan of the index at rest (cost follows posting-list size, not
    * corpus size). The oracle replays gram selection, postings, and
    * the positional join from the raw corpus — a divergence anywhere
    * in the write→read round trip hash-mismatches. */
  val q145 = Q("q145_phrase_stored",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val phrase = graft.text.Search.topNgram("doc_id", "text", 2)(docs)
      graft.text.Search.writePostingsIndex(docs, "doc_id", "text",
        "graft_q145_postings", numBuckets = 8)
      graft.text.Search.phraseSearchStored(s, "graft_q145_postings", phrase)
        .orderBy("id", "pos")
    },
    Some(s"""WITH $lmToksCte,
      grams AS (SELECT array_to_string(list_slice(tk, i + 1, i + 2), ' ') AS g
        FROM (SELECT tk, unnest(range(0, len(tk) - 1)) AS i FROM lmtk)),
      top AS (SELECT string_split(g, ' ') AS ph FROM (
        SELECT g, COUNT(*) AS c FROM grams GROUP BY 1
        ORDER BY c DESC, g LIMIT 1)),
      $postingsCte
      SELECT p0.id, CAST(p0.pos AS INT) AS pos
      FROM post p0
      JOIN post p1 ON p1.id = p0.id AND p1.pos = p0.pos + 1
      CROSS JOIN top
      WHERE p0.term = ph[1] AND p1.term = ph[2]
      ORDER BY p0.id, p0.pos"""))

  /** MOTION-COMPENSATED video round trip
    * ([[graft.multimodal.Codec.encodeAviMcv]] — the H.261/MPEG-style
    * block-matching P-frame construction, lossless by mod-256
    * residuals): per document, a 24×32 scene translating
    * `(1 + id%3, id%2)` px/frame is encoded as one keyframe + four
    * P-frames, then frames 0/2/4 are decoded through the GOP seek
    * path — frame 4's pixels exist only through the motion-vector
    * chain of all four P-frames. The oracle computes every pixel from
    * the closed-form translation formula, so ANY motion-compensation,
    * residual, chunking, or seek bug hash-mismatches. (CodecSpec pins
    * separately that translation compresses to SKIP blocks — the
    * motion search is load-bearing, not decorative.) */
  val q146 = Q("q146_avi_mcv_motion_sums",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val dx0 = (1 + id % 3).toInt; val dy0 = (id % 2).toInt
          def px(f: Int, r: Int, c: Int) =
            ((id * 7 + (r + f * dy0).toLong * 31 + (c + f * dx0).toLong * 17) % 256).toInt
          val frames = (0 until 5).map(f => Array.tabulate(24, 32)((r, c) => px(f, r, c)))
          val avi = graft.multimodal.Codec.encodeAviMcv(
            frames, fps = 5, keyframeInterval = 5)
          require(graft.multimodal.Codec.aviFrameCount(avi) == 5, "MCV8 stream lost frames")
          val (fps, picked) = graft.multimodal.Codec.decodeAviFrames(
            avi, Multimodal.sampleFrameIndices(5, stride = 2, maxFrames = 8))
          require(fps == 5, "MCV8 round-trip lost fps")
          for {
            (fi, g) <- picked
            br <- 0 until 3; bc <- 0 until 4
          } yield {
            var sum = 0L
            var r = br * 8
            while (r < br * 8 + 8) {
              var c = bc * 8
              while (c < bc * 8 + 8) { sum += g(r)(c); c += 1 }
              r += 1
            }
            (id, fi.toLong, br.toLong, bc.toLong, sum)
          }
        }
        .toDF("media_id", "frame_idx", "block_row", "block_col", "pixel_sum")
        .orderBy("media_id", "frame_idx", "block_row", "block_col")
    },
    Some("""WITH px AS (SELECT doc_id AS media_id, CAST(f AS BIGINT) AS f,
        CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
        (doc_id*7 + (r + f*(doc_id%2))*31 + (c + f*(1 + doc_id%3))*17) % 256 AS v
      FROM documents, (VALUES (0),(2),(4)) t(f), range(0, 24) u(r), range(0, 32) w(c))
      SELECT media_id, f AS frame_idx, r // 8 AS block_row, c // 8 AS block_col,
        CAST(SUM(v) AS BIGINT) AS pixel_sum
      FROM px GROUP BY media_id, f, r // 8, c // 8
      ORDER BY media_id, frame_idx, block_row, block_col"""))

  /** SCD TYPE 2 versioned-dimension apply ([[graft.store.Store.scd2Init]]
    * / `scd2Apply` — Kimball type 2; the reference's docs name it the
    * follow-on to their TRUNCATE+reload dims): customers snapshot at
    * t=100 folds one change batch (segment change at 200 for every 3rd
    * key, attribute-identical row at 220 for every 5th — a NO-OP
    * unless a key-%15 change-back, a second change at 300 for every
    * 7th, brand-new keys at 250), then every version row is emitted.
    * The oracle replays the timeline contract 1:1 (per-key order,
    * run-dedup by null-safe lag compare, lead() closing) — a drift in
    * tie rules, no-op suppression, or chaining hash-mismatches. */
  val q147 = Q("q147_scd2_versions",
    (s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
      val init = graft.store.Store.scd2Init(
        cust.withColumn("eff", lit(100L)), Seq("k"), "eff")
      val changes =
        cust.filter(col("k") % 3 === 0)
          .select(col("k"), concat(col("seg"), lit("-X")).as("seg"), lit(200L).as("eff"))
        .unionByName(cust.filter(col("k") % 5 === 0)
          .select(col("k"), col("seg"), lit(220L).as("eff")))
        .unionByName(cust.filter(col("k") % 7 === 0)
          .select(col("k"), concat(col("seg"), lit("-Y")).as("seg"), lit(300L).as("eff")))
        .unionByName(cust.filter(col("k") % 11 === 0)
          .select((col("k") + 1000000L).as("k"), lit("NEW").as("seg"), lit(250L).as("eff")))
      graft.store.Store.scd2Apply(init, changes, Seq("k"), "eff")
        .orderBy("k", "valid_from")
    },
    Some("""WITH cust AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer),
      tl AS (
        SELECT k, seg, CAST(100 AS BIGINT) AS vf, 0 AS src FROM cust
        UNION ALL SELECT k, seg || '-X', 200, 1 FROM cust WHERE k % 3 = 0
        UNION ALL SELECT k, seg, 220, 1 FROM cust WHERE k % 5 = 0
        UNION ALL SELECT k, seg || '-Y', 300, 1 FROM cust WHERE k % 7 = 0
        UNION ALL SELECT k + 1000000, 'NEW', 250, 1 FROM cust WHERE k % 11 = 0),
      lg AS (SELECT k, seg, vf, src,
          lag(seg) OVER (PARTITION BY k ORDER BY vf, src) AS prev
        FROM tl),
      kept AS (SELECT k, seg, vf, src FROM lg
        WHERE prev IS NULL OR prev IS DISTINCT FROM seg),
      fin AS (SELECT k, seg, vf AS valid_from,
          lead(vf) OVER (PARTITION BY k ORDER BY vf, src) AS valid_to
        FROM kept)
      SELECT k, seg, valid_from, valid_to, valid_to IS NULL AS is_current
      FROM fin ORDER BY k, valid_from"""))

  /** End-to-end UNSUPERVISED linkage: q143's EM weights (no labels
    * anywhere in training) score the blocked pairs and decide at ≥ 10
    * bits; the output confusion matrix is judged against the planted
    * truth — so the whole label-free chain (pattern counts → EM →
    * quantized weights → literal-sum scoring → threshold) must land
    * the same decisions in both engines. */
  val q148 = Q("q148_fs_em_linkage",
    (s, dir) => {
      val pairs = fsPairs(s, dir)
      val w = graft.operators.Linkage.fsEmWeights(pairs, fsFields, iters = 10)
        .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
      graft.operators.Linkage.scoreFs(pairs, fsFields, w)
        .withColumn("predicted", col("score_bits") >= lit(10L))
        .groupBy("predicted", "is_match")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("predicted", "is_match")
    },
    Some(s"""${emOracleSql(10)},
      w AS (SELECT
        MAX(CASE WHEN field = 'name' THEN w_agree_bits END) AS name_wa,
        MAX(CASE WHEN field = 'name' THEN w_disagree_bits END) AS name_wd,
        MAX(CASE WHEN field = 'acctbal' THEN w_agree_bits END) AS bal_wa,
        MAX(CASE WHEN field = 'acctbal' THEN w_disagree_bits END) AS bal_wd,
        MAX(CASE WHEN field = 'segment' THEN w_agree_bits END) AS seg_wa,
        MAX(CASE WHEN field = 'segment' THEN w_disagree_bits END) AS seg_wd
      FROM emw),
      sc AS (SELECT is_match,
        (CASE WHEN name_a IS NOT DISTINCT FROM name_b THEN name_wa ELSE name_wd END
         + CASE WHEN bal_a IS NOT DISTINCT FROM bal_b THEN bal_wa ELSE bal_wd END
         + CASE WHEN seg_a IS NOT DISTINCT FROM seg_b THEN seg_wa ELSE seg_wd END)
          AS score
      FROM prs CROSS JOIN w)
      SELECT score >= 10 AS predicted, is_match,
        CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM sc GROUP BY 1, 2 ORDER BY predicted, is_match"""))

  /** Exact per-group percentiles AT SCALE
    * ([[graft.operators.GroupedNtile.exactPercentilesDisc]] — the true
    * scale path q40's scaladoc deferred): quartiles + max of integer
    * order cents per priority class via the two-phase rank and a
    * rank-equality filter — no per-group collect-and-sort buffer. The
    * probabilities are exact rationals, so the target rank
    * `⌈num·n/den⌉` is integer arithmetic; the oracle replays the rule
    * with a row_number window. */
  val q149 = Q("q149_exact_percentiles_scale",
    (s, dir) => graft.operators.GroupedNtile.exactPercentilesDisc(
        Seq("o_orderpriority"), "v",
        probs = Seq((1L, 4L), (1L, 2L), (3L, 4L), (1L, 1L)))(
        t(s, dir, "orders").select(col("o_orderpriority"),
          cents(col("o_totalprice")).as("v")))
      .orderBy("o_orderpriority", "p_den", "p_num"),
    Some(s"""WITH w AS (SELECT o_orderpriority,
        ${centsSql("o_totalprice")} AS v FROM orders),
      r AS (SELECT o_orderpriority, v,
          row_number() OVER (PARTITION BY o_orderpriority ORDER BY v) AS rn,
          COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM w),
      p AS (SELECT * FROM (VALUES (1, 4), (1, 2), (3, 4), (1, 1)) t(num, den))
      SELECT o_orderpriority, CAST(num AS BIGINT) AS p_num,
        CAST(den AS BIGINT) AS p_den, v AS value
      FROM r CROSS JOIN p WHERE rn = (num * n + den - 1) // den
      ORDER BY o_orderpriority, p_den, p_num"""))

  /** Point-in-time read of the q147 versioned dim
    * ([[graft.store.Store.scd2AsOf]]): the dimension AS OF t=250 —
    * between the t=200/220 changes and the t=300 ones, with the t=250
    * new keys just born — one row per key, exercising the half-open
    * `[valid_from, valid_to)` rule at both edges. The oracle replays
    * the q147 timeline and applies the same containment filter. */
  val q150 = Q("q150_scd2_asof",
    (s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
      val init = graft.store.Store.scd2Init(
        cust.withColumn("eff", lit(100L)), Seq("k"), "eff")
      val changes =
        cust.filter(col("k") % 3 === 0)
          .select(col("k"), concat(col("seg"), lit("-X")).as("seg"), lit(200L).as("eff"))
        .unionByName(cust.filter(col("k") % 5 === 0)
          .select(col("k"), col("seg"), lit(220L).as("eff")))
        .unionByName(cust.filter(col("k") % 7 === 0)
          .select(col("k"), concat(col("seg"), lit("-Y")).as("seg"), lit(300L).as("eff")))
        .unionByName(cust.filter(col("k") % 11 === 0)
          .select((col("k") + 1000000L).as("k"), lit("NEW").as("seg"), lit(250L).as("eff")))
      graft.store.Store.scd2AsOf(
          graft.store.Store.scd2Apply(init, changes, Seq("k"), "eff"), lit(250L))
        .select("k", "seg", "valid_from")
        .orderBy("k")
    },
    Some("""WITH cust AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer),
      tl AS (
        SELECT k, seg, CAST(100 AS BIGINT) AS vf, 0 AS src FROM cust
        UNION ALL SELECT k, seg || '-X', 200, 1 FROM cust WHERE k % 3 = 0
        UNION ALL SELECT k, seg, 220, 1 FROM cust WHERE k % 5 = 0
        UNION ALL SELECT k, seg || '-Y', 300, 1 FROM cust WHERE k % 7 = 0
        UNION ALL SELECT k + 1000000, 'NEW', 250, 1 FROM cust WHERE k % 11 = 0),
      lg AS (SELECT k, seg, vf, src,
          lag(seg) OVER (PARTITION BY k ORDER BY vf, src) AS prev
        FROM tl),
      kept AS (SELECT k, seg, vf, src FROM lg
        WHERE prev IS NULL OR prev IS DISTINCT FROM seg),
      fin AS (SELECT k, seg, vf AS valid_from,
          lead(vf) OVER (PARTITION BY k ORDER BY vf, src) AS valid_to
        FROM kept)
      SELECT k, seg, valid_from
      FROM fin
      WHERE valid_from <= 250 AND (valid_to IS NULL OR 250 < valid_to)
      ORDER BY k"""))

  /** INCREMENTAL connected components
    * ([[graft.operators.ConnectedComponents.incrementalComponents]] —
    * the standing near-dup loop's missing maintenance piece): batch 1's
    * arithmetic edge set resolves to exact min-labels, then batch 2
    * FOLDS IN through the contracted delta graph (touched components +
    * new vertices only, never the history). The oracle computes plain
    * components of the UNION graph by recursive-CTE transitive closure
    * — so the fold must land exactly where a full recompute does,
    * merges, bridges, and new vertices included. */
  val q151 = Q("q151_incremental_components",
    (s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val b1 = cust.filter(col("k") % 3 === 0)
        .select(col("k").as("id_a"), (col("k") + 1L + col("k") % 4).as("id_b"))
      val b2 = cust.filter(col("k") % 4 === 1)
        .select(col("k").as("id_a"), (col("k") + 2L + col("k") % 5).as("id_b"))
      graft.operators.ConnectedComponents.incrementalComponents(
          graft.operators.ConnectedComponents.components(b1), b2)
        .select(col("id").as("node"), col("comp").as("component"))
        .orderBy("node")
    },
    Some("""WITH RECURSIVE b AS (
        SELECT c_custkey AS a, c_custkey + 1 + c_custkey % 4 AS bb
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_custkey + 2 + c_custkey % 5
        FROM customer WHERE c_custkey % 4 = 1),
      edges AS (SELECT a AS src, bb AS dst FROM b
        UNION SELECT bb, a FROM b),
      walk(src, reach) AS (
        SELECT src, src FROM (SELECT DISTINCT src FROM edges)
        UNION
        SELECT w.src, e.dst FROM walk w JOIN edges e ON w.reach = e.src)
      SELECT src AS node, CAST(MIN(reach) AS BIGINT) AS component
      FROM walk GROUP BY src ORDER BY node"""))

  /** ATOMIC manifest-store lifecycle ([[graft.store.Manifest]]): build
    * a versioned table from thirds of `orders` through the full
    * protocol — overwrite-commit, append-commit, reader-safe compact,
    * gc past retention, append again — then aggregate the final
    * snapshot. The oracle replays the LOGICAL content (all of orders)
    * in plain SQL: the store's whole point is that no sequence of
    * commits/compactions/gcs can make the read view diverge from the
    * logical table, so hash equality here is the storage protocol's
    * correctness statement, not just an aggregate check. */
  val q152 = Q("q152_manifest_lifecycle",
    (s, dir) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_q152").toString + "/orders_t"
      val orders = t(s, dir, "orders")
      import graft.store.Manifest
      Manifest.overwrite(orders.filter(col("o_orderkey") % 3 === 0), root)
      Manifest.append(orders.filter(col("o_orderkey") % 3 === 1), root)
      Manifest.compact(s, root)
      Manifest.gc(s, root, keepVersions = 1)
      Manifest.append(orders.filter(col("o_orderkey") % 3 === 2), root)
      Manifest.read(s, root)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .orderBy("status")
    },
    Some(s"""SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
      ${dsumSql("o_totalprice")} AS total_price
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** STREAMING CURATION PIPELINE CAPSTONE
    * ([[graft.streaming.StreamOps.curationPipelineSink]]): a REAL
    * multi-batch streamed run — documents arrive in three micro-batches
    * (doc_id mod 3), each batch flowing clean → intra-batch exact dedup
    * → near-dup screen-and-admit against the standing corpus index →
    * per-batch admitted sink → split-SCD2 per-source ingest profile on
    * atomic manifest roots. The result joins every admitted doc to the
    * SCD2 version in force at its batch, so ONE oracle hash covers the
    * admitted corpus, the batch partitioning, and the versioned
    * timeline together. The SQL replays the entire sequential process:
    * cleaned text, per-batch exact dedup, batch 1 screened against
    * batch 0's admissions, batch 2 against both, then the profile
    * timeline with SCD2 run-dedup and lead() closure. Batch ingestion
    * collects each slice to the driver for MemoryStream — test-harness
    * plumbing (bounded: the documents table), not the engine path. */
  val q153 = Q("q153_curation_pipeline",
    (s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val docs = t(s, dir, "documents").select("doc_id", "text", "source")
      val base = java.nio.file.Files.createTempDirectory("graft_q153").toString
      val hashedT = "graft_q153_hashed"; val bandedT = "graft_q153_banded"
      Dedup.writeCorpusIndex(docs.limit(0), "doc_id", "text",
        Dedup.CharShingles(5), 8, 4, hashedT, bandedT)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String)]
      val q = graft.streaming.StreamOps.curationPipelineSink(
        input.toDF().toDF("doc_id", "text", "source"),
        "doc_id", "text", "source", Dedup.CharShingles(5), 8, 4,
        hashedT, bandedT, minJaccard = 0.5,
        s"$base/admitted", s"$base/scd2_open", s"$base/scd2_closed",
        s"$base/ckpt")
      (0 to 2).foreach { bnum =>
        input.addData(docs.filter(col("doc_id") % 3 === bnum)
          .as[(Long, String, String)].collect().toSeq: _*)
        q.processAllAvailable()
      }
      q.stop()
      val admitted = s.read.parquet(s"$base/admitted")
      val versions = graft.store.Store.scd2VersionsAtomic(
        s, s"$base/scd2_open", s"$base/scd2_closed")
      admitted.as("d").join(versions.as("v"),
          col("d.source") === col("v.source") &&
            col("v.valid_from") <= col("d.batch_id") &&
            (col("v.valid_to").isNull || col("d.batch_id") < col("v.valid_to")))
        .select(col("d.doc_id"), col("d.source"),
          col("d.batch_id").cast(LongType).as("batch"),
          col("v.valid_from"), col("v.n_admitted"), col("v.max_admitted_id"))
        .orderBy("doc_id")
    },
    Some(s"""WITH cd AS (SELECT doc_id, source,
        lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS text,
        doc_id % 3 AS batch FROM documents),
      ex AS (SELECT doc_id, source, text, batch FROM (
        SELECT *, row_number() OVER (PARTITION BY batch, text ORDER BY doc_id) AS rn
        FROM cd) WHERE rn = 1),
      sh AS (SELECT doc_id, ${shingleSql(5)} AS s FROM ex),
      $hashSetCte,
      ${sigBandedSql(8, 4)},
      adm0 AS (SELECT doc_id FROM ex WHERE batch = 0),
      c1 AS (SELECT DISTINCT a.doc_id AS bid, b.doc_id AS cid
             FROM banded a JOIN banded b
             ON a.band = b.band AND a.bandsig = b.bandsig
             JOIN ex ea ON ea.doc_id = a.doc_id AND ea.batch = 1
             JOIN adm0 c ON c.doc_id = b.doc_id),
      d1 AS (SELECT DISTINCT bid FROM c1
             JOIN shh sa ON sa.doc_id = bid JOIN shh sb ON sb.doc_id = cid
             WHERE ${jaccardSql("sa.h", "sb.h")} >= 0.5),
      adm1 AS (SELECT doc_id FROM ex WHERE batch = 1
               AND doc_id NOT IN (SELECT bid FROM d1)),
      corp1 AS (SELECT doc_id FROM adm0 UNION ALL SELECT doc_id FROM adm1),
      c2 AS (SELECT DISTINCT a.doc_id AS bid, b.doc_id AS cid
             FROM banded a JOIN banded b
             ON a.band = b.band AND a.bandsig = b.bandsig
             JOIN ex ea ON ea.doc_id = a.doc_id AND ea.batch = 2
             JOIN corp1 c ON c.doc_id = b.doc_id),
      d2 AS (SELECT DISTINCT bid FROM c2
             JOIN shh sa ON sa.doc_id = bid JOIN shh sb ON sb.doc_id = cid
             WHERE ${jaccardSql("sa.h", "sb.h")} >= 0.5),
      adm2 AS (SELECT doc_id FROM ex WHERE batch = 2
               AND doc_id NOT IN (SELECT bid FROM d2)),
      admitted AS (SELECT e.doc_id, e.source, e.batch FROM ex e
        JOIN (SELECT doc_id FROM adm0 UNION ALL SELECT doc_id FROM adm1
              UNION ALL SELECT doc_id FROM adm2) a USING (doc_id)),
      prof AS (SELECT source, batch AS eff, COUNT(*) AS n_admitted,
          MAX(doc_id) AS max_admitted_id
        FROM admitted GROUP BY source, batch),
      seq AS (SELECT source, eff, n_admitted, max_admitted_id,
          LAG(n_admitted) OVER w AS pn, LAG(max_admitted_id) OVER w AS pm
        FROM prof WINDOW w AS (PARTITION BY source ORDER BY eff)),
      kept AS (SELECT source, eff AS valid_from, n_admitted, max_admitted_id
        FROM seq WHERE pn IS NULL OR pn <> n_admitted OR pm <> max_admitted_id),
      vers AS (SELECT source, valid_from,
          LEAD(valid_from) OVER (PARTITION BY source ORDER BY valid_from) AS valid_to,
          n_admitted, max_admitted_id FROM kept)
      SELECT d.doc_id, d.source, CAST(d.batch AS BIGINT) AS batch,
        v.valid_from, v.n_admitted, v.max_admitted_id
      FROM admitted d JOIN vers v ON v.source = d.source
        AND v.valid_from <= d.batch AND (v.valid_to IS NULL OR d.batch < v.valid_to)
      ORDER BY d.doc_id"""))

  /** All registered queries, in gate order. */
  def all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25,
    q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36, q37,
    q38, q39, q40, q41, q42, q43, q44, q45, q46, q47, q48, q49, q50,
    q51, q52, q53, q54, q55, q56, q57, q58, q59, q60, q61, q62, q63, q64,
    q65, q66, q67, q68, q69, q70, q71, q72, q73, q74, q75, q76, q77, q78, q79,
    q80, q81, q82, q83, q84, q85, q86, q87, q88, q89, q90, q91, q92, q93, q94, q95, q96, q97, q98,
    q99, q100, q101, q102, q103, q104, q105, q106, q107, q108, q109, q110,
    q111, q112, q113, q114, q115, q116, q117, q118, q119, q120, q121, q122, q123,
    q124, q125, q126, q127, q128, q129, q130, q131, q132, q133, q134, q135, q136, q137, q138, q139, q140, q141, q142,
    q143, q144, q145, q146, q147, q148, q149, q150, q151, q152, q153)
}
