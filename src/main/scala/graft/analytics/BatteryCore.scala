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

/** Shared cross-engine helpers + the reference-parity / relational core block (q01-q25).
  *
  * One link of the [[Battery]] mixin chain — the battery is split by
  * family for reviewability; the chain preserves the original single-
  * object member order (and with it val-initialization order) exactly.
  */
trait BatteryCore {

  protected def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)
  protected val dec = DecimalType(18, 6)
  protected def d(c: Column): Column = c.cast(dec)
  /** Exact decimal sum rendered as double — bit-identical across engines. */
  protected def dsum(c: Column): Column = sum(d(c)).cast("double")
  protected def dsumSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"

  /** Money columns live on the cent grid (2 decimals). Quantize to
    * integer cents so products/sums are exact BIGINT arithmetic, then
    * divide once at the end: one correctly-rounded IEEE division of
    * identical exact operands ⇒ bit-identical doubles in any engine.
    * (A DECIMAL-product path differs by 1 ulp between Spark and DuckDB
    * because their wide-decimal→double casts round differently.) */
  protected def cents(c: Column): Column = round(c * 100, 0).cast(LongType)
  protected def centsSql(e: String): String = s"CAST(round($e * 100) AS BIGINT)"
  /** SUM(price×(1−discount)) as exact integer 1e-4-dollar units / 1e4. */
  protected def discRevenue: Column =
    (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
      .cast("double") / lit(1e4))
  protected def discRevenueSql: String =
    s"CAST(SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS DOUBLE) / 10000.0"

  /** The parts-co-ordered-together pair list feeding the graph family
    * (q134/q135/q136/q154): one canonical (pa ≤ pb) row per unordered
    * row pair of lineitems sharing an order. Built as ONE hash
    * aggregate (collect the order's parts) + in-stage index-pair
    * expansion — the r17 form self-joined lineitem on the order key,
    * paying two sorts and a merge join for the same multiset. Order
    * groups are tiny (≤7 lineitems), so the collected arrays and the
    * i<j expansion are a few elements each; equal-part pairs (pa = pb)
    * are emitted and dropped by the canonicalizers' u ≠ v filter,
    * exactly as the join's a.pk < b.pk predicate dropped them. The
    * downstream DISTINCT sees the identical pair multiset, so every
    * oracle result is bit-identical. */
  protected def coOrderPairs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(collect_list(col("pk")).as("pks"))
      .select(explode(expr(
        """flatten(transform(pks, (x, i) ->
             transform(slice(pks, i + 2, size(pks)), y ->
               named_struct('pa', least(x, y), 'pb', greatest(x, y)))))"""))
        .as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))

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
  protected def shingleSql(n: Int, textExpr: String = "text"): String =
    s"""CASE WHEN len($textExpr) >= $n
       THEN list_distinct(list_transform(range(1, len($textExpr)-$n+2),
            i -> substr($textExpr, CAST(i AS INT), $n)))
       ELSE [$textExpr] END"""

  /** DuckDB word-n-gram shingle-set (matches Dedup.wordShingles);
    * `toks` must name a token-list column. */
  protected def wordShingleSql(n: Int, toks: String): String =
    s"""CASE WHEN len($toks) >= $n
       THEN list_distinct(list_transform(range(0, len($toks)-$n+1),
            i -> array_to_string(list_slice($toks, CAST(i+1 AS INT), CAST(i+$n AS INT)), ' ')))
       ELSE [array_to_string($toks, ' ')] END"""

  /** DuckDB CTEs `sig` + `banded` + `cand` replicating
    * Dedup.minhashCandidatePairs over the hash-set CTE `shh(doc_id, h)`
    * — permutation minhash (a_i·(x mod P)+b_i) mod P with the exact
    * constants from Dedup.permConsts interpolated as literals. */
  protected def sigBandedSql(bands: Int, rpb: Int): String = {
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

  protected def lshCandSql(bands: Int, rpb: Int): String =
    s"""${sigBandedSql(bands, rpb)},
       cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM banded a JOIN banded b
                ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id)"""

  /** CTE turning shingle-string lists `sh(doc_id, s)` into 60-bit md5
    * hash sets (mirrors Dedup.shingleHash60). */
  protected val hashSetCte =
    """shh AS (SELECT doc_id,
       list_distinct(list_transform(s, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS h
       FROM sh)"""

  protected def jaccardSql(ha: String, hb: String): String =
    s"""CAST(len(list_intersect($ha, $hb)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat($ha, $hb))) AS DOUBLE)"""
}
