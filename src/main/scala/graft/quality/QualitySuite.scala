package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One quality-check outcome. */
case class CheckResult(check: String, passed: Boolean, violations: Long, detail: String)

/** First-class data-quality suite (SURVEY §3 EP-3). The reference runs
  * these as ad-hoc notebook asserts (docs/quality_report.md:518-572);
  * here they are engine operators returning typed results, and they
  * replace MySQL's PK/UNIQUE/FK constraint enforcement (database.py DDL)
  * which Spark intentionally does not do.
  */
object QualitySuite {

  /** PK/UNIQUE check: zero keys with more than one row
    * (quality_report.md:518-530). */
  def uniqueness(df: DataFrame, keys: Seq[String]): CheckResult = {
    val dups = df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()
    CheckResult(s"unique(${keys.mkString(",")})", dups == 0, dups,
      s"$dups duplicated key(s)")
  }

  /** FK check: zero child rows without a parent — left-anti join
    * (quality_report.md:534-544). */
  def referentialIntegrity(child: DataFrame, parent: DataFrame, key: String): CheckResult = {
    val orphans = child.join(parent.select(key), Seq(key), "left_anti").count()
    CheckResult(s"fk($key)", orphans == 0, orphans, s"$orphans orphan row(s)")
  }

  /** k-anonymity audit (Sweeney 2002): quasi-identifier combinations
    * whose group is smaller than `k` — the rows a release would
    * re-identify. Returns the violating combinations with their group
    * sizes (empty = the projection is k-anonymous). One shuffle on
    * the QID key; composes with the redaction family as the
    * "generalize or suppress these" worklist. */
  def kAnonymity(df: DataFrame, qidCols: Seq[String], k: Long): DataFrame = {
    require(qidCols.nonEmpty, "kAnonymity: no quasi-identifier columns")
    require(k >= 2, s"kAnonymity: k must be >= 2, got $k")
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
  }

  /** Corpus-overlap estimate WITHOUT a join: `|A∩B| ≈ |A| + |B| −
    * |A∪B|` by inclusion–exclusion over mergeable HLL sketches — the
    * "how much of corpus B is already in corpus A" audit at two scans
    * and a constant-size union, where the exact answer is a corpus ⋈
    * corpus semi-join. Returns one row `(est_a, est_b, est_union,
    * est_intersection)`; est_intersection is clamped at 0 (the
    * subtraction can go slightly negative on disjoint sets —
    * estimator noise, not signal). Relative error follows HLL
    * (~1–2 % at default lgK), amplified for SMALL intersections of
    * large sets — use the exact semi-join when the answer drives a
    * per-row decision rather than a monitoring dashboard. */
  def overlapEstimate(a: DataFrame, b: DataFrame, colName: String): DataFrame = {
    val sa = a.agg(hll_sketch_agg(col(colName)).as("sk"))
    val sb = b.agg(hll_sketch_agg(col(colName)).as("sk"))
    sa.select(col("sk").as("ska")).crossJoin(sb.select(col("sk").as("skb")))
      .select(
        hll_sketch_estimate(col("ska")).as("est_a"),
        hll_sketch_estimate(col("skb")).as("est_b"),
        hll_sketch_estimate(hll_union(col("ska"), col("skb"))).as("est_union"))
      .withColumn("est_intersection",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
  }

  /** Bounds re-validation: all values in [lo,hi] or NULL
    * (quality_report.md:561-572). One pass over the table for all
    * columns (single aggregate, not one job per column). */
  def bounds(df: DataFrame, boundsSpec: Seq[(String, (Double, Double))]): Seq[CheckResult] = {
    val present = boundsSpec.filter { case (n, _) => df.columns.contains(n) }
    if (present.isEmpty) return Seq.empty
    val aggs: Seq[Column] = present.map { case (n, (lo, hi)) =>
      // coalesce: SUM over an empty table is NULL, and getLong would NPE
      coalesce(sum(when(col(n).isNotNull && (col(n) < lo || col(n) > hi), 1L).otherwise(0L)),
        lit(0L)).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    present.zipWithIndex.map { case ((n, (lo, hi)), i) =>
      val v = row.getLong(i)
      CheckResult(s"bounds($n in [$lo,$hi])", v == 0, v, s"$v out-of-bounds value(s)")
    }
  }

  /** Auto-mode thresholds for [[columnProfile]]: above either, the
    * profile switches from exact `countDistinct` to HLL. The Expand
    * plan behind multi-column exact distinct REPLICATES every scan row
    * once per distinct aggregate — a 17-column exact profile pushes
    * ~17× the scan's row count through the map stage before the
    * shuffle, which is the difference between "one pass" and "17
    * passes' worth of rows" at 100 TB. */
  val AutoExactMaxCols: Int = 12
  val AutoExactMaxBytes: Long = 8L * 1024 * 1024 * 1024

  /** Single-pass column profile — the data-profiling report every
    * curation run starts from: per column, null count, distinct count,
    * and min/max (as strings, so one long-form schema covers every
    * column type). ONE aggregate over ONE scan: Spark plans the
    * multi-column `countDistinct` set via Expand — BUT Expand fans
    * every input row out once per distinct-agg in the map stage
    * (|cols|× the scan's rows in flight before partials combine), so
    * exact-mode cost grows with the column count, not just the data.
    * `exact = Some(false)` swaps `countDistinct` for HLL
    * `approx_count_distinct` — the scale form when ±2% on
    * distinct-count is acceptable: no Expand, one ~1.5 KB sketch per
    * column crosses the wire. The default `None` AUTO-selects: exact
    * for profiles up to [[AutoExactMaxCols]] columns over inputs the
    * optimizer sizes under [[AutoExactMaxBytes]] (the
    * dimension-sample case, where the cross-engine oracle needs
    * determinism), HLL beyond either threshold (the wide-profile /
    * 100 TB case). A source the optimizer CANNOT size (stats absent —
    * `sizeInBytes` is the defaultSizeInBytes sentinel, e.g. some
    * RDD-backed or custom relations) passes the byte gate rather than
    * silently failing it: determinism is the documented default and
    * the column gate still bounds the Expand fan-out; file-backed
    * sources — the 100 TB case — always carry a real size. Pass
    * `Some(true)` to force the Expand form regardless. (Absence is
    * judged at the plan's LEAVES — a joined plan whose multiplied
    * size estimate exceeds the sentinel is enormous, not unsized.) */
  def columnProfile(
      df: DataFrame, cols: Seq[String], exact: Option[Boolean] = None): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"columns must exist: ${cols.filterNot(df.columns.contains).mkString(",")}")
    val plan = df.queryExecution.optimizedPlan
    val size = plan.stats.sizeInBytes
    // Stats-absence is detected at the LEAVES, not the plan root: the
    // size-only stats visitor MULTIPLIES child sizes through joins, so a
    // join of two large fully-sized file tables can carry a plan-level
    // estimate past the defaultSizeInBytes sentinel — a genuine "this is
    // enormous" signal that must fall to HLL, not be misread as "stats
    // absent" and routed to the exact Expand path (the OOM case the HLL
    // fallback exists for). Only a leaf actually reporting the sentinel
    // (RDD-backed/custom relations) means the size is unknowable; there
    // determinism stays the documented default and the column gate still
    // bounds the Expand fan-out.
    val sentinel = BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes)
    val anyLeafUnsized = plan.collectLeaves().exists(_.stats.sizeInBytes >= sentinel)
    val useExact = exact.getOrElse(
      cols.length <= AutoExactMaxCols &&
        (anyLeafUnsized || size <= BigInt(AutoExactMaxBytes)))
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        // coalesce: SUM over an empty table is NULL (cf. bounds above)
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nulls_$c"),
        (if (useExact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"__nulls_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
    }
    row.select(col("__n").as("n_rows"), explode(array(entries: _*)).as("__e"))
      .select(col("__e.col_name"), col("n_rows"), col("__e.n_nulls"),
        col("__e.n_distinct"), col("__e.min_value"), col("__e.max_value"))
  }

  /** Row-count parity between two layers (quality_report.md:548-557). */
  def countParity(a: DataFrame, b: DataFrame, label: String): CheckResult = {
    val (ca, cb) = (a.count(), b.count())
    CheckResult(s"countParity($label)", ca == cb, math.abs(ca - cb), s"$ca vs $cb")
  }

  /** Run the full reference invariant set over a built star schema. */
  def fullSuite(
      silver: DataFrame, dimProduct: DataFrame, dimBrand: DataFrame,
      dimCategory: DataFrame, fact: DataFrame,
      boundsSpec: Seq[(String, (Double, Double))]): Seq[CheckResult] =
    Seq(
      uniqueness(silver, Seq("code")),
      uniqueness(dimProduct, Seq("code")),
      uniqueness(dimBrand, Seq("brand_name")),
      uniqueness(dimCategory, Seq("category_name")),
      referentialIntegrity(fact, dimProduct, "product_sk"),
      countParity(silver, dimProduct, "silver=dim_product")) ++
      bounds(silver, boundsSpec)
}
