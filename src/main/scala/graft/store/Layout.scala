package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — Z-order (Morton
  * curve) clustering, the public `OPTIMIZE ZORDER BY` idea: rewrite a
  * table so rows close in a k-dimensional key space land in the same
  * files, which makes parquet row-group/file min-max stats tight on
  * EVERY clustered column at once. A table sorted on one column prunes
  * scans filtered on that column only; a Z-ordered table prunes
  * conjunctive and single-column range predicates on all k columns —
  * at 100 TB, the difference between reading a shelf and reading the
  * warehouse. (Reference scope ends at plain overwrite sinks —
  * pipeline_etl.ipynb:469-474 writes unclustered; this is a
  * north-star extension.)
  *
  * The mechanics are deliberately plain Spark, in the shape a 100 TB
  * maintenance job needs:
  *
  *  1. per-column BUCKET ranks from explicit quantile boundaries
  *     ([[bucketOf]] — a codegen'd `aggregate` over a literal array,
  *     no UDF, no shuffle); [[boundariesFor]] derives the boundaries
  *     with one bounded `approxQuantile` pass (driver holds ≤ 2^bits
  *     doubles per column — the same sampling contract a
  *     RangePartitioner uses);
  *  2. bit-interleave the bucket ranks into one integer [[zValue]]
  *     (pure shift/and/or expression tree, whole-stage codegen);
  *  3. [[cluster]]: ONE range shuffle on the z-value
  *     (`repartitionByRange`, sampled boundaries, so output files tile
  *     the curve evenly even under skew) + an in-partition sort, then
  *     the helper column is dropped — the written files carry only the
  *     original schema, clustered.
  *
  * Cost model at scale: one quantile pass + one full shuffle + local
  * sorts — identical to a plain global sort rewrite, but the result
  * prunes on k dimensions instead of one. Re-cluster cadence is the
  * same as [[Store.compact]]'s: periodic maintenance after appends.
  * A Hilbert curve would give marginally tighter locality at the same
  * cost; Z-order is chosen for the closed-form integer expression.
  *
  * Battery q107 hash-verifies the bucket+interleave arithmetic
  * cross-engine against a DuckDB replay; LayoutSpec proves the pruning
  * claim itself (per-partition min-max boxes of a Z-clustered layout
  * bound BOTH dimensions; a linear layout leaves the unsorted
  * dimension unbounded).
  */
object Layout {

  /** Bucket rank of `c` given ascending quantile `boundaries`:
    * #{b : c >= b}, an integer in [0, boundaries.length]. NULLs rank 0
    * (they carry no range information; parquet null-counts prune them
    * independently). Codegen'd higher-order `aggregate` over a literal
    * array — O(|boundaries|) integer ops per row, no UDF. */
  def bucketOf(c: Column, boundaries: Seq[Double]): Column = {
    require(boundaries.nonEmpty, "bucketOf needs at least one boundary")
    require(boundaries == boundaries.sorted, "boundaries must be ascending")
    aggregate(
      lit(boundaries.toArray),
      lit(0L),
      (acc, b) => acc + when(c.cast("double") >= b, 1L).otherwise(0L))
  }

  /** Interleave the low `bits` of k bucket columns into one Morton
    * z-value: bit j of bucket i lands at position j*k + i. Bucket
    * values must fit in `bits` (callers built from [[bucketOf]] with
    * ≤ 2^bits − 1 boundaries always do). Pure shift/mask expression —
    * k·bits terms, whole-stage codegen. k·bits ≤ 63 keeps the result
    * in a signed long. */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.length
    require(k >= 1, "zValue needs at least one bucket column")
    require(bits >= 1 && k * bits <= 63, s"k*bits must fit a long ($k x $bits)")
    val terms = for {
      j <- 0 until bits
      (b, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b.cast("long"), j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Quantile boundaries for each column: 2^bits − 1 split points from
    * one `approxQuantile` pass (bounded sketch per partition, merged
    * on the driver — ≤ 255 doubles/column at the default 8 bits, flat
    * regardless of table size). Deduplicated, so heavily-skewed
    * columns yield fewer, still-ascending boundaries. */
  def boundariesFor(
      df: DataFrame, cols: Seq[String], bits: Int = 8,
      relativeError: Double = 0.001): Map[String, Seq[Double]] = {
    require(bits >= 1 && bits <= 16, s"bits out of range ($bits)")
    if (cols.isEmpty) return Map.empty
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    // ONE multi-column approxQuantile pass (the per-column form cost
    // one full scan job per layout column — on maintenance-cycle
    // clustering the fixed per-job cost, not the sketch, was the wall)
    val qs = df.stat.approxQuantile(cols.toArray, probs, relativeError)
    cols.zip(qs).map { case (c, q) => c -> q.toSeq.distinct.sorted }.toMap
  }

  /** [[bucketOf]] for STRING layout columns: the same #{b : c >= b}
    * rank under Spark's binary string order — the order the manifest's
    * min/max stats prune with, so string-clustered files' boxes are
    * tight in exactly the comparison pruning uses. Same codegen'd
    * `aggregate` over a literal array, no UDF. */
  /** Spark compares strings as UTF-8 BINARY (UTF8String.compareTo);
    * Java's String ordering is UTF-16 code units. They disagree when
    * supplementary characters (surrogate pairs, UTF-16 0xD800+) mix
    * with U+E000..U+FFFF chars — boundary ordering must follow the
    * comparator the ranks are actually computed under. */
  private[graft] val utf8Order: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    }
  }

  def bucketOfString(c: Column, boundaries: Seq[String]): Column = {
    require(boundaries.nonEmpty, "bucketOfString needs at least one boundary")
    require(boundaries == boundaries.sorted(utf8Order),
      "boundaries must be ascending in UTF-8 byte order")
    aggregate(
      typedLit(boundaries),
      lit(0L),
      (acc, b) => acc + when(c >= b, 1L).otherwise(0L))
  }

  /** Boundary derivation for STRING layout columns (`approxQuantile`
    * is numeric-only): evenly-spaced split points over a
    * deterministic (fixed-seed) sample of the column's DISTINCT
    * values — the same sampling contract a RangePartitioner accepts,
    * and boundaries steer LAYOUT only, never correctness. Driver
    * holds ≤ `sampleCap` strings per column while deriving, ≤
    * 2^bits − 1 after. Low-cardinality keys (lang, source, status —
    * the common string clustering keys) are exact: every distinct
    * value below the cap is seen. */
  def stringBoundariesFor(df: DataFrame, cols: Seq[String], bits: Int = 8,
      sampleCap: Int = 1 << 16): Map[String, Seq[String]] = {
    require(bits >= 1 && bits <= 16, s"bits out of range ($bits)")
    cols.map { c =>
      val distinct = df.select(col(c)).na.drop().distinct()
      val n = distinct.count()
      val frac = math.min(1.0, sampleCap.toDouble / math.max(n, 1L))
      val sampled = (if (frac >= 1.0) distinct else distinct.sample(frac, 42L))
        .collect().map(_.getString(0)).sorted(utf8Order)
      val want = (1 << bits) - 1
      val bnds: Seq[String] =
        if (sampled.length <= want) sampled.toSeq
        // Long arithmetic: i * length overflows Int at bits=16 with a
        // near-cap sample (65k × 65k), wrapping to a negative index
        else (1 to want).map(i =>
          sampled((i.toLong * sampled.length / (want + 1)).toInt))
      c -> bnds.distinct
    }.toMap
  }

  /** Type-dispatched [[boundariesFor]]: numeric columns through the
    * quantile sketch, string columns through the sampled-distinct
    * path — the form [[graft.store.Manifest.compactClustered]] feeds
    * [[cluster]] with, so layout keys like (lang, doc_length) or
    * (status, order_key) mix freely. */
  def mixedBoundariesFor(df: DataFrame, cols: Seq[String], bits: Int = 8,
      relativeError: Double = 0.001): Map[String, Seq[Any]] = {
    val (strCols, numCols) = cols.partition(c =>
      df.schema(c).dataType == org.apache.spark.sql.types.StringType)
    val s: Map[String, Seq[Any]] =
      stringBoundariesFor(df, strCols, bits)
        .view.mapValues(_.map(v => v: Any)).toMap
    val n: Map[String, Seq[Any]] =
      boundariesFor(df, numCols, bits, relativeError)
        .view.mapValues(_.map(v => v: Any)).toMap
    s ++ n
  }

  /** Rewrite `df` into `partitions` curve-clustered ranges: bucket
    * each layout column by its boundaries, linearize the bucket tuple
    * on a space-filling curve, ONE range shuffle on the curve value,
    * sort within partitions, drop the helper. Each output partition
    * (= output file on write) then covers a compact curve range, so
    * its min-max box is tight on every layout column — the property
    * parquet row-group pruning feeds on. Size `partitions` for ~1 GB
    * files at the target table size, exactly like [[Store.compact]].
    *
    * `curve`: `"z"` (Morton, any k) or `"hilbert"` (2-D only —
    * [[graft.functions.HilbertIndexExpression]], a codegen'd native
    * expression). Hilbert's consecutive indices are always grid
    * neighbors, so file boxes carry none of the power-of-two seam
    * jumps Z-order pays; BENCH_SCALE's sixth campaign quantifies the
    * difference. */
  def cluster(
      df: DataFrame, boundaries: Map[String, Seq[Any]],
      partitions: Int, bits: Int = 8, curve: String = "z"): DataFrame = {
    require(boundaries.nonEmpty, "cluster needs at least one layout column")
    require(partitions >= 1, s"partitions must be positive ($partitions)")
    boundaries.foreach { case (c, b) =>
      require(b.nonEmpty,
        s"column $c has no derivable boundaries (all NULL in the input?) — " +
          "drop it from the layout columns or backfill it first")
      require(b.length < (1 << bits), s"column $c has too many boundaries for $bits bits")
    }
    val dims = boundaries.toSeq.sortBy(_._1) // deterministic dimension order
    val bucketCols = dims
      .map { case (c, b) =>
        b.headOption match { // per-column type dispatch (strings rank
          // under the same binary order the stats prune with)
          case Some(_: String) => bucketOfString(col(c), b.map(_.asInstanceOf[String]))
          case _ => bucketOf(col(c), b.map(_.asInstanceOf[Number].doubleValue()))
        }
      }
    // NORMALIZE each dimension's rank to the full 2^bits − 1 range: a
    // low-cardinality column (8 langs → ranks 0..8) otherwise occupies
    // only the LOW interleave positions, its high bits constant zero —
    // the curve degenerates to other-column-major order and that
    // column's file boxes span everything (no pruning). Scaling is a
    // monotone map, so in-column order — and with it box tightness —
    // is preserved; full-range columns pass through untouched.
    val full = (1L << bits) - 1L
    val scaledCols = bucketCols.zip(dims).map { case (bc, (_, b)) =>
      val maxRank = b.length.toLong // ranks run 0..maxRank
      if (maxRank >= full) bc
      else (bc * lit(full) / lit(maxRank)).cast("long")
    }
    val curveVal = curve match {
      case "z" => zValue(scaledCols, bits)
      case "hilbert" =>
        require(scaledCols.length == 2,
          s"hilbert curve is 2-D; got ${scaledCols.length} layout columns (use curve=\"z\")")
        graft.functions.HilbertIndexExpression.hilbertIndex(
          scaledCols.head, scaledCols(1), bits)
      case other => throw new IllegalArgumentException(
        s"unknown curve '$other' (supported: z, hilbert)")
    }
    df.withColumn("__z", curveVal)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** One-call convenience: derive boundaries (numeric or string
    * columns), then [[cluster]]. */
  def zOrder(
      df: DataFrame, cols: Seq[String], partitions: Int, bits: Int = 8): DataFrame =
    cluster(df, mixedBoundariesFor(df, cols, bits), partitions, bits)

  /** [[zOrder]]'s 2-D Hilbert twin — tighter boxes, same cost. */
  def hilbertOrder(
      df: DataFrame, cols: Seq[String], partitions: Int, bits: Int = 8): DataFrame = {
    require(cols.length == 2, s"hilbertOrder is 2-D; got ${cols.length} columns")
    cluster(df, mixedBoundariesFor(df, cols, bits), partitions, bits, curve = "hilbert")
  }
}
