package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.Manifest

/** An IVF (inverted-file) ANN index AT REST in the versioned manifest
  * store — the vector-search twin of the stored postings index
  * ([[graft.text.Search.writePostingsIndex]]): vectors live as an
  * ordinary versioned table whose file layout IS the index, so a probe
  * is a stats-pruned scan of the probed lists' files, with snapshot
  * isolation, exactly-once appends, time travel, and gc inherited from
  * the store instead of re-implemented (the public "vector search over
  * a lakehouse table" shape — e.g. Delta + file skipping, not a bespoke
  * index server).
  *
  * Layout contract: each appended batch is range-partitioned on the
  * list id before landing, so every data file covers a TIGHT
  * `[min, max]` list range in the manifest's skip stats, and a probe
  * of p of L lists reads ~p/L of the files through the
  * planner-integrated scan ([[Manifest.table]] — IN prunes). Centroid
  * state is a sidecar manifest table of per-list PARTIAL SUMS: sums
  * are additive, so index maintenance is pure append — no rebuild, no
  * read-modify-write — and the probe aggregates the (lists × batches)
  * sidecar rows at plan time (tiny: one row per list per batch).
  * Cosine against a summed centroid equals cosine against the mean
  * (scale invariance), so partial sums lose nothing.
  *
  * The sidecar is ADVISORY: it only chooses which lists to probe
  * (recall, like every IVF), never filters rows — a lagging sidecar
  * (e.g. a crash between the two appends) degrades recall of the
  * freshest batch, not correctness of what is returned.
  *
  * Exact-integer envelope: list selection squares the summed
  * components inside [[Similarity.cosineQ]]'s int64 kernel, so a
  * list's per-component |sum| must stay under √(2⁶³/dims) ≈ 3.8×10⁸
  * at 64 dims — with ×1000-quantized unit-scale embeddings that is
  * ~3.8×10⁵ vectors per list. Size L accordingly (the standard IVF
  * sizing L ∝ √N keeps lists AT √N, i.e. the envelope binds only past
  * ~10¹¹ vectors); an overflowed sum would silently mis-rank list
  * CHOICE (recall), never the returned rows. */
object ManifestAnn {

  /** The centroid-sum sidecar table root for an index root. */
  def centsRoot(root: String): String = root + "_cents"

  /** Append one vector batch (`idCol`, `listCol`, quantized `qvCol`)
    * into the index: data range-partitioned by list into the versioned
    * table with `listCol` skip stats, then the batch's per-list
    * centroid partial sums appended to the sidecar. Exactly the
    * store's append semantics — atomic per table, schema-enforced. */
  def appendBatch(emb: DataFrame, root: String, listCol: String,
      idCol: String, qvCol: String, listPartitions: Int = 8): Unit = {
    require(listPartitions >= 1,
      s"appendBatch: listPartitions must be >= 1, got $listPartitions")
    val base = emb.select(col(idCol), col(listCol), col(qvCol))
    Manifest.append(
      base.repartitionByRange(listPartitions, col(listCol)),
      root, statsCols = Seq(listCol))
    Manifest.append(
      Similarity.listCentroidSums(base, listCol, qvCol), centsRoot(root))
  }

  /** Current per-list centroid sums: the sidecar's partial sums folded
    * once per list (integer adds — order-free, exact). */
  def centroidSums(spark: SparkSession, root: String,
      listCol: String): DataFrame =
    Manifest.read(spark, centsRoot(root))
      .select(col(listCol), posexplode(col("cvec")).as(Seq("pos", "v")))
      .groupBy(listCol, "pos").agg(sum("v").as("sv"))
      .groupBy(listCol)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("sv")))),
        s => s.getField("sv")).as("cvec"))

  /** Fold the sidecar to ONE row per list (an overwrite commit of the
    * folded sums): probe-time sidecar aggregation returns to O(lists)
    * after any number of appended batches. Pure maintenance — the sums
    * are unchanged, so list selection is identical before and after.
    * Same single-maintainer contract as [[Manifest.compact]]: not
    * concurrent-safe with an in-flight [[appendBatch]] on the same
    * root (the fold reads then replaces; an append landing in between
    * would be erased from the sidecar — recall loss, not
    * incorrectness, but run it from the index's maintenance owner). */
  def compactCents(spark: SparkSession, root: String,
      listCol: String): Unit =
    // safe to read-and-replace in one pass: overwrite stages the folded
    // rows from the pinned snapshot's files, which stay on disk until a
    // LATER gc — the commit only swaps the pointer
    Manifest.overwrite(
      centroidSums(spark, root, listCol).select(col(listCol), col("cvec")),
      centsRoot(root))

  /** Rebuild the sidecar FROM the data table (overwrite commit): the
    * repair tool for when the additive fold no longer reflects the
    * rows — after a DELETE on the index root (vectors removed from a
    * list leave its sum stale: advisory recall skew, not
    * incorrectness) or a crash that landed data without its sidecar
    * half. One scan of the index; same single-maintainer contract as
    * [[compactCents]]. */
  def refreshCents(spark: SparkSession, root: String, listCol: String,
      qvCol: String): Unit =
    Manifest.overwrite(
      Similarity.listCentroidSums(Manifest.read(spark, root), listCol, qvCol),
      centsRoot(root))

  /** IVF probe with optional metadata filtering: rank lists by
    * centroid-sum cosine against `queryQv`, take the top `nProbe`
    * (ties to the smaller list id), then exact top-`k` cosine over
    * ONLY those lists' rows — the list IN-filter prunes files at scan
    * planning through the manifest stats, and `rowFilter` (the
    * filtered-ANN predicate: source, license, date, …) applies INSIDE
    * the pruned vectorized scan, never as a post-filter over a wider
    * candidate pull. Returns (`idCol`, `listCol`, cosine) ordered by
    * cosine then id. The probed list ids are a driver handoff bounded
    * by `nProbe`. */
  def probe(spark: SparkSession, root: String, listCol: String,
      idCol: String, qvCol: String, queryQv: Seq[Long], nProbe: Int,
      k: Int, rowFilter: Column = lit(true)): DataFrame = {
    require(nProbe >= 1, s"probe: nProbe must be >= 1, got $nProbe")
    require(k >= 1, s"probe: k must be >= 1, got $k")
    val qlit = typedLit(queryQv)
    val probed = centroidSums(spark, root, listCol)
      .select(col(listCol), Similarity.cosineQ(col("cvec"), qlit).as("cscore"))
      .orderBy(col("cscore").desc, col(listCol).asc)
      .limit(nProbe)
      .select(col(listCol))
      .collect().map(_.get(0)).toSeq
    Manifest.table(spark, root)
      .filter(col(listCol).isin(probed: _*) && rowFilter)
      .select(col(idCol), col(listCol),
        Similarity.cosineQ(col(qvCol), qlit).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
