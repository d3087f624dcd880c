package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured effectiveness of the manifest store's DATA SKIPPING
  * ([[graft.store.Manifest.readWhereBetween]]) — the LayoutBench
  * counterpart for the skip index: build a manifest table from the
  * g100x orders corpus (15M rows) as range-disjoint stat'd appends,
  * then probe a narrow key range three ways:
  *
  *  - full scan + filter (`Manifest.read(...).filter(...)`) — baseline
  *  - skip read (`readWhereBetween`) — files pruned by per-file stats
  *
  * Reports files scanned and min-of-2 wall for each, then measures the
  * touched-files-only MERGE against a full rewrite (x163) and the
  * three-probe lexicographic-vs-Hilbert 2-D layout comparison (x164).
  * Merges `x162_manifest_skip`, `x163_manifest_upsert`, and
  * `x164_manifest_zorder` into BENCH_SCALE.json.
  */
object SkipBench {

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_scale")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.store.Manifest

    if (!BenchFs.exists(spark, s"$base/g100x/orders.parquet")) {
      System.err.println(s"[skipbench] generating $base/g100x/orders.parquet")
      ScaleGen.orders(spark, 15000000L)
        .write.mode("overwrite").parquet(s"$base/g100x/orders.parquet")
    }
    val root = s"$base/g100x/orders_manifest"
    if (!BenchFs.exists(spark, s"$root/manifest")) {
      System.err.println(s"[skipbench] building stat'd manifest table (32 range appends)")
      val orders = spark.read.parquet(s"$base/g100x/orders.parquet")
      val hi = orders.agg(max(col("o_orderkey"))).head().getLong(0)
      val cut = hi / 32 + 1
      (0L until 32L).foreach { i =>
        Manifest.append(
          orders.filter(col("o_orderkey") >= i * cut && col("o_orderkey") < (i + 1) * cut),
          root, statsCols = Seq("o_orderkey"))
      }
    }
    val snap = Manifest.current(spark, root).get
    val hi = Manifest.read(spark, root).agg(max(col("o_orderkey"))).head().getLong(0)
    val (lo, up) = (hi / 2, hi / 2 + hi / 100) // ~1% key slab mid-table

    def timeIt(f: () => Long): (Double, Long) = {
      def once(): (Double, Long) = {
        graft.CacheReset(spark)
        val t0 = System.nanoTime()
        val n = f()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val a = once(); val b = once()
      (math.min(a._1, b._1), b._2)
    }
    val (fullSec, nFull) = timeIt(() =>
      Manifest.read(spark, root)
        .filter(col("o_orderkey") >= lo && col("o_orderkey") <= up)
        .agg(count(lit(1))).head().getLong(0))
    val (skipSec, nSkip) = timeIt(() =>
      Manifest.readWhereBetween(spark, root, "o_orderkey", lo, up)
        .agg(count(lit(1))).head().getLong(0))
    require(nFull == nSkip, s"skip read diverged: $nSkip vs $nFull rows")
    val scanned = Manifest.prunedFiles(snap, "o_orderkey", lo, up).size
    // count(*): manifest metadata (footer row counts) vs a real scan
    val (scanCountSec, nScan) = timeIt(() =>
      Manifest.read(spark, root).agg(count(lit(1))).head().getLong(0))
    val (metaCountSec, nMeta) = timeIt(() => Manifest.countRows(spark, root))
    require(nScan == nMeta, s"metadata count diverged: $nMeta vs $nScan")
    System.err.println(f"[skipbench] full=$fullSec%.2fs skip=$skipSec%.2fs " +
      f"(${fullSec / skipSec}%.2fx) files=$scanned/${snap.files.size} rows=$nFull " +
      f"countScan=$scanCountSec%.3fs countMeta=$metaCountSec%.3fs")

    // x163: MERGE cost follows touched files — upsert 1,000 keys that
    // all live in ONE of the 32 files, vs rewriting the whole table.
    // The upsert is content-idempotent (same rows re-asserted) so the
    // bench table stays logically unchanged across runs; the
    // full-rewrite baseline is rolled back via restore.
    val cutKey = hi / 32 + 1 // the build loop's per-file range width
    val oneFileBatch = Manifest.readWhereBetween(
        spark, root, "o_orderkey", 16L * cutKey, 16L * cutKey + 5000L)
      .limit(1000).localCheckpoint()
    val nBatch = oneFileBatch.count()
    val filesBefore = Manifest.current(spark, root).get.files.toSet
    val t0 = System.nanoTime()
    Manifest.upsert(oneFileBatch, root, "o_orderkey")
    val upsertSec = (System.nanoTime() - t0) / 1e9
    val rewrittenFiles = filesBefore.diff(
      Manifest.current(spark, root).get.files.toSet).size
    val t1 = System.nanoTime()
    Manifest.overwrite(Manifest.read(spark, root), root,
      statsCols = Seq("o_orderkey"))
    val rewriteSec = (System.nanoTime() - t1) / 1e9
    Manifest.restore(spark, root,
      Manifest.current(spark, root).get.version - 1) // pre-overwrite state
    Manifest.gc(spark, root, keepVersions = 1)
    System.err.println(f"[skipbench] upsert($nBatch keys)=$upsertSec%.2fs " +
      f"(files rewritten: $rewrittenFiles/32) fullRewrite=$rewriteSec%.2fs")
    oneFileBatch.unpersist()

    // x164: 2-D layout — the SAME conjunctive box probe against a
    // lexicographic range layout vs a Hilbert-clustered one
    // (compactClustered), both ~8 MB files from the same 15M-row base.
    val lexRoot = s"$base/g100x/orders_manifest_lex2d"
    val clusRoot = s"$base/g100x/orders_manifest_hilbert2d"
    val dims = Seq("o_custkey", "o_totalprice")
    if (!BenchFs.exists(spark, s"$lexRoot/manifest")) {
      System.err.println(s"[skipbench] building 2-D lexicographic layout")
      Manifest.overwrite(spark.read.parquet(s"$base/g100x/orders.parquet"),
        lexRoot, statsCols = dims)
      Manifest.compact(spark, lexRoot, targetBytes = 8L << 20, rangeBy = dims)
      Manifest.gc(spark, lexRoot, keepVersions = 1)
    }
    if (!BenchFs.exists(spark, s"$clusRoot/manifest")) {
      System.err.println(s"[skipbench] building 2-D hilbert-clustered layout")
      Manifest.overwrite(spark.read.parquet(s"$base/g100x/orders.parquet"),
        clusRoot, statsCols = dims)
      Manifest.compactClustered(spark, clusRoot, dims,
        targetBytes = 8L << 20, curve = "hilbert")
      Manifest.gc(spark, clusRoot, keepVersions = 1)
    }
    // Three probe shapes, the public OPTIMIZE ZORDER narrative: the
    // lexicographic layout is optimal for a LEADING-column slab and
    // useless for a SECOND-column slab (every file spans all of it);
    // the curve layout serves all shapes from one clustering.
    val probeBase = Manifest.read(spark, clusRoot)
    val custHi = probeBase.agg(max(col("o_custkey"))).head().getLong(0)
    val prRow = probeBase.agg(
      min(col("o_totalprice")), max(col("o_totalprice"))).head()
    val (prLo, prHi) = (prRow.getDouble(0), prRow.getDouble(1))
    val pLead = Seq[(String, Any, Any)](
      ("o_custkey", custHi / 2, custHi / 2 + custHi / 50)) // 2% leading slab
    val pSecond = Seq[(String, Any, Any)](
      ("o_totalprice", prLo + (prHi - prLo) * 0.49,
        prLo + (prHi - prLo) * 0.51)) // 2% second-column slab
    val pBox = Seq[(String, Any, Any)](
      ("o_custkey", custHi * 45L / 100L, custHi * 55L / 100L),
      ("o_totalprice", prLo + (prHi - prLo) * 0.45,
        prLo + (prHi - prLo) * 0.55)) // 10% x 10% square box
    def keptFiles(r: String, preds: Seq[(String, Any, Any)]): (Int, Int) = {
      val sn = Manifest.current(spark, r).get
      val kept = preds.foldLeft(sn.files) { case (fl, (c, lo, up2)) =>
        Manifest.prunedFiles(sn.copy(files = fl), c, lo, up2)
      }
      (kept.size, sn.files.size)
    }
    def probeCount(r: String, preds: Seq[(String, Any, Any)]): () => Long =
      () => Manifest.readWhere(spark, r, preds).agg(count(lit(1))).head().getLong(0)
    def probe(tag: String, preds: Seq[(String, Any, Any)]): (Double, Double, Int, Int, Int) = {
      val (lexSec, nLex) = timeIt(probeCount(lexRoot, preds))
      val (clusSec, nClus) = timeIt(probeCount(clusRoot, preds))
      require(nLex == nClus, s"2-D layouts diverged on $tag: $nLex vs $nClus rows")
      val (lexKept, total) = keptFiles(lexRoot, preds)
      val (clusKept, _) = keptFiles(clusRoot, preds)
      System.err.println(f"[skipbench] $tag: lex=$lexSec%.2fs ($lexKept/$total files) " +
        f"hilbert=$clusSec%.2fs ($clusKept/$total files) rows=$nLex")
      (lexSec, clusSec, lexKept, clusKept, total)
    }
    val (leadLex, leadClus, leadLexF, leadClusF, total2d) = probe("lead-slab", pLead)
    val (secLex, secClus, secLexF, secClusF, _) = probe("second-slab", pSecond)
    val (boxLex, boxClus, boxLexF, boxClusF, _) = probe("square-box", pBox)

    // x166: the PLANNER-INTEGRATED path — plain SQL over Manifest.table
    // must prune like the dedicated readWhereBetween API (the FileIndex
    // feeds the same stats to Catalyst at scan-planning time), at the
    // same wall cost. Also times the zero-RPC planning resolve.
    val (tableSec, nTable) = timeIt { () =>
      Manifest.table(spark, root).createOrReplaceTempView("skipbench_orders")
      spark.sql(
        s"SELECT COUNT(*) FROM skipbench_orders WHERE o_orderkey BETWEEN $lo AND $up")
        .head().getLong(0)
    }
    require(nTable == nFull, s"planner path diverged: $nTable vs $nFull rows")
    System.err.println(f"[skipbench] planner-table SQL=$tableSec%.2fs " +
      f"(vs skip API $skipSec%.2fs, full $fullSec%.2fs)")

    val jsonFile = java.nio.file.Paths.get("BENCH_SCALE.json")
    val existing: Map[String, String] = if (java.nio.file.Files.exists(jsonFile)) {
      val txt = new String(java.nio.file.Files.readAllBytes(jsonFile), "UTF-8")
      """"([qx]\d+\w*)"\s*:\s*(\{[^}]*\})""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2)).toMap
    } else Map.empty
    val merged = existing +
      ("x162_manifest_skip" ->
        s"""{"full":${fmt(fullSec)},"skip":${fmt(skipSec)},"files_total":${snap.files.size},"files_scanned":$scanned,"count_scan":${fmt(scanCountSec)},"count_meta":${fmt(metaCountSec)}}""") +
      ("x163_manifest_upsert" ->
        s"""{"upsert_1file":${fmt(upsertSec)},"files_rewritten":$rewrittenFiles,"full_rewrite":${fmt(rewriteSec)},"batch_rows":$nBatch}""") +
      ("x166_manifest_table_sql" ->
        s"""{"sql":${fmt(tableSec)},"skip_api":${fmt(skipSec)},"full":${fmt(fullSec)}}""") +
      ("x164_manifest_zorder" ->
        s"""{"files_total":$total2d,"lead_lex_files":$leadLexF,"lead_hilbert_files":$leadClusF,"second_lex_files":$secLexF,"second_hilbert_files":$secClusF,"box_lex_files":$boxLexF,"box_hilbert_files":$boxClusF,"lead_lex":${fmt(leadLex)},"lead_hilbert":${fmt(leadClus)},"second_lex":${fmt(secLex)},"second_hilbert":${fmt(secClus)},"box_lex":${fmt(boxLex)},"box_hilbert":${fmt(boxClus)}}""")
    val json = merged.toSeq.sortBy(_._1)
      .map { case (n, v) => s""""$n":$v""" }.mkString("{", ",", "}")
    java.nio.file.Files.write(jsonFile, (json + "\n").getBytes("UTF-8"))

    println(s"| read | wall (s) | files scanned |")
    println(s"|---|---|---|")
    println(s"| full + filter | ${fmt(fullSec)} | ${snap.files.size} |")
    println(s"| skip (readWhereBetween) | ${fmt(skipSec)} | $scanned |")
    spark.stop()
  }
}
