package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** STEADY-STATE change-feed mirror campaign: 40 consecutive source
  * commits (100k orders rows each) pumped across one at a time by
  * [[graft.streaming.StreamOps.manifestMirrorStep]], destination
  * compaction + gc interleaved every 10 steps. The claims under test:
  * per-step mirror latency stays FLAT (the delta read is the new
  * files only — never a function of accumulated table size), the
  * destination's txn watermark SURVIVES its own compactions (metadata
  * merge semantics — a lost watermark would re-mirror everything and
  * the row-count check would explode), and destination file counts
  * stay bounded.
  *
  * Emits `x165_mirror_loop` into BENCH_SCALE.json:
  * `{"first10":s,"last10":s,"max_files":n,"batches":40,"rows":n}`.
  */
object FeedBench {

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.store.Manifest

    val nBatches = 40
    val batchRows = 100000L
    val pool = ScaleGen.orders(spark, nBatches * batchRows).localCheckpoint()

    val base = java.nio.file.Files.createTempDirectory("graft_feed").toString
    val (src, dst) = (s"$base/src", s"$base/dst")
    val laps = new scala.collection.mutable.ArrayBuffer[Double](nBatches)
    var maxFiles = 0
    (0 until nBatches).foreach { b =>
      Manifest.append(
        pool.filter(col("o_orderkey") % nBatches === b), src,
        statsCols = Seq("o_orderkey"))
      val t0 = System.nanoTime()
      val stepped = graft.streaming.StreamOps.manifestMirrorStep(
        spark, src, dst, "mirror", statsCols = Seq("o_orderkey"))
      laps += (System.nanoTime() - t0) / 1e9
      require(stepped.nonEmpty, s"step $b mirrored nothing")
      val snap = Manifest.current(spark, dst).get
      maxFiles = math.max(maxFiles, snap.files.size)
      // dst maintenance: PARTIAL compaction (the steady-state tool —
      // O(small files), large packed files carried by identity) must
      // not disturb the txn watermark
      if (b % 10 == 9) {
        Manifest.compactSmall(spark, dst, smallBytes = 4L << 20,
          targetBytes = 64L << 20, rangeBy = Seq("o_orderkey"))
        Manifest.gc(spark, dst, keepVersions = 1)
        System.err.println(f"[feed] batch $b: ${laps.last}%.2fs, " +
          f"${snap.files.size} files pre-compact")
      }
    }
    val total = Manifest.countRows(spark, dst)
    require(total == nBatches * batchRows,
      s"mirror diverged: $total rows vs ${nBatches * batchRows} " +
        "(a lost watermark re-mirrors; a lost delta drops)")
    val first10 = laps.take(10).sum / 10
    val last10 = laps.takeRight(10).sum / 10
    System.err.println(f"[feed] first10=$first10%.2fs last10=$last10%.2fs " +
      f"maxFiles=$maxFiles rows=$total")

    upsertLedger("x165_mirror_loop",
      s"""{"first10":${fmt(first10)},"last10":${fmt(last10)},"max_files":$maxFiles,"batches":$nBatches,"rows":$total}""")
    println(s"x165_mirror_loop first10=${fmt(first10)} last10=${fmt(last10)} maxFiles=$maxFiles")

    // -------------------------------------------------------------- //
    // CDC campaign: the RETRACTION-capable mirror over a MUTATING    //
    // source. Each cycle appends one key-RANGE batch, bumps every    //
    // 10th key of it (touched-file upsert), DV-deletes a small slab  //
    // of it, then pumps ONE manifestCdcMirrorStep over the 3-commit  //
    // window. Claim: per-step wall follows the WINDOW (the rewritten //
    // file + the slab), never the accumulated table.                 //
    // -------------------------------------------------------------- //
    val cdcBatches = 20
    val cdcRows = 100000L
    val cdcPool = ScaleGen.orders(spark, cdcBatches * cdcRows)
      .localCheckpoint()
    val cbase = java.nio.file.Files.createTempDirectory("graft_cdcfeed").toString
    val (csrc, cdst) = (s"$cbase/src", s"$cbase/dst")
    val maxKey = cdcPool.agg(max(col("o_orderkey"))).head().getLong(0)
    val span = maxKey / cdcBatches + 1
    val claps = new scala.collection.mutable.ArrayBuffer[Double](cdcBatches)
    (0 until cdcBatches).foreach { b =>
      val lo = b * span; val hi = (b + 1) * span - 1
      Manifest.append(
        cdcPool.filter(col("o_orderkey").between(lo, hi)), csrc,
        statsCols = Seq("o_orderkey"))
      Manifest.upsert(
        cdcPool.filter(col("o_orderkey").between(lo, hi) &&
            col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(5.0)),
        csrc, "o_orderkey")
      Manifest.deleteWhereBetweenDv(spark, csrc, "o_orderkey",
        lo, lo + span / 100)
      val t0 = System.nanoTime()
      val stepped = graft.streaming.StreamOps.manifestCdcMirrorStep(
        spark, csrc, cdst, "cdc", "o_orderkey")
      claps += (System.nanoTime() - t0) / 1e9
      require(stepped.nonEmpty, s"cdc step $b mirrored nothing")
    }
    val srcRows = Manifest.read(spark, csrc).count()
    val dstRows = Manifest.countRows(spark, cdst)
    require(srcRows == dstRows,
      s"cdc mirror diverged: src $srcRows vs dst $dstRows")
    val cFirst = claps.take(5).sum / 5
    val cLast = claps.takeRight(5).sum / 5
    upsertLedger("x191_cdc_mirror_loop",
      s"""{"first5":${fmt(cFirst)},"last5":${fmt(cLast)},"batches":$cdcBatches,"rows":$dstRows}""")
    println(s"x191_cdc_mirror_loop first5=${fmt(cFirst)} last5=${fmt(cLast)} rows=$dstRows")
    spark.stop()
  }

  /** Insert-or-replace ONE ledger entry in BENCH_SCALE.json WITHOUT
    * reparsing the rest — the previous regex-extract merge silently
    * DROPPED nested entries (x172/x173/...) whose objects it could not
    * match. The entry's own object must be flat (no nested braces). */
  private def upsertLedger(key: String, flatObj: String): Unit = {
    val jsonFile = java.nio.file.Paths.get("BENCH_SCALE.json")
    val txt0 =
      if (java.nio.file.Files.exists(jsonFile))
        new String(java.nio.file.Files.readAllBytes(jsonFile), "UTF-8").trim
      else ""
    // a truncated/empty file from a crashed prior run must not lose
    // THIS run's numbers at the finish line
    val txt = if (txt0.isEmpty || txt0.lastIndexOf('}') < 0) "{}" else txt0
    val entry = s""""$key": $flatObj"""
    if (txt.contains(entry)) return // identical numbers: already current
    val updated =
      if (txt.contains(s""""$key"""")) {
        val r = txt.replaceAll(s""""$key"\\s*:\\s*\\{[^{}]*\\}""",
          java.util.regex.Matcher.quoteReplacement(entry))
        // a no-op replace means the existing entry isn't flat (hand-
        // edited/nested) — fail LOUDLY rather than print new numbers
        // while the ledger silently keeps the old ones
        require(r != txt,
          s"BENCH_SCALE.json: entry [$key] exists but is not a flat " +
            "object — update it by hand")
        r
      } else {
        val i = txt.lastIndexOf('}')
        val body = txt.substring(0, i).trim
        if (body == "{") s"{\n $entry\n}"
        else body.stripSuffix(",") + s",\n $entry\n}"
      }
    java.nio.file.Files.write(jsonFile, (updated + "\n").getBytes("UTF-8"))
  }
}
