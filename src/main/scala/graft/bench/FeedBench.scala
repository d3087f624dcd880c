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

    val jsonFile = java.nio.file.Paths.get("BENCH_SCALE.json")
    val existing: Map[String, String] = if (java.nio.file.Files.exists(jsonFile)) {
      val txt = new String(java.nio.file.Files.readAllBytes(jsonFile), "UTF-8")
      """"([qx]\d+\w*)"\s*:\s*(\{[^}]*\})""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2)).toMap
    } else Map.empty
    val merged = existing +
      ("x165_mirror_loop" ->
        s"""{"first10":${fmt(first10)},"last10":${fmt(last10)},"max_files":$maxFiles,"batches":$nBatches,"rows":$total}""")
    val json = merged.toSeq.sortBy(_._1)
      .map { case (n, v) => s""""$n":$v""" }.mkString("{", ",", "}")
    java.nio.file.Files.write(jsonFile, (json + "\n").getBytes("UTF-8"))
    println(s"x165_mirror_loop first10=${fmt(first10)} last10=${fmt(last10)} maxFiles=$maxFiles")
    spark.stop()
  }
}
