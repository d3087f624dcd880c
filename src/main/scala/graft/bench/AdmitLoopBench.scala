package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** STEADY-STATE corpus-index maintenance campaign (VERDICT r12 #6):
  * the admit loops are measured per-batch (SemLoopBench) but never
  * across a long admit→compact→screen cycle. Here: bootstrap the text
  * corpus index from the g1x corpus (5k docs), then admit 40
  * consecutive ~250-doc batches ([[graft.dedup.Dedup.admitBatch]],
  * compaction interleaved in-loop by `compactMinFiles`), sampling
  * per-batch screen-and-admit wall time and the index tables' file
  * counts. The claims under test: screening latency stays FLAT (no
  * creep from accumulated small files — the in-loop
  * maintainCorpusIndex compaction is doing its job) and file counts
  * stay bounded (fileReport's needs_compaction never sticks).
  *
  * Emits `x160_admit_loop` into BENCH_SCALE.json:
  * `{"first10":s,"last10":s,"max_files":n,"batches":40}` — first-10
  * vs last-10 mean per-batch seconds is the creep measure.
  */
object AdmitLoopBench {

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
    import graft.dedup.Dedup

    if (!BenchFs.exists(spark, s"$base/g1x/documents.parquet")) {
      System.err.println(s"[admitloop] generating $base/g1x")
      ScaleGen.docs(spark, 5000, seed = 42)
        .write.mode("overwrite").parquet(s"$base/g1x/documents.parquet")
    }
    val corpus = spark.read.parquet(s"$base/g1x/documents.parquet")
      .select("doc_id", "text")
    val hashedT = "graft_admitloop_hashed"
    val bandedT = "graft_admitloop_banded"
    graft.store.Store.drop(spark, hashedT)
    graft.store.Store.drop(spark, bandedT)
    Dedup.writeCorpusIndex(corpus, "doc_id", "text", Dedup.CharShingles(5),
      8, 4, hashedT, bandedT)

    // 40 disjoint-id batches from the 10x generator tail (ids offset
    // past the corpus, deterministic content, ~10% near-dup rate like
    // the corpus itself so the screen has real work)
    val nBatches = 40
    val batchRows = 250
    val pool = ScaleGen.docs(spark, nBatches * batchRows, seed = 77)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .localCheckpoint()

    val laps = new scala.collection.mutable.ArrayBuffer[Double](nBatches)
    var maxFiles = 0L
    var admittedTotal = 0L
    (0 until nBatches).foreach { b =>
      val batch = pool.filter(col("doc_id") % nBatches === b)
      val t0 = System.nanoTime()
      val admitted = Dedup.admitBatch(batch, "doc_id", "text",
        Dedup.CharShingles(5), 8, 4, hashedT, bandedT,
        minJaccard = 0.5, compactMinFiles = 48)
      admittedTotal += admitted.count()
      laps += (System.nanoTime() - t0) / 1e9
      val files = graft.store.Store.fileReport(spark, hashedT)
        .agg(sum(col("n_files"))).head().getLong(0) +
        graft.store.Store.fileReport(spark, bandedT)
          .agg(sum(col("n_files"))).head().getLong(0)
      maxFiles = math.max(maxFiles, files)
      if (b % 10 == 9)
        System.err.println(f"[admitloop] batch $b: ${laps.last}%.2fs, $files files, " +
          f"$admittedTotal admitted so far")
    }

    val first10 = laps.take(10).sum / 10
    val last10 = laps.takeRight(10).sum / 10
    System.err.println(f"[admitloop] first10=${first10}%.2fs last10=${last10}%.2fs " +
      f"maxFiles=$maxFiles admitted=$admittedTotal")

    // ATOMIC-STORE TWIN: the identical 40-batch loop through
    // admitBatchManifest (snapshot-committed index roots, in-loop
    // Manifest.compact+gc) — measures what the atomic layer costs the
    // standing loop. The commit itself is one rename + a small JSON
    // regardless of table size; the difference shows mostly in the
    // manifest file-list read per probe.
    val mBase = java.nio.file.Files.createTempDirectory("graft_admitloop_m").toString
    val (hRoot, bRoot) = (s"$mBase/hashed", s"$mBase/banded")
    Dedup.writeCorpusIndexManifest(corpus, "doc_id", "text", Dedup.CharShingles(5),
      8, 4, hRoot, bRoot)
    val lapsM = new scala.collection.mutable.ArrayBuffer[Double](nBatches)
    var admittedM = 0L
    (0 until nBatches).foreach { b =>
      val batch = pool.filter(col("doc_id") % nBatches === b)
      val t0 = System.nanoTime()
      val admitted = Dedup.admitBatchManifest(batch, "doc_id", "text",
        Dedup.CharShingles(5), 8, 4, hRoot, bRoot,
        minJaccard = 0.5, compactMinFiles = 48)
      admittedM += admitted.count()
      lapsM += (System.nanoTime() - t0) / 1e9
    }
    val first10M = lapsM.take(10).sum / 10
    val last10M = lapsM.takeRight(10).sum / 10
    System.err.println(f"[admitloop] ATOMIC first10=${first10M}%.2fs last10=${last10M}%.2fs " +
      f"admitted=$admittedM (catalog admitted $admittedTotal — must match)")
    require(admittedM == admittedTotal,
      s"atomic loop admitted $admittedM vs catalog $admittedTotal — verdict divergence")

    val jsonFile = java.nio.file.Paths.get("BENCH_SCALE.json")
    val existing: Map[String, String] = if (java.nio.file.Files.exists(jsonFile)) {
      val txt = new String(java.nio.file.Files.readAllBytes(jsonFile), "UTF-8")
      """"([qx]\d+\w*)"\s*:\s*(\{[^}]*\})""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2)).toMap
    } else Map.empty
    val merged = existing ++ Map(
      "x160_admit_loop" ->
        s"""{"first10":${fmt(first10)},"last10":${fmt(last10)},"max_files":$maxFiles,"batches":$nBatches}""",
      "x161_admit_loop_atomic" ->
        s"""{"first10":${fmt(first10M)},"last10":${fmt(last10M)},"batches":$nBatches}""")
    val json = merged.toSeq.sortBy(_._1)
      .map { case (n, v) => s""""$n":$v""" }.mkString("{", ",", "}")
    java.nio.file.Files.write(jsonFile, (json + "\n").getBytes("UTF-8"))

    println("| store | first-10 mean (s) | last-10 mean (s) |")
    println("|---|---|---|")
    println(s"| catalog | ${fmt(first10)} | ${fmt(last10)} |")
    println(s"| atomic manifest | ${fmt(first10M)} | ${fmt(last10M)} |")
    println(s"| max catalog index files | $maxFiles | |")
    graft.store.Store.drop(spark, hashedT)
    graft.store.Store.drop(spark, bandedT)
    spark.stop()
  }
}
