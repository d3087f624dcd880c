package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.ManifestAnn
import graft.store.Manifest

/** ANN-at-rest scaling campaign: probe wall vs the brute-force exact
  * scan as the stored vector count grows 10⁴ → 10⁵ → 10⁶ (64 dims,
  * 64 lists, the shipped [[ManifestAnn]] layout — each append
  * range-partitioned so files ≈ lists). The claim under test is the
  * index's scale story: a probe of p of L lists should cost ~p/L of
  * the full scan because the manifest stats prune the non-probed
  * lists' FILES at planning time — at 100 TB that is the difference
  * between touching 6 % of the corpus and all of it. The probed-list
  * choice itself reads only the folded sidecar (L rows).
  *
  * Vectors are deterministic in-engine arithmetic (no RNG, no data
  * dependency): component d of vector i is ((i·31 + d·17) mod 2000) −
  * 1000. List assignment i mod 64 is deliberately content-blind —
  * probe COST depends only on the probed fraction, not recall, and
  * this campaign measures cost (recall is oracle-checked at q97/q170/
  * q172).
  *
  * Usage: runMain graft.bench.AnnAtRestBench [maxVectors]
  * Prints one JSON line per decade.
  */
object AnnAtRestBench {
  def main(args: Array[String]): Unit = {
    val maxVectors = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files
      .createTempDirectory("graft_annbench").toString + "/ivf"
    val lists = 64
    val dims = 64

    def vecs(from: Long, until: Long) =
      spark.range(from, until).select(
        col("id").as("vec_id"),
        pmod(col("id"), lit(lists.toLong)).as("list"),
        expr(s"transform(sequence(0, ${dims - 1}), " +
          "d -> (id * 31 + d * 17) % 2000 - 1000)").as("qv"))

    val queryQv = (0 until dims).map(d => ((7L * 31 + d * 17) % 2000) - 1000L)

    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    var n = 0L
    var next = 10000L
    while (n < maxVectors) {
      val until = math.min(next, maxVectors)
      // land the decade's growth in ≤100k-row appends (a standing
      // ingest loop's batch scale), then fold the sidecar once
      while (n < until) {
        val hi = math.min(n + 100000L, until)
        ManifestAnn.appendBatch(vecs(n, hi), root, "list", "vec_id", "qv",
          listPartitions = lists)
        n = hi
      }
      ManifestAnn.compactCents(spark, root, "list")
      val files = Manifest.current(spark, root).get.files.size

      def brute(): Unit = {
        val qlit = typedLit(queryQv)
        Manifest.read(spark, root)
          .select(col("vec_id"),
            graft.similarity.Similarity.cosineQ(col("qv"), qlit).as("c"))
          .orderBy(col("c").desc, col("vec_id").asc).limit(10)
          .collect(); ()
      }
      def probe(p: Int): Unit = {
        ManifestAnn.probe(spark, root, "list", "vec_id", "qv", queryQv,
          nProbe = p, k = 10).collect(); ()
      }
      // one unmeasured warmup each, then median of 5
      brute(); probe(4); probe(8)
      val tB = (0 until 5).map(_ => sec(brute()))
      val t4 = (0 until 5).map(_ => sec(probe(4)))
      val t8 = (0 until 5).map(_ => sec(probe(8)))
      println(s"""{"campaign":"ann_at_rest","vectors":$n,"files":$files""" +
        f""","brute_s":${median(tB)}%.3f,"probe4_s":${median(t4)}%.3f""" +
        f""","probe8_s":${median(t8)}%.3f""" +
        f""","probe4_frac":${median(t4) / median(tB)}%.3f""" +
        f""","probe8_frac":${median(t8) / median(tB)}%.3f}""")

      // PQ/ADC compression point: rebuild the codes layer over the
      // decade's rows (the offline maintenance action), then compare
      // the COMPRESSED probe against the full-vector probe — wall and,
      // the 100 TB story, planner-equivalent bytes of the probed lists'
      // files (union of the stats-pruned file sets, exactly what the
      // scan's IN-filter admits) on the codes table vs the main table.
      ManifestAnn.buildPq(spark, root, "list", "vec_id", "qv",
        listPartitions = lists)
      def probePq(p: Int): Unit = {
        ManifestAnn.probePq(spark, root, "list", "vec_id", "qv", queryQv,
          nProbe = p, k = 10, rerank = 4).collect(); ()
      }
      probePq(4) // warmup
      val tP4 = (0 until 5).map(_ => sec(probePq(4)))
      // routing as the probe does it: top-4 lists by centroid-sum cosine
      val qlit = typedLit(queryQv)
      val probed = ManifestAnn.centroidSums(spark, root, "list")
        .select(col("list"),
          graft.similarity.Similarity.cosineQ(col("cvec"), qlit).as("c"))
        .orderBy(col("c").desc, col("list").asc).limit(4)
        .select("list").collect().map(_.getLong(0)).toSeq
      def probedBytes(tableRoot: String): Long = {
        val snap = Manifest.current(spark, tableRoot).get
        probed.flatMap(l => Manifest.prunedFiles(snap, "list", l, l))
          .distinct.map(f => snap.bytes.getOrElse(f, 0L)).sum
      }
      val mainB = probedBytes(root)
      val codesB = probedBytes(ManifestAnn.codesRoot(root))
      println(s"""{"campaign":"ann_pq_at_rest","vectors":$n""" +
        f""","probe4_s":${median(t4)}%.3f,"probepq4_s":${median(tP4)}%.3f""" +
        s""","main_probe_bytes":$mainB,"codes_probe_bytes":$codesB""" +
        f""","bytes_shrink":${mainB.toDouble / math.max(codesB, 1L)}%.1f}""")

      // id-bloom point-lookup delta on the CODES table: the codes
      // layout is range-partitioned on the LIST id, so a lookup BY
      // VECTOR id survives every file's stats — without the bloom
      // sidecar (built by buildPq above) it scans the whole codes
      // table; with it, the file(s) whose sketch might contain the id
      val lookupId = n / 2
      val codesSnap = Manifest.current(spark,
        ManifestAnn.codesRoot(root)).get
      val bloomFiles = {
        // candidate count the bloom admits = files the lookup scans
        val got = ManifestAnn.codesById(spark, root, lookupId)
        got.collect()
        var plan = got.queryExecution.executedPlan
        plan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            plan = a.executedPlan
          case _ =>
        }
        def walk(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
          p.collect {
            case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              walk(q.plan)
          }.flatten
        walk(plan).map(_.metrics("numFiles").value).sum
      }
      ManifestAnn.codesById(spark, root, lookupId).collect() // warm
      val tLk = (0 until 5).map(_ =>
        sec { ManifestAnn.codesById(spark, root, lookupId).collect(); () })
      println(s"""{"campaign":"ann_pq_id_lookup","vectors":$n""" +
        s""","codes_files":${codesSnap.files.size},"bloom_files":$bloomFiles""" +
        f""","lookup_s":${median(tLk)}%.3f}""")
      next *= 10
    }
    spark.stop()
  }
}
