package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE at PRODUCTION vocabulary size (VERDICT r12 #4): x117 proved 1k
  * merges flat across corpus decades; this campaign trains the full
  * 32k-merge vocabulary (the public BPE papers' operating point,
  * Sennrich arXiv:1508.07909) and measures the batch-size sensitivity
  * (32 vs 256), confirming the claimed cost model: round count — not
  * corpus size — is the only cost axis once the corpus collapses to
  * the distinct-word table.
  *
  * The ScaleGen corpus cannot sustain 32k merges (2,048 distinct words
  * ⇒ ~13k total possible merges before every word is one symbol), so
  * the bench mints its own merge-rich corpus: ~60k distinct base-26
  * words (Σ(len−1) ≈ 270k possible merges), docs of 40 words, at two
  * corpus scales (1× = 50k docs, 10× = 500k docs) to show the decades
  * separate only in the first word-frequency pass.
  *
  * Emits `x118_bpe32k` into BENCH_SCALE.json:
  * `{"b32_1x":s,"b32_10x":s,"b256_10x":s,"merges":n}`.
  */
object BpeVocabBench {

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Deterministic word for id: base-26 over 'a'..'z', length 4+. */
  private def word(id: Long): String = {
    var x = id; val sb = new StringBuilder
    while (sb.length < 4 || x > 0) { sb.append(('a' + (x % 26)).toChar); x /= 26 }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_bpe32k")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val distinctWords = 60000
    Seq(("c1x", 50000), ("c10x", 500000)).foreach { case (g, nDocs) =>
      val path = s"$base/$g/docs.parquet"
      if (!BenchFs.exists(spark, path)) {
        System.err.println(s"[bpe32k] generating $path ($nDocs docs)")
        val rnd = new java.util.Random(11)
        val rows = (0 until nDocs).map { i =>
          (i.toLong, Array.fill(40)(word(rnd.nextInt(distinctWords).toLong)).mkString(" "))
        }
        spark.createDataset(rows).toDF("doc_id", "text")
          .repartition(32).write.mode("overwrite").parquet(path)
      }
    }

    def run(g: String, batch: Int): (Double, Long) = {
      graft.CacheReset(spark)
      val docs = spark.read.parquet(s"$base/$g/docs.parquet")
      val t0 = System.nanoTime()
      val merges = graft.text.Curation
        .trainBpeBatched("text", nMerges = 32000, batch = batch)(docs)
        .count()
      ((System.nanoTime() - t0) / 1e9, merges)
    }

    val (b32_1x, m1) = run("c1x", 32)
    System.err.println(f"[bpe32k] 1x  batch=32:  $b32_1x%.1fs ($m1 merges)")
    val (b32_10x, m2) = run("c10x", 32)
    System.err.println(f"[bpe32k] 10x batch=32:  $b32_10x%.1fs ($m2 merges)")
    val (b256_10x, m3) = run("c10x", 256)
    System.err.println(f"[bpe32k] 10x batch=256: $b256_10x%.1fs ($m3 merges)")

    val jsonFile = java.nio.file.Paths.get("BENCH_SCALE.json")
    val existing: Map[String, String] = if (java.nio.file.Files.exists(jsonFile)) {
      val txt = new String(java.nio.file.Files.readAllBytes(jsonFile), "UTF-8")
      """"([qx]\d+\w*)"\s*:\s*(\{[^}]*\})""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2)).toMap
    } else Map.empty
    val merged = existing + ("x118_bpe32k" ->
      s"""{"b32_1x":${fmt(b32_1x)},"b32_10x":${fmt(b32_10x)},"b256_10x":${fmt(b256_10x)},"merges":$m2}""")
    val json = merged.toSeq.sortBy(_._1)
      .map { case (n, v) => s""""$n":$v""" }.mkString("{", ",", "}")
    java.nio.file.Files.write(jsonFile, (json + "\n").getBytes("UTF-8"))

    println(f"| corpus | batch | wall (s) | merges |")
    println(f"|---|---|---|---|")
    println(f"| 1x (50k docs) | 32 | ${fmt(b32_1x)} | $m1 |")
    println(f"| 10x (500k docs) | 32 | ${fmt(b32_10x)} | $m2 |")
    println(f"| 10x (500k docs) | 256 | ${fmt(b256_10x)} | $m3 |")
    spark.stop()
  }
}
