package graft.bench

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic 1×/10× twin datasets for the scaling measurement
  * (BENCH_SCALE.md): the SAME generator at two sizes, so per-query
  * time ratios isolate how cost grows with n — corpus shape, dup
  * density, and value distributions are held constant by construction.
  *
  * Shape follows the driver's `documents`/`orders` tables (same
  * columns and types, same language/source split, word-salad docs),
  * with one deliberate difference: the vocabulary is ~2,000 words
  * (driver: ~40), so near-dup structure comes from the INJECTED
  * mutation process — each doc is, with fixed probability, a
  * lightly-mutated copy of an earlier doc — rather than from
  * accidental whole-vocabulary collisions. A fixed per-doc dup rate is
  * how a real corpus scales (clusters grow linearly with n); a 40-word
  * vocab at 10× the docs would instead densify quadratically and
  * measure the corpus, not the engine.
  *
  * The same requirement holds one level down, at CHARACTER granularity
  * — learned the hard way. The first vocabulary was 2,048 products of
  * 16 syllables ("sparker", "sparking", "sparkerix"…): distinct as
  * WORDS, but sharing most of their char 5-grams, which put the
  * char-shingle Jaccard of two UNRELATED docs around the 0.25 dedup
  * threshold. Measured on that corpus, ~1% of ALL doc pairs were true
  * near-dups (1×: 119,970 verified pairs over 5,000 docs; 10×:
  * 11.65M over 50,000 — 97×, pure n²), so every char-shingle query's
  * OUTPUT was quadratic while the word-shingle twin stayed linear
  * (510 → 5,692 candidates, 11.2×). No engine outruns its own output
  * size; the corpus, not the plan, was super-linear. Words are now
  * independent random letter strings, so distinct words share almost
  * no 5-grams and char-level near-dup structure, like word-level, comes
  * only from the injected mutations. */
object ScaleGen {

  private val Priorities =
    Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Word list: 2,048 distinct random-letter words (5–9 chars), zipf-ish
    * sampled. Letter-level independence between words is load-bearing:
    * see the char-granularity note in the object scaladoc. */
  private val Vocab: Array[String] = {
    val rnd = new java.util.Random(7)
    val seen = new java.util.LinkedHashSet[String]()
    while (seen.size < 2048) {
      val len = 5 + rnd.nextInt(5)
      val sb = new StringBuilder(len)
      var i = 0
      while (i < len) { sb.append(('a' + rnd.nextInt(26)).toChar); i += 1 }
      seen.add(sb.toString)
    }
    seen.toArray(new Array[String](0))
  }

  private def pickWord(rnd: java.util.Random): String = {
    // quadratic skew: low ranks dominate, tail still exercised
    val u = rnd.nextDouble()
    Vocab(((u * u) * Vocab.length).toInt.min(Vocab.length - 1))
  }

  /** n documents; ~10% are near-dup mutations of an earlier doc (1–3
    * words swapped), matching the driver corpus's cluster-bearing
    * structure at a rate independent of n. */
  def docs(spark: SparkSession, n: Int, seed: Long): DataFrame = {
    val rnd = new java.util.Random(seed)
    val langs = Array("en", "en", "en", "en", "fr", "de", "es", "zh")
    val texts = new ArrayBuffer[Array[String]](n)
    val rows = new ArrayBuffer[(Long, String, String, String, Int)](n)
    var i = 0
    while (i < n) {
      val words: Array[String] =
        if (i > 20 && rnd.nextDouble() < 0.10) {
          val base = texts(rnd.nextInt(i)).clone()
          var m = 1 + rnd.nextInt(3)
          while (m > 0) {
            base(rnd.nextInt(base.length)) = pickWord(rnd); m -= 1
          }
          base
        } else {
          Array.fill(8 + rnd.nextInt(93))(pickWord(rnd))
        }
      texts += words
      val text = words.mkString(" ")
      rows += ((i.toLong, text, langs(rnd.nextInt(langs.length)),
        "src" + rnd.nextInt(20), text.length))
      i += 1
    }
    import spark.implicits._
    spark.createDataset(rows.toSeq)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(32)
  }

  /** n embedding vectors (64 dims, same schema as the driver table:
    * vec_id, embedding FLOAT[], label INT): 10 deterministic cluster
    * centers with per-vector noise, and — mirroring [[docs]] — ~10% of
    * vectors are small perturbations of an earlier vector, so
    * embedding-space near-dup structure grows linearly with n (fixed
    * per-vector dup rate, not density). */
  def embeddings(spark: SparkSession, n: Int, seed: Long): DataFrame = {
    val rnd = new java.util.Random(seed)
    val dims = 64
    val centers = Array.fill(10, dims)((rnd.nextDouble() * 1.6 - 0.8).toFloat)
    val vecs = new ArrayBuffer[Array[Float]](n)
    val rows = new ArrayBuffer[(Long, Seq[Float], Int)](n)
    var i = 0
    while (i < n) {
      val (v, label) =
        if (i > 20 && rnd.nextDouble() < 0.10) {
          val base = vecs(rnd.nextInt(i))
          val out = base.clone()
          var m = 1 + rnd.nextInt(4)
          while (m > 0) {
            val d = rnd.nextInt(dims)
            out(d) = (out(d) + (rnd.nextDouble() * 0.04 - 0.02)).toFloat
            m -= 1
          }
          (out, rows(rnd.nextInt(i))._3)
        } else {
          val label = rnd.nextInt(10)
          (Array.tabulate(dims)(d =>
            (centers(label)(d) + (rnd.nextDouble() * 0.6 - 0.3)).toFloat), label)
        }
      vecs += v
      rows += ((i.toLong, v.toSeq, label))
      i += 1
    }
    import spark.implicits._
    spark.createDataset(rows.toSeq)
      .toDF("vec_id", "embedding", "label")
      .repartition(32)
  }

  /** n orders, all-expression generation (no driver loop at 1.5M rows);
    * same schema/types as the driver table, ~n/10 customers, ~6.5 years
    * of dates. */
  def orders(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).selectExpr(
      "id AS o_orderkey",
      s"pmod(xxhash64(id, 1L), ${math.max(n / 10, 1)}L) AS o_custkey",
      "CASE CAST(pmod(xxhash64(id, 2L), 10) AS INT) WHEN 0 THEN 'F' WHEN 1 THEN 'P' ELSE 'O' END AS o_orderstatus",
      "CAST(pmod(xxhash64(id, 3L), 40000000) AS DOUBLE) / 100.0 AS o_totalprice",
      "CAST(date_add(DATE '1995-01-01', CAST(pmod(xxhash64(id, 4L), 2400) AS INT)) AS TIMESTAMP) AS o_orderdate",
      "CASE CAST(pmod(xxhash64(id, 5L), 5) AS INT) WHEN 0 THEN '1-URGENT' WHEN 1 THEN '2-HIGH' WHEN 2 THEN '3-MEDIUM' WHEN 3 THEN '4-NOT SPECIFIED' ELSE '5-LOW' END AS o_orderpriority")

  /** Writes `<out>/g1x` (driver-sf0.1-sized) and `<out>/g10x` (10×). */
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_scale")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq(("g1x", 5000, 150000L), ("g10x", 50000, 1500000L)).foreach {
      case (name, nDocs, nOrders) =>
        docs(spark, nDocs, seed = 42)
          .write.mode("overwrite").parquet(s"$out/$name/documents.parquet")
        orders(spark, nOrders)
          .write.mode("overwrite").parquet(s"$out/$name/orders.parquet")
        println(s"[scalegen] wrote $out/$name (docs=$nDocs, orders=$nOrders)")
    }
    spark.stop()
  }
}
