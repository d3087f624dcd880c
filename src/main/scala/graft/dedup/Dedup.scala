package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: the reference's latest-per-key window dedup
  * (O-23, pipeline_etl.ipynb:425-429 — the canonical dedup of the
  * engine), plus the large-scale training-data dedup family (exact,
  * MinHash-LSH, SimHash, n-gram Jaccard) layered on top.
  *
  * Scale notes: latest-per-key is a single shuffle on the key with no
  * driver involvement; at 100 TB the partition count follows
  * spark.sql.shuffle.partitions / AQE, and skewed keys are handled by
  * AQE skew handling. The near-dup family avoids the O(n²) all-pairs
  * comparison by LSH banding: candidate pairs only form inside a
  * (band-signature) shuffle bucket.
  */
object Dedup {

  /** O-23: keep exactly one row per key — the arg-max by `order`.
    * Deterministic iff `order` is a total order within a key; callers
    * should append tiebreak columns (the reference's single-column
    * ordering keeps an arbitrary row on ties — we standardize on
    * deterministic tiebreaks, SURVEY §7.4). */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** O-24/O-25 convenience: first row per key under an explicit
    * deterministic ordering (replaces order-dependent
    * `dropDuplicates(keys)`, whose kept row Spark does not specify —
    * the reference relies on that unspecified behavior at
    * pipeline_etl.ipynb:327-328). */
  def firstPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    latestPerKey(df, keys, order)

  /** Exact-duplicate groups by content hash: (content_hash, n_dups,
    * keep_id). Hash-groupBy — one shuffle, map-side partial agg. */
  def exactDupGroups(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))

  /** Exact dedup: keep the min-id row per identical content. */
  def exactDedup(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    latestPerKey(
      df.withColumn("__h", md5(col(contentCol))),
      Seq("__h"),
      Seq(col(idCol).asc)).drop("__h")

  /** Character n-gram shingle set of `text` (distinct, order of first
    * appearance irrelevant — treated as a set). Built-ins only
    * (sequence/transform/substr) so identical shingling is expressible
    * in an ANSI-SQL oracle. Texts shorter than n yield the whole text
    * as the single shingle. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(
      when(length(text) >= n,
        transform(sequence(lit(1), length(text) - n + 1), i => text.substr(i, lit(n))))
        .otherwise(array(text)))

  /** Word n-gram shingles over whitespace-tokenized text. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n), i =>
          array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array(array_join(toks, " "))))
  }

  /** One MinHash value: min over the shingle set of a keyed md5. Using
    * the lexicographic min of md5 hex strings keeps the construction
    * reproducible in any engine with md5(). */
  private def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => md5(concat_ws("", lit(seed.toString), s))))

  /** MinHash signature as `k` columns named minhash_0..minhash_{k-1}. */
  def withMinhashSignature(df: DataFrame, textCol: String, shingleN: Int, k: Int): DataFrame = {
    val sh = shingles(col(textCol), shingleN)
    val withSh = df.withColumn("__sh", sh)
    val sig = (0 until k).map(i => minhash(col("__sh"), i).as(s"minhash_$i"))
    withSh.select((df.columns.map(col).toIndexedSeq ++ sig): _*)
  }

  /** MinHash-LSH candidate pairs: band the k-row signature into
    * `bands` groups of `rowsPerBand`, bucket-join on (band id, band
    * signature), emit distinct (id_a < id_b) candidate pairs. The join
    * is an equi-join on the band key — a plain shuffle join, no
    * cross-product. */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val k = bands * rowsPerBand
    val sig = withMinhashSignature(df.select(col(idCol), col(textCol)), textCol, shingleN, k)
    val banded = sig.select(
      col(idCol).as("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("|", (0 until rowsPerBand).map(r => col(s"minhash_${b * rowsPerBand + r}")): _*)
            .as("bandsig"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bandsig"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bandsig") === col("b.bandsig")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity on shingle sets for a pair DataFrame with
    * columns (id_a, id_b) — verification stage after LSH candidates. */
  def jaccardOnPairs(
      pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), shingles(col(textCol), shingleN).as("__sh"))
    pairs
      .join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / col("uni").cast("double")).as("jaccard"))
  }

  /** 64-bit SimHash over word tokens, via xxhash64 token hashes: sum the
    * per-bit contributions (+1/-1) and keep the sign bit-vector. Pure
    * built-ins: per-bit popcount-style aggregation using
    * shiftrightunsigned. Near-dups then compare by hamming distance. */
  def simhash64(text: Column): Column = {
    val toks = array_distinct(split(trim(lower(text)), "\\s+"))
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      // contribution of bit b: (#tokens with bit set)*2 - #tokens  > 0
      val setCnt = aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftrightunsigned(h, b).bitwiseAND(lit(1L)))
      when(setCnt * 2 > size(toks), shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
