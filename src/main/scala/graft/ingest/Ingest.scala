package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod, size, split}

/** Sources + early projection (SURVEY §2.A / §2.B O-1, O-7, O-8).
  *
  * O-1 reproduces the reference's TSV read options exactly
  * (pipeline_etl.ipynb:93-102): header, tab separator, quote/escape `"`,
  * multiLine, PERMISSIVE — every column lands as a string (schema-on-read).
  */
object Ingest {

  /** O-1: bronze CSV/TSV scan. All columns inferred as strings. */
  def bronzeCsv(spark: SparkSession, path: String, sep: String = "\t"): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** The SPLITTABLE bronze scan — [[bronzeCsv]] minus `multiLine`.
    *
    * `multiLine=true` (reference parity: a quoted field may legally
    * span line breaks) makes every FILE one task: Spark cannot chop the
    * file at arbitrary byte offsets because an offset may land inside a
    * quoted region, and the per-byte cost of the multiline parser is
    * higher besides. At 100× reference scale the silver stage is ~80%
    * of pipeline wall and the CSV parse is the single-task cost no
    * post-scan exchange can recover (measured — see
    * [[graft.pipeline.OffPipeline.silver]]'s note). When the corpus is
    * known quoted-newline-free, `multiLine=false` restores
    * maxPartitionBytes splitting (parallelism follows BYTES, not file
    * count) and the cheaper line-mode parser.
    *
    * "Known" is PROVEN, not assumed: the guard makes one splittable
    * `text` pass over the corpus counting lines with ODD quote parity.
    * With the doubled-quote escape convention (`quote = escape = "`), a
    * record confined to one physical line always carries an even number
    * of `"` characters (field delimiters pair up; embedded quotes are
    * doubled), while a record broken across lines leaves each fragment
    * with an open quote — odd parity. One odd-parity line anywhere →
    * loud throw naming the fix (the multiLine scan), never a silently
    * shredded record. The guard is conservative by design: a stray
    * unbalanced quote from a malformed writer also throws rather than
    * risk mis-splitting. Callers that ingest the same immutable corpus
    * repeatedly can skip the re-proof with `validate = false`.
    *
    * Cost: the guard is one narrow scan (split → size → parity — all
    * codegen, no data movement) that parallelizes across the same byte
    * splits the fast read then enjoys; at 100 TB it is strictly cheaper
    * than a single mis-parallelized multiline pass. */
  def bronzeCsvSplittable(
      spark: SparkSession, path: String, sep: String = "\t",
      validate: Boolean = true): DataFrame = {
    if (validate) {
      val oddParity = spark.read.text(path)
        // n quote chars = (parts after split on ") - 1; odd n ⇔ even parts
        .filter(pmod(size(split(col("value"), "\"", -1)), lit(2)) === 0)
        .limit(1).count()
      require(oddParity == 0L,
        s"bronzeCsvSplittable: $path has a line with unbalanced quotes — a quoted " +
          "field spans line breaks (or the file is malformed); splitting it at line " +
          "boundaries would shred records. Use bronzeCsv (multiLine=true) instead.")
    }
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", "false")
      .option("mode", "PERMISSIVE")
      .csv(path)
  }

  /** JSON-lines scan (one object per line — the interchange format of
    * most web-corpus dumps). `schema = None` infers (requiring an extra
    * pass over the data — fine interactively, wasteful in a pipeline);
    * production callers pass the schema so the scan is single-pass and
    * malformed rows land in PERMISSIVE nulls instead of failing the
    * job. Unlike the bronze TSV, JSONL is SPLITTABLE (one record per
    * line, no multi-line quoting), so scan parallelism follows file
    * size, not file count. */
  def jsonLines(
      spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.option("mode", "PERMISSIVE")
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** ORC scan — the other columnar format a warehouse migration brings
    * along; Spark's vectorized reader handles it like parquet
    * (pushdown, pruning). */
  def orc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)

  /** O-7: allowlist projection, skipping columns absent in the source
    * (pipeline_etl.ipynb:167-175). Manual pruning is kept as the schema
    * contract even though Catalyst would prune anyway. */
  def selectExisting(df: DataFrame, allowlist: Seq[String]): DataFrame = {
    val present = allowlist.filter(df.columns.contains)
    df.select(present.map(col): _*)
  }

  /** O-8: `-` → `_` column renames for downstream schema compatibility
    * (pipeline_etl.ipynb:179-181). Single `toDF` call, not N
    * `withColumnRenamed` plan nodes. */
  def renameDashes(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.replace("-", "_")): _*)
}
