package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
