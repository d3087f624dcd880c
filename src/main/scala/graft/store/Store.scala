package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Engine-managed table catalog (SURVEY §2.A O-2…O-5, §7.1 step 6).
  *
  * The reference persists every layer into MySQL over JDBC and manages
  * it with external DDL + TRUNCATE choreography
  * (tools/database.py:19-151; pipeline_etl.ipynb:469-474,540-556).
  * Here the engine owns its tables: parquet-backed catalog tables with
  * idempotent full-overwrite semantics (the reference's contract,
  * docs/architecture_notes.md:251-254) — no external RDBMS in the
  * execution path.
  *
  * Scale notes: `overwrite` maps to an atomic catalog swap of parquet
  * files (no row-at-a-time JDBC inserts); `partitionBy` turns the fact
  * table into partition-pruned scans (e.g. by year); appends are new
  * files, not transactions.
  */
object Store {

  /** Backtick-quote a (possibly db-qualified) identifier for SQL-text
    * DDL — each dot-separated part quoted, embedded backticks doubled,
    * so names with reserved words or odd characters can't break (or
    * inject into) the statement. */
  def quoted(ident: String): String =
    ident.split('.').map(p => "`" + p.replace("`", "``") + "`").mkString(".")

  /** CREATE DATABASE IF NOT EXISTS + USE (replaces database.py:19-42's
    * DROP/CREATE DATABASE round trip; idempotent). */
  def ensureDatabase(spark: SparkSession, name: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${quoted(name)}")
    spark.catalog.setCurrentDatabase(name)
  }

  /** Idempotent full reload — the TRUNCATE+INSERT contract as one
    * atomic overwrite. Optional partition columns for big tables. */
  def overwrite(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).saveAsTable(table)
  }

  /** Append (the reference's dims/fact append writes, O-3). */
  def append(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).format("parquet").saveAsTable(table)

  /** Bucketed overwrite: co-locates future joins/aggregations on the
    * bucket key — two tables bucketed the same way join with NO
    * exchange on either side, the decisive shuffle-elimination move for
    * repeated large-fact⋈large-fact joins at 100 TB. */
  def overwriteBucketed(
      df: DataFrame, table: String, bucketCols: Seq[String], numBuckets: Int): Unit = {
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Read back a managed table (replaces the JDBC SK read-back O-4 —
    * though with in-plan SKs the round trip itself is gone). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Collect table (+ optional column) statistics so the cost-based
    * optimizer plans from real row counts and NDVs instead of
    * file-size guesses (SURVEY §4: CBO join reordering and broadcast
    * decisions are free once `spark.sql.cbo.enabled` is on AND stats
    * exist — this is the ANALYZE half). Run after each overwrite of a
    * table that feeds multi-join queries; cost is one scan, amortized
    * across every subsequent plan. */
  def analyze(spark: SparkSession, table: String, columns: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE ${quoted(table)} COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE ${quoted(table)} COMPUTE STATISTICS FOR COLUMNS " +
        columns.map(quoted).mkString(", "))
  }

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${quoted(table)}")

  /** Optional JDBC compat sink (SURVEY §2.A O-2's `.write.jdbc` shim):
    * a thin passthrough for users who still need the reference's
    * MySQL-shaped landing zone. Deliberately NOT in the engine's own
    * execution path — row-at-a-time JDBC inserts are the bottleneck the
    * parquet catalog exists to remove (BASELINE.md: the reference
    * spends minutes here) — and it funnels the whole DataFrame through
    * however many partitions it has, so `coalesce` first if the target
    * DB can't take the connection fan-out. Requires the target's JDBC
    * driver on the classpath; fails fast with the driver/URL error
    * otherwise. */
  def writeJdbc(
      df: DataFrame, url: String, table: String,
      properties: java.util.Properties = new java.util.Properties(),
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).jdbc(url, table, properties)

  /** Small-file compaction: rewrite a managed table into
    * ~`targetBytes`-sized files. Streaming sinks and micro-batch
    * appends accumulate file sprawl (every [[append]] is new files),
    * and at 100 TB a table of 10⁶ tiny files spends more time in
    * footer reads and task scheduling than in data — periodic
    * compaction is the standing maintenance job of any large parquet
    * store.
    *
    * Target file count = catalog-stats bytes / targetBytes, clamped to
    * [1, 2²⁰] — the clamp both caps pathological rewrites and absorbs
    * the stats-missing sentinel (`defaultSizeInBytes` = Long.MaxValue
    * for never-ANALYZEd non-file relations), which would otherwise
    * wrap to repartition(0) under Int narrowing. A table CANNOT be
    * overwritten from a plan that reads it, so the rewrite goes
    * through a temp table + catalog swap: write `<table>__compact`,
    * drop the original, rename. The window where the original name is
    * absent is the same non-atomic window Spark's own
    * non-transactional catalog has for overwrite-by-name; callers
    * needing stronger guarantees layer a transactional table format on
    * top. Partitioned/bucketed tables are REJECTED (the plain rewrite
    * would silently strip pruning/co-location metadata) — recompact
    * those via [[overwrite]] with `partitionBy` / [[overwriteBucketed]]
    * instead. */
  def compact(spark: SparkSession, table: String,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    require(meta.partitionColumnNames.isEmpty && meta.bucketSpec.isEmpty,
      s"compact would strip partitioning/bucketing from $table — " +
        "rewrite via overwrite(partitionBy)/overwriteBucketed instead")
    val df = spark.table(table)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = ((bytes + targetBytes - 1) / targetBytes)
      .max(1).min(1L << 20).toInt
    val tmp = table + "__compact"
    df.repartition(nFiles).write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(tmp)
    drop(spark, table)
    spark.sql(s"ALTER TABLE ${quoted(tmp)} RENAME TO ${quoted(table)}")
  }

  /** Persist a full gold layer; fact partitioned if requested. */
  def persistGold(
      gold: Map[String, DataFrame],
      factPartitionBy: Seq[String] = Nil): Unit =
    gold.foreach { case (name, df) =>
      if (name.startsWith("fact_")) overwrite(df, name, factPartitionBy)
      else overwrite(df, name)
    }
}
