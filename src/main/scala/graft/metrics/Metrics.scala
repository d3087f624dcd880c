package graft.metrics

import java.nio.file.{Files, Paths}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Run metrics (O-6/O-29): counts, rates, anomaly counts → timestamped
  * JSON, mirroring pipeline_etl.ipynb:708-745 and the recorded runs in
  * metrics/metrics_*.json. All aggregates are computed in ONE Spark job
  * over the silver table (the reference runs four separate actions).
  */
case class RunMetrics(
    startedAt: String,
    finishedAt: String,
    durationSec: Double,
    rowsIn: Long,
    rowsOut: Long,
    rowsRejected: Long,
    avgCompleteness: Double,
    nutriscoreCoverage: Double,
    sugarAnomalies: Long) {

  def toJson: String = {
    def f(d: Double) = if (d.isNaN) "null" else d.toString
    s"""{"started_at":"$startedAt","finished_at":"$finishedAt",""" +
      s""""duration_sec":${f(durationSec)},"rows_in":$rowsIn,"rows_out":$rowsOut,""" +
      s""""rows_rejected":$rowsRejected,"avg_completeness":${f(avgCompleteness)},""" +
      s""""nutriscore_coverage":${f(nutriscoreCoverage)},"sugar_anomalies":$sugarAnomalies}"""
  }
}

object Metrics {

  /** Single-pass silver metrics (pipeline_etl.ipynb:708-717). */
  def compute(silver: DataFrame, rowsIn: Long, startedAtMs: Long, finishedAtMs: Long): RunMetrics = {
    val row = silver.agg(
      count(lit(1)).as("rows_out"),
      avg(col("completeness")).as("avg_completeness"),
      (sum(when(col("nutriscore_grade").isNotNull, 1L).otherwise(0L)).cast("double") /
        count(lit(1))).as("nutriscore_coverage"),
      coalesce(sum(when(col("sugars_100g") > 100, 1L).otherwise(0L)), lit(0L)).as("sugar_anomalies")
    ).collect()(0)
    val rowsOut = row.getLong(0)
    val fmt = DateTimeFormatter.ISO_OFFSET_DATE_TIME
    RunMetrics(
      startedAt = ZonedDateTime.ofInstant(java.time.Instant.ofEpochMilli(startedAtMs), ZoneOffset.UTC).format(fmt),
      finishedAt = ZonedDateTime.ofInstant(java.time.Instant.ofEpochMilli(finishedAtMs), ZoneOffset.UTC).format(fmt),
      durationSec = (finishedAtMs - startedAtMs) / 1000.0,
      rowsIn = rowsIn,
      rowsOut = rowsOut,
      rowsRejected = rowsIn - rowsOut,
      avgCompleteness = if (row.isNullAt(1)) Double.NaN else row.getDouble(1),
      nutriscoreCoverage = if (row.isNullAt(2)) Double.NaN else row.getDouble(2),
      sugarAnomalies = row.getLong(3))
  }

  /** Timestamped JSON dump (pipeline_etl.ipynb:730-745). */
  def writeJson(m: RunMetrics, dir: String): String = {
    Files.createDirectories(Paths.get(dir))
    val stamp = ZonedDateTime.now(ZoneOffset.UTC)
      .format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
    val path = Paths.get(dir, s"metrics_$stamp.json")
    Files.writeString(path, m.toJson)
    path.toString
  }
}
