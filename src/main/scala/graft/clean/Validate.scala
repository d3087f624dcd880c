package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic fill, range validation, derivations, time parts — operators
  * O-13…O-21 (SURVEY §2.B). Reference: pipeline_etl.ipynb:270-436.
  */
object Validate {

  /** O-13 validity predicate: a value is usable iff non-null and its
    * lowercase form is not a semantic-missing marker
    * (pipeline_etl.ipynb:284-286). Returns NULL when invalid (for use in
    * `coalesce`). */
  def validOrNull(c: Column, invalidVals: Seq[String]): Column =
    when(c.isNotNull && !lower(c).isin(invalidVals: _*), c)

  /** O-13 + O-14: semantic default fill then 255-char truncation, per
    * (column, fallback, default) spec (pipeline_etl.ipynb:281-302).
    * Fallback column is consumed (dropped) when present. */
  def fillDefaults(
      df: DataFrame,
      specs: Seq[(String, Option[String], String)],
      invalidVals: Seq[String],
      truncateTo: Int = 255): DataFrame =
    specs.foldLeft(df) { case (d, (main, fallback, default)) =>
      if (!d.columns.contains(main)) d
      else {
        val sources = validOrNull(col(main), invalidVals) +:
          fallback.filter(d.columns.contains).map(f => validOrNull(col(f), invalidVals)).toSeq
        val filled = coalesce(sources :+ lit(default): _*)
        val out = d.withColumn(main, substring(filled, 1, truncateTo))
        fallback.filter(d.columns.contains).fold(out)(out.drop)
      }
    }

  /** O-15: multi-valued string → real array (pipeline_etl.ipynb:305-308).
    * The reference then casts back to string purely for MySQL; internally
    * we keep the ArrayType. */
  def splitToArray(c: Column): Column = split(c, ",\\s*")

  /** MySQL-compat boundary: array → the reference's `"[a, b]"` string
    * form (pipeline_etl.ipynb:310-312). */
  def arrayToCompatString(c: Column): Column =
    concat(lit("["), array_join(c, ", "), lit("]"))

  /** O-16: range-validation null-out — out-of-bounds values become NULL
    * so they cannot skew downstream aggregates
    * (pipeline_etl.ipynb:345-364). */
  def boundsNullOut(df: DataFrame, bounds: Seq[(String, (Double, Double))]): DataFrame = {
    val byName = bounds.toMap
    val cols = df.schema.fieldNames.map { n =>
      byName.get(n) match {
        case Some((lo, hi)) =>
          when(col(n) >= lo && col(n) <= hi, col(n)).otherwise(lit(null)).as(n)
        case None => col(n)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** O-17 + O-18: salt ⇄ sodium estimation (×2.5 / ÷2.5) with coalesce
    * fill, then kcal → kJ (×4.184) (pipeline_etl.ipynb:366-381). Done in
    * one select — no transient `*_est` columns in the plan. */
  def deriveNutrients(df: DataFrame): DataFrame = {
    val hasSalt = df.columns.contains("salt_100g")
    val hasSodium = df.columns.contains("sodium_100g")
    val hasKcal = df.columns.contains("energy_kcal_100g")
    val d1 =
      if (hasSalt && hasSodium)
        df.withColumn("salt_100g", coalesce(col("salt_100g"), col("sodium_100g") * 2.5))
          .withColumn("sodium_100g", coalesce(col("sodium_100g"), col("salt_100g") / 2.5))
      else df
    if (hasKcal) d1.withColumn("energy_kj_100g", col("energy_kcal_100g") * 4.184) else d1
  }

  /** O-19: round to 1 decimal (HALF_UP, matching the reference's Spark
    * `round`) (pipeline_etl.ipynb:385-388). */
  def roundCols(df: DataFrame, names: Seq[String], scale: Int = 1): DataFrame = {
    val targets = names.filter(df.columns.contains).toSet
    val cols = df.schema.fieldNames.map { n =>
      if (targets(n)) round(col(n), scale).as(n) else col(n)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** O-20: unix seconds → timestamp + date (pipeline_etl.ipynb:405-411);
    * session timezone is pinned UTC. */
  def addTimeParts(df: DataFrame, tsCol: String = "last_modified_t"): DataFrame =
    df.withColumn("last_modified_ts", to_timestamp(col(tsCol).cast("double")))
      .withColumn("last_modified_date", to_date(col("last_modified_ts")))

  /** O-21: valid-code predicate (pipeline_etl.ipynb:432-436). */
  def validCode(c: Column): Column = c.isNotNull && c =!= "" && c =!= "null"
}
