package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic generator of a reference-shaped Open Food Facts TSV at
  * the published baseline scale (418,676 rows × 215 columns, ~120 MB —
  * BASELINE.md; docs/readme.md:27-28), so Bench can measure the full
  * Bronze→Silver→Gold pipeline against the reference's recorded
  * end-to-end runs (metrics_20260129_235133.json:4-7).
  *
  * Index-arithmetic only (no RNG), so every run generates byte-identical
  * input. Shapes mirror FIXTURES.md A1: raw dashed column names, accents
  * and ™ marks for the clean chain, invalid-marker values, multi-country
  * lists, out-of-bounds nutrients, salt-only/sodium-only rows, duplicate
  * codes with older timestamps (dedup fodder, ~26 rows like the
  * reference's 25), empty/"null" codes (O-21 rejects), plus 198 filler
  * columns so the CSV scan parses the same column count the reference
  * pays for.
  */
object OffTsvGen {

  val ReferenceRows: Long = 418676L

  def generate(spark: SparkSession, path: String, rows: Long = ReferenceRows): Unit =
    df(spark, rows)
      .write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .csv(path)

  def df(spark: SparkSession, rows: Long): DataFrame = {
    val i = col("id")
    val names = Seq("Côte d'Or™ Chocolat", "Muesli Croustillant", "Jus d'Orange Bio",
      "Fromage à Pâte Molle", "Galletas María", "Späzle Natur", "Crème Brûlée", "Pain Complet")
    val countries = Seq("France", "France, Belgium", "Spain", "Germany, Austria",
      "undefined", "Italy", "n/a")
    val grades = Seq("a", "b", "c", "d", "e", "unknown", "a", "b", "none", "c", "")
    def pick(vals: Seq[String], m: Int): org.apache.spark.sql.Column =
      element_at(array(vals.map(lit): _*), (i % m).cast("int") + 1)

    // every 16000th row re-uses the previous row's code with an older
    // timestamp -> the window dedup must reject it (keep-latest)
    val baseId = when(i % 16000 === 15999, i - 1).otherwise(i)
    val code = when(i % 40000 === 39998, lit(""))
      .when(i % 40000 === 19998, lit("null"))
      .otherwise(lpad(baseId.cast("string"), 13, "0"))
    val ts = (lit(1600000000L) + (baseId % 80000000L) * 2 -
      when(i % 16000 === 15999, 1000L).otherwise(0L))

    val core = Seq(
      code.as("code"),
      concat(pick(names, 8), lit(" No "), (i % 97).cast("string")).as("product_name"),
      concat(lit("Brand "), (i % 5000).cast("string")).as("brands"),
      concat(lit("en:cat-"), (i % 200).cast("string"), lit("-style")).as("main_category"),
      concat(lit("Category "), (i % 200).cast("string")).as("categories_en"),
      pick(countries, 7).as("countries_en"),
      ts.cast("string").as("last_modified_t"),
      pick(grades, 11).as("nutriscore_grade"),
      (i % 1200).cast("string").as("energy-kcal_100g"),     // >1000 -> bounds null-out
      (i % 120).cast("string").as("fat_100g"),              // >100  -> bounds null-out
      (i % 90).cast("string").as("saturated-fat_100g"),
      (i % 120).cast("string").as("sugars_100g"),
      when(i % 3 === 0, lit("")).otherwise((i % 50).cast("string")).as("salt_100g"),
      (i % 110).cast("string").as("proteins_100g"),
      (i % 60).cast("string").as("fiber_100g"),
      when(i % 3 === 0, (i % 30).cast("string")).otherwise(lit("")).as("sodium_100g"),
      (i % 2).cast("string").as("completeness"))
    // 198 filler columns: the real dump has 215 columns the scanner must
    // parse even though the allowlist keeps 17 (pipeline_etl.ipynb:167)
    val fillers = (1 to 198).map(n => lit(s"f$n").as(s"extra_col_$n"))
    spark.range(rows).select(core ++ fillers: _*)
  }
}
