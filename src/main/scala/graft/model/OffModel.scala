package graft.model

import org.apache.spark.sql.types._

/** Constants + schemas of the OpenFoodFacts-parity pipeline.
  *
  * Sources (reference, read-only): vincent_valentin/pipeline_etl.ipynb:167-175
  * (column allowlist), :270-298 (semantic defaults), :345-364 (nutrient
  * bounds), vincent_valentin/tools/database.py:44-151 (star-schema DDL).
  */
object OffModel {

  /** The 17 retained raw columns, pre-rename (pipeline_etl.ipynb:167-171). */
  val rawAllowlist: Seq[String] = Seq(
    "code", "product_name", "brands", "main_category", "categories_en",
    "countries_en", "last_modified_t", "nutriscore_grade",
    "energy-kcal_100g", "fat_100g", "saturated-fat_100g", "sugars_100g",
    "salt_100g", "proteins_100g", "fiber_100g", "sodium_100g", "completeness")

  /** Values treated as semantically missing (pipeline_etl.ipynb:279). */
  val invalidVals: Seq[String] =
    Seq("undefined", "null", "unknown", "none", "n/a", "")

  /** (column, optional fallback column, default literal) — fill config
    * (pipeline_etl.ipynb:270-277). Note the reference's fallback column
    * "categories" is never in the allowlist, so the fallback path never
    * fires there; we preserve the literal behavior. */
  val textDefaults: Seq[(String, Option[String], String)] = Seq(
    ("categories_en", Some("categories"), "non classe"),
    ("main_category", None, "non classe"),
    ("brands", None, "marque inconnue"),
    ("countries_en", None, "pays inconue"),
    ("nutriscore_grade", None, "non classe"))

  /** Biological/physical validity bounds; out-of-bounds → NULL
    * (pipeline_etl.ipynb:345-356; docs/data_dictionary.md:213-224). */
  val nutrientBounds: Seq[(String, (Double, Double))] = Seq(
    "energy_kcal_100g" -> (0d, 1000d),
    "fat_100g" -> (0d, 100d),
    "saturated_fat_100g" -> (0d, 100d),
    "sugars_100g" -> (0d, 100d),
    "salt_100g" -> (0d, 100d),
    "proteins_100g" -> (0d, 100d),
    "fiber_100g" -> (0d, 100d),
    "sodium_100g" -> (0d, 40d),
    "completeness" -> (0d, 1d))

  /** Numeric columns rounded to 1 decimal (pipeline_etl.ipynb:385-388). */
  val colsToRound: Seq[String] = nutrientBounds.map(_._1) :+ "energy_kj_100g"

  /** Silver schema after the full clean (FIXTURES.md A2; countries_en is a
    * real ArrayType here — the reference stringifies it only because MySQL
    * lacks arrays, database.py:52). */
  val silverSchema: StructType = StructType(Seq(
    StructField("code", StringType, nullable = false),
    StructField("product_name", StringType),
    StructField("brands", StringType),
    StructField("main_category", StringType),
    StructField("categories_en", StringType),
    StructField("countries_en", ArrayType(StringType)),
    StructField("last_modified_t", LongType),
    StructField("nutriscore_grade", StringType),
    StructField("energy_kcal_100g", DoubleType),
    StructField("fat_100g", DoubleType),
    StructField("saturated_fat_100g", DoubleType),
    StructField("sugars_100g", DoubleType),
    StructField("salt_100g", DoubleType),
    StructField("proteins_100g", DoubleType),
    StructField("fiber_100g", DoubleType),
    StructField("sodium_100g", DoubleType),
    StructField("completeness", DoubleType),
    StructField("energy_kj_100g", DoubleType)))
}
