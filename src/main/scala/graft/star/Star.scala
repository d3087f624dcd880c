package graft.star

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Star-schema build (SURVEY §2.C O-24…O-28 + §7.1 step 5).
  *
  * The reference delegates surrogate-key assignment to MySQL
  * AUTO_INCREMENT and reads keys back over JDBC
  * (pipeline_etl.ipynb:570-571,644; database.py:96,102,108,115,127).
  * Here SKs are assigned in-plan — deterministic dense ranks over the
  * natural key — which kills four JDBC round trips and keeps the whole
  * build lazy in one Catalyst plan.
  */
object Sk {

  /** Dense SK via a global-order window. Deterministic; fine for
    * dimension tables (they stay small/broadcastable), but the empty
    * partitionBy moves all rows to ONE partition — never use on a fact
    * table. */
  def withWindowSk(df: DataFrame, skName: String, order: Seq[Column]): DataFrame =
    df.withColumn(skName, row_number().over(Window.orderBy(order: _*)).cast(LongType))

  /** Scalable dense SK: global sort (range-partitioned, fully parallel)
    * + two-phase rank — per-partition row index and partition id from
    * `monotonically_increasing_id` (= pid<<33 + row-in-partition on the
    * sorted layout), per-partition counts, cumulative offsets broadcast
    * back, sk = offset + row index. Deterministic when `order` is a
    * total order. Used for big tables (dim_product, fact at 100 TB).
    *
    * All-DataFrame on purpose: the previous `rdd.zipWithIndex` form
    * paid an external-Row encoder round trip per row and fenced
    * whole-stage codegen + AQE at the SK step; here every phase is
    * Tungsten (the wide side of the offsets join is a broadcast hash
    * join, no extra shuffle beyond the sort itself).
    *
    * The one subtlety is the lazy `localCheckpoint`: the counts pass
    * and the SK pass must see the SAME partition layout, and two
    * independent lazy reads of the sort exchange don't guarantee that
    * (AQE may coalesce each read differently, which would silently
    * misalign offsets — duplicate/gapped SKs). Materializing the
    * sorted+mid frame once pins the layout; blocks are stored as
    * InternalRows, so there is still no encoder round trip. Same
    * lifetime contract as [[graft.text.Curation.funnel]]: the result
    * cannot recompute past a block-manager sweep. */
  def withDistributedSk(df: DataFrame, skName: String, order: Seq[Column], startAt: Long = 1L): DataFrame = {
    val sorted = df.orderBy(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(false)
    val pid = shiftright(col("__mid"), 33)
    val counts = sorted.groupBy(pid.as("__pid")).agg(count(lit(1)).as("__n"))
    val w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(w), lit(0L)))
      .select(col("__pid"), col("__off"))
    sorted.join(broadcast(offsets), pid === col("__pid"))
      .withColumn(skName,
        (col("__off") + col("__mid").bitwiseAND(lit((1L << 33) - 1)) + lit(startAt))
          .cast(LongType))
      .drop("__mid", "__pid", "__off")
  }
}

/** Dimension + fact builders, mirroring pipeline_etl.ipynb:496-691. */
object Star {

  /** dim_time (pipeline_etl.ipynb:493-505): degenerate SK = unix ts;
    * week and iso_week are both `weekofyear` (ISO-8601 in Spark, which
    * is exactly what the reference's PySpark computed too). */
  def dimTime(silver: DataFrame): DataFrame =
    silver.select("last_modified_t").distinct()
      .withColumn("ts_date", from_unixtime(col("last_modified_t")).cast("date"))
      .select(
        col("last_modified_t").alias("time_sk"),
        col("ts_date").alias("date"),
        year(col("ts_date")).alias("year"),
        month(col("ts_date")).alias("month"),
        dayofmonth(col("ts_date")).alias("day"),
        weekofyear(col("ts_date")).alias("week"),
        weekofyear(col("ts_date")).alias("iso_week"))

  /** dim_brand (pipeline_etl.ipynb:508-512) + in-plan SK. */
  def dimBrand(silver: DataFrame): DataFrame = {
    val base = silver.select(col("brands").alias("brand_name"))
      .filter(col("brand_name").isNotNull && col("brand_name") =!= "")
      .distinct()
      .withColumn("brand_name", substring(col("brand_name"), 1, 500))
    Sk.withWindowSk(base, "brand_sk", Seq(col("brand_name").asc))
      .select("brand_sk", "brand_name")
  }

  /** dim_category (pipeline_etl.ipynb:514-520): key-dedup on
    * category_name with a deterministic keep (min parent) instead of
    * the reference's unspecified dropDuplicates pick. */
  def dimCategory(silver: DataFrame): DataFrame = {
    val base = silver.select(
        substring(lower(trim(col("categories_en"))), 1, 500).alias("category_name"),
        substring(lower(trim(col("main_category"))), 1, 500).alias("parent_category_sk"))
      .filter(col("category_name").isNotNull && col("category_name") =!= "")
      .groupBy("category_name")
      .agg(min("parent_category_sk").alias("parent_category_sk"))
    Sk.withWindowSk(base, "category_sk", Seq(col("category_name").asc))
      .select("category_sk", "category_name", "parent_category_sk")
  }

  /** dim_country (pipeline_etl.ipynb:523-525): the disconnected
    * dimension — countries arrays, non-null. */
  def dimCountry(silver: DataFrame): DataFrame = {
    val base = silver.select(col("countries_en").alias("countries_name"))
      .filter(col("countries_name").isNotNull)
      .distinct()
    Sk.withWindowSk(base, "country_sk", Seq(col("countries_name").cast("string").asc))
      .select("country_sk", "countries_name")
  }

  /** dim_product (pipeline_etl.ipynb:574-606): silver ←left— brand/
    * category FK lookups. Dims are explicitly broadcast — they are
    * orders of magnitude smaller than the product table and stay so at
    * scale. SK via the distributed two-phase rank on `code`. */
  def dimProduct(silver: DataFrame, brand: DataFrame, category: DataFrame): DataFrame = {
    val joined = silver.select(
        col("code"), col("product_name"), col("brands"), col("main_category"),
        col("countries_en").alias("countries_multi_name"))
      .join(broadcast(brand.select("brand_sk", "brand_name")),
        col("brands") === col("brand_name"), "left")
      .join(broadcast(category.select("category_sk", "category_name")),
        col("main_category") === col("category_name"), "left")
      .select(col("code"), col("product_name"), col("brand_sk"),
        col("category_sk").alias("primary_category_sk"), col("countries_multi_name"))
    Sk.withDistributedSk(joined, "product_sk", Seq(col("code").asc))
      .select("product_sk", "code", "product_name", "brand_sk",
        "primary_category_sk", "countries_multi_name")
  }

  /** fact_nutrition_snapshot (pipeline_etl.ipynb:647-676): attach
    * product_sk by the `code` natural key; time_sk is the degenerate
    * unix ts. The join key (`code`) is unique on both sides post-dedup,
    * so this is a 1:1 equi-join — shuffle on code, or broadcast when
    * the product dim fits. */
  def fact(silver: DataFrame, dimProduct: DataFrame): DataFrame =
    silver.select(
        col("code"), col("last_modified_t"), col("energy_kcal_100g"), col("fat_100g"),
        col("saturated_fat_100g"), col("sugars_100g"), col("salt_100g"),
        col("proteins_100g"), col("fiber_100g"), col("sodium_100g"),
        col("nutriscore_grade"), col("completeness"))
      .join(dimProduct.select("product_sk", "code"), Seq("code"), "inner")
      .select(
        col("product_sk"),
        col("last_modified_t").alias("time_sk"),
        col("energy_kcal_100g"), col("fat_100g"), col("saturated_fat_100g"),
        col("sugars_100g"), col("salt_100g"), col("proteins_100g"),
        col("fiber_100g"), col("sodium_100g"), col("nutriscore_grade"),
        col("completeness").alias("completeness_score"))
}
