package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's six analytic OLAP queries
  * (sql/requetes_analytiques.sql:1-100), re-expressed natively in Spark
  * — both as DataFrame builders (preferred: no parse step, typed) and as
  * Spark-SQL text (drop-in for users migrating raw SQL off MySQL).
  *
  * Physical notes: every query is a star join fact ⋈ small dims —
  * Catalyst broadcasts the dims (they are ≪ autoBroadcastJoinThreshold
  * and stay so at scale); Q1's ORDER BY + LIMIT plans as
  * TakeOrderedAndProject (no global sort); Q3's JSON_TABLE lateral
  * unnest is a plain `explode` over the real ArrayType column.
  */
object OffQueries {

  /** Q1 (sql:1-16): top-10 brands by share of Nutri-Score A/B products,
    * min 10 products. Conditional distinct count — exact, per parity. */
  def q1TopBrandsAbShare(fact: DataFrame, product: DataFrame, brand: DataFrame): DataFrame =
    fact.filter(col("nutriscore_grade").isNotNull)
      .join(product.select("product_sk", "brand_sk"), Seq("product_sk"))
      .join(broadcast(brand.select("brand_sk", "brand_name")), Seq("brand_sk"))
      .groupBy("brand_name")
      .agg(
        (countDistinct(when(col("nutriscore_grade").isin("A", "B"), col("product_sk")))
          .cast("double") / countDistinct(col("product_sk")).cast("double"))
          .as("proportion_ab"),
        countDistinct(col("product_sk")).as("nb_products"))
      .filter(col("nb_products") >= 10)
      .orderBy(col("proportion_ab").desc, col("brand_name").asc)
      .limit(10)

  /** Q1 fast mode (SURVEY §7.3): HLL approximate distinct counts.
    * Same query shape, but `approx_count_distinct` (HyperLogLog++,
    * default 5% rsd) replaces the exact distinct — at 100 TB the exact
    * version shuffles every (brand, product_sk) pair, the sketch is a
    * fixed-size buffer merged map-side. Not oracle-hashable by design;
    * use for interactive exploration, keep the exact form for parity. */
  def q1TopBrandsAbShareApprox(
      fact: DataFrame, product: DataFrame, brand: DataFrame, rsd: Double = 0.05): DataFrame =
    fact.filter(col("nutriscore_grade").isNotNull)
      .join(product.select("product_sk", "brand_sk"), Seq("product_sk"))
      .join(broadcast(brand.select("brand_sk", "brand_name")), Seq("brand_sk"))
      .groupBy("brand_name")
      .agg(
        (approx_count_distinct(
          when(col("nutriscore_grade").isin("A", "B"), col("product_sk")), rsd)
          .cast("double") /
          approx_count_distinct(col("product_sk"), rsd).cast("double")).as("proportion_ab"),
        approx_count_distinct(col("product_sk"), rsd).as("nb_products"))
      .filter(col("nb_products") >= 10)
      .orderBy(col("proportion_ab").desc, col("brand_name").asc)
      .limit(10)

  /** Q2 (sql:18-34): Nutri-Score distribution by category level 1/2. */
  def q2GradeByCategory(fact: DataFrame, product: DataFrame, category: DataFrame): DataFrame =
    fact.filter(col("nutriscore_grade").isNotNull)
      .join(product.select("product_sk", "primary_category_sk"), Seq("product_sk"))
      .join(broadcast(category), col("primary_category_sk") === col("category_sk"))
      .groupBy(
        col("parent_category_sk").as("category_lvl1"),
        col("category_name").as("category_lvl2"),
        col("nutriscore_grade"))
      .agg(count(lit(1)).as("nb_products"))
      .orderBy(col("category_lvl2").asc, col("nutriscore_grade").asc)

  /** Q3 (sql:36-52): country × category sugar heatmap. MySQL needs a
    * JSON_TABLE lateral to unnest the stringified array; with a real
    * ArrayType column this is a single `explode` Generator. */
  def q3CountryCategorySugar(fact: DataFrame, product: DataFrame, category: DataFrame): DataFrame =
    fact.filter(col("sugars_100g").isNotNull)
      .join(product.select("product_sk", "primary_category_sk", "countries_multi_name"), Seq("product_sk"))
      .join(broadcast(category.select("category_sk", "category_name")),
        col("primary_category_sk") === col("category_sk"))
      .select(explode(col("countries_multi_name")).as("country"),
        col("category_name"), col("sugars_100g"))
      .groupBy("country", "category_name")
      .agg(avg("sugars_100g").as("avg_sugars_100g"))
      .orderBy(col("country").asc, col("category_name").asc)

  /** Q4 (sql:54-75): per-brand nutrient completeness rate — MySQL
    * boolean-as-int arithmetic becomes explicit casts. */
  def q4CompletenessByBrand(fact: DataFrame, product: DataFrame, brand: DataFrame): DataFrame = {
    val nutrients = Seq("energy_kcal_100g", "fat_100g", "saturated_fat_100g", "sugars_100g",
      "salt_100g", "proteins_100g", "fiber_100g", "sodium_100g")
    val presentSum = nutrients.map(c => col(c).isNotNull.cast("int")).reduce(_ + _)
    fact.join(product.select("product_sk", "brand_sk"), Seq("product_sk"))
      .join(broadcast(brand.select("brand_sk", "brand_name")), Seq("brand_sk"))
      .groupBy("brand_name")
      .agg(avg(presentSum.cast("double") / 8d).as("completeness_rate"))
      .orderBy(col("completeness_rate").desc, col("brand_name").asc)
  }

  /** Q5 (sql:77-90): anomaly listing — disjunctive filter, multi-key
    * desc sort. */
  def q5Anomalies(fact: DataFrame, product: DataFrame, brand: DataFrame): DataFrame =
    fact.filter(col("salt_100g") > 25 || col("sugars_100g") > 80)
      .join(product.select("product_sk", "code", "product_name", "brand_sk"), Seq("product_sk"))
      .join(broadcast(brand.select("brand_sk", "brand_name")), Seq("brand_sk"))
      .select("code", "product_name", "brand_name", "salt_100g", "sugars_100g")
      .orderBy(col("salt_100g").desc_nulls_last, col("sugars_100g").desc_nulls_last,
        col("code").asc)

  /** Q6 (sql:92-100): weekly completeness trend via dim_time. */
  def q6WeeklyCompleteness(fact: DataFrame, time: DataFrame): DataFrame =
    fact.join(broadcast(time.select("time_sk", "year", "iso_week")), Seq("time_sk"))
      .groupBy("year", "iso_week")
      .agg(avg("completeness_score").as("avg_completeness"))
      .orderBy(col("year").asc, col("iso_week").asc)

  /** The same six queries as Spark-SQL text over the registered gold
    * views (names per database.py DDL); functionally identical to the
    * MySQL originals modulo JSON_TABLE → explode. */
  val sql: Map[String, String] = Map(
    "q1" -> """SELECT b.brand_name,
              |  CAST(COUNT(DISTINCT CASE WHEN f.nutriscore_grade IN ('A','B') THEN p.product_sk END) AS DOUBLE)
              |    / COUNT(DISTINCT p.product_sk) AS proportion_ab,
              |  COUNT(DISTINCT p.product_sk) AS nb_products
              |FROM fact_nutrition_snapshot f
              |JOIN dim_product p ON f.product_sk = p.product_sk
              |JOIN dim_brand b ON p.brand_sk = b.brand_sk
              |WHERE f.nutriscore_grade IS NOT NULL
              |GROUP BY b.brand_name
              |HAVING COUNT(DISTINCT p.product_sk) >= 10
              |ORDER BY proportion_ab DESC, b.brand_name LIMIT 10""".stripMargin,
    "q2" -> """SELECT c.parent_category_sk AS category_lvl1, c.category_name AS category_lvl2,
              |  f.nutriscore_grade, COUNT(*) AS nb_products
              |FROM fact_nutrition_snapshot f
              |JOIN dim_product p ON f.product_sk = p.product_sk
              |JOIN dim_category c ON p.primary_category_sk = c.category_sk
              |WHERE f.nutriscore_grade IS NOT NULL
              |GROUP BY c.parent_category_sk, c.category_name, f.nutriscore_grade
              |ORDER BY c.category_name, f.nutriscore_grade""".stripMargin,
    "q3" -> """SELECT ct.country, c.category_name, AVG(f.sugars_100g) AS avg_sugars_100g
              |FROM fact_nutrition_snapshot f
              |JOIN dim_product p ON f.product_sk = p.product_sk
              |JOIN dim_category c ON p.primary_category_sk = c.category_sk
              |LATERAL VIEW explode(p.countries_multi_name) ct AS country
              |WHERE f.sugars_100g IS NOT NULL
              |GROUP BY ct.country, c.category_name
              |ORDER BY ct.country, c.category_name""".stripMargin,
    "q4" -> """SELECT b.brand_name,
              |  AVG((CAST(f.energy_kcal_100g IS NOT NULL AS INT) + CAST(f.fat_100g IS NOT NULL AS INT)
              |     + CAST(f.saturated_fat_100g IS NOT NULL AS INT) + CAST(f.sugars_100g IS NOT NULL AS INT)
              |     + CAST(f.salt_100g IS NOT NULL AS INT) + CAST(f.proteins_100g IS NOT NULL AS INT)
              |     + CAST(f.fiber_100g IS NOT NULL AS INT) + CAST(f.sodium_100g IS NOT NULL AS INT)) / CAST(8.0 AS DOUBLE))
              |    AS completeness_rate
              |FROM fact_nutrition_snapshot f
              |JOIN dim_product p ON f.product_sk = p.product_sk
              |JOIN dim_brand b ON p.brand_sk = b.brand_sk
              |GROUP BY b.brand_name
              |ORDER BY completeness_rate DESC, b.brand_name""".stripMargin,
    "q5" -> """SELECT p.code, p.product_name, b.brand_name, f.salt_100g, f.sugars_100g
              |FROM fact_nutrition_snapshot f
              |JOIN dim_product p ON f.product_sk = p.product_sk
              |JOIN dim_brand b ON p.brand_sk = b.brand_sk
              |WHERE f.salt_100g > 25 OR f.sugars_100g > 80
              |ORDER BY f.salt_100g DESC NULLS LAST, f.sugars_100g DESC NULLS LAST, p.code""".stripMargin,
    "q6" -> """SELECT t.year, t.iso_week, AVG(f.completeness_score) AS avg_completeness
              |FROM fact_nutrition_snapshot f
              |JOIN dim_time t ON f.time_sk = t.time_sk
              |GROUP BY t.year, t.iso_week
              |ORDER BY t.year, t.iso_week""".stripMargin)

  def runSql(spark: SparkSession, name: String): DataFrame = spark.sql(sql(name))
}
