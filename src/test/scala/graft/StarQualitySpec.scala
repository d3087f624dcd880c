package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.quality.QualitySuite
import graft.star.{Sk, Star}

/** Star build (O-24…O-28, §7.1 step 5) + QualitySuite (§3 EP-3). */
class StarQualitySpec extends SparkTestBase {
  import spark.implicits._

  private def miniSilver = Seq(
    ("001", "choco a", "brandx", "chocolate", "chocolate spreads", Seq("france", "belgium"),
      1700000000L, "d", Some(550.0), Some(30.0), Some(57.0), Some(0.5)),
    ("002", "choco b", "brandx", "chocolate", "chocolates", Seq("france"),
      1700000100L, "a", Some(400.0), Some(20.0), Some(30.0), None),
    ("003", "juice", "brandy", "beverages", "juices", Seq("spain"),
      1650000000L, "b", Some(45.0), Some(0.0), Some(10.0), Some(0.01)))
    .toDF("code", "product_name", "brands", "main_category", "categories_en", "countries_en",
      "last_modified_t", "nutriscore_grade", "energy_kcal_100g", "fat_100g", "sugars_100g",
      "salt_100g")
    .withColumn("saturated_fat_100g", lit(null).cast("double"))
    .withColumn("proteins_100g", lit(null).cast("double"))
    .withColumn("fiber_100g", lit(null).cast("double"))
    .withColumn("sodium_100g", lit(null).cast("double"))
    .withColumn("completeness", lit(0.5))

  test("withWindowSk assigns dense 1..n keys in order") {
    val df = Seq("c", "a", "b").toDF("k")
    val out = Sk.withWindowSk(df, "sk", Seq(col("k").asc))
      .orderBy("sk").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("withDistributedSk matches withWindowSk on same ordering") {
    val df = (1 to 100).map(i => (s"k${100 - i}", i)).toDF("k", "v").repartition(7)
    val a = Sk.withWindowSk(df, "sk", Seq(col("k").asc))
      .select("k", "sk").as[(String, Long)].collect().toSet
    val b = Sk.withDistributedSk(df, "sk", Seq(col("k").asc))
      .select("k", "sk").as[(String, Long)].collect().toSet
    assert(a == b)
    assert(b.map(_._2) == (1L to 100L).toSet)
  }

  test("withDistributedSk: dense from startAt across many partitions; broadcast offsets join") {
    val df = spark.range(10000).selectExpr("CAST(id AS STRING) AS k").repartition(16)
    val out = Sk.withDistributedSk(df, "sk", Seq(col("k").asc), startAt = 100L)
    val sks = out.select("sk").as[Long].collect().sorted
    assert(sks.toSeq == (100L until 10100L).toSeq, "SKs not dense from startAt")
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"big side shuffled for the offsets join:\n$p")
  }

  test("dimBrand: distinct non-empty brands with dense SKs") {
    val out = Star.dimBrand(miniSilver).orderBy("brand_sk")
      .as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "brandx"), (2L, "brandy")))
  }

  test("dimTime: week == iso_week == Spark weekofyear; degenerate SK = ts") {
    val out = Star.dimTime(miniSilver)
    assert(out.count() == 3)
    assert(out.filter(col("week") =!= col("iso_week")).count() == 0)
    val r = out.filter(col("time_sk") === 1700000000L).collect()(0)
    assert(r.getAs[java.sql.Date]("date").toString == "2023-11-14")
  }

  test("dimProduct resolves FK lookups; fact count == silver count") {
    val brand = Star.dimBrand(miniSilver)
    val category = Star.dimCategory(miniSilver)
    val product = Star.dimProduct(miniSilver, brand, category)
    assert(product.count() == 3)
    assert(product.filter(col("brand_sk").isNull).count() == 0)
    val factDf = Star.fact(miniSilver, product)
    assert(factDf.count() == 3)
    assert(factDf.select("product_sk").distinct().count() == 3)
  }

  test("QualitySuite detects violations and passes on clean data") {
    val clean = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val dirty = Seq(("a", 1), ("a", 2)).toDF("k", "v")
    assert(QualitySuite.uniqueness(clean, Seq("k")).passed)
    val dup = QualitySuite.uniqueness(dirty, Seq("k"))
    assert(!dup.passed && dup.violations == 1)

    val parent = Seq(Tuple1(1L), Tuple1(2L)).toDF("id")
    val child = Seq(Tuple1(1L), Tuple1(3L)).toDF("id")
    val ri = QualitySuite.referentialIntegrity(child, parent, "id")
    assert(!ri.passed && ri.violations == 1)

    val b = Seq(Some(5.0), Some(-1.0), None).toDF("fat_100g")
    val res = QualitySuite.bounds(b, Seq("fat_100g" -> (0d, 100d)))
    assert(res.head.violations == 1)
  }

  test("columnProfile: one-pass nulls/distinct/min-max; approx path sane; empty table") {
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None), (None, Some("a")), (Some(3L), Some("a")))
      .toDF("k", "s")
    val prof = QualitySuite.columnProfile(df, Seq("k", "s"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Option[String], Option[String])].collect()
    assert(prof(0) == (("k", 4L, 1L, 2L, Some("1"), Some("3"))))
    assert(prof(1) == (("s", 4L, 1L, 2L, Some("a"), Some("b"))))
    // approx path: tiny cardinalities are exact under HLL too
    val approx = QualitySuite.columnProfile(df, Seq("k"), exact = Some(false))
      .select("n_distinct").as[Long].collect()
    assert(approx.head == 2L)
    // empty input: zero counts, NULL min/max — no NPE, no NULL counts
    val empty = QualitySuite.columnProfile(df.filter(lit(false)), Seq("k"))
      .as[(String, Long, Long, Long, Option[String], Option[String])].collect()
    assert(empty.head == (("k", 0L, 0L, 0L, None, None)))
  }

  test("columnProfile auto mode: exact for narrow profiles, HLL above the column threshold") {
    def usesHll(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.toString.contains("approx_count_distinct")
    val wideCols = (1 to (QualitySuite.AutoExactMaxCols + 1)).map(i => s"c$i")
    val wide = spark.range(10).select(wideCols.map(c => col("id").as(c)): _*)
    // auto: 13 distinct-aggs would push 13x the scan's rows through
    // Expand — the profile must flip to the sketch form on its own
    assert(usesHll(QualitySuite.columnProfile(wide, wideCols)))
    // auto: a narrow dimension-sized profile stays exact (q91's form)
    assert(!usesHll(QualitySuite.columnProfile(wide, wideCols.take(5))))
    // caller override beats the threshold in both directions
    assert(!usesHll(QualitySuite.columnProfile(wide, wideCols, exact = Some(true))))
    assert(usesHll(QualitySuite.columnProfile(wide, wideCols.take(2), exact = Some(false))))
  }

  test("columnProfile auto size gate: multiplied join estimates fall to HLL, unsized leaves stay exact") {
    // The size-only stats visitor MULTIPLIES child sizes through joins,
    // so a join of two large fully-sized inputs carries a plan-level
    // estimate far past the stats-absent sentinel. That is a genuine
    // "enormous" signal and must route to HLL — misreading it as
    // "stats absent" (the pre-fix root-size check) would send the one
    // input the HLL fallback exists for down the exact Expand path
    // (ADVICE r10, medium). A child session pins the sentinel low so
    // the misread would be observable.
    def usesHll(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.toString.contains("approx_count_distinct")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.defaultSizeInBytes", (1L << 30).toString) // sentinel = 1 GiB
    val a = s2.range(50L * 1000 * 1000).select(col("id").as("k"))      // ~400 MB sized leaf
    val b = s2.range(50L * 1000 * 1000).select(col("id").as("k2"))
    val joined = a.join(b, col("k") === col("k2")) // product estimate ≫ sentinel
    val planSize = joined.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(planSize >= BigInt(1L << 30), s"test premise broken: plan size $planSize")
    assert(usesHll(QualitySuite.columnProfile(joined, Seq("k"))),
      "huge multiplied estimate must fall to the HLL profile")
    // an RDD-backed leaf genuinely HAS no stats (reports the sentinel):
    // determinism stays the documented default there
    val rdd = s2.sparkContext.parallelize(Seq(Row(1L), Row(2L)))
    val unsized = s2.createDataFrame(rdd, StructType(Seq(StructField("k", LongType))))
    assert(!usesHll(QualitySuite.columnProfile(unsized, Seq("k"))),
      "unsized-leaf input must keep the deterministic exact profile")
  }

  test("fullSuite passes over a built star schema") {
    val brand = Star.dimBrand(miniSilver)
    val category = Star.dimCategory(miniSilver)
    val product = Star.dimProduct(miniSilver, brand, category)
    val factDf = Star.fact(miniSilver, product)
    val results = QualitySuite.fullSuite(miniSilver, product, brand, category, factDf,
      graft.model.OffModel.nutrientBounds)
    assert(results.forall(_.passed), results.filterNot(_.passed).mkString("; "))
  }
}
