package graft

import org.apache.spark.sql.functions._

/** Mergeable HLL sketches (Spark 4 DataSketches integration) — the
  * 100 TB approximate-distinct path: per-partition/per-day sketches are
  * persistable binary columns that union WITHOUT rescanning history,
  * unlike exact countDistinct which reshuffles everything each time. */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  test("per-group sketches union to the same estimate as one global sketch") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    // one sketch per order-year (the "daily sketch" pattern)
    val perYear = orders
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val unioned = perYear
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .as[Long].collect()(0)
    val global = orders
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .as[Long].collect()(0)
    // HLL union is lossless over sketches of the same lgK
    assert(unioned == global, s"union=$unioned global=$global")
    val exact = orders.select(countDistinct(col("o_custkey"))).as[Long].collect()(0)
    assert(math.abs(unioned - exact).toDouble / exact < 0.05,
      s"estimate $unioned vs exact $exact")
  }

  test("sketches are deterministic: same input -> same estimate, any partitioning") {
    val df = spark.range(10000).select((col("id") % 2357).as("v"))
    def est(parts: Int) = df.repartition(parts)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v")))).as[Long].collect()(0)
    assert(est(2) == est(13))
  }

  // ------------------------------------------------- Count-Min sketch

  import graft.functions.CountMinSketch

  test("cms: the sketch matrix is bit-identical under any partitioning") {
    val df = spark.range(5000).select(concat(lit("w"), col("id") % 97).as("w"))
    def sk(parts: Int): Seq[Long] = df.repartition(parts)
      .agg(CountMinSketch.sketch(col("w"), 4, 32)).as[Seq[Long]].collect()(0)
    assert(sk(1) == sk(17), "merge order changed the matrix")
  }

  test("cms: row sums each equal N; estimate >= exact count, exact when uncollided") {
    val words = Seq.fill(40)("alpha") ++ Seq.fill(7)("beta") ++
      (1 to 30).map(i => s"noise$i")
    val df = words.toDF("w")
    val sk = df.agg(CountMinSketch.sketch(col("w"), 4, 64)).as[Seq[Long]].collect()(0)
    // every occurrence lands once per row: each of the 4 rows sums to N
    (0 until 4).foreach { i =>
      assert(sk.slice(i * 64, (i + 1) * 64).sum == words.size.toLong,
        s"row $i mass != N")
    }
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    (exact.keys ++ Seq("absent")).foreach { w =>
      val est = (0 until 4).map(i =>
        sk(i * 64 + CountMinSketch.bucketOf(w, i, 64))).min
      assert(est >= exact.getOrElse(w, 0L), s"$w undercounted: $est")
    }
    // at 77 distinct items in 4x64 cells, the heavy item is almost
    // surely uncollided in SOME row -> estimate is exact
    val estAlpha = (0 until 4).map(i =>
      sk(i * 64 + CountMinSketch.bucketOf("alpha", i, 64))).min
    assert(estAlpha == 40L, s"alpha est $estAlpha")
  }

  test("cms: kernel buckets == engine md5-slice arithmetic (the oracle's view)") {
    val keys = Seq("key", "agg", "spark", "nosuchword", "émoji-ü")
    val cols = col("w") +: (0 until 4).map(i =>
      (conv(substring(md5(col("w")), 1 + 8 * i, 8), 16, 10)
        .cast("long") % 64).cast("int").as(s"b$i"))
    val got = keys.toDF("w").select(cols: _*).collect()
    got.foreach { r =>
      val w = r.getString(0)
      (0 until 4).foreach { i =>
        assert(r.getInt(i + 1) == CountMinSketch.bucketOf(w, i, 64),
          s"bucket mismatch for $w row $i")
      }
    }
  }

  test("cms: merging stored partial sketches equals the one-pass sketch of the union") {
    val df = spark.range(3000).select(
      (col("id") % 7).as("g"), concat(lit("w"), col("id") % 131).as("w"))
    val partials = df.groupBy("g").agg(CountMinSketch.sketch(col("w"), 4, 32).as("sk"))
    val merged = CountMinSketch.mergedCells(partials, "sk")
      .orderBy("pos").as[(Int, Long)].collect().toSeq
    val global = df.agg(CountMinSketch.sketch(col("w"), 4, 32).as("sk"))
      .select(posexplode(col("sk")).as(Seq("pos", "cell")))
      .orderBy("pos").as[(Int, Long)].collect().toSeq
    assert(merged == global)
  }

  test("overlapEstimate: inclusion-exclusion tracks the exact overlap; disjoint clamps at 0") {
    import graft.quality.QualitySuite
    val a = spark.range(0, 10000).toDF("v")
    val b = spark.range(6000, 16000).toDF("v") // true overlap 4000
    val r = QualitySuite.overlapEstimate(a, b, "v")
      .as[(Long, Long, Long, Long)].head()
    assert(math.abs(r._4 - 4000L) < 600, s"intersection estimate ${r._4}")
    assert(math.abs(r._3 - 16000L) < 800, s"union estimate ${r._3}")
    val disjoint = QualitySuite.overlapEstimate(
      spark.range(0, 5000).toDF("v"), spark.range(100000, 105000).toDF("v"), "v")
      .as[(Long, Long, Long, Long)].head()
    assert(disjoint._4 >= 0L && disjoint._4 < 300, s"disjoint est ${disjoint._4}")
  }

  test("cms: SQL surface and loud rejects") {
    GraftExtensions.register(spark)
    val n = spark.sql(
      "SELECT size(cms_sketch(CAST(id AS STRING), 3, 16)) FROM range(10)")
      .as[Int].collect()(0)
    assert(n == 48)
    // SQL-path input typing matches the Column API: a non-string item
    // is implicitly CAST to string at analysis time (identical sketch
    // to the explicit cast), never a runtime ClassCastException
    val m = spark.sql("SELECT cms_sketch(id, 3, 16) FROM range(10)")
      .as[Seq[Long]].collect()(0)
    val mExplicit = spark.sql(
      "SELECT cms_sketch(CAST(id AS STRING), 3, 16) FROM range(10)")
      .as[Seq[Long]].collect()(0)
    assert(m == mExplicit)
    intercept[IllegalArgumentException](
      graft.functions.CountMinSketch(null, 5, 16))
    intercept[IllegalArgumentException](
      graft.functions.CountMinSketch(null, 2, 0))
  }
}
