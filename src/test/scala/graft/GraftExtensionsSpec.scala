package graft

/** The SQL surface of the native functions: registered via the same
  * builders GraftExtensions injects, then exercised from plain SQL
  * text (the spark.sql.extensions deployment path). */
class GraftExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("clean_ascii and topk_by work from plain SQL") {
    GraftExtensions.register(spark)
    Seq(("g1", 1.0, 10L, "Côte d'Or™"), ("g1", 3.0, 30L, "Späzle"), ("g1", 2.0, 20L, "x"))
      .toDF("g", "o", "p", "s").createOrReplaceTempView("ext_t")
    val cleaned = spark.sql("SELECT clean_ascii(s) AS c FROM ext_t ORDER BY o")
      .as[String].collect()
    assert(cleaned.toSeq == Seq("Cote d'OrTM", "x", "Spazle"))
    val top = spark.sql("SELECT topk_by(o, p, 2) AS t FROM ext_t GROUP BY g")
      .as[Seq[Long]].collect()(0)
    assert(top == Seq(30L, 20L))
  }

  test("topk_by rejects a non-literal k with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT topk_by(1.0, 2, CAST(rand() * 3 AS INT))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getMessage.toLowerCase.contains("topk_by"))
  }
}
