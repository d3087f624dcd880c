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

  test("registerUdfs exposes the near-dup primitives to plain SQL end to end") {
    GraftExtensions.registerUdfs(spark)
    Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"), (3L, "zzz yyy xxx www"))
      .toDF("id", "t").createOrReplaceTempView("udf_t")
    // full near-dup verification in SQL: word shingles → 60-bit hashes →
    // pairwise exact Jaccard
    val j = spark.sql(
      """WITH h AS (SELECT id,
           sort_array(array_distinct(transform(word_shingles(t, 2), s -> shingle_hash60(s)))) AS hs
         FROM udf_t)
         SELECT a.id, b.id, jaccard_hash_sets(a.hs, b.hs) AS j
         FROM h a JOIN h b ON a.id < b.id ORDER BY a.id, b.id""")
      .as[(Long, Long, Double)].collect()
    assert(j.toSeq == Seq((1L, 2L, 1.0), (1L, 3L, 0.0), (2L, 3L, 0.0)), j.mkString(","))
    val sh = spark.sql("SELECT simhash32(t) FROM udf_t WHERE id IN (1, 2)")
      .as[Long].collect()
    assert(sh(0) == sh(1) && sh(0) != 0L)
    assert(spark.sql("SELECT char_shingles('abcd', 3)").as[Seq[String]].head() ==
      Seq("abc", "bcd"))
  }

  test("bpe_merge_step works from plain SQL; rejects non-literal symbols") {
    GraftExtensions.register(spark)
    val merged = spark.sql(
      "SELECT bpe_merge_step(array('a', 'a', 'a'), 'a', 'a') AS m")
      .as[Seq[String]].head()
    assert(merged == Seq("aa", "a"))
    val e = intercept[Exception] {
      spark.sql("SELECT bpe_merge_step(array('a'), substr(rand(), 1, 1), 'b')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }
}
