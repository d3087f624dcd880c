package graft

import org.apache.spark.sql.functions._

import graft.functions.TokenStatsAggregator

/** Typed Aggregator: correctness vs a direct computation and usability
  * both as a TypedColumn and as a registered UDAF in grouped SQL. */
class TokenStatsAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  test("matches a direct computation on the documents table (one pass, partial-agg)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spark.udf.register("token_stats", udaf(TokenStatsAggregator))
    docs.createOrReplaceTempView("docs_agg_test")
    val got = spark.sql(
      "SELECT lang, token_stats(text) AS st FROM docs_agg_test GROUP BY lang")
      .select(col("lang"), col("st.n_docs"), col("st.n_tokens"), col("st.avg_tokens"))
      .as[(String, Long, Long, Double)].collect().toSet
    val want = docs
      .select(col("lang"), size(split(trim(col("text")), "\\s+")).cast("long").as("t"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("t").as("n_tokens"),
        (sum("t").cast("double") / count(lit(1))).as("avg_tokens"))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("usable as a TypedColumn on a typed Dataset") {
    val ds = Seq("a b c", "d e", "", "x").toDS()
    val st = ds.select(TokenStatsAggregator.toColumn).collect()(0)
    assert(st.n_docs == 4 && st.n_tokens == 6 && st.max_tokens == 3)
    assert(st.avg_tokens == 1.5)
  }
}
