package graft

import org.apache.spark.sql.functions._

import graft.clean.TextClean
import graft.functions.CleanAsciiExpression
import graft.functions.CleanAsciiExpression.cleanAsciiNative

/** Native Catalyst clean_ascii: equivalence with the UDF, null safety,
  * SQL registration, and codegen-friendliness. */
class CleanAsciiExpressionSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq("Côte d'Or™", "Müsli à l'ancienne", "plain", "",
    "ŒUF ﬁre ß", "日本語 mixed", "ÀÉÎÕÜ 123")

  test("native expression ≡ Scala UDF on a unicode corpus") {
    val df = corpus.toDF("s")
    val rows = df.select(
      cleanAsciiNative(col("s")).as("native"),
      TextClean.cleanAscii(col("s")).as("viaUdf")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("null-safe") {
    val df = Seq(Option.empty[String], Some("ok")).toDF("s")
    val out = df.select(cleanAsciiNative(col("s"))).as[Option[String]].collect()
    assert(out.toSeq == Seq(None, Some("ok")))
  }

  test("registers as a SQL function") {
    CleanAsciiExpression.register(spark)
    val out = spark.sql("SELECT clean_ascii('Côte d\\'Or™') AS c").as[String].collect()(0)
    assert(out == TextClean.cleanAsciiString("Côte d'Or™"))
  }

  test("stays inside whole-stage codegen (no codegen fence)") {
    // must come from a real scan — a local Seq collapses to
    // LocalTableScan via constant folding (which itself proves eval)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(cleanAsciiNative(col("text")).as("c"))
      .filter(length(col("c")) > 0)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"), s"codegen broken:\n$p")
    // and equivalence on real data
    val both = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(cleanAsciiNative(col("text")).as("a"),
        graft.clean.TextClean.cleanAscii(col("text")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(both.count() == 0)
  }
}
