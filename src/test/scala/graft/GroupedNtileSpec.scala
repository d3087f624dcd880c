package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GroupedNtile

/** The scalable exact ntile vs the window form it replaces — parity is
  * the whole contract (q84 rides it against the DuckDB oracle). */
class GroupedNtileSpec extends SparkTestBase {
  import spark.implicits._

  // uneven groups: g=a 13 rows, g=b 4 rows (< n for n=10), g=c 1 row,
  // g=d 30 rows (divisible by 3 and 10)
  private def fixture = (
    (1 to 13).map(i => ("a", i * 7 % 13, i)) ++
    (1 to 4).map(i => ("b", i % 2, i)) ++
    Seq(("c", 0, 1)) ++
    (1 to 30).map(i => ("d", i * 11 % 9, i))
  ).toDF("g", "v", "id")

  test("groupedNtile ≡ ntile window for n = 1, 3, 10 on uneven groups") {
    for (n <- Seq(1, 3, 10)) {
      val want = fixture.withColumn("bucket",
        ntile(n).over(Window.partitionBy("g").orderBy(col("v"), col("id")))
          .cast("long"))
        .as[(String, Int, Int, Long)].collect().toSet
      val got = GroupedNtile.groupedNtile(Seq("g"), Seq(col("v"), col("id")), n)(
          fixture)
        .as[(String, Int, Int, Long)].collect().toSet
      assert(got == want, s"n=$n: got $got")
    }
  }

  test("groupedNtile is partitioning-invariant and deterministic") {
    val a = GroupedNtile.groupedNtile(Seq("g"), Seq(col("v"), col("id")), 4)(
      fixture.repartition(1)).as[(String, Int, Int, Long)].collect().toSet
    val b = GroupedNtile.groupedNtile(Seq("g"), Seq(col("v"), col("id")), 4)(
      fixture.repartition(13)).as[(String, Int, Int, Long)].collect().toSet
    assert(a == b)
  }

  test("groupedNtile: loud rejects") {
    intercept[IllegalArgumentException](
      GroupedNtile.groupedNtile(Seq("g"), Seq(col("v")), 0)(fixture))
    intercept[IllegalArgumentException](
      GroupedNtile.groupedNtile(Seq.empty, Seq(col("v")), 2)(fixture))
  }
}
