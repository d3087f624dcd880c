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

  test("exactPercentilesDisc ≡ per-group sort reference, incl. duplicate values") {
    val df = (
      (1 to 13).map(i => ("a", (i * 7 % 5).toLong)) ++ // duplicates everywhere
      Seq(("b", 42L)) ++
      (1 to 10).map(i => ("c", i.toLong))
    ).toDF("g", "v")
    val probs = Seq((1L, 4L), (1L, 2L), (3L, 4L), (1L, 1L))
    val got = GroupedNtile.exactPercentilesDisc(Seq("g"), "v", probs)(df)
      .as[(String, Long, Long, Long)].collect().toSet
    val byG = df.as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    val want = (for {
      (g, vs) <- byG.toSeq
      (num, den) <- probs
    } yield {
      val rank = ((num * vs.length + den - 1) / den).toInt // ceil(p·n)
      (g, num, den, vs(rank - 1))
    }).toSet
    assert(got == want, s"got $got want $want")
    // p = 1/1 is the max, p at the smallest rational the min-ish rank
    assert(got.contains(("b", 1L, 1L, 42L)))
    intercept[IllegalArgumentException](
      GroupedNtile.exactPercentilesDisc(Seq("g"), "v", Seq((0L, 2L)))(df))
    intercept[IllegalArgumentException](
      GroupedNtile.exactPercentilesDisc(Seq("g"), "v", Seq((3L, 2L)))(df))
  }

  test("groupedNtile: loud rejects") {
    intercept[IllegalArgumentException](
      GroupedNtile.groupedNtile(Seq("g"), Seq(col("v")), 0)(fixture))
    intercept[IllegalArgumentException](
      GroupedNtile.groupedNtile(Seq.empty, Seq(col("v")), 2)(fixture))
  }
}
