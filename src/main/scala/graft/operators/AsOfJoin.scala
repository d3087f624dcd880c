package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, attach the latest right row
  * with the same key and right.time <= left.time.
  *
  * Spark-first composition (preference (a) of the custom-operator
  * ladder — no custom SparkPlan needed): tag both sides, UNION, and run
  * one `last(_, ignoreNulls)` window per key ordered by (time, tag).
  * That is a SINGLE shuffle on the key — the same cost profile as a
  * sort-merge join — and scales with AQE like any window. Right-side
  * payload travels as one struct so the matched attributes always come
  * from the SAME right row.
  *
  * Determinism: callers must ensure at most one right row per
  * (key, time) — pre-dedup with [[graft.dedup.Dedup.latestPerKey]]
  * otherwise the kept row at equal times is unspecified (same caveat as
  * DuckDB's ASOF JOIN).
  */
object AsOfJoin {

  /** @param left        left (probe) side
    * @param right       right (reference) side, ≤1 row per (key, time)
    * @param leftKey     left join-key column name
    * @param rightKey    right join-key column name
    * @param leftTime    left event-time column name
    * @param rightTime   right event-time column name
    * @param rightCols   right columns to attach (others dropped)
    * @param inner       drop left rows with no match (default: keep, nulls)
    */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String],
      inner: Boolean = false): DataFrame = {
    val payload = struct(rightCols.map(right(_)): _*)
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .withColumn("__payload", lit(null).cast(
        right.select(payload).schema.fields.head.dataType))
    val r = right
      .select(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__tag"), payload.as("__payload"))
    // left columns that the right side lacks are null-padded
    val rAligned = l.columns.foldLeft(r) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.map(col): _*)

    // at equal time, tag 0 (right) sorts before tag 1 (left) →
    // right rows at exactly left.time ARE visible (inclusive bound)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(rAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val matched = if (inner) joined.filter(col("__match").isNotNull) else joined

    rightCols.foldLeft(matched) { (d, c) =>
      d.withColumn(c, col("__match").getField(c))
    }.drop("__k", "__t", "__tag", "__payload", "__match")
  }
}
