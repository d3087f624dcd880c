package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Exact `⌊log2(a/b)⌋` over positive BIGINT operands with `a ≥ b` —
  * the arithmetic kernel of the model-based quality-filter family
  * ([[graft.text.LmQuality]]): n-gram LM surprisal, Naive-Bayes
  * log-likelihood ratios, and DSIR importance weights are all sums of
  * `log(count-ratio)` terms, and this expression quantizes each term
  * to its exact integer bit count so the whole family stays in the
  * repo's exact-integer determinism regime (no float `ln`, no
  * cross-engine ulp drift, no rounding boundaries).
  *
  * The identity: with `e = bitlen(a) − bitlen(b)`, the answer is `e`
  * when `(a >> e) ≥ b` and `e−1` otherwise — two bit-scans, one
  * shift, one compare; no division. `bitlen` is what both engines can
  * compute exactly (`Long.numberOfLeadingZeros` here,
  * `length(bin(x))` in the DuckDB oracles), so every battery query
  * built on this replays bit-for-bit in ANSI SQL.
  *
  * Edge contract (SQL-registered ⇒ arbitrary inputs reach it):
  * `b < 1` or `a < b` throws — a negative-bits term means the caller
  * inverted a ratio (probabilities > 1), and silently clamping would
  * turn that bug into a plausible score. NULL on either side yields
  * NULL (BinaryExpression's null-safe contract). The ratios this
  * library feeds it (`(c_hist + V) / (c_bigram + 1)`) satisfy
  * `a ≥ b ≥ 1` by construction since `c_bigram ≤ c_hist` and
  * `V ≥ 1`. */
case class FloorLog2Ratio(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "floor_log2_ratio"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FloorLog2Ratio.evalBits(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FloorLog2Ratio.evalBits($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloorLog2Ratio =
    copy(left = newLeft, right = newRight)
}

object FloorLog2Ratio {

  /** Static kernel shared by interpreted eval and generated code. */
  def evalBits(a: Long, b: Long): Int = {
    if (b < 1L || a < b)
      throw new IllegalArgumentException(
        s"floor_log2_ratio: requires a >= b >= 1, got a=$a b=$b")
    val e = java.lang.Long.numberOfLeadingZeros(b) -
      java.lang.Long.numberOfLeadingZeros(a)
    if ((a >> e) < b) e - 1 else e
  }

  /** Column-level entry point: `⌊log2(a/b)⌋` as INT. */
  def of(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloorLog2Ratio(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
