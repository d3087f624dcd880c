package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert curve index as a native codegen'd expression — the
  * tighter-locality alternative to [[graft.store.Layout.zValue]] for
  * two-column layouts (SURVEY §2-ext data layout).
  *
  * Both curves linearize a 2-D bucket grid so range-partitioned files
  * get compact min-max boxes; the difference is adjacency: CONSECUTIVE
  * Hilbert indices are always grid neighbors (HilbertSpec proves it
  * exhaustively), while the Z curve jumps across the grid at power-of-
  * two seams — each jump stretches some file's bounding box, which is
  * exactly the slack parquet pruning pays for. Measured in
  * BENCH_SCALE's sixth campaign: the Hilbert layout scans fewer rows
  * than Z for the same slab probes.
  *
  * The kernel is the standard public iterative rotate-and-accumulate
  * mapping (Hilbert 1891; the d2xy/xy2d formulation popularized by
  * Warren's "Hacker's Delight" §16): per bit level s, quadrant bits
  * (rx, ry) contribute s²·((3·rx) XOR ry) and the lower bits rotate.
  * Pure integer ops, O(bits) per row, shared verbatim by interpreted
  * eval and generated code — a UDF here would fence whole-stage
  * codegen for every layout rewrite row. Inputs are BUCKET ranks in
  * [0, 2^bits); out-of-range inputs fail loudly (a wrong bucket
  * silently curving to the wrong file is a pruning correctness bug,
  * not a formatting one).
  */
case class HilbertIndexExpression(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && 2 * bits <= 62, s"bits out of range ($bits)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndexExpression.hilbertD(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.HilbertIndexExpression.hilbertD($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndexExpression {

  /** Static kernel shared by interpreted eval and generated code:
    * (x, y) in [0, 2^bits)² → Hilbert distance in [0, 4^bits). */
  def hilbertD(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    if (x0 < 0 || y0 < 0 || x0 >= n || y0 >= n)
      throw new IllegalArgumentException(
        s"hilbert_index input ($x0, $y0) outside [0, $n) — bucket first")
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the lower quadrant so the curve enters/exits correctly
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - (x & (s - 1))
          y = s - 1 - (y & (s - 1))
        }
        val t = x & (s - 1)
        x = y & (s - 1)
        y = t
      } else {
        x &= s - 1
        y &= s - 1
      }
      s >>= 1
    }
    d
  }

  /** Inverse mapping (test/debug aid): Hilbert distance → (x, y).
    * The adjacency spec walks it over the whole grid. */
  def hilbertXY(d0: Long, bits: Int): (Long, Long) = {
    val n = 1L << bits
    require(d0 >= 0 && d0 < n * n, s"hilbert distance $d0 outside [0, ${n * n})")
    var x = 0L
    var y = 0L
    var t = d0
    var s = 1L
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Column API entry — `hilbertIndex(bx, by, bits)`. Inputs must be
    * BIGINT bucket ranks (cast upstream; [[graft.store.Layout.bucketOf]]
    * already emits them). */
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    GraftSqlBridge.column(HilbertIndexExpression(
      GraftSqlBridge.expression(x), GraftSqlBridge.expression(y), bits))

  /** Register `hilbert_index(x, y, bits)` for SQL texts on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndexExpression].getName, "hilbert_index"),
      (exprs: Seq[Expression]) => {
        val bits = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hilbert_index bits must be an INT literal, got $other")
        }
        HilbertIndexExpression(exprs(0), exprs(1), bits)
      })
}
