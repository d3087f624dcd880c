package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic ±1 random projection (Johnson-Lindenstrauss via the
  * Achlioptas sign construction, "Database-friendly random
  * projections", PODS 2001): pv[j] = Σ_i s(i,j)·qv[i] with the sign
  * s(i,j) derived from a fixed public LCG over the flat index i·m+j —
  * pure integer arithmetic, so any BIGINT engine replays the
  * projection EXACTLY (battery q120) and the projected dot products
  * carry no float ambiguity.
  *
  * What it buys at 100 TB: a d→m reduction shrinks every downstream
  * exact-scoring pass by d/m (64→16 = 4× fewer multiply-adds and
  * 4× smaller shuffles for the brute prefilter stage) while JL keeps
  * relative angles approximately — the standard shape is project →
  * generous top-(k·factor) in projected space → exact full-dimension
  * re-rank of the tiny candidate set
  * ([[graft.similarity.Similarity.jlPrefilterTopK]]), which restores
  * exact ordering for everything the prefilter retained. Unlike PQ
  * (codebook training + LUT scan) the projection is training-free and
  * stateless — nothing to store, drift, or rebuild — at the cost of a
  * weaker compression/recall trade-off; it is the cheap first rung of
  * the ANN ladder (JL → IVF → IVFADC-R).
  *
  * Overflow envelope: |pv[j]| ≤ d·max|qv[i]| — quantized unit-scale
  * embeddings (|qv| ≲ 10⁴) at d = 4096 stay below 2²⁶, six orders
  * under the 2⁶³ line.
  */
case class SignProjectLongs(child: Expression, outDims: Int)
    extends UnaryExpression {

  require(outDims >= 1, s"sign_project outDims must be positive ($outDims)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_project requires ARRAY<BIGINT>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_project"

  override protected def nullSafeEval(input: Any): Any =
    SignProjectLongs.evalArray(input.asInstanceOf[ArrayData], outDims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignProjectLongs.evalArray($c, $outDims)")

  override protected def withNewChildInternal(newChild: Expression): SignProjectLongs =
    copy(child = newChild)
}

object SignProjectLongs {

  /** Public LCG constants (ANSI C rand) over the prime 2³¹−1 — the
    * sign stream's single source of truth, inlined identically by the
    * SQL oracles. s(flat) = +1 iff (A·flat + B) mod P < P/2. */
  val A: Long = 1103515245L
  val B: Long = 12345L
  val P: Long = 2147483647L

  def sign(flat: Long): Long =
    if ((A * flat + B) % P < P / 2) 1L else -1L

  /** Static kernel shared by interpreted eval and generated code. */
  def evalArray(qv: ArrayData, m: Int): ArrayData = {
    val d = qv.numElements()
    val out = new Array[Long](m)
    var i = 0
    while (i < d) {
      val x = qv.getLong(i)
      val base = i.toLong * m
      var j = 0
      while (j < m) {
        if ((A * (base + j) + B) % P < P / 2) out(j) += x else out(j) -= x
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API — `signProject(col("qv"), 16)`. */
  def signProject(c: Column, outDims: Int): Column =
    GraftSqlBridge.column(SignProjectLongs(GraftSqlBridge.expression(c), outDims))
}
