package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for byte-pair-encoding (Sennrich et al.,
  * arXiv:1508.07909) — the tokenizer-training loop's inner transform.
  *
  * One BPE training iteration rewrites every symbol sequence by
  * greedily merging one `(left, right)` pair left-to-right without
  * overlap: in a run of identical symbols `aaa` with merge `(a,a)` the
  * scan takes positions 0-1 and leaves the trailing `a` — the exact
  * semantics the trainer's pair-count argmax assumes on the NEXT
  * round, so the apply step must honor it or counts drift from the
  * vocabulary actually produced.
  *
  * Why native: the greedy scan is inherently sequential per sequence,
  * which higher-order `transform`/`filter` chains cannot express
  * without a window (one shuffle per merge round). As a codegen'd
  * UnaryExpression the pass is a single in-place array walk — the
  * per-round cost is one narrow map over the vocabulary table, and the
  * round's only exchange is the pair-count aggregation. The merged
  * pair rides in the expression as a constant (it IS constant within a
  * round), same shape as [[HilbertIndexExpression]]'s `bits`.
  */
case class BpeMergeStep(child: Expression, leftSym: String, rightSym: String)
    extends UnaryExpression {

  require(leftSym.nonEmpty && rightSym.nonEmpty,
    "bpe_merge_step symbols must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge_step requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_step"

  @transient private lazy val leftU = UTF8String.fromString(leftSym)
  @transient private lazy val rightU = UTF8String.fromString(rightSym)

  override protected def nullSafeEval(input: Any): Any =
    BpeExpressions.mergeStep(input.asInstanceOf[ArrayData], leftU, rightU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("bpeLeft", leftU, classOf[UTF8String].getName)
    val r = ctx.addReferenceObj("bpeRight", rightU, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeExpressions.mergeStep($c, $l, $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeStep =
    copy(child = newChild)
}

/** Whole-encoder kernel: word → code-point symbols → the full learned
  * merge list applied in rank order. One codegen call per word (no
  * per-merge column round-trip), used when ENCODING with an
  * already-trained merge table — the inference-side twin of the
  * training loop's per-round [[BpeMergeStep]].
  */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.forall(m => m._1.nonEmpty && m._2.nonEmpty),
    "bpe_encode_word merge symbols must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_word requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_word"

  @transient private lazy val table: BpeExpressions.MergeTable =
    BpeExpressions.MergeTable(
      merges.map(m => UTF8String.fromString(m._1)).toArray,
      merges.map(m => UTF8String.fromString(m._2)).toArray)

  override protected def nullSafeEval(input: Any): Any =
    BpeExpressions.encodeWord(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeMerges", table,
      classOf[BpeExpressions.MergeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeExpressions.encodeWord($c, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWord =
    copy(child = newChild)
}

object BpeExpressions {

  /** Learned merge list in apply order, pre-encoded as UTF8. */
  final case class MergeTable(lefts: Array[UTF8String], rights: Array[UTF8String]) {
    require(lefts.length == rights.length, "ragged merge table")
  }

  /** Static kernel: one greedy left-to-right non-overlapping merge
    * pass. Null elements (never produced by this library's splitters)
    * pass through unmerged. */
  def mergeStep(arr: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return arr.copy()
    val out = new Array[AnyRef](n)
    val merged = UTF8String.concat(l, r)
    var i = 0
    var k = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && l.equals(cur) && r.equals(arr.getUTF8String(i + 1))) {
        out(k) = merged
        i += 2
      } else {
        out(k) = cur
        i += 1
      }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** Static kernel: split a word into code-point symbols (the same
    * per-character granularity as `substring(word, i, 1)` in both
    * Spark and DuckDB), then apply every merge in rank order. */
  def encodeWord(word: UTF8String, t: MergeTable): ArrayData = {
    val s = word.toString
    val nCp = s.codePointCount(0, s.length)
    var cur = new Array[UTF8String](nCp)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      cur(ci) = UTF8String.fromString(new String(Character.toChars(cp)))
      ci += 1
      off += Character.charCount(cp)
    }
    var m = 0
    while (m < t.lefts.length && cur.length >= 2) {
      cur = mergePass(cur, t.lefts(m), t.rights(m))
      m += 1
    }
    new GenericArrayData(cur.asInstanceOf[Array[AnyRef]])
  }

  private def mergePass(
      syms: Array[UTF8String], l: UTF8String, r: UTF8String): Array[UTF8String] = {
    val n = syms.length
    val out = new Array[UTF8String](n)
    val merged = UTF8String.concat(l, r)
    var i = 0
    var k = 0
    while (i < n) {
      if (i + 1 < n && l.equals(syms(i)) && r.equals(syms(i + 1))) {
        out(k) = merged
        i += 2
      } else {
        out(k) = syms(i)
        i += 1
      }
      k += 1
    }
    if (k == n) out else java.util.Arrays.copyOf(out, k)
  }

  /** Column API — one training-round merge pass. */
  def bpeMergeStep(c: Column, left: String, right: String): Column =
    GraftSqlBridge.column(BpeMergeStep(GraftSqlBridge.expression(c), left, right))

  /** Column API — full encoder over a learned merge list. */
  def bpeEncodeWord(c: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeEncodeWord(GraftSqlBridge.expression(c), merges))
}
