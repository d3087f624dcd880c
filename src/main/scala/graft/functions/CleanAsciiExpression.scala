package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.clean.TextClean

/** Native Catalyst expression for O-9 (unicode→ASCII normalize,
  * pipeline_etl.ipynb:205-211) — the SURVEY §4 codegen candidate.
  *
  * A Scala UDF for the same logic works but BLOCKS whole-stage codegen
  * (the UDF call is a codegen fence and adds serde per row). This
  * UnaryExpression generates inline code via doGenCode, so the O-10
  * clean chain (ascii → regexp chain) stays inside one codegen stage.
  */
case class CleanAsciiExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"clean_ascii requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "clean_ascii"

  override protected def nullSafeEval(input: Any): Any =
    CleanAsciiExpression.evalUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CleanAsciiExpression.evalUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): CleanAsciiExpression =
    copy(child = newChild)
}

object CleanAsciiExpression {

  /** Static kernel shared by interpreted eval and generated code. */
  def evalUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(TextClean.cleanAsciiString(s.toString))

  /** Column API entry — `cleanAsciiNative(col("name"))`. */
  def cleanAsciiNative(c: Column): Column =
    GraftSqlBridge.column(CleanAsciiExpression(GraftSqlBridge.expression(c)))

  /** Register `clean_ascii(...)` for SQL texts on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("clean_ascii"),
      new ExpressionInfo(classOf[CleanAsciiExpression].getName, "clean_ascii"),
      (exprs: Seq[Expression]) => CleanAsciiExpression(exprs.head))
}
