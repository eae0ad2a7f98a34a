package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE tokenization expressions (see [[graft.pipeline.Bpe]]
  * for the algorithm + oracle contract). A composable-functions
  * formulation would be ~90 nested `replace` calls inside a
  * `transform` lambda — no CSE, heavy allocation; these stay inside
  * whole-stage codegen as one static call per row with a per-executor
  * word cache. */
final case class BpeCountExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    graft.pipeline.Bpe.countTokens(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.Bpe.countTokens($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

/** Space-joined BPE tokens of a document ('' for empty input) —
  * `split(bpe_tokens(text), ' ')` recovers the token array; md5 of it
  * is the content hash the oracle pins. */
final case class BpeJoinedExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_tokens"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.pipeline.Bpe.tokensJoined(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.pipeline.Bpe.tokensJoined($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): BpeJoinedExpr =
    copy(child = newChild)
}

object BpeExpr {
  def bpeCount(text: Column): Column =
    ExpressionUtils.column(BpeCountExpr(ExpressionUtils.expression(text)))
  def bpeJoined(text: Column): Column =
    ExpressionUtils.column(BpeJoinedExpr(ExpressionUtils.expression(text)))
}
