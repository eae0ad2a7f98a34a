package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** `bloom_test(positions)` — true iff EVERY position in the input
  * array<bigint> has its bit set in a broadcast Bloom bit set
  * (packed long words, position p -> words[p >>> 6] bit (p & 63)).
  *
  * The bit set rides a Spark Broadcast carried as a JVM constructor
  * parameter (the TermScanExpr/TileMaskExpr precedent — Column-API-
  * only, noted in GraftExtensions): tasks serialize only the
  * broadcast HANDLE, executors fetch the words once, and the test
  * itself stays inside whole-stage codegen — no DeserializeToObject /
  * typed-filter stage in the corpus scan (the r14 bloom-contamination
  * plan break this replaces).
  */
final case class BloomTestExpr(child: Expression,
                               words: Broadcast[Array[Long]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_test"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val w = words.value
    var i = 0
    while (i < arr.numElements()) {
      val p = arr.getLong(i)
      if ((w((p >>> 6).toInt) & (1L << (p & 63).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBits", words,
      classOf[Broadcast[Array[Long]]].getName)
    // fetch the broadcast value once per codegen object, not per row
    val w = ctx.addMutableState("long[]", "bloomWords",
      v => s"$v = (long[]) $bc.value();", forceInline = true)
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      s"""
         |${ev.value} = true;
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $p = $c.getLong($i);
         |  if (($w[(int)($p >>> 6)] & (1L << (int)($p & 63))) == 0L) {
         |    ${ev.value} = false;
         |    break;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomTestExpr =
    copy(child = newChild)
}

object BloomTestExpr {
  /** All-positions-set test against a broadcast packed bit set. */
  def bloomTest(positions: Column, words: Broadcast[Array[Long]]): Column =
    ExpressionUtils.column(BloomTestExpr(ExpressionUtils.expression(positions), words))
}
