// Custom native expressions live under org.apache.spark.sql to access
// the private[sql] expression-construction API (the standard pattern
// for Spark extension libraries).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression: single-pass NaN-skipping statistics of a
  * tile (`array<double>`) -> struct(vsum, vcnt, vmin, vmax).
  *
  * Replaces four separate higher-order-function passes (aggregate +
  * size∘filter + array_min∘filter + array_max∘filter) with one loop,
  * with real codegen (`doGenCode`) so it stays inside whole-stage
  * codegen. Preferred extension shape: native Expression > UDF.
  */
final case class TileStatsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = TileStatsExpr.schema

  override def prettyName: String = "tile_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var sum = 0.0; var cnt = 0L
    var mn = Double.NaN; var mx = Double.NaN
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val v = arr.getDouble(i)
      if (!v.isNaN) {
        sum += v; cnt += 1
        if (mn.isNaN || v < mn) mn = v
        if (mx.isNaN || v > mx) mx = v
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](sum, cnt, mn, mx))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val sum = ctx.freshName("sum")
      val cnt = ctx.freshName("cnt")
      val mn = ctx.freshName("mn")
      val mx = ctx.freshName("mx")
      s"""
         |double $sum = 0.0; long $cnt = 0L;
         |double $mn = Double.NaN; double $mx = Double.NaN;
         |final int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = $c.getDouble($i);
         |  if (!Double.isNaN($v)) {
         |    $sum += $v; $cnt++;
         |    if (Double.isNaN($mn) || $v < $mn) $mn = $v;
         |    if (Double.isNaN($mx) || $v > $mx) $mx = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$sum, $cnt, $mn, $mx});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TileStatsExpr =
    copy(child = newChild)
}

object TileStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("vsum", DoubleType, nullable = false),
    StructField("vcnt", LongType, nullable = false),
    StructField("vmin", DoubleType, nullable = false),
    StructField("vmax", DoubleType, nullable = false)))

  /** Column API: tile_stats(tile) */
  def tileStats(tile: Column): Column =
    ExpressionUtils.column(TileStatsExpr(ExpressionUtils.expression(tile)))
}
