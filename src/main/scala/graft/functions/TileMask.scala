// Custom native expressions live under org.apache.spark.sql to access
// the private[sql] expression-construction API (the standard pattern
// for Spark extension libraries).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

import graft.vector.Polygon

/** Native Catalyst expression: mask a tile (`array<double>`) by a
  * polygon set — cells whose center falls inside any polygon keep
  * their value, everything else becomes NaN (reference layer.py:2044
  * mask).
  *
  * This was the last hot-path Scala UDF (CLAUDE.md bar: prefer native
  * Expressions on hot paths): the UDF variant deserializes every tile
  * to a boxed Seq[Double] and back per row; this expression stays
  * inside whole-stage codegen and reads the unsafe array directly.
  * The polygon array rides the generated class as a reference object.
  *
  * Cell-center math is bit-identical to the r7 UDFs: grid variant
  * passes (x0 = 0, cw = 1, yTop = 0, sy = 1) so the center is the raw
  * grid coordinate; world variant passes (extent.xmin, cellWidth,
  * extent.ymax, -cellHeight).
  */
final case class TileMaskExpr(colE: Expression, rowE: Expression, tileE: Expression,
                              polys: Array[Polygon], dropPolys: Array[Polygon],
                              tc: Int, tr: Int,
                              x0: Double, cw: Double, yTop: Double, sy: Double)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = colE
  override def second: Expression = rowE
  override def third: Expression = tileE

  override def inputTypes: Seq[AbstractDataType] =
    Seq(IntegerType, IntegerType, ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "tile_mask"

  override protected def nullSafeEval(cAny: Any, rAny: Any, tileAny: Any): Any = {
    val c = cAny.asInstanceOf[Int]
    val r = rAny.asInstanceOf[Int]
    val tile = tileAny.asInstanceOf[ArrayData]
    val out = new Array[Double](tile.numElements())
    var j = 0
    while (j < tr) {
      var i = 0
      while (i < tc) {
        val wx = x0 + (c.toLong * tc + i + 0.5) * cw
        val wy = yTop + (r.toLong * tr + j + 0.5) * sy
        val v = tile.getDouble(j * tc + i)
        out(j * tc + i) =
          if (!v.isNaN && TileMaskExpr.containsAny(polys, wx, wy) &&
              !TileMaskExpr.containsAny(dropPolys, wx, wy)) v else Double.NaN
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, r, t) => {
      val polysRef = ctx.addReferenceObj("maskPolys", polys, "graft.vector.Polygon[]")
      val dropRef = ctx.addReferenceObj("dropPolys", dropPolys, "graft.vector.Polygon[]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val wx = ctx.freshName("wx")
      val wy = ctx.freshName("wy")
      val v = ctx.freshName("v")
      s"""
         |final double[] $out = new double[$t.numElements()];
         |for (int $j = 0; $j < $tr; $j++) {
         |  for (int $i = 0; $i < $tc; $i++) {
         |    final double $wx = $x0 + (((long) $c) * $tc + $i + 0.5) * $cw;
         |    final double $wy = $yTop + (((long) $r) * $tr + $j + 0.5) * $sy;
         |    final double $v = $t.getDouble($j * $tc + $i);
         |    $out[$j * $tc + $i] =
         |      (!Double.isNaN($v) &&
         |       org.apache.spark.sql.graft.TileMaskExpr.containsAny($polysRef, $wx, $wy) &&
         |       !org.apache.spark.sql.graft.TileMaskExpr.containsAny($dropRef, $wx, $wy))
         |        ? $v : Double.NaN;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression, newSecond: Expression,
                                                 newThird: Expression): TileMaskExpr =
    copy(colE = newFirst, rowE = newSecond, tileE = newThird)
}

object TileMaskExpr {
  /** Called from generated code — keep public and static-shaped. */
  def containsAny(polys: Array[Polygon], x: Double, y: Double): Boolean = {
    var k = 0
    while (k < polys.length) {
      if (polys(k).contains(x, y)) return true
      k += 1
    }
    false
  }

  /** Column API: grid-coordinate mask (cell center = raw grid coord). */
  def maskTileGrid(c: Column, r: Column, tile: Column,
                   polys: Seq[Polygon], tc: Int, tr: Int): Column =
    ExpressionUtils.column(TileMaskExpr(
      ExpressionUtils.expression(c), ExpressionUtils.expression(r),
      ExpressionUtils.expression(tile), polys.toArray, Array.empty,
      tc, tr, 0.0, 1.0, 0.0, 1.0))

  /** Column API: erosion mask (grid coords) — keep a cell iff its
    * center lies inside some `keep` polygon and NO `drop` polygon
    * (Buffer.erodePieces' containment-test pair), one pass. */
  def erodeTileGrid(c: Column, r: Column, tile: Column,
                    keep: Seq[Polygon], drop: Seq[Polygon], tc: Int, tr: Int): Column =
    ExpressionUtils.column(TileMaskExpr(
      ExpressionUtils.expression(c), ExpressionUtils.expression(r),
      ExpressionUtils.expression(tile), keep.toArray, drop.toArray,
      tc, tr, 0.0, 1.0, 0.0, 1.0))

  /** Column API: world-coordinate mask through the layout transform. */
  def maskTileWorld(c: Column, r: Column, tile: Column, polys: Seq[Polygon],
                    tc: Int, tr: Int, x0: Double, cw: Double,
                    yTop: Double, ch: Double): Column =
    ExpressionUtils.column(TileMaskExpr(
      ExpressionUtils.expression(c), ExpressionUtils.expression(r),
      ExpressionUtils.expression(tile), polys.toArray, Array.empty,
      tc, tr, x0, cw, yTop, -ch))
}
