// Custom native expressions live under org.apache.spark.sql to access
// the private[sql] expression-construction API (the standard pattern
// for Spark extension libraries).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

import graft.core.CellType

/** Native Catalyst expressions for the catalog's native-width tile
  * storage (reference GeoTrellis stores tiles at the dtype's width;
  * graft packs `array<double>` tiles to little-endian BINARY at the
  * layer's [[graft.core.CellType]] before the z-order write shuffle,
  * Catalog.scala).
  *
  * These replace the last UDFs on a data path: the UDF variants
  * round-tripped every tile through boxed `Seq[Double]` via the
  * catalyst-to-Scala converters; these read/write the unsafe array
  * data directly and stay inside whole-stage codegen, so the pack
  * stage fuses with the zindex projection feeding the write exchange.
  *
  * The [[CellType]] is resolved from its NAME, so the expressions are
  * also SQL-callable with a literal type name:
  * `tile_pack(tile, 'uint8')` (registered in [[GraftExtensions]]).
  */
final case class TilePackExpr(child: Expression, ctName: String)
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val ct: CellType = CellType.fromName(ctName)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "tile_pack"

  override protected def nullSafeEval(a: Any): Any =
    TilePackExpr.pack(ct, a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctRef = ctx.addReferenceObj("cellType", ct, classOf[CellType].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TilePackExpr.pack($ctRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TilePackExpr =
    copy(child = newChild)
}

object TilePackExpr {
  /** Called from generated code — keep public and static-shaped. */
  def pack(ct: CellType, cells: ArrayData): Array[Byte] =
    ct.pack(cells.toDoubleArray())

  def packCol(tile: Column, cellType: String): Column =
    ExpressionUtils.column(TilePackExpr(ExpressionUtils.expression(tile), cellType))
}

/** Inverse of [[TilePackExpr]]: native-width LE bytes back to the
  * NaN-as-NoData `array<double>` compute representation. */
final case class TileUnpackExpr(child: Expression, ctName: String)
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val ct: CellType = CellType.fromName(ctName)

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "tile_unpack"

  override protected def nullSafeEval(a: Any): Any =
    TileUnpackExpr.unpack(ct, a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctRef = ctx.addReferenceObj("cellType", ct, classOf[CellType].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TileUnpackExpr.unpack($ctRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TileUnpackExpr =
    copy(child = newChild)
}

object TileUnpackExpr {
  /** Called from generated code — keep public and static-shaped. */
  def unpack(ct: CellType, packed: Array[Byte]): GenericArrayData =
    new GenericArrayData(ct.unpack(packed))

  def unpackCol(blob: Column, cellType: String): Column =
    ExpressionUtils.column(TileUnpackExpr(ExpressionUtils.expression(blob), cellType))
}

/** Multiband pack: the whole band stack (`array<array<double>>`) into
  * ONE binary blob, bands contiguous at native width. Single pre-sized
  * output buffer (an iterator `reduce(_ ++ _)` would re-copy the
  * accumulated prefix per band, O(nb^2)). */
final case class BandsPackExpr(child: Expression, ctName: String)
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val ct: CellType = CellType.fromName(ctName)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bands_pack"

  override protected def nullSafeEval(a: Any): Any =
    BandsPackExpr.pack(ct, a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctRef = ctx.addReferenceObj("cellType", ct, classOf[CellType].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BandsPackExpr.pack($ctRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BandsPackExpr =
    copy(child = newChild)
}

object BandsPackExpr {
  /** Called from generated code — keep public and static-shaped. */
  def pack(ct: CellType, bands: ArrayData): Array[Byte] = {
    val nb = bands.numElements()
    val parts = new Array[Array[Byte]](nb)
    var total = 0
    var b = 0
    while (b < nb) {
      val p = ct.pack(bands.getArray(b).toDoubleArray())
      parts(b) = p; total += p.length; b += 1
    }
    val out = new Array[Byte](total)
    var off = 0
    b = 0
    while (b < nb) {
      System.arraycopy(parts(b), 0, out, off, parts(b).length)
      off += parts(b).length; b += 1
    }
    out
  }

  def packCol(bands: Column, cellType: String): Column =
    ExpressionUtils.column(BandsPackExpr(ExpressionUtils.expression(bands), cellType))
}

/** Inverse of [[BandsPackExpr]]: slice the blob into `nb` equal bands
  * and unpack each. Band count rides the catalog's attribute store, so
  * it is a construction-time parameter, not data. */
final case class BandsUnpackExpr(child: Expression, ctName: String, nb: Int)
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val ct: CellType = CellType.fromName(ctName)

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "bands_unpack"

  override protected def nullSafeEval(a: Any): Any =
    BandsUnpackExpr.unpack(ct, nb, a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctRef = ctx.addReferenceObj("cellType", ct, classOf[CellType].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BandsUnpackExpr.unpack($ctRef, $nb, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BandsUnpackExpr =
    copy(child = newChild)
}

object BandsUnpackExpr {
  /** Called from generated code — keep public and static-shaped. */
  def unpack(ct: CellType, nb: Int, blob: Array[Byte]): GenericArrayData = {
    val per = blob.length / nb
    val out = new Array[GenericArrayData](nb)
    var b = 0
    while (b < nb) {
      out(b) = new GenericArrayData(
        ct.unpack(java.util.Arrays.copyOfRange(blob, b * per, (b + 1) * per)))
      b += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  def unpackCol(blob: Column, cellType: String, nb: Int): Column =
    ExpressionUtils.column(BandsUnpackExpr(ExpressionUtils.expression(blob), cellType, nb))
}
