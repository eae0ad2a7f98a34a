package graft.raster

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NetCDF classic-format (CDF-1) codec, written from the public
  * netCDF classic format specification (the on-disk format of netCDF
  * 3.x; magic 'CDF\1'). The reference stack reads NetCDF through its
  * GDAL path (rasterio.py); graft decodes the classic format natively
  * so gridded scene ingest needs no external driver.
  *
  * Layout implemented (all big-endian, names ASCII, 4-byte padding):
  * {{{
  *   header  = magic numrecs dim_list gatt_list var_list
  *   dim     = name int32(length)            (length 0 = record dim)
  *   attr    = name nc_type nelems values
  *   var     = name ndims dimids vatt_list nc_type vsize begin(int32)
  * }}}
  * Fixed vars live at their `begin` offsets; record vars interleave
  * per record with stride = Σ padded per-record slab sizes. Read
  * supports nc_types short/int/float/double (3/4/5/6); write emits
  * doubles.
  *
  * Scale: encode/decode are per-scene row operations inside a
  * Dataset.map — the same distributed ingest shape as [[GeoTiff]];
  * nothing touches the driver.
  */
object NetCdf {
  private val TagDim = 0x0A
  private val TagVar = 0x0B
  private val TagAtt = 0x0C

  // ---------------------------------------------------------------- write

  private def pad4(n: Int): Int = (n + 3) & ~3

  private final class W {
    val out = new ByteArrayOutputStream()
    def i4(v: Int): Unit = {
      out.write(v >>> 24); out.write(v >>> 16); out.write(v >>> 8); out.write(v)
    }
    def f8(v: Double): Unit = {
      val b = java.lang.Double.doubleToLongBits(v)
      (7 to 0 by -1).foreach(s => out.write((b >>> (8 * s)).toInt))
    }
    def name(s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      i4(b.length); out.write(b)
      (b.length until pad4(b.length)).foreach(_ => out.write(0))
    }
  }

  private def attBytes(w: W, atts: Seq[(String, Double)]): Unit = {
    if (atts.isEmpty) { w.i4(0); w.i4(0) }
    else {
      w.i4(TagAtt); w.i4(atts.size)
      atts.foreach { case (n, v) => w.name(n); w.i4(6); w.i4(1); w.f8(v) }
    }
  }

  private def headerSize(dims: Seq[(String, Int)], gatts: Seq[(String, Double)],
                         vars: Seq[(String, Seq[Int])]): Int = {
    def nameSz(s: String) = 4 + pad4(s.getBytes("US-ASCII").length)
    val dimSz = 8 + dims.map(d => nameSz(d._1) + 4).sum
    val gattSz = 8 + gatts.map(a => nameSz(a._1) + 4 + 4 + 8).sum
    val varSz = 8 + vars.map { case (n, ds) =>
      nameSz(n) + 4 + 4 * ds.size + 8 /* ABSENT vatts */ + 4 + 4 + 4
    }.sum
    4 + 4 + dimSz + gattSz + varSz
  }

  /** One 2D double grid (dims y, x) + coordinate vars carrying cell
    * CENTER coords + extent global attrs. `cells` is row-major y-down
    * (row 0 = ymax edge), NaN = NoData (IEEE NaN round-trips). */
  def encodeGrid(cells: Array[Double], cols: Int, rows: Int,
                 xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                 varName: String = "v"): Array[Byte] = {
    require(cells.length == cols * rows, "cells must be cols*rows row-major")
    val cw = (xmax - xmin) / cols; val ch = (ymax - ymin) / rows
    val dims = Seq(("y", rows), ("x", cols))
    val gatts = Seq(("xmin", xmin), ("ymin", ymin), ("xmax", xmax), ("ymax", ymax))
    val vars = Seq(("y", Seq(0)), ("x", Seq(1)), (varName, Seq(0, 1)))
    val h = headerSize(dims, gatts, vars)
    val sizes = Seq(rows * 8, cols * 8, rows * cols * 8)
    val begins = sizes.scanLeft(h)((acc, s) => acc + pad4(s))
    val w = new W
    w.out.write('C'); w.out.write('D'); w.out.write('F'); w.out.write(1)
    w.i4(0) // numrecs
    w.i4(TagDim); w.i4(dims.size)
    dims.foreach { case (n, l) => w.name(n); w.i4(l) }
    attBytes(w, gatts)
    w.i4(TagVar); w.i4(vars.size)
    vars.zipWithIndex.foreach { case ((n, ds), i) =>
      w.name(n); w.i4(ds.size); ds.foreach(w.i4)
      w.i4(0); w.i4(0) // vatt_list ABSENT
      w.i4(6); w.i4(pad4(sizes(i))); w.i4(begins(i))
    }
    (0 until rows).foreach(r => w.f8(ymax - (r + 0.5) * ch))
    (0 until cols).foreach(c => w.f8(xmin + (c + 0.5) * cw))
    cells.foreach(w.f8)
    w.out.toByteArray
  }

  /** Record-dimension twin: `slabs(r)` is the grid at `instants(r)`
    * (epoch seconds, stored as the `time` record coordinate var);
    * data var is (time, y, x). */
  def encodeScenes(instants: Array[Long], slabs: Array[Array[Double]],
                   cols: Int, rows: Int,
                   xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                   varName: String = "v"): Array[Byte] = {
    require(instants.length == slabs.length && slabs.forall(_.length == cols * rows),
      "one cols*rows slab per instant")
    val dims = Seq(("time", 0), ("y", rows), ("x", cols))
    val gatts = Seq(("xmin", xmin), ("ymin", ymin), ("xmax", xmax), ("ymax", ymax))
    val vars = Seq(("time", Seq(0)), (varName, Seq(0, 1, 2)))
    val h = headerSize(dims, gatts, vars)
    val slabSizes = Seq(8, rows * cols * 8) // per-record, both multiples of 4
    val begins = slabSizes.scanLeft(h)((acc, s) => acc + pad4(s))
    val w = new W
    w.out.write('C'); w.out.write('D'); w.out.write('F'); w.out.write(1)
    w.i4(instants.length)
    w.i4(TagDim); w.i4(dims.size)
    dims.foreach { case (n, l) => w.name(n); w.i4(l) }
    attBytes(w, gatts)
    w.i4(TagVar); w.i4(vars.size)
    vars.zipWithIndex.foreach { case ((n, ds), i) =>
      w.name(n); w.i4(ds.size); ds.foreach(w.i4)
      w.i4(0); w.i4(0)
      w.i4(6); w.i4(pad4(slabSizes(i))); w.i4(begins(i))
    }
    instants.indices.foreach { r => // records interleave: time, slab
      w.f8(instants(r).toDouble)
      slabs(r).foreach(w.f8)
    }
    w.out.toByteArray
  }

  // ---------------------------------------------------------------- read

  final case class NcDim(name: String, length: Int)
  final case class NcVar(name: String, dimIds: Seq[Int], ncType: Int,
                         vsize: Int, begin: Long, isRecord: Boolean)

  final class NcFile(val dims: Seq[NcDim], val numrecs: Int,
                     val gatts: Map[String, Any], val vars: Seq[NcVar],
                     bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    private val recStride: Long =
      vars.filter(_.isRecord).map(v => pad4(slabSize(v)).toLong).sum

    private def typeSize(t: Int): Int = t match {
      case 1 | 2 => 1; case 3 => 2; case 4 | 5 => 4; case 6 => 8
      case t => throw new IllegalArgumentException(s"nc_type $t unsupported")
    }
    /** Per-record (record vars) or total (fixed vars) unpadded size. */
    private def slabSize(v: NcVar): Int = {
      val fixedDims = if (v.isRecord) v.dimIds.tail else v.dimIds
      fixedDims.map(dims(_).length).product * typeSize(v.ncType)
    }
    private def readAt(off: Long, n: Int, t: Int): Array[Double] = {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = t match {
          case 3 => buf.getShort((off + 2L * i).toInt).toDouble
          case 4 => buf.getInt((off + 4L * i).toInt).toDouble
          case 5 => buf.getFloat((off + 4L * i).toInt).toDouble
          case 6 => buf.getDouble((off + 8L * i).toInt)
          case t => throw new IllegalArgumentException(s"nc_type $t unsupported")
        }
        i += 1
      }
      out
    }
    def variable(name: String): NcVar = vars.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"variable '$name' not in ${vars.map(_.name).mkString("[", ", ", "]")}"))
    /** Full data of a FIXED var as doubles. */
    def readVar(name: String): Array[Double] = {
      val v = variable(name)
      require(!v.isRecord, s"'$name' is a record variable — use readRecord")
      readAt(v.begin, slabSize(v) / typeSize(v.ncType), v.ncType)
    }
    /** One record slab of a RECORD var as doubles. */
    def readRecord(name: String, rec: Int): Array[Double] = {
      val v = variable(name)
      require(v.isRecord, s"'$name' is a fixed variable — use readVar")
      require(rec >= 0 && rec < numrecs, s"record $rec outside 0..${numrecs - 1}")
      readAt(v.begin + rec * recStride, slabSize(v) / typeSize(v.ncType), v.ncType)
    }
  }

  def decode(bytes: Array[Byte]): NcFile = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(bytes.length > 8 && bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F',
      "not a NetCDF classic file (bad magic)")
    val version = bytes(3)
    require(version == 1 || version == 2, s"CDF version $version unsupported")
    var p = 4
    def i4(): Int = { val v = buf.getInt(p); p += 4; v }
    def off(): Long = if (version == 2) { val v = buf.getLong(p); p += 8; v } else i4().toLong
    def name(): String = {
      val n = i4()
      val s = new String(bytes, p, n, "US-ASCII")
      p += pad4(n); s
    }
    val numrecs = i4()
    def list(tag: Int): Int = {
      val t = i4(); val n = i4()
      require(t == tag || (t == 0 && n == 0), s"bad list tag $t (want $tag)")
      n
    }
    val dims = (0 until list(TagDim)).map(_ => NcDim(name(), i4()))
    def atts(): Map[String, Any] =
      (0 until list(TagAtt)).map { _ =>
        val n = name(); val t = i4(); val ne = i4()
        val v: Any = t match {
          case 2 =>
            val s = new String(bytes, p, ne, "US-ASCII"); p += pad4(ne); s
          case 6 =>
            val ds = (0 until ne).map(i => buf.getDouble(p + 8 * i))
            p += 8 * ne
            if (ne == 1) ds.head else ds
          case 4 =>
            val is = (0 until ne).map(i => buf.getInt(p + 4 * i))
            p += pad4(4 * ne)
            if (ne == 1) is.head else is
          case t =>
            throw new IllegalArgumentException(s"attr nc_type $t unsupported")
        }
        n -> v
      }.toMap
    val gatts = atts()
    val vars = (0 until list(TagVar)).map { _ =>
      val n = name()
      val dimIds = (0 until i4()).map(_ => i4())
      atts() // vatts: parsed and dropped
      val t = i4(); val vsize = i4(); val begin = off()
      val isRec = dimIds.headOption.exists(d => dims(d).length == 0)
      NcVar(n, dimIds, t, vsize, begin, isRec)
    }
    new NcFile(dims, numrecs, gatts, vars, bytes)
  }

  // ------------------------------------------------------------- ingest

  private def sceneRow(id: Long, nc: NcFile, varName: String,
                       cells: Array[Double]): (Long, Double, Double, Double, Double, Int, Int, Seq[Double]) = {
    def g(n: String) = nc.gatts(n).asInstanceOf[Double]
    val v = nc.variable(varName)
    val spatial = if (v.isRecord) v.dimIds.tail else v.dimIds
    require(spatial.size == 2, s"'$varName' must be 2D (y, x)")
    val rows = nc.dims(spatial(0)).length
    val cols = nc.dims(spatial(1)).length
    (id, g("xmin"), g("ymin"), g("xmax"), g("ymax"), cols, rows, cells.toSeq)
  }

  /** NetCDF byte scenes → [[UntiledRaster]] (decode distributed, then
    * tileToLayout). `ncs` columns: (scene_id LONG, nc BINARY). */
  def fromNetCdf(ncs: DataFrame, varName: String = "v"): UntiledRaster = {
    val spark = ncs.sparkSession
    import spark.implicits._
    val scenes = ncs.select(col("scene_id"), col("nc")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val nc = decode(bytes)
        sceneRow(id, nc, varName, nc.readVar(varName))
      }
      .toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells")
    UntiledRaster(scenes)
  }

  /** Temporal twin: every record of the `time` dimension becomes one
    * scene stamped with the time coordinate (epoch seconds). */
  def fromNetCdfTemporal(ncs: DataFrame, varName: String = "v"): UntiledRaster = {
    val spark = ncs.sparkSession
    import spark.implicits._
    val scenes = ncs.select(col("scene_id"), col("nc")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nc = decode(bytes)
        (0 until nc.numrecs).map { r =>
          val inst = nc.readRecord("time", r).head.toLong
          val row = sceneRow(id * 65536 + r, nc, varName, nc.readRecord(varName, r))
          (row._1, row._2, row._3, row._4, row._5, row._6, row._7, row._8, inst)
        }
      }
      .toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells", "instant")
    UntiledRaster(scenes)
  }

  /** Layer → one NetCDF scene per tile (the toGeoTiff twin):
    * (col, row, nc BINARY). */
  def toNetCdf(layer: RasterLayer): DataFrame = {
    val spark = layer.df.sparkSession
    import spark.implicits._
    val meta = layer.meta
    val tl = meta.layout.tileLayout
    val ext = meta.layout.extent
    val cw = meta.layout.cellWidth; val chh = meta.layout.cellHeight
    layer.df.select(col("col"), col("row"), col("tile"))
      .as[(Int, Int, Seq[Double])]
      .map { case (c, r, tile) =>
        val xmin = ext.xmin + c.toLong * tl.tileCols * cw
        val ymax = ext.ymax - r.toLong * tl.tileRows * chh
        (c, r, encodeGrid(tile.toArray, tl.tileCols, tl.tileRows,
          xmin, ymax - tl.tileRows * chh, xmin + tl.tileCols * cw, ymax))
      }
      .toDF("col", "row", "nc")
  }
}
