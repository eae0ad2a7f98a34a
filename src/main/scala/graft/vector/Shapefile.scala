package graft.vector

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** ESRI Shapefile (.shp) codec — the WHAT of the reference's
  * shapefile ingestion (geopyspark/geotools/shapefile.py:68 `get`
  * returns the file's features as geometries), re-expressed without
  * the GeoTools dependency: the .shp main-file format is a public
  * spec (ESRI Shapefile Technical Description, 1998), mixed-endian
  * (headers big-endian, geometry little-endian).
  *
  * Supported shape types: Null (0), Point (1), PolyLine (3, all
  * parts — single-part records decode to LINESTRING, multi-part to
  * MULTILINESTRING), Polygon (5), MultiPoint (8). Z/M variants are
  * out of scope; the .dbf attribute sidecar is handled by [[Dbf]] and
  * joined in [[readFeatures]].
  *
  * Ring orientation per spec: exterior rings are clockwise
  * (negative shoelace area in y-up coords), holes counter-clockwise;
  * holes attach to the polygon whose exterior contains them.
  *
  * Spark shape: [[read]] lists + reads files distributed via the
  * `binaryFile` source (one file per task — shapefiles are bounded at
  * 2 GB by their 32-bit word offsets, so a file is a sane task), and
  * per-record decode is a narrow flatMap yielding WKT rows that feed
  * the existing geometry operators.
  */
object Shapefile {

  private val FileCode = 9994
  private val Version = 1000

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  /** Decode every record of a .shp main file into geometries
    * (Null-shape records dropped). */
  def readGeometries(bytes: Array[Byte]): Seq[Wkt.Geom] =
    readGeometriesIndexed(bytes).map(_._2)

  /** Decode with positional record indices (0-based file order,
    * Null-shape slots counted but not emitted) — the index that
    * aligns with the sibling .dbf's record numbers. */
  def readGeometriesIndexed(bytes: Array[Byte]): Seq[(Int, Wkt.Geom)] = {
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(be.getInt(0) == FileCode, "not a shapefile (bad file code)")
    require(le.getInt(28) == Version, "unsupported shapefile version")
    val fileBytes = be.getInt(24).toLong * 2
    require(fileBytes <= bytes.length, "truncated shapefile")
    val out = Seq.newBuilder[(Int, Wkt.Geom)]
    var pos = 100
    var rec = 0
    while (pos + 8 <= fileBytes) {
      val contentWords = be.getInt(pos + 4)
      val body = pos + 8
      decodeRecord(le, body) match {
        case Some(g) => out += ((rec, g))
        case None    =>
      }
      rec += 1
      pos = body + contentWords * 2
    }
    out.result()
  }

  private def decodeRecord(le: ByteBuffer, at: Int): Option[Wkt.Geom] = {
    le.getInt(at) match {
      case 0 => None // Null shape
      case 1 => // Point
        Some(Wkt.PointG(Pt(le.getDouble(at + 4), le.getDouble(at + 12))))
      case 8 => // MultiPoint: bbox(32) + numPoints + points
        val n = le.getInt(at + 36)
        val pts = (0 until n).map(i =>
          Pt(le.getDouble(at + 40 + 16 * i), le.getDouble(at + 48 + 16 * i)))
        Some(Wkt.MultiPointG(pts))
      case 3 | 5 => // PolyLine / Polygon: bbox + numParts + numPoints + parts + points
        val shapeType = le.getInt(at)
        val numParts = le.getInt(at + 36)
        val numPoints = le.getInt(at + 40)
        val partsOff = at + 44
        val ptsOff = partsOff + 4 * numParts
        val starts = (0 until numParts).map(i => le.getInt(partsOff + 4 * i))
        val bounds = starts :+ numPoints
        val rings = (0 until numParts).map { p =>
          (bounds(p) until bounds(p + 1)).map(i =>
            Pt(le.getDouble(ptsOff + 16 * i), le.getDouble(ptsOff + 8 + 16 * i)))
        }
        if (shapeType == 3)
          Some(if (numParts == 1) Wkt.LineStringG(rings.head)
               else Wkt.MultiLineStringG(rings))
        else Some(assemblePolygons(rings))
      case t => throw new IllegalArgumentException(
        s"unsupported shape type $t (Z/M shapefiles not supported)")
    }
  }

  /** Signed shoelace area: negative = clockwise in y-up coords. */
  private def signedArea(ring: IndexedSeq[Pt]): Double = {
    var a = 0.0
    var i = 0
    val n = ring.length
    while (i < n) {
      val p = ring(i); val q = ring((i + 1) % n)
      a += p.x * q.y - q.x * p.y
      i += 1
    }
    a / 2
  }

  /** Group rings into polygons: clockwise rings are exteriors, each
    * counter-clockwise ring attaches to the exterior containing its
    * first vertex (spec-conform files list holes after their outer
    * ring, which the fallback also honors). */
  private def assemblePolygons(rings: Seq[IndexedSeq[Pt]]): Wkt.Geom = {
    // shapefile rings repeat the first point last; our Polygon model
    // keeps rings open
    val open = rings.map(r => if (r.length > 1 && r.head == r.last) r.dropRight(1) else r)
    val (outers, holes) = open.partition(r => signedArea(r) <= 0)
    val polys = scala.collection.mutable.ArrayBuffer.empty[(IndexedSeq[Pt], scala.collection.mutable.ArrayBuffer[IndexedSeq[Pt]])]
    (if (outers.nonEmpty) outers else open).foreach(o => polys += ((o, scala.collection.mutable.ArrayBuffer.empty)))
    if (outers.nonEmpty) holes.foreach { h =>
      val probe = h.head
      val owner = polys.indexWhere { case (ext, _) => Polygon(ext).contains(probe.x, probe.y) }
      polys(if (owner >= 0) owner else polys.length - 1)._2 += h
    }
    val built = polys.map { case (ext, hs) => Polygon(ext, hs.toSeq) }.toSeq
    if (built.size == 1) Wkt.PolygonG(built.head) else Wkt.MultiPolygonG(built)
  }

  /** Convenience: all polygons in the file (PolygonG flattened,
    * matching Wkt.parsePolygons). */
  def readPolygons(bytes: Array[Byte]): Seq[Polygon] =
    readGeometries(bytes).flatMap {
      case Wkt.PolygonG(p)       => Seq(p)
      case Wkt.MultiPolygonG(ps) => ps
      case _                     => Nil
    }

  /** Distributed ingestion: every .shp under `path` via the
    * `binaryFile` source, one row per record as (path, idx, wkt) —
    * URI-transparent across local/HDFS/S3 like GeoTiff.readFolder.
    * Chain `Wkt.parsePolygons(wkt)` / mask / rasterize downstream. */
  def read(spark: SparkSession, path: String, glob: String = "*.shp"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        // positional record indices (Null-shape slots counted), the
        // same idx readFeatures pairs with .dbf record numbers
        readGeometriesIndexed(bytes).map { case (i, g) => (p, i, Wkt.write(g)) }
      }
      .toDF("path", "idx", "wkt")
  }

  /** Feature ingestion: geometries from .shp records PLUS their
    * attribute row from the sibling .dbf (records align by index —
    * the shapefile contract). Output one row per feature:
    * (path, idx, wkt, attrs MAP<STRING,STRING>); numeric casts happen
    * downstream where the consumer knows the field type. Both file
    * families load through binaryFile and pair on their basename —
    * a broadcastable join at any realistic shapefile count. */
  def readFeatures(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    def base(p: String) = {
      val f = p.split('/').last
      f.substring(0, f.lastIndexOf('.'))
    }
    val shp = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.shp").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        readGeometriesIndexed(bytes).map { case (i, g) =>
          (base(p), p, i, Wkt.write(g))
        }
      }
      .toDF("_base", "path", "idx", "wkt")
    val dbf = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.dbf").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        // positional indices survive deleted (0x2A) records, keeping
        // shp/dbf row alignment
        val (fields, rows) = Dbf.readIndexed(bytes)
        rows.map { case (i, r) =>
          (base(p), i, fields.map(_.name).zip(r).toMap)
        }
      }
      .toDF("_base", "idx", "attrs")
    shp.join(org.apache.spark.sql.functions.broadcast(dbf), Seq("_base", "idx"), "left")
      .select(col("path"), col("idx"), col("wkt"), col("attrs"))
  }

  // ------------------------------------------------------------------
  // encode (exports + the test/oracle writer)
  // ------------------------------------------------------------------

  private def bbox(pts: Iterable[Pt]): (Double, Double, Double, Double) = {
    var xmin = Double.MaxValue; var ymin = Double.MaxValue
    var xmax = -Double.MaxValue; var ymax = -Double.MaxValue
    pts.foreach { p =>
      if (p.x < xmin) xmin = p.x; if (p.x > xmax) xmax = p.x
      if (p.y < ymin) ymin = p.y; if (p.y > ymax) ymax = p.y
    }
    (xmin, ymin, xmax, ymax)
  }

  private def header(buf: ByteBuffer, fileWords: Int, shapeType: Int,
                     box: (Double, Double, Double, Double)): Unit = {
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(0, FileCode)
    buf.putInt(24, fileWords)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(28, Version)
    buf.putInt(32, shapeType)
    buf.putDouble(36, box._1); buf.putDouble(44, box._2)
    buf.putDouble(52, box._3); buf.putDouble(60, box._4)
    // z/m ranges stay zero
  }

  /** Encode points as a Point-type .shp (one record each). */
  def writePoints(pts: Seq[Pt]): Array[Byte] = {
    val recBytes = 8 + 20 // record header + (type, x, y)
    val total = 100 + pts.size * recBytes
    val buf = ByteBuffer.allocate(total)
    header(buf, total / 2, 1, bbox(pts))
    var pos = 100
    pts.zipWithIndex.foreach { case (p, i) =>
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(pos, i + 1)       // record numbers are 1-based
      buf.putInt(pos + 4, 10)      // content: 20 bytes = 10 words
      buf.order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(pos + 8, 1)
      buf.putDouble(pos + 12, p.x)
      buf.putDouble(pos + 20, p.y)
      pos += recBytes
    }
    buf.array()
  }

  /** Encode polylines as a PolyLine-type .shp, one record per entry;
    * each entry's parts become the record's parts (multi-part records
    * are the spec's representation of MULTILINESTRING). */
  def writePolyLines(lines: Seq[Seq[IndexedSeq[Pt]]]): Array[Byte] = {
    require(lines.forall(parts => parts.nonEmpty && parts.forall(_.length >= 2)),
      "each polyline part needs >= 2 points")
    val recs = lines.map { parts =>
      val nPts = parts.map(_.size).sum
      val contentBytes = 4 + 32 + 4 + 4 + 4 * parts.size + 16 * nPts
      (parts, contentBytes)
    }
    val total = 100 + recs.map(8 + _._2).sum
    val buf = ByteBuffer.allocate(total)
    header(buf, total / 2, 3, bbox(lines.flatten.flatten))
    var pos = 100
    recs.zipWithIndex.foreach { case ((parts, contentBytes), i) =>
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(pos, i + 1)
      buf.putInt(pos + 4, contentBytes / 2)
      buf.order(ByteOrder.LITTLE_ENDIAN)
      val at = pos + 8
      buf.putInt(at, 3)
      val (xmin, ymin, xmax, ymax) = bbox(parts.flatten)
      buf.putDouble(at + 4, xmin); buf.putDouble(at + 12, ymin)
      buf.putDouble(at + 20, xmax); buf.putDouble(at + 28, ymax)
      buf.putInt(at + 36, parts.size)
      buf.putInt(at + 40, parts.map(_.size).sum)
      val partsOff = at + 44
      val starts = parts.map(_.size).scanLeft(0)(_ + _).init
      starts.zipWithIndex.foreach { case (s, ri) => buf.putInt(partsOff + 4 * ri, s) }
      var ptsOff = partsOff + 4 * parts.size
      parts.flatten.foreach { q =>
        buf.putDouble(ptsOff, q.x); buf.putDouble(ptsOff + 8, q.y)
        ptsOff += 16
      }
      pos += 8 + contentBytes
    }
    buf.array()
  }

  /** Encode polygons as a Polygon-type .shp, one record per polygon;
    * exteriors written clockwise, holes counter-clockwise, rings
    * closed — spec-conform output readable by any GIS. */
  def writePolygons(polys: Seq[Polygon]): Array[Byte] = {
    def closed(r: IndexedSeq[Pt]): IndexedSeq[Pt] = r :+ r.head
    def oriented(r: IndexedSeq[Pt], clockwise: Boolean): IndexedSeq[Pt] = {
      val cw = signedArea(r) <= 0
      if (cw == clockwise) r else r.reverse
    }
    val recs = polys.map { p =>
      val rings = closed(oriented(p.exterior, clockwise = true)) +:
        p.holes.map(h => closed(oriented(h, clockwise = false)))
      val nPts = rings.map(_.size).sum
      val contentBytes = 4 + 32 + 4 + 4 + 4 * rings.size + 16 * nPts
      (p, rings, contentBytes)
    }
    val total = 100 + recs.map(8 + _._3).sum
    val buf = ByteBuffer.allocate(total)
    val allPts = polys.flatMap(p => p.exterior ++ p.holes.flatten)
    header(buf, total / 2, 5, bbox(allPts))
    var pos = 100
    recs.zipWithIndex.foreach { case ((p, rings, contentBytes), i) =>
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(pos, i + 1)
      buf.putInt(pos + 4, contentBytes / 2)
      buf.order(ByteOrder.LITTLE_ENDIAN)
      val at = pos + 8
      buf.putInt(at, 5)
      val (xmin, ymin, xmax, ymax) = bbox(p.exterior)
      buf.putDouble(at + 4, xmin); buf.putDouble(at + 12, ymin)
      buf.putDouble(at + 20, xmax); buf.putDouble(at + 28, ymax)
      buf.putInt(at + 36, rings.size)
      buf.putInt(at + 40, rings.map(_.size).sum)
      val partsOff = at + 44
      val starts = rings.map(_.size).scanLeft(0)(_ + _).init
      starts.zipWithIndex.foreach { case (s, ri) => buf.putInt(partsOff + 4 * ri, s) }
      var ptsOff = partsOff + 4 * rings.size
      rings.flatten.foreach { q =>
        buf.putDouble(ptsOff, q.x); buf.putDouble(ptsOff + 8, q.y)
        ptsOff += 16
      }
      pos += 8 + contentBytes
    }
    buf.array()
  }
}
