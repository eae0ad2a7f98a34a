package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Wkt._

/** GeoJSON (RFC 7946) geometry + feature codec over the same [[Wkt.Geom]]
  * ADT as the WKT codec — the geotrellis `vector.io.json` surface
  * (public; geopyspark routes shapely geometries through it when masks
  * and rasterize arguments cross the bridge).
  *
  * Two layers:
  *  - A driver-side Scala codec (`writeGeom`/`parseGeom`,
  *    `writeFeature*`/`parsePolygons`) for geometry ARGUMENTS — mask
  *    polygons, rasterize shapes — mirroring how Wkt.parsePolygons is
  *    consumed today.
  *  - Spark-native COLUMN codecs for point-feature data streams
  *    (`pointFeature` / `parsePointFeature`): pure
  *    `to_json`/`from_json` over typed structs — codegen'd, zero UDFs,
  *    the shape a 100 TB GeoJSON export/ingest takes.
  *
  * The hand parser covers the GeoJSON geometry subset (all six
  * non-collection types, nested coordinate arrays, nulls rejected);
  * numbers use the JVM double parse, identical to Spark's JSON reader.
  */
object GeoJson {

  // ---------------------------------------------------------------- write

  def writeGeom(g: Geom): String = g match {
    case PointG(p)          => s"""{"type":"Point","coordinates":${pt(p)}}"""
    case MultiPointG(ps)    => s"""{"type":"MultiPoint","coordinates":${arr(ps.map(pt))}}"""
    case LineStringG(ps)    => s"""{"type":"LineString","coordinates":${arr(ps.map(pt))}}"""
    case MultiLineStringG(ls) =>
      s"""{"type":"MultiLineString","coordinates":${arr(ls.map(l => arr(l.map(pt))))}}"""
    case PolygonG(p)        => s"""{"type":"Polygon","coordinates":${polyCoords(p)}}"""
    case MultiPolygonG(ps)  =>
      s"""{"type":"MultiPolygon","coordinates":${arr(ps.map(polyCoords))}}"""
  }

  /** Feature with numeric properties (the properties a raster pipeline
    * carries: ids, priorities, values). */
  def writeFeature(g: Geom, properties: Seq[(String, Double)] = Nil): String = {
    val props = properties.map { case (k, v) => s""""${esc(k)}":${num(v)}""" }
      .mkString("{", ",", "}")
    s"""{"type":"Feature","geometry":${writeGeom(g)},"properties":$props}"""
  }

  def writeCollection(features: Seq[String]): String =
    features.mkString("""{"type":"FeatureCollection","features":[""", ",", "]}")

  private def num(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
  private def pt(p: Pt): String = s"[${num(p.x)},${num(p.y)}]"
  private def arr(xs: Seq[String]): String = xs.mkString("[", ",", "]")
  private def polyCoords(p: Polygon): String = {
    def ring(r: IndexedSeq[Pt]) = arr((r :+ r.head).map(pt))
    arr(ring(p.exterior) +: p.holes.map(ring))
  }
  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  // ---------------------------------------------------------------- parse

  def parseGeom(json: String): Geom = {
    val v = new JsonParser(json).value()
    geomOf(v)
  }

  /** Polygonal content of a GeoJSON geometry, Feature, or
    * FeatureCollection — what mask / rasterize consume (the
    * Wkt.parsePolygons twin). */
  def parsePolygons(json: String): Seq[Polygon] = {
    val v = new JsonParser(json).value()
    def geoms(v: Any): Seq[Geom] = v match {
      case m: Map[String @unchecked, Any @unchecked] => m.get("type") match {
        case Some("FeatureCollection") =>
          m("features").asInstanceOf[Seq[Any]].flatMap(geoms)
        case Some("Feature") => geoms(m("geometry"))
        case _               => Seq(geomOf(m))
      }
      case other => throw new IllegalArgumentException(s"not a GeoJSON object: $other")
    }
    geoms(v).flatMap {
      case PolygonG(p)       => Seq(p)
      case MultiPolygonG(ps) => ps
      case g => throw new IllegalArgumentException(
        s"expected polygonal geometry, got ${g.getClass.getSimpleName}")
    }
  }

  private def geomOf(v: Any): Geom = {
    val m = v match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => throw new IllegalArgumentException(s"not a GeoJSON object: $other")
    }
    val c = m.getOrElse("coordinates",
      throw new IllegalArgumentException("geometry without coordinates"))
    def p(v: Any): Pt = {
      val s = v.asInstanceOf[Seq[Any]]
      require(s.length >= 2, "coordinate needs x and y")
      Pt(s(0).asInstanceOf[Double], s(1).asInstanceOf[Double])
    }
    def ring(v: Any): IndexedSeq[Pt] = {
      val pts = v.asInstanceOf[Seq[Any]].map(p).toIndexedSeq
      // GeoJSON rings repeat the first point; the Polygon ADT doesn't
      if (pts.length >= 2 && pts.head == pts.last) pts.dropRight(1) else pts
    }
    def poly(v: Any): Polygon = {
      val rings = v.asInstanceOf[Seq[Any]]
      require(rings.nonEmpty, "polygon needs an exterior ring")
      Polygon(ring(rings.head), rings.tail.map(ring))
    }
    m("type") match {
      case "Point"           => PointG(p(c))
      case "MultiPoint"      => MultiPointG(c.asInstanceOf[Seq[Any]].map(p).toIndexedSeq)
      case "LineString"      => LineStringG(c.asInstanceOf[Seq[Any]].map(p).toIndexedSeq)
      case "MultiLineString" =>
        MultiLineStringG(c.asInstanceOf[Seq[Any]].map(r => r.asInstanceOf[Seq[Any]].map(p).toIndexedSeq))
      case "Polygon"         => PolygonG(poly(c))
      case "MultiPolygon"    => MultiPolygonG(c.asInstanceOf[Seq[Any]].map(poly))
      case t => throw new IllegalArgumentException(s"unsupported GeoJSON type: $t")
    }
  }

  /** Parse one JSON value into Any (Map/Seq/String/Double/Boolean/
    * null) — shared with the Zarr `.zarray`/`.zattrs` metadata reader,
    * which needs exactly this subset. */
  private[graft] def parseJsonValue(json: String): Any =
    new JsonParser(json).value()

  /** Minimal JSON value parser (objects, arrays, strings, numbers,
    * true/false/null) — the subset GeoJSON uses. Numbers parse with
    * the JVM double parser, same as Spark's JSON source. */
  private final class JsonParser(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"GeoJSON parse error at $i: $msg")
    private def expect(c: Char): Unit = {
      ws(); if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'"); i += 1
    }
    def value(): Any = {
      ws()
      if (i >= s.length) fail("unexpected end")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => array()
        case '"' => string()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _   => number()
      }
    }
    private def lit(text: String, v: Any): Any = {
      if (!s.startsWith(text, i)) fail(s"expected $text"); i += text.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      val b = Map.newBuilder[String, Any]
      if (i < s.length && s.charAt(i) == '}') { i += 1; return b.result() }
      var done = false
      while (!done) {
        ws(); val k = string(); expect(':'); b += (k -> value()); ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      b.result()
    }
    private def array(): Seq[Any] = {
      expect('['); ws()
      val b = Seq.newBuilder[Any]
      if (i < s.length && s.charAt(i) == ']') { i += 1; return b.result() }
      var done = false
      while (!done) {
        b += value(); ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      b.result()
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) fail("bad escape")
          s.charAt(i) match {
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case '/'  => sb += '/'
            case 'n'  => sb += '\n'
            case 't'  => sb += '\t'
            case 'r'  => sb += '\r'
            case 'u'  =>
              if (i + 4 >= s.length) fail("bad \\u escape")
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case o => fail(s"unsupported escape \\$o")
          }
        } else sb += c
        i += 1
      }
      expect('"')
      sb.result()
    }
    private def number(): Double = {
      val start = i
      while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
      if (i == start) fail("expected a value")
      s.substring(start, i).toDouble
    }
  }

  // ------------------------------------------------------- column codecs

  /** Spark schema of a GeoJSON Point feature with one numeric id
    * property — the columnar fast path for point streams. */
  val pointFeatureSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("geometry", StructType(Seq(
      StructField("type", StringType),
      StructField("coordinates", ArrayType(DoubleType))))),
    StructField("properties", StructType(Seq(
      StructField("pid", LongType))))))

  /** (pid, px, py) -> GeoJSON Point feature text; pure `to_json`,
    * codegen'd, no UDF. */
  def pointFeature(pid: Column, px: Column, py: Column): Column =
    to_json(struct(
      lit("Feature").as("type"),
      struct(lit("Point").as("type"), array(px, py).as("coordinates")).as("geometry"),
      struct(pid.as("pid")).as("properties")))

  /** GeoJSON Point feature text -> struct(pid, px, py); pure
    * `from_json`. Malformed rows yield nulls (Spark JSON semantics). */
  def parsePointFeature(j: Column): Column = {
    val f = from_json(j, pointFeatureSchema)
    struct(
      f.getField("properties").getField("pid").as("pid"),
      element_at(f.getField("geometry").getField("coordinates"), 1).as("px"),
      element_at(f.getField("geometry").getField("coordinates"), 2).as("py"))
  }
}
