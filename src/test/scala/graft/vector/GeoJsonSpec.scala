package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec
import Wkt._

class GeoJsonSpec extends SparkSpec {
  import spark.implicits._

  val geoms: Seq[Geom] = Seq(
    PointG(Pt(1.5, -2.0)),
    MultiPointG(IndexedSeq(Pt(0, 0), Pt(3, 4))),
    LineStringG(IndexedSeq(Pt(0, 0), Pt(1, 1), Pt(2, 0))),
    MultiLineStringG(Seq(IndexedSeq(Pt(0, 0), Pt(1, 0)), IndexedSeq(Pt(5, 5), Pt(6, 7)))),
    PolygonG(Polygon(IndexedSeq(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4)),
      Seq(IndexedSeq(Pt(1, 1), Pt(2, 1), Pt(2, 2), Pt(1, 2))))),
    MultiPolygonG(Seq(
      Polygon(IndexedSeq(Pt(0, 0), Pt(2, 0), Pt(1, 2))),
      Polygon(IndexedSeq(Pt(10, 10), Pt(12, 10), Pt(11, 12))))))

  test("geojson write/parse roundtrips every geometry type") {
    geoms.foreach { g =>
      assert(GeoJson.parseGeom(GeoJson.writeGeom(g)) == g, GeoJson.writeGeom(g))
    }
  }

  test("geojson and wkt codecs agree through a cross-roundtrip") {
    geoms.foreach { g =>
      assert(Wkt.parse(Wkt.write(GeoJson.parseGeom(GeoJson.writeGeom(g)))) == g)
    }
  }

  test("parsePolygons unwraps Feature and FeatureCollection, drops closing ring point") {
    val poly = Polygon(IndexedSeq(Pt(0, 0), Pt(4, 0), Pt(4, 4)))
    val fc = GeoJson.writeCollection(Seq(
      GeoJson.writeFeature(PolygonG(poly), Seq("id" -> 1.0)),
      GeoJson.writeFeature(MultiPolygonG(Seq(poly, poly)), Seq("id" -> 2.0))))
    val ps = GeoJson.parsePolygons(fc)
    assert(ps.length == 3 && ps.forall(_ == poly))
    // bare geometry and bare feature also work
    assert(GeoJson.parsePolygons(GeoJson.writeGeom(PolygonG(poly))) == Seq(poly))
    assert(GeoJson.parsePolygons(GeoJson.writeFeature(PolygonG(poly))) == Seq(poly))
    // non-polygonal content is rejected
    val e = intercept[IllegalArgumentException] {
      GeoJson.parsePolygons(GeoJson.writeGeom(PointG(Pt(1, 2))))
    }
    assert(e.getMessage.contains("polygonal"))
  }

  test("mask by GeoJSON equals mask by the same WKT polygon") {
    import graft.core.{Extent, LayoutDefinition, TileLayout}
    import graft.raster.{RasterLayer, ZonalOps}
    val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))
    val cells = for { x <- 0L until 8L; y <- 0L until 8L } yield (x, y, (x + y).toDouble)
    val l = RasterLayer.fromCells(cells.toDF("x", "y", "v"), layout)
    val wkt = "POLYGON ((1 1, 6 1, 6 6, 1 6, 1 1))"
    val viaWkt = ZonalOps.mask(l, Wkt.parsePolygons(wkt)).toCells
      .as[(Long, Long, Double)].collect().toSet
    val json = GeoJson.writeGeom(Wkt.parse(wkt))
    val viaJson = ZonalOps.mask(l, GeoJson.parsePolygons(json)).toCells
      .as[(Long, Long, Double)].collect().toSet
    assert(viaJson == viaWkt && viaWkt.nonEmpty)
  }

  test("columnar point-feature codec: encode/parse identity, malformed rows null out") {
    val df = Seq((7L, 13.5, 29.5), (8L, 0.5, 255.5)).toDF("pid", "px", "py")
    val back = df.select(GeoJson.pointFeature(col("pid"), col("px"), col("py")).as("j"))
      .select(GeoJson.parsePointFeature(col("j")).as("f"))
      .select("f.pid", "f.px", "f.py")
      .as[(Long, Double, Double)].collect().toSet
    assert(back == Set((7L, 13.5, 29.5), (8L, 0.5, 255.5)))
    val bad = Seq("not json at all").toDF("j")
      .select(GeoJson.parsePointFeature(col("j")).as("f"))
      .select("f.pid").collect()
    assert(bad.head.isNullAt(0))
  }
}
