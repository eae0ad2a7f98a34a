package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** Read-only GeoTrellis AttributeStore adapter (r18): layer
  * discovery, the [layerId, value] tuple unwrap, TileLayerMetadata
  * parsing onto graft's layout model, and the cellType mapping — over
  * a synthetic FileAttributeStore directory in the public
  * geotrellis-store layout. */
class GeoTrellisStoreSpec extends SparkSpec {

  private def writeStore(): String = {
    spark // force the session so Hadoop conf resolution has one
    val dir = Files.createTempDirectory("gt_store").toFile
    val attrs = new java.io.File(dir, "attributes")
    attrs.mkdirs()
    def put(name: String, body: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(attrs, name), "UTF-8")
      try w.write(body) finally w.close()
    }
    // the FileLayerWriter shape: [layerId, {header, metadata, ...}]
    def metaJson(zoom: Int, n: Int): String =
      s"""[{"name":"ndvi","zoom":$zoom},
         |{"header":{"format":"file","keyClass":"geotrellis.layer.SpatialKey",
         |  "valueClass":"geotrellis.raster.Tile","path":"ndvi/$zoom"},
         |"metadata":{
         |  "extent":{"xmin":0.0,"ymin":0.0,"xmax":${n * 10.0},"ymax":${n * 10.0}},
         |  "layoutDefinition":{
         |    "extent":{"xmin":0.0,"ymin":0.0,"xmax":${n * 10.0},"ymax":${n * 10.0}},
         |    "tileLayout":{"layoutCols":$n,"layoutRows":$n,"tileCols":256,"tileRows":256}},
         |  "cellType":"int32ud-2147483648",
         |  "crs":"+proj=merc +a=6378137 +b=6378137",
         |  "bounds":{"minKey":{"col":1,"row":2},"maxKey":{"col":${n - 1},"row":${n - 1}}}},
         |"keyIndex":{"type":"zorder"},"schema":{}}]""".stripMargin
    put("ndvi__0__metadata.json", metaJson(0, 4))
    put("ndvi__1__metadata.json", metaJson(1, 8))
    put("ndvi__0__histogram.json",
      """[{"name":"ndvi","zoom":0},{"buckets":[[1.0,5],[2.0,7]],"maxBucketCount":80}]""")
    put("notalayer.json", "{}") // ignored: no __zoom__metadata shape
    dir.getAbsolutePath
  }

  test("layer discovery, metadata parse, and cellType mapping") {
    val store = writeStore()
    val ids = GeoTrellisStore.layers(store)
    assert(ids == Seq(GeoTrellisStore.GtLayerId("ndvi", 0),
      GeoTrellisStore.GtLayerId("ndvi", 1)))
    val gt = GeoTrellisStore.readMetadata(store, ids.head)
    assert(gt.layout.extent == graft.core.Extent(0, 0, 40, 40))
    assert(gt.layout.tileLayout ==
      graft.core.TileLayout(4, 4, 256, 256))
    assert(gt.cellType == "int32ud-2147483648")
    assert(gt.crs.startsWith("+proj=merc"))
    assert(gt.keyBounds == ((1L, 2L), (3L, 3L)))
    // zoom 1 is the 8x8 layout
    val gt1 = GeoTrellisStore.readMetadata(store, ids(1))
    assert(gt1.layout.tileLayout.layoutCols == 8)
    // graft mapping: ud sentinel collapses to the base width
    val lm = GeoTrellisStore.toLayerMetadata(gt)
    assert(lm.cellType == "int32" && lm.layout == gt.layout)
  }

  test("arbitrary attributes unwrap the [layerId, value] tuple") {
    val store = writeStore()
    val h = GeoTrellisStore.readAttribute(store,
      GeoTrellisStore.GtLayerId("ndvi", 0), "histogram")
      .asInstanceOf[Map[String, Any]]
    assert(h("maxBucketCount") == 80.0)
    assert(h("buckets").asInstanceOf[Seq[Any]].length == 2)
  }

  test("missing store and absent layers stay quiet/loud appropriately") {
    assert(GeoTrellisStore.layers("/tmp/definitely_not_a_gt_store_xyz") == Nil)
    intercept[Exception] {
      GeoTrellisStore.readMetadata(writeStore(),
        GeoTrellisStore.GtLayerId("nope", 0))
    }
  }
}
