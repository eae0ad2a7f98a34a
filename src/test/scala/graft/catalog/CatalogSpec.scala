package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import graft.core.{Extent, LayoutDefinition, TileLayout}
import graft.raster.RasterLayer

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  val layout = LayoutDefinition(Extent(0, 0, 8, 8), TileLayout(2, 2, 4, 4))

  def layer(cells: (Long, Long, Double)*): RasterLayer =
    RasterLayer.fromCells(cells.toSeq.toDF("x", "y", "v"), layout)

  test("write/read roundtrip preserves cells and metadata") {
    val dir = Files.createTempDirectory("graft_cat").toString
    val l = layer((0, 0, 1.0), (7, 7, 2.0))
    Catalog.write(dir, "t", l, zoom = 3)
    val back = Catalog.read(spark, dir, "t", zoom = 3)
    assert(back.toCells.as[(Long, Long, Double)].collect().toSet ==
      Set((0L, 0L, 1.0), (7L, 7L, 2.0)))
    assert(back.meta.layout == layout)
  }

  test("extent query prunes to requested tiles") {
    val dir = Files.createTempDirectory("graft_cat").toString
    Catalog.write(dir, "t", layer((0, 0, 1.0), (5, 5, 2.0)), zoom = 0)
    val q = Catalog.query(spark, dir, "t", 0, 4, 4, 8, 8)
    assert(q.toCells.as[(Long, Long, Double)].collect().toSet == Set((5L, 5L, 2.0)))
  }

  test("update appends tiles; merge resolves duplicates") {
    val dir = Files.createTempDirectory("graft_cat").toString
    Catalog.write(dir, "t", layer((0, 0, 1.0)), zoom = 0)
    Catalog.update(dir, "t", layer((0, 0, 5.0), (7, 0, 3.0)), zoom = 0)
    val merged = Catalog.read(spark, dir, "t", zoom = 0).aggregateByCell("Max")
    assert(merged.toCells.as[(Long, Long, Double)].collect().toSet ==
      Set((0L, 0L, 5.0), (7L, 0L, 3.0)))
  }

  test("compact coalesces appended files, preserves content, can merge duplicates") {
    val dir = Files.createTempDirectory("graft_cat").toString
    Catalog.write(dir, "t", layer((0, 0, 1.0)), zoom = 0)
    Catalog.update(dir, "t", layer((0, 0, 5.0), (7, 0, 3.0)), zoom = 0)
    Catalog.update(dir, "t", layer((3, 3, 4.0)), zoom = 0)
    def files() = new java.io.File(s"$dir/t/tiles/zoom=0").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = files()
    // physical-only compaction keeps duplicate keys (update contract)
    Catalog.compact(spark, dir, "t", zoom = 0)
    assert(files() < before, s"expected fewer files than $before")
    val kept = Catalog.read(spark, dir, "t", zoom = 0)
      .toCells.as[(Long, Long, Double)].collect()
    assert(kept.count { case (x, y, _) => (x, y) == ((0L, 0L)) } == 2)
    assert(kept.toSet ==
      Set((0L, 0L, 1.0), (0L, 0L, 5.0), (7L, 0L, 3.0), (3L, 3L, 4.0)))
    // merging compaction collapses duplicates cell-wise
    Catalog.compact(spark, dir, "t", zoom = 0, mergeDuplicates = true)
    assert(Catalog.read(spark, dir, "t", zoom = 0)
      .toCells.as[(Long, Long, Double)].collect().toSet ==
      Set((0L, 0L, 5.0), (7L, 0L, 3.0), (3L, 3L, 4.0)))
    // other zooms untouched by the dynamic overwrite
    Catalog.write(dir, "t2", layer((1, 1, 9.0)), zoom = 1)
    Catalog.compact(spark, dir, "t2", zoom = 1)
    assert(Catalog.read(spark, dir, "t2", zoom = 1)
      .toCells.as[(Long, Long, Double)].collect().toSet == Set((1L, 1L, 9.0)))
  }

  test("attribute-store surface: layers / contains / delete") {
    val dir = Files.createTempDirectory("graft_cat_store").toString
    Catalog.write(dir, "b_layer", layer((0, 0, 1.0)), zoom = 0)
    Catalog.write(dir, "a_layer", layer((1, 1, 2.0)), zoom = 0)
    // a stray non-layer directory is not listed
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/not_a_layer"))
    assert(Catalog.layers(dir) == Seq("a_layer", "b_layer"))
    assert(Catalog.contains(dir, "a_layer"))
    assert(!Catalog.contains(dir, "nope"))
    Catalog.delete(dir, "a_layer")
    assert(Catalog.layers(dir) == Seq("b_layer"))
    assert(!Catalog.contains(dir, "a_layer"))
    Catalog.delete(dir, "a_layer") // idempotent
    // the surviving layer still reads
    assert(Catalog.read(spark, dir, "b_layer").toCells.count() == 1)
    assert(Catalog.layers("/nonexistent/path").isEmpty)
  }

  test("temporal write/read roundtrip preserves instants; queryTime prunes both dims") {
    val dir = Files.createTempDirectory("graft_cat").toString
    val l = RasterLayer.fromCellsTemporal(
      Seq((0L, 0L, 10L, 1.0), (0L, 0L, 20L, 2.0), (5L, 5L, 10L, 3.0), (5L, 5L, 30L, 4.0))
        .toDF("x", "y", "instant", "v"), layout)
    Catalog.write(dir, "tt", l, zoom = 0)
    val back = Catalog.read(spark, dir, "tt", zoom = 0)
    assert(back.meta.temporal)
    assert(back.toCells.as[(Long, Long, Long, Double)].collect().toSet ==
      Set((0L, 0L, 10L, 1.0), (0L, 0L, 20L, 2.0), (5L, 5L, 10L, 3.0), (5L, 5L, 30L, 4.0)))
    // time interval [15, 30] x extent [4,8)x[4,8) -> only (5,5,30)
    val q = Catalog.queryTime(spark, dir, "tt", 0, 4, 4, 8, 8, 15L, 30L)
    assert(q.toCells.as[(Long, Long, Long, Double)].collect().toSet ==
      Set((5L, 5L, 30L, 4.0)))
    // instant predicate reaches the parquet scan (file/row-group skip)
    val plan = q.df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("instant"))
    // spatial-only layers refuse time queries
    Catalog.write(dir, "ss", layer((0, 0, 1.0)), zoom = 0)
    intercept[IllegalArgumentException](
      Catalog.queryTime(spark, dir, "ss", 0, 0, 0, 8, 8, 0L, 1L))
  }

  test("attribute store roundtrip") {
    val dir = Files.createTempDirectory("graft_cat").toString
    Catalog.write(dir, "t", layer((0, 0, 1.0)), zoom = 0)
    Catalog.writeAttribute(dir, "t", "notes", """{"a":1}""")
    assert(Catalog.readAttribute(dir, "t", "notes") == """{"a":1}""")
  }
}
