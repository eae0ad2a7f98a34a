package graft.catalog

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.core.{Extent, LayoutDefinition, TileLayout}
import graft.raster.LayerMetadata

/** READ-ONLY adapter over an existing GeoTrellis catalog's
  * AttributeStore — the migration bridge for users with a store
  * written by geotrellis `FileLayerWriter` (the backend the reference
  * reaches through catalog.py:210 / LayerWriterWrapper.scala:1).
  *
  * What it reads (plain JSON, the public geotrellis-store
  * `FileAttributeStore` layout `{catalog}/attributes/
  * {layer}__{zoom}__{attribute}.json`, each file a `[layerId, value]`
  * tuple):
  *  - layer inventory (name, zoom) — `layers`;
  *  - any attribute's JSON value — `readAttribute`;
  *  - the "metadata" attribute's TileLayerMetadata — extent, layout,
  *    cellType, CRS, key bounds — mapped onto graft's
  *    [[LayoutDefinition]] so a migration rebuilds layers at the
  *    EXACT layouts the old store used (`readMetadata` /
  *    `toLayerMetadata`).
  *
  * What it deliberately does NOT read: tile PAYLOADS. GeoTrellis
  * stores tiles as Avro records under per-layer key-index ranges;
  * decoding them needs the geotrellis Avro schema machinery (an
  * external dependency this engine doesn't ship). The supported
  * migration is: read the layout here, re-ingest the source scenes
  * with [[graft.raster.Ingest.readToLayout]] at that layout, write
  * with [[Catalog.writeLayer]] — documented in README's migration
  * notes. Distributed-read interop for Accumulo/HBase/Cassandra
  * stores needs those services and stays out of scope.
  */
object GeoTrellisStore {

  final case class GtLayerId(name: String, zoom: Int)

  /** Parsed TileLayerMetadata subset. */
  final case class GtMetadata(layout: LayoutDefinition, cellType: String,
                              crs: String,
                              keyBounds: ((Long, Long), (Long, Long)))

  private def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fsPath(p: String): (FileSystem, Path) = {
    val path = new Path(p)
    (path.getFileSystem(hadoopConf), path)
  }

  private def readString(p: String): String = {
    val (fs, path) = fsPath(p)
    val in = fs.open(path)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Layer ids present in the store, from the attribute filenames
    * (`{name}__{zoom}__metadata.json`), sorted (name, zoom). */
  def layers(catalog: String): Seq[GtLayerId] = {
    val (fs, root) = fsPath(s"$catalog/attributes")
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.endsWith("__metadata.json"))
      .flatMap { f =>
        f.stripSuffix("__metadata.json").split("__") match {
          case Array(name, zoom) if zoom.forall(_.isDigit) =>
            Some(GtLayerId(name, zoom.toInt))
          case _ => None
        }
      }
      .sortBy(l => (l.name, l.zoom))
  }

  /** One attribute's parsed JSON VALUE (the second element of the
    * stored `[layerId, value]` tuple; a bare object passes through —
    * some writers omit the tuple wrapper). */
  def readAttribute(catalog: String, layer: GtLayerId, attribute: String): Any = {
    val raw = readString(
      s"$catalog/attributes/${layer.name}__${layer.zoom}__$attribute.json")
    graft.vector.GeoJson.parseJsonValue(raw) match {
      case tuple: Seq[Any @unchecked] if tuple.length == 2 => tuple(1)
      case bare => bare
    }
  }

  /** The "metadata" attribute's TileLayerMetadata subset. */
  def readMetadata(catalog: String, layer: GtLayerId): GtMetadata = {
    val v = readAttribute(catalog, layer, "metadata")
    val top = v.asInstanceOf[Map[String, Any]]
    // FileLayerWriter nests TileLayerMetadata under "metadata" beside
    // "header"/"keyIndex"/"schema"; tolerate a bare TileLayerMetadata
    val m = top.get("metadata") match {
      case Some(mm: Map[String @unchecked, Any @unchecked]) => mm
      case _ => top
    }
    def extent(o: Any): Extent = {
      val e = o.asInstanceOf[Map[String, Any]]
      def d(k: String) = e(k).asInstanceOf[Double]
      Extent(d("xmin"), d("ymin"), d("xmax"), d("ymax"))
    }
    val ld = m("layoutDefinition").asInstanceOf[Map[String, Any]]
    val tl = ld("tileLayout").asInstanceOf[Map[String, Any]]
    def i(o: Map[String, Any], k: String) = o(k).asInstanceOf[Double].toInt
    val layout = LayoutDefinition(extent(ld("extent")),
      TileLayout(i(tl, "layoutCols"), i(tl, "layoutRows"),
        i(tl, "tileCols"), i(tl, "tileRows")))
    val bounds = m.get("bounds").map { b =>
      val bb = b.asInstanceOf[Map[String, Any]]
      def key(k: String): (Long, Long) = {
        val kk = bb(k).asInstanceOf[Map[String, Any]]
        (kk("col").asInstanceOf[Double].toLong, kk("row").asInstanceOf[Double].toLong)
      }
      (key("minKey"), key("maxKey"))
    }.getOrElse(((0L, 0L),
      (layout.tileLayout.layoutCols - 1L, layout.tileLayout.layoutRows - 1L)))
    GtMetadata(layout,
      cellType = m.get("cellType").map(_.toString).getOrElse("float64"),
      crs = m.get("crs").map(_.toString).getOrElse(""),
      keyBounds = bounds)
  }

  /** Graft layer metadata at the stored layout — hand this to
    * [[graft.raster.Ingest.readToLayout]] / [[Catalog.writeLayer]] to
    * rebuild the layer in graft's parquet store. GeoTrellis cell
    * types map by name prefix (int8/uint8/.../float64, NoData
    * variants collapse to the base width — graft models NoData as
    * NaN, not a sentinel). */
  def toLayerMetadata(gt: GtMetadata): LayerMetadata = {
    val base = Seq("bit", "int8", "uint8", "int16", "uint16", "int32",
      "float32", "float64")
      .find(p => gt.cellType.startsWith(p)).getOrElse("float64")
    LayerMetadata(gt.layout, cellType = base)
  }
}
