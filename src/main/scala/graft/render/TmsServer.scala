package graft.render

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.SparkSession

import graft.catalog.Catalog
import graft.raster.GeoTiff

/** Minimal TMS-style tile endpoint — reference geopyspark tms.py: serve
  * `GET /tiles/{layer}/{zoom}/{col}/{row}.png` rendered on demand from
  * the catalog (classify by breaks -> ramp -> PNG, the Render path).
  *
  * Serving is inherently driver-side and JOB-FREE: a request is one
  * [[Catalog.readTile]] footer-pruned parquet point read (no Spark job
  * scheduled) + a single-tile render. JDK HttpServer, no dependencies.
  *
  * `cogs` additionally registers COG-pyramid files (from
  * [[GeoTiff.saveCogPyramid]]) under `GET /cog/{name}/{zoom}/{col}/
  * {row}.png`, mapped as name -> (path, baseZoom). The zoom path
  * segment picks the overview IFD (overview = baseZoom - zoom; 0 = the
  * base image) and [[GeoTiff.readCogWindow]] inflates ONLY the TIFF
  * tiles under the requested window — per GET, one header walk plus
  * one tile's byte range, which is exactly the range-request pattern
  * that serves the same file from remote storage without Spark.
  */
object TmsServer {
  /** THE payload constructor — the single function both `/tiles`
    * (catalog point read) and `/cog` (COG window read) hand their
    * fetched cells to. Factored out so the byte-level response
    * construction is oracle-checkable without HTTP: q_tms_payload
    * runs this exact function over every pyramid tile, decodes the
    * PNGs back, and compares pixels against the CASE-chain oracle
    * parameterized by zoom (the q_render_png pattern). Only the HTTP
    * GET framing itself remains spec-only. */
  def payload(cells: IndexedSeq[Double], cols: Int, rows: Int,
              breaks: Seq[Double], ramp: String,
              renderFn: Option[(IndexedSeq[Double], Int, Int) => Array[Byte]] = None)
      : Array[Byte] =
    renderFn.map(f => f(cells, cols, rows))
      .getOrElse(Render.renderImage(cells, cols, rows, breaks, ramp))
}

final class TmsServer(spark: SparkSession, uri: String,
                      breaks: Seq[Double], ramp: String, port: Int = 0,
                      cogs: Map[String, (String, Int)] = Map.empty,
                      renderFn: Option[(IndexedSeq[Double], Int, Int) => Array[Byte]] = None,
                      renderContentType: String = "image/png",
                      compositeLayers: Seq[String] = Nil,
                      compositeFn: Option[(Seq[IndexedSeq[Double]], Int, Int) => Array[Byte]] = None) {
  // `compositeLayers` + `compositeFn` are the multi-source hook
  // (reference tms.py:57 TileCompositer / TMS.build with a list of
  // sources): N catalog layers are fetched per GET and the compositing
  // function (tiles, cols, rows) -> image bytes produces ONE response
  // image, served on the reference's own single-source URL shape
  // `GET /tile/{z}/{x}/{y}.png` (tms.py url_pattern). A layer with no
  // tile at the key contributes an all-NoData (NaN) array, matching
  // the reference's composite-over-sparse-pyramids behavior; only a
  // key missing from EVERY layer 404s. Fetches stay job-free
  // (Catalog.readTile point reads), so compositing N layers costs N
  // footer-pruned parquet point reads + one driver-side render.
  require(compositeLayers.isEmpty || compositeFn.isDefined,
    "compositeLayers needs compositeFn (a ColorMap-style default is only " +
      "defined for single-source serving — reference TMS.build contract)")
  // `renderFn` is the user render hook (reference tms.py:14
  // TileRender: "render(tile) -> image bytes"): given the tile's
  // row-major cells (NaN = NoData) and its pixel dims, produce the
  // response image bytes. When absent, tiles render through the
  // default classify-by-breaks -> color-ramp path. A hook emitting a
  // format other than PNG declares it via `renderContentType` (the
  // default path always serves image/png). The hook runs driver-side
  // per GET on a single already-fetched tile — the fetch (job-free
  // parquet point read / COG window read) is identical either way.

  // per-(layer, zoom) metadata for pixel dims — tile BYTES come from
  // Catalog.readTile's job-free footer-pruned parquet point read, so
  // serving schedules ZERO Spark jobs (the r11 path ran a lookup +
  // collect() job per GET, paying driver job-scheduling latency)
  private val metas = scala.collection.concurrent.TrieMap.empty[(String, Int), graft.raster.LayerMetadata]

  private def meta(name: String, zoom: Int): graft.raster.LayerMetadata =
    metas.getOrElseUpdate((name, zoom), Catalog.readMetadata(uri, name, zoom))

  // byte-range reader + per-level pixel geometry, opened once per cog
  // name: the server NEVER loads a whole COG — the header walk and
  // each window read are positioned range requests (Hadoop FS, so
  // file://, hdfs://, s3a:// all serve the same way)
  private val cogCache =
    scala.collection.concurrent.TrieMap.empty[String, (graft.raster.RangeReader, IndexedSeq[(Int, Int, Int, Int)])]

  private def cog(name: String): (graft.raster.RangeReader, IndexedSeq[(Int, Int, Int, Int)], Int) = {
    val (path, baseZoom) = cogs(name)
    // lock-free fast path; creation serialized so two racing requests
    // can't both open a reader and leak the discarded one's stream
    val (rr, levels) = cogCache.get(name).getOrElse(cogCache.synchronized {
      cogCache.getOrElseUpdate(name, {
        val r = graft.raster.RangeReader.hadoop(path,
          spark.sparkContext.hadoopConfiguration)
        (r, GeoTiff.cogLevels(r))
      })
    })
    (rr, levels, baseZoom)
  }

  private def send(ex: HttpExchange, code: Int, body: Array[Byte], ctype: String): Unit = {
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, body.length)
    ex.getResponseBody.write(body)
    ex.close()
  }

  private val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/tiles", new HttpHandler {
    private val Path = raw"/tiles/([A-Za-z0-9_-]+)/(\d+)/(\d+)/(\d+)\.png".r
    override def handle(ex: HttpExchange): Unit =
      ex.getRequestURI.getPath match {
        case Path(name, z, c, r) =>
          try {
            val tl = meta(name, z.toInt).layout.tileLayout
            Catalog.readTile(spark, uri, name, z.toInt, c.toInt, r.toInt) match {
              case None => send(ex, 404, "no tile".getBytes, "text/plain")
              case Some(cells) =>
                send(ex, 200,
                  TmsServer.payload(cells.toIndexedSeq, tl.tileCols, tl.tileRows,
                    breaks, ramp, renderFn),
                  if (renderFn.isDefined) renderContentType else "image/png")
            }
          } catch {
            case e: Exception => send(ex, 500, e.toString.getBytes, "text/plain")
          }
        case _ => send(ex, 404, "bad path".getBytes, "text/plain")
      }
  })
  if (compositeLayers.nonEmpty) server.createContext("/tile", new HttpHandler {
    private val Path = raw"/tile/(\d+)/(\d+)/(\d+)\.png".r
    override def handle(ex: HttpExchange): Unit =
      ex.getRequestURI.getPath match {
        case Path(z, c, r) =>
          try {
            val tl = meta(compositeLayers.head, z.toInt).layout.tileLayout
            val n = tl.tileCols * tl.tileRows
            val fetched = compositeLayers.map(name =>
              Catalog.readTile(spark, uri, name, z.toInt, c.toInt, r.toInt))
            if (fetched.forall(_.isEmpty))
              send(ex, 404, "no tile in any layer".getBytes, "text/plain")
            else {
              val tiles = fetched.map(_.map(_.toIndexedSeq)
                .getOrElse(IndexedSeq.fill(n)(Double.NaN)))
              send(ex, 200, compositeFn.get(tiles, tl.tileCols, tl.tileRows),
                renderContentType)
            }
          } catch {
            case e: Exception => send(ex, 500, e.toString.getBytes, "text/plain")
          }
        case _ => send(ex, 404, "bad path".getBytes, "text/plain")
      }
  })
  server.createContext("/cog", new HttpHandler {
    private val Path = raw"/cog/([A-Za-z0-9_-]+)/(\d+)/(\d+)/(\d+)\.png".r
    override def handle(ex: HttpExchange): Unit =
      ex.getRequestURI.getPath match {
        case Path(name, z, c, r) if cogs.contains(name) =>
          try {
            val (rr, levels, baseZoom) = cog(name)
            val overview = baseZoom - z.toInt
            if (overview < 0 || overview >= levels.size)
              send(ex, 404, s"no overview for zoom $z".getBytes, "text/plain")
            else {
              val (cols, rows, tw, th) = levels(overview)
              val (wx, wy) = (c.toInt * tw, r.toInt * th)
              if (wx >= cols || wy >= rows)
                send(ex, 404, "tile outside image".getBytes, "text/plain")
              else {
                val cells = GeoTiff.readCogWindow(rr, wx, wy, tw, th, overview)
                send(ex, 200,
                  TmsServer.payload(cells, tw, th, breaks, ramp, renderFn), "image/png")
              }
            }
          } catch {
            case e: Exception => send(ex, 500, e.toString.getBytes, "text/plain")
          }
        case _ => send(ex, 404, "bad path".getBytes, "text/plain")
      }
  })
  server.setExecutor(null)
  server.start()

  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = {
    server.stop(0)
    cogCache.values.foreach(c => try c._1.close() catch { case _: Exception => () })
    cogCache.clear()
  }
}
