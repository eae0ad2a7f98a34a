package graft.render

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.SparkSession

import graft.catalog.Catalog
import graft.raster.{GeoTiff, RasterLayer}

/** Minimal TMS-style tile endpoint — reference geopyspark tms.py: serve
  * `GET /tiles/{layer}/{zoom}/{col}/{row}.png` rendered on demand from
  * the catalog (classify by breaks -> ramp -> PNG, the Render path).
  *
  * Serving is inherently driver-side; per-(layer, zoom) DataFrames are
  * cached so a request is one keyed lookup (pushed col/row predicates)
  * + a single-tile render. JDK HttpServer, no dependencies.
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
final class TmsServer(spark: SparkSession, uri: String,
                      breaks: Seq[Double], ramp: String, port: Int = 0,
                      cogs: Map[String, (String, Int)] = Map.empty,
                      renderFn: Option[(IndexedSeq[Double], Int, Int) => Array[Byte]] = None) {
  // `renderFn` is the user render hook (reference tms.py:14
  // TileRender: "render(tile) -> PNG bytes"): given the tile's
  // row-major cells (NaN = NoData) and its pixel dims, produce the
  // response image bytes. When absent, tiles render through the
  // default classify-by-breaks -> color-ramp path. The hook runs
  // driver-side per GET on a single already-fetched tile — the Spark
  // side (catalog lookup / COG window read) is identical either way.

  private val layers = scala.collection.concurrent.TrieMap.empty[(String, Int), RasterLayer]

  private def layer(name: String, zoom: Int): RasterLayer =
    layers.getOrElseUpdate((name, zoom), {
      val l = Catalog.read(spark, uri, name, zoom)
      l.copy(df = l.df.cache())
    })

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
            val l = layer(name, z.toInt)
            val one = l.copy(df = l.lookup(c.toInt, r.toInt))
            renderFn match {
              case Some(f) =>
                val rows = one.df.select("tile").collect()
                if (rows.isEmpty) send(ex, 404, "no tile".getBytes, "text/plain")
                else {
                  val tl = l.meta.layout.tileLayout
                  send(ex, 200, f(rows.head.getSeq[Double](0).toIndexedSeq, tl.tileCols, tl.tileRows), "image/png")
                }
              case None =>
                val tiles = Render.renderPng(one, breaks, ramp).collect()
                if (tiles.isEmpty) send(ex, 404, "no tile".getBytes, "text/plain")
                else send(ex, 200, tiles.head.png, "image/png")
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
                val png = renderFn.map(f => f(cells, tw, th))
                  .getOrElse(Render.renderImage(cells, tw, th, breaks, ramp))
                send(ex, 200, png, "image/png")
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
