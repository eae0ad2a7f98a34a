package graft.render

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.SparkSession

import graft.catalog.Catalog
import graft.raster.RasterLayer

/** Minimal TMS-style tile endpoint — reference geopyspark tms.py: serve
  * `GET /tiles/{layer}/{zoom}/{col}/{row}.png` rendered on demand from
  * the catalog (classify by breaks -> ramp -> PNG, the Render path).
  *
  * Serving is inherently driver-side; per-(layer, zoom) DataFrames are
  * cached so a request is one keyed lookup (pushed col/row predicates)
  * + a single-tile render. JDK HttpServer, no dependencies.
  */
final class TmsServer(spark: SparkSession, uri: String,
                      breaks: Seq[Double], ramp: String, port: Int = 0) {

  private val layers = scala.collection.concurrent.TrieMap.empty[(String, Int), RasterLayer]

  private def layer(name: String, zoom: Int): RasterLayer =
    layers.getOrElseUpdate((name, zoom), {
      val l = Catalog.read(spark, uri, name, zoom)
      l.copy(df = l.df.cache())
    })

  private val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/tiles", new HttpHandler {
    private val Path = raw"/tiles/([A-Za-z0-9_-]+)/(\d+)/(\d+)/(\d+)\.png".r
    override def handle(ex: HttpExchange): Unit = {
      def send(code: Int, body: Array[Byte], ctype: String): Unit = {
        ex.getResponseHeaders.set("Content-Type", ctype)
        ex.sendResponseHeaders(code, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
      ex.getRequestURI.getPath match {
        case Path(name, z, c, r) =>
          try {
            val l = layer(name, z.toInt)
            val one = l.copy(df = l.lookup(c.toInt, r.toInt))
            val tiles = Render.renderPng(one, breaks, ramp).collect()
            if (tiles.isEmpty) send(404, "no tile".getBytes, "text/plain")
            else send(200, tiles.head.png, "image/png")
          } catch {
            case e: Exception => send(500, e.toString.getBytes, "text/plain")
          }
        case _ => send(404, "bad path".getBytes, "text/plain")
      }
    }
  })
  server.setExecutor(null)
  server.start()

  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}
