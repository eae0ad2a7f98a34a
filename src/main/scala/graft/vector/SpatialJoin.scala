package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector point-in-polygon spatial join — the "which zone is each
  * point in" primitive (geotrellis vector joins / shapely contains in
  * the reference's mask arguments), expressed Spark-first: the
  * polygon side is the DIM side and broadcasts; points stream through
  * a bbox prefilter then the exact even-odd test per candidate. No
  * shuffle touches the point side.
  *
  * Scale shape: polygons collect driver-side under `maxPolys` (loud
  * failure beyond — at millions of polygons the right plan is the
  * rasterize path: burn polygon ids to a zone raster and key-join,
  * which the engine already has). Each executor holds the parsed
  * geometry list once via broadcast.
  */
object SpatialJoin {

  /** Join points (pid, px, py) to polygons (gid, wkt): one row per
    * (point, containing polygon) — points in no polygon emit nothing,
    * points in several emit several. */
  def pointsInPolygons(points: DataFrame, polys: DataFrame,
                       maxPolys: Int = 1 << 16): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val collected = polys.select(col("gid").cast("long"), col("wkt")).collect()
    require(collected.length <= maxPolys,
      s"${collected.length} polygons exceed maxPolys=$maxPolys; " +
        "rasterize polygon ids to a zone layer and key-join instead")
    val parsed: Array[(Long, Array[((Double, Double, Double, Double), Polygon)])] =
      collected.map { r =>
        r.getLong(0) -> Wkt.parsePolygons(r.getString(1)).map(p => (p.bbox, p)).toArray
      }
    val bc = spark.sparkContext.broadcast(parsed)
    points.select(col("pid").cast("long"), col("px"), col("py"))
      .as[(Long, Double, Double)]
      .mapPartitions { it =>
        val gs = bc.value
        it.flatMap { case (pid, x, y) =>
          gs.iterator.collect {
            case (gid, ps) if ps.exists { case ((x0, y0, x1, y1), poly) =>
              x >= x0 && x <= x1 && y >= y0 && y <= y1 && poly.contains(x, y)
            } => (pid, gid)
          }
        }
      }
      .toDF("pid", "gid")
  }
}
