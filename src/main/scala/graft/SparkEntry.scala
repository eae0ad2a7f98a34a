package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.raster.{Neighborhood, RasterLayer}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each query key maps to. Every query reads only the
  * driver's parquet tables under `dir` and must match its `oracleSql`
  * DuckDB result (same column names, deterministic values).
  */
object SparkEntry {
  import GridSource._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Rasterize lineitem to the 256-grid, 3x3 focal mean, zonal stats by
    * returnflag zone — the engine's bread and butter in one plan. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_rasterize")(spark, "/root/testdata/sf0.001")

  // ----------------------------------------------------------------
  // helpers
  // ----------------------------------------------------------------
  private def flat(l: RasterLayer): DataFrame = l.toCells

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- rasterize + layer round-trip (SURVEY §2: rasterize, tile_to_layout)
    "q_rasterize" -> ((s, dir) => flat(lineitemLayer(s, dir))),

    "q_tile_to_layout" -> ((s, dir) => {
      // retile 64 -> 32 and back to cells: identity on the logical grid
      val cells = flat(lineitemLayer(s, dir))
      val small = RasterLayer.fromCells(cells,
        core.LayoutDefinition(layout.extent, core.TileLayout(G / 32, G / 32, 32, 32)))
      small.toCells
    }),

    "q_collect_keys" -> ((s, dir) =>
      lineitemLayer(s, dir).collectKeys().orderBy("col", "row")),

    "q_lookup" -> ((s, dir) =>
      RasterLayer.tilesToCells(lineitemLayer(s, dir).lookup(2, 3), T, T)),

    // --- local map algebra
    "q_local_arith" -> ((s, dir) => {
      val l = lineitemLayer(s, dir)
      flat(((l + 10.0) * 2.0 - 5.0) / 4.0)
    }),

    "q_local_max" -> ((s, dir) => flat(lineitemLayer(s, dir).localMax(25.0))),

    "q_local_binary" -> ((s, dir) =>
      flat(lineitemLayer(s, dir) + ordersLayer(s, dir))),

    "q_reclassify" -> ((s, dir) =>
      flat(lineitemLayer(s, dir)
        .reclassify(Seq(50.0 -> 1.0, 150.0 -> 2.0, 300.0 -> 3.0, 1e9 -> 4.0)))),

    "q_normalize" -> ((s, dir) => {
      val n = lineitemLayer(s, dir).normalize(0.0, 100.0)
      n.toCells.select(col("x"), col("y"), round(col("v"), 5).as("v"))
    }),

    "q_with_no_data" -> ((s, dir) =>
      flat(lineitemLayer(s, dir).withNoData(1.0))),

    // --- multi-layer
    "q_union" -> ((s, dir) => {
      val u = lineitemLayer(s, dir).union(ordersLayer(s, dir)).aggregateByCell("Sum")
      u.toCells
    }),

    "q_aggregate_by_cell" -> ((s, dir) => {
      val l = lineitemLayer(s, dir)
      flat(l.union(l).aggregateByCell("Sum"))
    }),

    // --- focal suite (SURVEY §2 focal ops)
    "q_focal_sum" -> ((s, dir) =>
      flat(lineitemLayer(s, dir).focal(Neighborhood.Square(1), "Sum"))),
    "q_focal_mean" -> ((s, dir) =>
      flat(lineitemLayer(s, dir).focal(Neighborhood.Square(1), "Mean"))),
    "q_focal_min" -> ((s, dir) =>
      flat(lineitemLayer(s, dir).focal(Neighborhood.Square(1), "Min"))),
    "q_focal_max" -> ((s, dir) =>
      flat(lineitemLayer(s, dir).focal(Neighborhood.Square(1), "Max"))),
    "q_focal_median" -> ((s, dir) =>
      flat(lineitemLayer(s, dir).focal(Neighborhood.Square(1), "Median"))),
    "q_focal_mode" -> ((s, dir) =>
      flat(lineitemLayer(s, dir).focal(Neighborhood.Square(1), "Mode"))),
    "q_focal_stddev" -> ((s, dir) =>
      flat(lineitemLayer(s, dir).focal(Neighborhood.Square(1), "StandardDeviation"))),
    "q_focal_circle" -> ((s, dir) =>
      flat(lineitemLayer(s, dir).focal(Neighborhood.Circle(2.0), "Mean"))),
    "q_slope" -> ((s, dir) => {
      val l = lineitemLayer(s, dir).slope()
      l.toCells.select(col("x"), col("y"), round(col("v"), 5).as("v"))
    }),
    "q_aspect" -> ((s, dir) => {
      val l = lineitemLayer(s, dir).aspect()
      l.toCells.select(col("x"), col("y"), round(col("v"), 5).as("v"))
    }),
    "q_hillshade" -> ((s, dir) => flat(lineitemLayer(s, dir).hillshade())),
    "q_tobler" -> ((s, dir) => {
      val l = lineitemLayer(s, dir).tobler()
      l.toCells.select(col("x"), col("y"), round(col("v"), 5).as("v"))
    }),
  )

  /** 3x3 neighbor join over the lineitem grid (shared focal-oracle CTE). */
  private def focalJoin(agg: String): String =
    s"""WITH g AS ($lineitemCellsSql)
       |SELECT c.x AS x, c.y AS y, $agg AS v
       |FROM g c JOIN g n ON n.x BETWEEN c.x - 1 AND c.x + 1 AND n.y BETWEEN c.y - 1 AND c.y + 1
       |GROUP BY c.x, c.y""".stripMargin

  /** Horn-gradient pivot oracle (all-9-present convention, SURVEY §2). */
  private def hornSql(select: String): String =
    s"""WITH g AS ($lineitemCellsSql), nb AS (
       |  SELECT c.x AS x, c.y AS y,
       |    max(CASE WHEN n.x = c.x - 1 AND n.y = c.y - 1 THEN n.v END) AS n1,
       |    max(CASE WHEN n.x = c.x     AND n.y = c.y - 1 THEN n.v END) AS n2,
       |    max(CASE WHEN n.x = c.x + 1 AND n.y = c.y - 1 THEN n.v END) AS n3,
       |    max(CASE WHEN n.x = c.x - 1 AND n.y = c.y     THEN n.v END) AS n4,
       |    max(CASE WHEN n.x = c.x + 1 AND n.y = c.y     THEN n.v END) AS n6,
       |    max(CASE WHEN n.x = c.x - 1 AND n.y = c.y + 1 THEN n.v END) AS n7,
       |    max(CASE WHEN n.x = c.x     AND n.y = c.y + 1 THEN n.v END) AS n8,
       |    max(CASE WHEN n.x = c.x + 1 AND n.y = c.y + 1 THEN n.v END) AS n9,
       |    count(*) AS cnt
       |  FROM g c JOIN g n ON n.x BETWEEN c.x - 1 AND c.x + 1 AND n.y BETWEEN c.y - 1 AND c.y + 1
       |  GROUP BY c.x, c.y
       |), d AS (
       |  SELECT x, y,
       |    ((n3 + 2 * n6 + n9) - (n1 + 2 * n4 + n7)) / 8.0 AS dzdx,
       |    ((n7 + 2 * n8 + n9) - (n1 + 2 * n2 + n3)) / 8.0 AS dzdy
       |  FROM nb WHERE cnt = 9
       |)
       |SELECT x, y, $select AS v FROM d""".stripMargin

  def oracleSql: Map[String, String] = {
    val grid  = lineitemCellsSql
    val ogrid = ordersCellsSql
    Map(
      "q_rasterize" -> s"SELECT x, y, v FROM ($grid)",

      "q_tile_to_layout" -> s"SELECT x, y, v FROM ($grid)",

      "q_collect_keys" ->
        s"SELECT DISTINCT CAST(x // 64 AS INT) AS col, CAST(y // 64 AS INT) AS row FROM ($grid) ORDER BY col, row",

      "q_lookup" ->
        s"SELECT x, y, v FROM ($grid) WHERE x // 64 = 2 AND y // 64 = 3",

      "q_local_arith" ->
        s"SELECT x, y, ((v + 10) * 2 - 5) / 4 AS v FROM ($grid)",

      "q_local_max" ->
        s"SELECT x, y, CASE WHEN v > 25 THEN v ELSE 25.0 END AS v FROM ($grid)",

      "q_local_binary" ->
        s"SELECT a.x, a.y, a.v + b.v AS v FROM ($grid) a JOIN ($ogrid) b ON a.x = b.x AND a.y = b.y",

      "q_reclassify" ->
        s"SELECT x, y, CASE WHEN v <= 50 THEN 1.0 WHEN v <= 150 THEN 2.0 WHEN v <= 300 THEN 3.0 ELSE 4.0 END AS v FROM ($grid)",

      "q_normalize" ->
        s"SELECT x, y, round((v - mn) / (mx - mn) * 100.0, 5) AS v FROM ($grid), (SELECT min(v) AS mn, max(v) AS mx FROM ($grid))",

      "q_with_no_data" -> s"SELECT x, y, v FROM ($grid) WHERE v <> 1.0",

      "q_union" ->
        s"SELECT x, y, sum(v) AS v FROM (SELECT * FROM ($grid) UNION ALL SELECT * FROM ($ogrid)) GROUP BY x, y",

      "q_aggregate_by_cell" -> s"SELECT x, y, v + v AS v FROM ($grid)",

      "q_focal_sum"    -> focalJoin("sum(n.v)"),
      "q_focal_mean"   -> focalJoin("avg(n.v)"),
      "q_focal_min"    -> focalJoin("min(n.v)"),
      "q_focal_max"    -> focalJoin("max(n.v)"),
      "q_focal_median" -> focalJoin("median(n.v)"),

      "q_focal_mode" ->
        s"""WITH g AS ($grid)
           |SELECT x, y, v FROM (
           |  SELECT c.x AS x, c.y AS y, n.v AS v,
           |    row_number() OVER (PARTITION BY c.x, c.y ORDER BY count(*) DESC, n.v ASC) AS rn
           |  FROM g c JOIN g n ON n.x BETWEEN c.x - 1 AND c.x + 1 AND n.y BETWEEN c.y - 1 AND c.y + 1
           |  GROUP BY c.x, c.y, n.v
           |) WHERE rn = 1""".stripMargin,

      "q_focal_stddev" ->
        (focalJoin("sqrt((sum(n.v * n.v) - sum(n.v) * sum(n.v) / count(*)) / (count(*) - 1))")
          + " HAVING count(*) > 1"),

      "q_focal_circle" ->
        s"""WITH g AS ($grid)
           |SELECT c.x AS x, c.y AS y, avg(n.v) AS v
           |FROM g c JOIN g n
           |  ON n.x BETWEEN c.x - 2 AND c.x + 2 AND n.y BETWEEN c.y - 2 AND c.y + 2
           | AND (n.x - c.x) * (n.x - c.x) + (n.y - c.y) * (n.y - c.y) <= 4
           |GROUP BY c.x, c.y""".stripMargin,

      "q_slope" ->
        hornSql("round(degrees(atan(sqrt(dzdx * dzdx + dzdy * dzdy))), 5)"),

      "q_aspect" ->
        hornSql("round(CASE WHEN degrees(atan2(dzdy, -dzdx)) < 0 THEN degrees(atan2(dzdy, -dzdx)) + 360 ELSE degrees(atan2(dzdy, -dzdx)) END, 5)"),

      "q_hillshade" ->
        hornSql("floor(greatest(0, 255 * (cos(radians(45)) * cos(atan(sqrt(dzdx * dzdx + dzdy * dzdy))) + sin(radians(45)) * sin(atan(sqrt(dzdx * dzdx + dzdy * dzdy))) * cos(radians(315) - (CASE WHEN atan2(dzdy, -dzdx) < 0 THEN atan2(dzdy, -dzdx) + 2 * pi() ELSE atan2(dzdy, -dzdx) END)))))"),

      "q_tobler" ->
        hornSql("round(6 * exp(-3.5 * abs(sqrt(dzdx * dzdx + dzdy * dzdy) + 0.05)), 5)"),
    )
  }
}
