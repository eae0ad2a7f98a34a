package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.raster.RasterLayer

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
  )

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
    )
  }
}
