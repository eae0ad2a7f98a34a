package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Extent, LayoutDefinition, TileLayout}
import graft.raster.RasterLayer

/** The derived-grid contract shared by every raster query and its
  * DuckDB oracle (SURVEY.md §3): the driver's TPC-H-ish tables are
  * deterministically mapped to logical grids / point sets, identically
  * in Spark code (here) and in oracle SQL (the `Sql` strings).
  *
  * Grid: 256 x 256 cells, tiled 64 x 64 (4 x 4 tiles), extent
  * (0,0)-(256,256) with cell size 1 and y-down rows (grid coords ==
  * cell coords, so oracles stay pure integer arithmetic).
  */
object GridSource {
  val G  = 256 // grid cols == rows
  val T  = 64  // tile cols == rows
  val layout: LayoutDefinition =
    LayoutDefinition(Extent(0, 0, G, G), TileLayout(G / T, G / T, T, T))

  /** 64x64 grid (tile 32) for the events spacetime layer. */
  val layout64: LayoutDefinition =
    LayoutDefinition(Extent(0, 0, 64, 64), TileLayout(2, 2, 32, 32))

  /** LatLng twin of the 256x256 grid: same cells, extent 0..64
    * DEGREES (cell 0.25 — exact in binary, so Horn denominators stay
    * exact), putting each of the 4 tile rows at a distinct center
    * latitude (56/40/24/8 deg) for per-latitude z-factor oracles. */
  val layoutLatLng: LayoutDefinition =
    LayoutDefinition(Extent(0, 0, 64, 64), TileLayout(G / T, G / T, T, T))

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Value grid from lineitem: x = l_orderkey%256, y = l_partkey%256,
    * v = sum(l_quantity) (integral => exact double sums). */
  def lineitemCells(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy((col("l_orderkey") % G).as("x"), (col("l_partkey") % G).as("y"))
      .agg(sum("l_quantity").as("v"))

  val lineitemCellsSql: String =
    s"SELECT l_orderkey % $G AS x, l_partkey % $G AS y, sum(l_quantity) AS v FROM lineitem GROUP BY 1, 2"

  /** Tiled layer straight from raw rows: TileBuildAgg(Sum) rasterizes
    * and tiles in ONE shuffle (map-side partial tiles), skipping the
    * per-cell groupBy — identical result to tiling lineitemCells. */
  def lineitemLayer(spark: SparkSession, dir: String): RasterLayer =
    RasterLayer.fromCells(
      table(spark, dir, "lineitem").select(
        (col("l_orderkey") % G).as("x"), (col("l_partkey") % G).as("y"),
        col("l_quantity").as("v")),
      layout, graft.raster.CellOp.Sum)

  /** ONE-SCAN fused build of the lineitem value layer AND the
    * returnflag zone layer (r20 optimization round): both grids key on
    * the same (l_orderkey%G, l_partkey%G) cells, so one groupBy
    * carries both tile aggregates — one scan + one keyed shuffle
    * replaces the two scans + three shuffles + uncoupled join inputs
    * of building each side separately (guide §2.4). Zone equality:
    * min over ascii codes == ascii(min(flag)) for the single-char
    * returnflags (ascii order == lex order), so the zone tiles match
    * the zoneCells -> fromCells path bit-for-bit; value tiles are the
    * exact lineitemLayer aggregation. */
  def lineitemWithZoneLayers(spark: SparkSession, dir: String): (RasterLayer, RasterLayer) =
    RasterLayer.fromCellsDual(
      table(spark, dir, "lineitem").select(
        (col("l_orderkey") % G).as("x"), (col("l_partkey") % G).as("y"),
        col("l_quantity").as("va"),
        ascii(col("l_returnflag")).cast("double").as("vb")),
      layout, graft.raster.CellOp.Sum, graft.raster.CellOp.Min)

  /** Zone layer alone in ONE shuffle (r20): TileBuildAgg(Min) over the
    * raw ascii flags skips zoneCells' per-cell groupBy (same
    * ascii-min/lex-min equality as [[lineitemWithZoneLayers]]). */
  def zoneLayer(spark: SparkSession, dir: String): RasterLayer =
    RasterLayer.fromCells(
      table(spark, dir, "lineitem").select(
        (col("l_orderkey") % G).as("x"), (col("l_partkey") % G).as("y"),
        ascii(col("l_returnflag")).cast("double").as("v")),
      layout, graft.raster.CellOp.Min)

  /** Second value grid (for binary ops / union) from orders:
    * x = o_orderkey%256, y = o_custkey%256, v = count (exact). */
  def ordersCells(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy((col("o_orderkey") % G).as("x"), (col("o_custkey") % G).as("y"))
      .agg(count(lit(1)).cast("double").as("v"))

  val ordersCellsSql: String =
    s"SELECT o_orderkey % $G AS x, o_custkey % $G AS y, CAST(count(*) AS DOUBLE) AS v FROM orders GROUP BY 1, 2"

  def ordersLayer(spark: SparkSession, dir: String): RasterLayer =
    RasterLayer.fromCells(
      table(spark, dir, "orders").select(
        (col("o_orderkey") % G).as("x"), (col("o_custkey") % G).as("y"),
        lit(1.0).as("v")),
      layout, graft.raster.CellOp.Sum)

  /** Third value grid (for N-ary local algebra) from part:
    * x = p_partkey%256, y = (p_partkey div 256 * 7 + p_size)%256,
    * v = sum(p_size) (integral => exact double sums). Covers only the
    * lower tile rows by construction — deliberately, so N-ary ops
    * exercise their missing-tile (all-NoData) outer-join path. */
  def partCells(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .groupBy((col("p_partkey") % G).as("x"),
        ((expr("p_partkey div 256") * 7 + col("p_size")) % G).as("y"))
      .agg(sum("p_size").cast("double").as("v"))

  val partCellsSql: String =
    s"SELECT p_partkey % $G AS x, (p_partkey // 256 * 7 + p_size) % $G AS y, CAST(sum(p_size) AS DOUBLE) AS v FROM part GROUP BY 1, 2"

  def partLayer(spark: SparkSession, dir: String): RasterLayer =
    RasterLayer.fromCells(
      table(spark, dir, "part").select(
        (col("p_partkey") % G).as("x"),
        ((expr("p_partkey div 256") * 7 + col("p_size")) % G).as("y"),
        col("p_size").cast("double").as("v")),
      layout, graft.raster.CellOp.Sum)

  /** Zone grid from lineitem: zone = min(l_returnflag) per cell
    * (min => deterministic, unlike mode). Encoded to int via ascii. */
  def zoneCells(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy((col("l_orderkey") % G).as("x"), (col("l_partkey") % G).as("y"))
      .agg(min(col("l_returnflag")).as("zone"))

  val zoneCellsSql: String =
    s"SELECT l_orderkey % $G AS x, l_partkey % $G AS y, min(l_returnflag) AS zone FROM lineitem GROUP BY 1, 2"

  /** Point set from supplier: deterministic scatter of 100-ish points
    * with fractional offsets (px, py in cell units). */
  def supplierPoints(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "supplier").select(
      col("s_suppkey").as("pid"),
      ((col("s_suppkey") * 13) % G + lit(0.5)).cast("double").as("px"),
      ((col("s_suppkey") * 29) % G + lit(0.5)).cast("double").as("py"))

  val supplierPointsSql: String =
    s"SELECT s_suppkey AS pid, CAST(s_suppkey * 13 % $G + 0.5 AS DOUBLE) AS px, CAST(s_suppkey * 29 % $G + 0.5 AS DOUBLE) AS py FROM supplier"

  /** Second point set from customer ON THE SAME 256-frame as
    * [[supplierPoints]] (for point-point joins): same +0.5 center
    * offset, so pairwise coordinate DIFFERENCES are exact integers
    * and squared distances stay pure integer arithmetic. */
  def customerPoints(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer").select(
      col("c_custkey").as("qid"),
      ((col("c_custkey") * 17) % G + lit(0.5)).cast("double").as("qx"),
      ((col("c_custkey") * 31) % G + lit(0.5)).cast("double").as("qy"))

  val customerPointsSql: String =
    s"SELECT c_custkey AS qid, CAST(c_custkey * 17 % $G + 0.5 AS DOUBLE) AS qx, CAST(c_custkey * 31 % $G + 0.5 AS DOUBLE) AS qy FROM customer"

  /** Lon/lat points from customer (for CRS transforms): lon in
    * (-180,180), lat clamped to mercator-safe (-85,85). */
  def customerLonLat(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer").select(
      col("c_custkey").as("pid"),
      ((col("c_custkey") * 7) % 360 - 180 + lit(0.25)).cast("double").as("lon"),
      ((col("c_custkey") * 11) % 170 - 85 + lit(0.25)).cast("double").as("lat"))

  val customerLonLatSql: String =
    "SELECT c_custkey AS pid, CAST(c_custkey * 7 % 360 - 180 + 0.25 AS DOUBLE) AS lon, CAST(c_custkey * 11 % 170 - 85 + 0.25 AS DOUBLE) AS lat FROM customer"

  /** events table, normalized at ingest so `ts` is ALWAYS raw epoch
    * nanos (LongType) regardless of the on-disk dtype — every
    * downstream op does exact integer epoch math (UTC) on that
    * contract. The driver's testdata has shipped `ts` both as
    * TIMESTAMP(NANOS) (readable only as raw longs, hence the legacy
    * flag) and as timestamp[us]; sniff the decoded schema and convert.
    * Sessions pin spark.sql.session.timeZone=UTC, so the NTZ→timestamp
    * cast below is epoch-identity and matches DuckDB's naive
    * epoch_us(ts). */
  def eventsTable(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _: org.apache.spark.sql.types.TimestampType |
           _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn(
          "ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported dtype $other (expected long nanos or timestamp)")
    }
  }

  val NanosPerDay = 86400L * 1000 * 1000 * 1000

  /** SpaceTime cells from events: day-keyed grid. */
  def eventCells(spark: SparkSession, dir: String): DataFrame =
    eventsTable(spark, dir)
      .groupBy((col("user_id") % 64).as("x"), (col("event_id") % 64).as("y"),
               expr(s"ts div $NanosPerDay").as("instant"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))

  /** Dense SpaceTime cells from lineitem (64-grid, 3 instants): the
    * events grid is too sparse per instant for 4-corner interpolation
    * rules, so temporal resample uses this ~5-rows-per-cell grid. */
  def lineitemTemporalCells(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy((col("l_orderkey") % 64).as("x"), (col("l_partkey") % 64).as("y"),
               (col("l_suppkey") % 3).cast("long").as("instant"))
      .agg(sum("l_quantity").as("v"))

  val lineitemTemporalCellsSql: String =
    "SELECT l_orderkey % 64 AS x, l_partkey % 64 AS y, CAST(l_suppkey % 3 AS BIGINT) AS instant, sum(l_quantity) AS v FROM lineitem GROUP BY 1, 2, 3"

  val eventCellsSql: String =
    "SELECT user_id % 64 AS x, event_id % 64 AS y, CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS instant, CAST(sum(CAST(\"value\" AS DECIMAL(18,6))) AS DOUBLE) AS v FROM events GROUP BY 1, 2, 3"
}
