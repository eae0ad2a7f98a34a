package graft.functions

import org.apache.spark.sql.graft.{GraftExtensions, LongDotExpr, TileStatsExpr}

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("TileStatsExpr computes NaN-skipping stats (codegen + interpreted)") {
    val df = Seq(Seq(1.0, Double.NaN, 3.0), Seq(Double.NaN, Double.NaN, Double.NaN))
      .toDF("tile")
    val rows = df.select(TileStatsExpr.tileStats($"tile").as("st"))
      .selectExpr("st.vsum", "st.vcnt", "st.vmin", "st.vmax").collect()
    assert(rows(0).getDouble(0) == 4.0 && rows(0).getLong(1) == 2L)
    assert(rows(0).getDouble(2) == 1.0 && rows(0).getDouble(3) == 3.0)
    assert(rows(1).getLong(1) == 0L && rows(1).getDouble(2).isNaN)
  }

  test("LongDotExpr fused dot product") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    val out = df.select(LongDotExpr.longDot($"a", $"b")).as[Long].head()
    assert(out == 32L)
  }

  test("extension registration exposes SQL functions") {
    GraftExtensions.register(spark)
    val out = spark.sql("SELECT long_dot(array(1L, 2L), array(3L, 4L)) AS d")
      .as[Long].head()
    assert(out == 11L)
    val st = spark.sql("SELECT tile_stats(array(CAST(2.0 AS DOUBLE), CAST('NaN' AS DOUBLE))).vsum AS s")
      .as[Double].head()
    assert(st == 2.0)
  }
}
