package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")

    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val cnt = f
      println(f"TIMING $n ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt rows)")
    }

    val l = GridSource.lineitemLayer(spark, dir)
    time("layer_count")(l.df.count())
    val u = l.union(l)
    time("union_count")(u.df.count())
    // variant A: current aggregateByCell (aggregate HOF over collect_list)
    time("aggByCell_hof")(u.aggregateByCell("Sum").df.count())
    // variant B: explode-free, two-sided: groupBy + reduce via array zip in UDF
    val zipsum = udf { (tiles: Seq[Seq[Double]]) =>
      val n = tiles.head.length
      val out = Array.fill(n)(Double.NaN)
      tiles.foreach { t =>
        var i = 0
        while (i < n) {
          val v = t(i)
          if (!v.isNaN) out(i) = if (out(i).isNaN) v else out(i) + v
          i += 1
        }
      }
      out
    }
    val b = u.df.groupBy("col", "row").agg(zipsum(collect_list(col("tile"))).as("tile"))
    time("aggByCell_udf")(b.count())
    time("aggByCell_hof2")(u.aggregateByCell("Sum").df.count())
    u.aggregateByCell("Sum").df.explain("formatted")
    spark.stop()
  }
}
