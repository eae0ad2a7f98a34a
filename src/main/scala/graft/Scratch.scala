package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry (not part of the driver contract):
  * `runMain graft.Scratch <sfDir> [query ...]` times the named
  * SparkEntry queries (twice each when EXPLAIN=1 also prints plans).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        if (sys.env.contains("EXPLAIN")) df.explain("formatted")
        val cnt = df.count()
        println(f"TIMING $n ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt rows)")
      } catch {
        case e: Throwable =>
          println(f"TIMING $n FAILED ${(System.nanoTime() - t0) / 1e9}%.2f s: ${e.getMessage.take(200)}")
      }
    }
    spark.stop()
  }
}
