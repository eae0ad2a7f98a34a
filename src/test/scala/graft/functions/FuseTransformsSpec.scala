package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.ArrayTransform
import org.apache.spark.sql.graft.GraftExtensions
import org.scalatest.funsuite.AnyFunSuite

/** Builds a dedicated session (shared SparkContext) so the fusion rule
  * arrives the production way — via withExtensions. */
class FuseTransformsSpec extends AnyFunSuite {

  test("chained localMap transforms fuse into a single ArrayTransform") {
    graft.TestSpark.spark // ensure the shared context exists
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // non-foldable input (depends on id) so constant folding can't
      // collapse the whole expression before our rule sees it
      val df = spark.range(1)
        .select(array((col("id") + 1).cast("double"), lit(2.0), lit(3.0)).as("tile"))
        .select(transform(transform(transform(col("tile"), _ + 1), _ * 2), _ - 3).as("out"))
      val optimized = df.queryExecution.optimizedPlan
      val nTransforms = optimized.expressions.map(_.collect {
        case t: ArrayTransform => t
      }.size).sum
      assert(nTransforms == 1, s"expected fused single transform, got $nTransforms\n$optimized")
      assert(df.as[Seq[Double]].head() == Seq(1.0, 3.0, 5.0)) // ((v+1)*2)-3 over [1,2,3]
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
