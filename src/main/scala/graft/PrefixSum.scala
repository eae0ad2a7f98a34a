package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed cumulative sums over a keyed table WITHOUT a single-task
  * global window (r20): `Window.orderBy(key)` with no partitionBy
  * funnels every row through ONE task — at a 2^22-distinct-value
  * degrade ceiling that is a 4M-row sort on one core. Two-phase
  * partition prefix sum instead (the Curation packing discipline):
  * range-partition by the key (partitions ARE the global order), one
  * tiny per-partition-totals collect (≤ nPartitions rows), then an
  * in-partition running sum plus the broadcast prior-partition offset.
  * Exact integer sums — byte-identical to the global window's output,
  * every partition sorts in parallel. */
object PrefixSum {

  /** Add `cum_<col>` running-total columns (ordered by `keyCol`, ties
    * impossible: input must be one row per distinct key — a groupBy
    * output). */
  def withCumulatives(counts: DataFrame, keyCol: String,
                      cntCols: Seq[String]): DataFrame = {
    require(cntCols.nonEmpty)
    val parts = math.max(counts.sparkSession.sparkContext.defaultParallelism, 1)
    // localCheckpoint pins the range boundaries: phase A (totals) and
    // phase B (running sums) must see the SAME partitioning
    val ranged = counts.repartitionByRange(parts, col(keyCol))
      .sortWithinPartitions(keyCol)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val aggs = cntCols.map(c => sum(c).cast("long").as(c))
    val totals = ranged.groupBy("_pid").agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => (r.getInt(0), cntCols.indices.map(i => r.getLong(i + 1))))
      .sortBy(_._1)
    val offsets: Seq[Map[Int, Long]] = cntCols.indices.map { i =>
      var acc = 0L
      totals.map { case (pid, ts) => val off = acc; acc += ts(i); (pid, off) }.toMap
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy(keyCol).rowsBetween(Long.MinValue, 0)
    cntCols.zipWithIndex.foldLeft(ranged) { case (df, (c, i)) =>
      df.withColumn(s"cum_$c",
        sum(c).over(w).cast("long") +
          coalesce(element_at(typedLit(offsets(i)), col("_pid")), lit(0L)))
    }.drop("_pid")
  }

  /** Single-column form: adds `cum`. */
  def withCumulative(counts: DataFrame, keyCol: String,
                     cntCol: String = "cnt"): DataFrame =
    withCumulatives(counts, keyCol, Seq(cntCol))
      .withColumnRenamed(s"cum_$cntCol", "cum")
}
