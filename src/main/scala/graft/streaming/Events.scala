package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event-stream operators (Spark-first addition; the reference has no
  * streaming surface). The same transform functions serve the batch
  * path (oracle-checked) and the Structured Streaming path
  * (readStream + watermark, unit-tested) — write once, run both.
  *
  * `ts` arrives as raw nanos (see GridSource.eventsTable).
  */
object Events {
  val NanosPerHour = 3600L * 1000 * 1000 * 1000
  val SessionGapUs = 30L * 60 * 1000 * 1000 // 30 min in micros

  /** Tumbling 1h aggregation per event_type — batch form. Exact sums
    * via decimal; hour derived from MICROsecond epoch so the oracle
    * (whose timestamps are us-truncated) states the identical math. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(expr("(ts div 1000) div 3600000000").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast("decimal(18,6)")).cast("double").as("vsum"))

  /** Same aggregation as a streaming query on a timestamp column with
    * a watermark (streaming path; used by the spec with a memory sink). */
  def hourlyAggStream(events: DataFrame): DataFrame =
    events
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ets", "2 hours")
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast("decimal(18,6)")).cast("double").as("vsum"))

  /** Sessionization: a new session starts after a >30min gap per user.
    * Batch form via window functions (deterministic ts, event_id order).
    */
  def sessionize(events: DataFrame): DataFrame = {
    val us = expr("ts div 1000")
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val marked = events
      .select(col("user_id"), col("event_id"), us.as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("us") - col("prev") > SessionGapUs, 1).otherwise(0))
    marked
      .withColumn("session_id", sum("brk").over(
        Window.partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("cnt"), min("us").as("start_us"), max("us").as("end_us"))
  }

  /** Streaming exact dedup for a document stream: content-hash
    * dropDuplicatesWithinWatermark — the streaming twin of
    * pipeline.Dedup.exact. State is bounded by the watermark horizon
    * (the property that makes streaming dedup feasible at all). */
  def streamingDedup(docs: DataFrame, tsCol: String = "ts"): DataFrame =
    docs
      .withColumn("ets", timestamp_micros(expr(s"$tsCol div 1000")))
      .withWatermark("ets", "1 hour")
      .withColumn("fp", md5(col("text")))
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming raster ingestion: a stream of scenes (UntiledRaster
    * schema) is tiled per micro-batch and appended to the catalog —
    * the readStream -> tiles -> store pipeline a live imagery feed
    * needs. foreachBatch reuses the exact batch tiling path, so batch
    * and streaming ingestion cannot diverge; readers merge duplicate
    * keys (Catalog.update contract). */
  def ingestScenes(scenes: DataFrame, uri: String, name: String,
                   layout: graft.core.LayoutDefinition, zoom: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.catalog.Catalog
    import graft.raster.{LayerMetadata, UntiledRaster}
    if (!Catalog.metadataExists(uri, name))
      Catalog.writeMetadata(uri, name, LayerMetadata(layout), zoom)
    scenes.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Catalog.update(uri, name, UntiledRaster(batch).tileToLayout(layout), zoom)
      }
      .start()
  }

  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, cnt: Long)

  /** Streaming sessionization with explicit state — the
    * flatMapGroupsWithState path (spec-tested with a memory sink). */
  def sessionizeStream(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ets", "1 hour")
      // keep the watermarked column in the projection — dropping it
      // disconnects the watermark from the stateful operator
      .select(col("user_id").as[Long], expr("ts div 1000").as[Long],
              col("ets").as[java.sql.Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)], state: GroupState[SessionState]) =>
          // emit closed sessions; sorted-within-batch approximation
          val ts = rows.map(_._2).toArray.sorted
          var out = List.empty[SessionOut]
          var st = state.getOption.getOrElse(SessionState(-1, -1, 0))
          ts.foreach { t =>
            if (st.start < 0) st = SessionState(t, t, 1)
            else if (t - st.last > SessionGapUs) {
              out = SessionOut(user, st.start, st.last, st.n) :: out
              st = SessionState(t, t, 1)
            } else st = SessionState(st.start, t, st.n + 1)
          }
          state.update(st)
          out.reverseIterator
      }
  }
}
