package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

/** Structured Streaming over the events table — the capability upgrade the
  * reference lacks entirely (SURVEY.md §2.10: strictly batch; its nearest
  * notions are slice checkpointing and time-range-sharded log input).
  *
  * The batch parquet drives a real streaming query: file source →
  * event-time tumbling-window aggregation → memory sink, with an
  * AvailableNow trigger so a bounded run processes everything and stops.
  * The same code runs unbounded on a live directory/Kafka source; at
  * scale, add `withWatermark` to bound state.
  */
object StreamingJobs {

  /** Read events as a stream, handling the TIMESTAMP(NANOS) column the
    * same way Tables.events does (nanos→µs floor). */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    if (schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Tumbling 1-hour event-time windows: count + exact cents sum per
    * (window, event_type). Runs the stream to completion (AvailableNow)
    * and returns the final result table. */
  def windowedEventCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventsStream(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("total_cents"))
    val qname = "graft_stream_events"
    spark.streams.active.filter(_.name == qname).foreach(_.stop())
    val q = agg.writeStream
      .outputMode("complete").format("memory").queryName(qname)
      .trigger(Trigger.AvailableNow()).start()
    try { q.processAllAvailable() } finally { q.stop() }
    spark.table(qname)
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("cnt"), col("total_cents"))
  }
}
