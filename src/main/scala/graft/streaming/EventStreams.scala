package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table shape.
  *
  * The reference is batch-only (SURVEY §2.9), but a web-scale ingest
  * pipeline needs the streaming versions of its rollups: the same
  * tumbling-window aggregation as the batch q_events_hourly, expressed
  * as readStream -> watermark -> window -> writeStream, so late data is
  * bounded and state is evicted. Batch and streaming share the
  * aggregation logic; the batch query is the correctness oracle for the
  * streaming one (run-to-completion on static input must agree).
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Hourly tumbling-window rollup with a watermark for bounded state:
    * (window_start, event_type, n_events, value_sum).
    */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** Run a streaming rollup into an in-memory sink (tests/demos);
    * returns the query — callers processAllAvailable() then read the
    * `tableName` table.
    */
  def startMemorySink(rollup: DataFrame, tableName: String): StreamingQuery =
    rollup.writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode(OutputMode.Append()) // watermark allows append finalization
      .start()
}
