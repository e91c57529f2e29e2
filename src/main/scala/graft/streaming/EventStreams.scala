package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Event-stream operators. The reference's ingest endpoint is a
  * micro-batch-per-upload pattern (one POST = one batch,
  * reference web/api/products.py:77-95); Structured Streaming's
  * file-arrival source + foreachBatch is its native Spark shape, and the
  * windowed/sessionized aggregations here are the analytics the `events`
  * table exists for.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Tumbling-window counts/sums (batch or stream — same plan). */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding-window counts. */
  def sliding(events: DataFrame, width: String = "1 hour", slide: String = "15 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))

  /** Batch sessionization via gaps-and-islands: a new session starts when
    * the gap to the previous event of the same user exceeds `gapMinutes`.
    * Deterministic and SQL-expressible (oracle-checkable), same semantics
    * as the streaming `session_window`.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("_prev", lag(col("ts"), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("_prev")) > gapSec, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("_new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
  }

  /** Streaming sessionization with the native session_window + watermark. */
  def sessionizeStream(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** File-arrival stream over a drop directory (the streaming shape of the
    * reference's upload endpoint).
    */
  def fromDirectory(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Windowed aggregation stream to an in-memory sink (test/demo). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Complete()): StreamingQuery =
    df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()

  /** The micro-batch ingest bridge: every arriving file batch runs an
    * arbitrary batch sink function — the reference's one-POST-one-batch
    * ingest lifted onto a stream (SURVEY.md §2.9).
    */
  def foreachBatchIngest(stream: DataFrame)(f: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode(OutputMode.Append())
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) => f(batch.toDF(), id))
}
