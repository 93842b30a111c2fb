package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming forms of the engine's incremental semantics.
  *
  * The reference is a polling micro-batch system (P/replicator.py:193-247);
  * its streaming semantics (watermark-like settling T2, exactly-once per
  * chunk T3, late-data-as-updates T6) live in the control table. These
  * transforms give the same operators an event-time streaming surface:
  * identical logical plans run in batch (for the DuckDB oracle) and under
  * `readStream` (for continuous ingest).
  */
object EventStreams {

  /** Tumbling event-time window aggregate with watermark; works over a
    * batch DataFrame too (window() is engine-agnostic).
    */
  def windowedCounts(events: DataFrame, windowDur: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("value_cents"))
  }

  /** Gap-based sessionization per user: a new session starts when the gap
    * from the previous event exceeds `gapUs`. Expressed as
    * lag + running-sum (batch form; the streaming form of the same
    * semantics is [[sessionizeStreaming]]).
    */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_us").isNull || (col("ts_us") - col("prev_us")) > gapUs)
          .cast("int"))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"))
  }

  /** Streaming sessionization via session_window (state handled by the
    * engine; append-mode with watermark).
    */
  def sessionizeStreaming(events: DataFrame, gap: String,
      watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"))

  /** Host a micro-batch sink: run `transform` over a parquet-backed stream
    * into an in-memory table (used by specs; production would point at the
    * chunk export dirs and a foreachBatch committing via the catalog).
    */
  def runToMemory(spark: SparkSession, srcDir: String, schema: StructType,
      queryName: String, transform: DataFrame => DataFrame,
      outputMode: String = "append"): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(srcDir)
    transform(src).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
