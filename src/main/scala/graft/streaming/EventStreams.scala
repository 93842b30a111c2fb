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

  /** A user's open session while streaming. */
  final case class SessionState(startUs: Long, lastUs: Long, n: Long)

  /** A closed session emitted by [[sessionizeStateful]]. */
  final case class SessionOut(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  /** Custom-state streaming sessionization: per-user
    * `flatMapGroupsWithState` keeps the open session as explicit state,
    * emits a session when a gap exceeds `gapUs`, and closes idle sessions
    * through an event-time timeout at the watermark — the hand-rolled
    * form of session_window for when session semantics outgrow it (e.g.
    * emitting counts mid-session or capping session length). Within each
    * micro-batch a group's rows are buffered and processed in event-time
    * order; across batches the watermark bounds disorder. Works on a
    * batch Dataset too (state is per-invocation there, so the trailing
    * open session of each user is simply not emitted — same contract as
    * the streaming form before its timeout fires).
    */
  def sessionizeStateful(events: DataFrame, gapUs: Long,
      watermark: String = "30 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val base =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    val streaming = events.isStreaming
    // the watermarked ts column must survive the projection for
    // event-time timeout to resolve
    base.select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.startUs, s.lastUs, s.n))
          } else {
            val ts = rows.map(_._3).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.lastUs <= gapUs =>
                  cur = Some(SessionState(s.startUs, math.max(s.lastUs, t),
                    s.n + 1))
                case Some(s) =>
                  out += SessionOut(user, s.startUs, s.lastUs, s.n)
                  cur = Some(SessionState(t, t, 1L))
                case None =>
                  cur = Some(SessionState(t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the open session once the watermark passes its gap
              if (streaming)
                state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
            }
            out.iterator
          }
      }
      .toDF()
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
