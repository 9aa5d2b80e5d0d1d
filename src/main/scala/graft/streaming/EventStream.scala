package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import java.sql.Timestamp

/** Open-session accumulator for [[EventStream.sessionizeStateful]]. */
final case class OpenSession(startMs: Long, lastMs: Long, n: Long, total: Double)

/** A finalized session emitted by [[EventStream.sessionizeStateful]]. */
final case class SessionRecord(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    total: Double
)

/** Structured Streaming surface over the `events` stream (ST1–ST4 +
  * the declared tumbling/sliding/session windows, SURVEY.md §2.7).
  *
  * The reference is batch-incremental CDC; this module preserves those
  * semantics (file source + idempotent `foreachBatch` upsert gives the
  * same exactly-once-ish guarantee as the reference's keyed MERGE +
  * delete-on-success, `crime_etl.py:296-301`) and adds true streaming
  * windows. Watermarks bound state; at scale the only stateful shuffle
  * is keyed by (window, event_type) / session key.
  *
  * Batch twins of each aggregation live in `analytics.Queries`
  * (st1/st2/st3) where the DuckDB oracle checks them; streaming
  * execution is covered by `StreamingSpec` via the memory sink.
  */
object EventStream {

  /** File-source stream over a parquet events directory. */
  def readEvents(spark: SparkSession, dir: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)

  /** Tumbling 1-hour counts/sums per event_type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** Sliding 2-hour / 1-hour-step counts per event_type. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows (30-minute gap) per user. The watermark delay is
    * the max tolerated event-time disorder: session state older than it
    * is finalized, so late-beyond-delay events are dropped rather than
    * merged (pick the delay per source disorder, not per session gap). */
  def sessionCounts(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total"))
      .select(
        col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"), col("total"))

  /** Custom sessionization state machine via `flatMapGroupsWithState`
    * (the KeyValueGroupedDataset custom-state surface — semantics
    * `session_window` can't express: sessions EMIT exactly once, either
    * the moment a new event proves the gap elapsed, or on event-time
    * timeout when the watermark passes last_event + gap).
    *
    * State per user is one [[OpenSession]] accumulator; completed
    * sessions stream out in append mode. Watermark bounds both late
    * data and state size — a key's state lives at most gap + delay past
    * its last event. At scale the only shuffle is the groupByKey hash
    * partition on user_id, and state is O(active users), not O(events).
    */
  def sessionizeStateful(events: DataFrame, gapMinutes: Int = 30, delay: String = "2 hours"): Dataset[SessionRecord] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", delay)
      .select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, SessionRecord](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, state) =>
          def toRec(s: OpenSession) =
            SessionRecord(user, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.total)
          if (state.hasTimedOut) {
            // watermark passed last_event + gap: the open session is final
            val out = state.getOption.map(toRec).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(_._2.getTime)
            var open = state.getOption
            val done = Seq.newBuilder[SessionRecord]
            sorted.foreach { case (_, ts, v) =>
              val t = ts.getTime
              open = open match {
                case Some(s) if t >= s.startMs - gapMs && t - s.lastMs < gapMs =>
                  // in-session; a late (within-watermark) event may also
                  // EXTEND the session start backwards
                  Some(s.copy(
                    startMs = math.min(s.startMs, t),
                    lastMs = math.max(s.lastMs, t),
                    n = s.n + 1,
                    total = s.total + v))
                case Some(s) if t < s.startMs - gapMs =>
                  // late event a full gap BEFORE the open session: a
                  // completed predecessor session of its own
                  done += SessionRecord(user, new Timestamp(t), new Timestamp(t), 1, v)
                  Some(s)
                case Some(s) =>
                  done += toRec(s) // gap proven by this event: emit, start fresh
                  Some(OpenSession(t, t, 1, v))
                case None =>
                  Some(OpenSession(t, t, 1, v))
              }
            }
            open.foreach { s =>
              state.update(s)
              // event-time timeout must sit beyond the current watermark
              state.setTimeoutTimestamp(math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            done.result().iterator
          }
      }
  }

  /** Run a streaming aggregation to a memory sink until the source
    * drains; returns the sink table name. Local smoke-test entry. */
  def runToMemory(df: DataFrame, name: String, mode: String = "append"): StreamingQuery =
    df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()

  /** CDC upsert sink: maintain a keep-latest-per-key parquet table from
    * a stream via foreachBatch + the engine upsert (ST1/ST3/ST4). */
  def upsertSink(events: DataFrame, tablePath: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val keyed = batch.withColumn("part", lit(0))
        graft.operators.Upsert.upsertIntoParquet(
          spark, tablePath, keyed,
          keyCols = Seq("user_id"), versionCol = "ts", partitionCol = "part")
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
