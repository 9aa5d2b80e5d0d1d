package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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
