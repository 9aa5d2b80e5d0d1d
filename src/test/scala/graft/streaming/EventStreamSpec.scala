package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Structured Streaming execution: the windowed aggregations run as real
  * streams (file source → memory sink) and match their batch twins. */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)
  ))

  private def writeEvents(dir: String): Unit = {
    val rows = (0 until 200).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
        (i % 7).toLong, s"type${i % 3}", i * 1.5)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(4).write.parquet(dir)
  }

  test("tumbling window stream matches batch aggregation") {
    val dir = java.nio.file.Files.createTempDirectory("events").toString + "/in"
    writeEvents(dir)
    val stream = EventStream.readEvents(spark, dir, schema)
    // complete mode: with AvailableNow + unordered files, append mode
    // finalizes windows against a lagging watermark and emits partials
    val q = EventStream.runToMemory(EventStream.tumblingCounts(stream), "tumbling", "complete")
    q.awaitTermination(60000)
    val streamed = spark.table("tumbling")
      .select("window_start", "event_type", "n", "total")
    val batch = spark.read.schema(schema).parquet(dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .select($"window.start".as("window_start"), $"event_type", $"n", $"total")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    assert(streamed.count() > 0)
  }

  test("session window stream produces per-user sessions") {
    val dir = java.nio.file.Files.createTempDirectory("events").toString + "/in"
    writeEvents(dir)
    val q = EventStream.runToMemory(
      // delay > the 3h20m data span: with maxFilesPerTrigger=1 and
      // unordered files an out-of-order file would otherwise advance the
      // watermark past earlier files' events and split their sessions
      EventStream.sessionCounts(EventStream.readEvents(spark, dir, schema), "4 hours"),
      "sessions", "complete")
    q.awaitTermination(60000)
    val out = spark.table("sessions")
    // events are 1/minute round-robin over 7 users → per-user gaps are
    // 7 min < 30 min, so each user gets exactly one session
    assert(out.count() == 7)
    assert(out.agg(sum("n_events")).first().getLong(0) == 200L)
  }

  test("streaming upsert sink maintains keep-latest table across micro-batches") {
    val base = java.nio.file.Files.createTempDirectory("events").toString
    writeEvents(s"$base/in")
    val q = EventStream.upsertSink(
      EventStream.readEvents(spark, s"$base/in", schema),
      s"$base/table", s"$base/ckpt")
    q.awaitTermination(60000)
    val tbl = spark.read.parquet(s"$base/table")
    assert(tbl.count() == 7) // one latest row per user
    // the kept row per user is the max-ts event
    val kept = tbl.select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(kept(0L) == 196L) // last event for user 0: id 196 (196 % 7 == 0)
  }
}
