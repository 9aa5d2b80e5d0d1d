package graft.streaming

import graft.SparkSpec
import graft.sources.{ApiSimulator, LandingZone}

/** Streaming-mode pipeline: the landing zone consumed as a file stream
  * produces the same replica as the batch path, and restarts resume
  * from the stream checkpoint without reprocessing. */
class StreamingRunnerSpec extends SparkSpec {

  test("landing stream upserts into the replica; restart is a checkpointed no-op") {
    val base = java.nio.file.Files.createTempDirectory("srunner").toString
    val landing = s"$base/landing"
    val api = new ApiSimulator(totalRows = 120, pageSize = 40)
    api.fetchPages("2025-07-01", "2025-07-01").foreach { case (_, rows) =>
      if (rows.nonEmpty) LandingZone.write(api.toDataFrame(spark, rows), landing, "2025-07-01")
    }

    val q1 = StreamingRunner.run(spark, landing, s"$base/crime", s"$base/ckpt")
    q1.awaitTermination(60000)
    val tbl = spark.read.parquet(s"$base/crime")
    assert(tbl.count() == 120)
    assert(tbl.select("crime_id").distinct().count() == 120)

    // land one more day, restart the stream: only the new files process,
    // and re-upserting is idempotent for the old keys
    api.fetchPages("2025-07-02", "2025-07-02").foreach { case (_, rows) =>
      if (rows.nonEmpty) LandingZone.write(api.toDataFrame(spark, rows), landing, "2025-07-02")
    }
    val q2 = StreamingRunner.run(spark, landing, s"$base/crime", s"$base/ckpt")
    q2.awaitTermination(60000)
    val after = spark.read.parquet(s"$base/crime")
    // same crime_ids with a newer source_updated_on → keep-latest, still 120
    assert(after.count() == 120)
    val maxUpd = after.agg(org.apache.spark.sql.functions.max("source_updated_on"))
      .first().getTimestamp(0).toString
    assert(maxUpd.startsWith("2025-07-02"))
  }
}
