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

  test("streaming rollup maintains IncrementalAgg state; replay is a watermarked no-op") {
    import org.apache.spark.sql.functions._
    import graft.operators.{IncrementalAgg, Transform}
    val base = java.nio.file.Files.createTempDirectory("srollup").toString
    val landing = s"$base/landing"
    val api = new ApiSimulator(totalRows = 120, pageSize = 40)
    api.fetchPages("2025-07-01", "2025-07-01").foreach { case (_, rows) =>
      if (rows.nonEmpty) LandingZone.write(api.toDataFrame(spark, rows), landing, "2025-07-01")
    }
    val spec = IncrementalAgg.Spec(keys = Seq("primary_description"))

    val q1 = StreamingRunner.runRollup(spark, landing, s"$base/state", s"$base/ckpt", spec)
    q1.awaitTermination(60000)
    val st = IncrementalAgg.read(spark, s"$base/state")

    // the state equals the batch aggregate over everything landed
    val expected = Transform.crimeRecords(
      spark.read.schema(graft.core.Schemas.rawCrime).json(s"$landing/year=*/month=*/load_date=*"))
      .groupBy("primary_description").count().withColumnRenamed("count", "n_rows")
    assert(st.select("primary_description", "n_rows").except(expected).isEmpty)
    assert(expected.except(st.select("primary_description", "n_rows")).isEmpty)
    assert(IncrementalAgg.appliedBatchId(spark, s"$base/state") >= 0L)

    // a foreachBatch replay of an already-folded batch must not double-count
    val replayed = IncrementalAgg.update(
      spark, s"$base/state",
      Transform.crimeRecords(
        spark.read.schema(graft.core.Schemas.rawCrime).json(s"$landing/year=*/month=*/load_date=*")),
      spec, batchId = Some(0L))
    assert(replayed.agg(sum("n_rows")).first().getLong(0) === 120L)

    // restart with the same checkpoint and no new files: state unchanged
    val q2 = StreamingRunner.runRollup(spark, landing, s"$base/state", s"$base/ckpt", spec)
    q2.awaitTermination(60000)
    assert(IncrementalAgg.read(spark, s"$base/state")
      .agg(sum("n_rows")).first().getLong(0) === 120L)
  }
}
