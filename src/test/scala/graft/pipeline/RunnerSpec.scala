package graft.pipeline

import graft.SparkSpec
import graft.operators.SyncRepair
import graft.sources.ApiSimulator
import org.apache.spark.sql.functions._

/** End-to-end pipeline smoke (SURVEY.md §5.5): simulated API → landing
  * zone → transform → dual-replica upsert → logs → checkpoint/resume →
  * sync repair. */
class RunnerSpec extends SparkSpec {

  test("full run lands, transforms and upserts into both replicas") {
    val dir = java.nio.file.Files.createTempDirectory("runner").toString
    val r = new Runner(spark, dir)
    val api = new ApiSimulator(totalRows = 250, pageSize = 100)
    val status = r.run("run1", "2025-07-01", api)
    assert(status == "SUCCESS")
    val a = spark.read.parquet(r.replicaA)
    assert(a.count() == 250)
    // typed schema survived
    assert(a.schema("date_of_occurrence").dataType.typeName == "timestamp")
    assert(a.schema("arrest").dataType.typeName == "boolean")
    // second identical run is idempotent (same keys upsert over themselves)
    assert(r.run("run2", "2025-07-01", api) == "SUCCESS")
    assert(spark.read.parquet(r.replicaA).count() == 250)
    // logs recorded both runs as SUCCESS
    val logs = r.logsA.read().filter(col("status") === "SUCCESS")
    assert(logs.count() == 2)
  }

  test("checkpoint/resume: a failing page checkpoints, retry resumes and completes") {
    val dir = java.nio.file.Files.createTempDirectory("runner").toString
    val r = new Runner(spark, dir)
    // fails at page 2 on the first pass; Runner retries internally and
    // the simulator only fails once per fetch generation here, so use
    // maxRetries to allow recovery
    var failures = 0
    val api = new ApiSimulator(totalRows = 300, pageSize = 100) {
      override def fetchPages(s: String, e: String, resume: Int): Iterator[(Int, Seq[org.apache.spark.sql.Row])] = {
        val it = super.fetchPages(s, e, resume)
        it.map { case (pg, rows) =>
          if (pg == 2 && failures == 0) { failures += 1; throw graft.sources.ApiPageFetchError(pg, s) }
          (pg, rows)
        }
      }
    }
    assert(r.run("run1", "2025-07-02", api) == "SUCCESS")
    assert(spark.read.parquet(r.replicaA).count() == 300)
    // checkpoint cleared after success
    assert(r.checkpoint.read().isEmpty)
  }

  test("sync repair replays load_dates missing in one replica") {
    val dir = java.nio.file.Files.createTempDirectory("runner").toString
    val r = new Runner(spark, dir)
    val api = new ApiSimulator(totalRows = 100, pageSize = 50)
    assert(r.run("run1", "2025-07-03", api) == "SUCCESS")
    // simulate replica B lagging: mark its log row FAILED
    r.logsB.finish("run1", java.sql.Date.valueOf("2025-07-03"), "FAILED")
    assert(SyncRepair.diff(r.logsA.read(), r.logsB.read()).count() == 1)
    assert(r.syncRepair("recovery1") == 1)
    assert(SyncRepair.diff(r.logsA.read(), r.logsB.read()).count() == 0)
    assert(spark.read.parquet(r.replicaB).count() == 100)
  }
}
