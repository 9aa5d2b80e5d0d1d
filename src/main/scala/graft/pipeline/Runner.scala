package graft.pipeline

import graft.meta.{Checkpoint, CheckpointState, RunLog}
import graft.operators.{SyncRepair, Transform, Upsert}
import graft.sources.{ApiPageFetchError, ApiSimulator, LandingZone}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-side orchestration of the weekly run (§3.1 of SURVEY.md) —
  * the Airflow DAG `crime_etl` (`airflow/dags/crime_etl.py:563-695`)
  * re-expressed as plain Scala control flow over lazy Spark plans.
  *
  * Stages: metadata branch (FULL vs INCREMENT on the high-water mark)
  * → paged extract with (date, page) checkpoint/resume → partitioned
  * landing write → transform → keyed upsert into TWO parquet replicas
  * → log finalize → sync-validate (anti-join) → replay missed
  * partitions. Thread/process boundaries of the DAG become Spark job
  * boundaries; branching is `if` on collected scalars (the only
  * `collect`s are scalar cursors — 100 TB posture).
  */
class Runner(spark: SparkSession, workDir: String) {

  val landingRoot = s"$workDir/landing"
  val replicaA = s"$workDir/warehouse_a/crime"
  val replicaB = s"$workDir/warehouse_b/crime"
  val logsA = new RunLog(spark, s"$workDir/warehouse_a/logs")
  val logsB = new RunLog(spark, s"$workDir/warehouse_b/logs")
  val checkpoint = new Checkpoint(s"$workDir/checkpoint.json")

  /** One scheduled run. Returns the final status. */
  def run(runId: String, loadDate: String, api: ApiSimulator, maxRetries: Int = 3): String = {
    val ld = java.sql.Date.valueOf(loadDate)
    // fetch_metadata: branch FULL vs INCREMENT on the high-water mark
    val mode = if (logsA.maxLoadDate(Seq("SUCCESS")).isEmpty) "FULL" else "INCREMENT"
    logsA.start(runId, ld, "SCHEDULED", mode, s"""{"load_date":"$loadDate"}""")
    logsB.start(runId, ld, "SCHEDULED", mode, s"""{"load_date":"$loadDate"}""")

    val status =
      try {
        extractAndLand(loadDate, api, maxRetries)
        loadReplica(replicaA, Seq(loadDate))
        loadReplica(replicaB, Seq(loadDate))
        "SUCCESS"
      } catch { case _: Exception => "FAILED" }

    logsA.finish(runId, ld, status)
    logsB.finish(runId, ld, status)
    status
  }

  /** Paged extract with checkpoint/resume at (date, page) granularity
    * (ST2): a failed page leaves a checkpoint; the retry resumes from
    * it; exhausted retries clear it (`crime_etl.py:132-168`). */
  private def extractAndLand(loadDate: String, api: ApiSimulator, maxRetries: Int): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      val resumeFrom = checkpoint.read().filter(_.lastDate == loadDate).map(_.lastPage).getOrElse(0)
      try {
        api.fetchPages(loadDate, loadDate, resumeFrom).foreach { case (_, rows) =>
          if (rows.nonEmpty) LandingZone.write(api.toDataFrame(spark, rows), landingRoot, loadDate)
        }
        checkpoint.clear()
        done = true
      } catch {
        case e: ApiPageFetchError =>
          checkpoint.write(CheckpointState(e.date, e.pagenum))
          attempt += 1
          if (attempt > maxRetries) { checkpoint.clear(); throw e }
      }
    }
  }

  /** Landing → transform → idempotent keyed upsert into one replica,
    * partition-scoped by occurrence year (only touched years rewrite). */
  def loadReplica(replicaPath: String, loadDates: Seq[String]): Unit = {
    val raw = LandingZone.read(spark, landingRoot, loadDates)
    val typed = Transform.crimeRecords(raw)
      .withColumn("occ_year", year(col("date_of_occurrence")))
    Upsert.upsertIntoParquet(
      spark, replicaPath, typed,
      keyCols = Seq("crime_id"), versionCol = "source_updated_on", partitionCol = "occ_year")
  }

  /** validate_sync + sync_* (ST5): anti-join the replica logs, replay
    * missed load_dates into the lagging replica, mark RECOVERY rows. */
  def syncRepair(runId: String): Int = {
    val diff = SyncRepair.diff(logsA.read(), logsB.read()).collect()
    diff.foreach { r =>
      val missedDate = r.getDate(0)
      val side = r.getString(1)
      val (log, replica) = if (side == "a") (logsA, replicaA) else (logsB, replicaB)
      log.start(runId, missedDate, "RECOVERY", "INCREMENT", s"""{"recover":"$missedDate"}""")
      loadReplica(replica, Seq(missedDate.toString))
      log.finish(runId, missedDate, "SUCCESS")
    }
    diff.length
  }
}
