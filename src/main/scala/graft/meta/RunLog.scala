package graft.meta

import graft.core.Schemas
import graft.operators.Upsert
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The pipeline-run metadata table (`logs`) and its status state
  * machine RUNNING → SUCCESS | FAILED (ST6).
  *
  * Reference: row shape and transitions in
  * `airflow/dags/crimeapi/db/postgres/db_postgres.py:38-63` and
  * `airflow/dags/crime_etl.py:106-107, 167-168, 374-375`; times stored
  * as UTC HH:mm:ss strings (`helper.py:18-19`).
  *
  * Stored as a parquet table maintained through [[Upsert.merge]] keyed
  * on (run_id, load_date) — the same operator the warehouse rows use,
  * so log updates are idempotent too.
  */
class RunLog(spark: SparkSession, path: String) {

  def read(): DataFrame =
    if (new java.io.File(path).exists()) spark.read.schema(Schemas.logs).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schemas.logs)

  private def write(df: DataFrame): Unit = {
    val tmp = path + ".tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** UTC wall-clock HH:mm:ss — pinned to UTC regardless of host zone,
    * matching the reference's `datetime.utcnow()` strings
    * (`helper.py:18-19`) and the session's UTC timezone setting. */
  private def utcTime(): String =
    java.time.LocalTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))

  /** Open a RUNNING row for (runId, loadDate) — `init_log` semantics.
    * The run config serializes through `to_json(struct(...))` (F9),
    * mirroring the reference's `json.dumps(config)`
    * (`db_postgres.py:51`, `crime_etl.py:429`). */
  def start(runId: String, loadDate: java.sql.Date, runType: String, mode: String, config: Seq[(String, String)]): Unit = {
    val base = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(runId, loadDate, runType, mode, "RUNNING", utcTime(), null, null))),
      Schemas.logs)
    upsert(base.withColumn("config", to_json(struct(config.map { case (k, v) => lit(v).as(k) }: _*))))
  }

  /** Finalize the row — `update_log` semantics. The update is a lazy
    * filtered plan over the table, not a driver collect. */
  def finish(runId: String, loadDate: java.sql.Date, status: String): Unit =
    upsert(read()
      .filter(col("run_id") === runId && col("load_date") === loadDate)
      .withColumn("status", lit(status))
      .withColumn("end_time", lit(utcTime())))

  private def upsert(updates: DataFrame): Unit = {
    val target = read().withColumn("__v", lit(0))
    write(Upsert.merge(target, updates.withColumn("__v", lit(1)), Seq("run_id", "load_date"), "__v").drop("__v"))
  }

  /** A1: high-water mark — max load_date with status in the given set. */
  def maxLoadDate(statuses: Seq[String]): Option[java.sql.Date] = {
    val r = read().filter(col("status").isin(statuses: _*)).agg(max("load_date")).first()
    Option(r.getDate(0))
  }
}
