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

  /** Open a RUNNING row for (runId, loadDate) — `init_log` semantics. */
  def start(runId: String, loadDate: java.sql.Date, runType: String, mode: String, config: String): Unit =
    upsert(Seq(Row(runId, loadDate, runType, mode, "RUNNING",
      new java.text.SimpleDateFormat("HH:mm:ss").format(new java.util.Date()), null, config)))

  /** Finalize the row — `update_log` semantics. */
  def finish(runId: String, loadDate: java.sql.Date, status: String): Unit = {
    val now = new java.text.SimpleDateFormat("HH:mm:ss").format(new java.util.Date())
    val existing = read().filter(col("run_id") === runId && col("load_date") === loadDate).collect()
    val updated = existing.map(r => Row(r.get(0), r.get(1), r.get(2), r.get(3), status, r.get(5), now, r.get(7)))
    if (updated.nonEmpty) upsert(updated.toIndexedSeq)
  }

  private def upsert(rows: Seq[Row]): Unit = {
    val updates = spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.logs)
      .withColumn("__v", lit(1))
    val target = read().withColumn("__v", lit(0))
    write(Upsert.merge(target, updates, Seq("run_id", "load_date"), "__v").drop("__v"))
  }

  /** A1: high-water mark — max load_date with status in the given set. */
  def maxLoadDate(statuses: Seq[String]): Option[java.sql.Date] = {
    val r = read().filter(col("status").isin(statuses: _*)).agg(max("load_date")).first()
    Option(r.getDate(0))
  }
}
