package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replica-sync reconciliation (J2/ST5) — the reference's
  * `validate_sync` set-difference of successful load_dates between the
  * two warehouses (`airflow/dags/crime_etl.py:377-408`), as anti-joins.
  *
  * Both directions are one `left_anti` each; at scale the `logs` tables
  * are tiny and broadcast automatically.
  */
object SyncRepair {

  /** load_dates SUCCESS in `a` but missing-or-unsuccessful in `b`. */
  def missingIn(a: DataFrame, b: DataFrame): DataFrame = {
    val okA = a.filter(col("status") === "SUCCESS").select("load_date").distinct()
    val okB = b.filter(col("status") === "SUCCESS").select("load_date").distinct()
    okA.join(okB, Seq("load_date"), "left_anti")
  }

  /** Symmetric diff with a direction tag — drives which replica replays
    * which partitions (`crime_etl.py:388-396`). */
  def diff(logsA: DataFrame, logsB: DataFrame): DataFrame =
    missingIn(logsA, logsB)
      .withColumn("missing_in", lit("b"))
      .unionByName(missingIn(logsB, logsA).withColumn("missing_in", lit("a")))
}
