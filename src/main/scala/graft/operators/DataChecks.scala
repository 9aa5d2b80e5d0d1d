package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-test operators (A5) — the dbt `unique` / `not_null` schema
  * tests (`dbt/crime_dbt_postgres/models/example/schema.yml:10-21`) as
  * violation-reporting queries.
  *
  * Each check returns a VIOLATION frame (empty ⇒ pass) so callers can
  * inspect, count, or persist offending rows — the dbt failure-rows
  * model. `require*` variants throw on violation for pipeline gating.
  *
  * Scale: uniqueViolations is one map-side-combinable groupBy on the
  * key; notNullViolations is a pushed-down scan filter. Both are single
  * lazy plans.
  */
object DataChecks {

  /** Keys appearing more than once: (key cols..., n_rows). */
  def uniqueViolations(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Rows where any of the given columns is NULL. */
  def notNullViolations(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNull).reduce(_ || _))

  /** Throw if `cols` is not a unique key of `df`. */
  def requireUnique(df: DataFrame, cols: Seq[String]): Unit = {
    val v = uniqueViolations(df, cols).limit(5).collect()
    require(v.isEmpty, s"unique check failed on ${cols.mkString(",")}: ${v.mkString("; ")}")
  }

  /** Throw if any of `cols` contains NULL. */
  def requireNotNull(df: DataFrame, cols: Seq[String]): Unit = {
    val v = notNullViolations(df, cols).limit(5).collect()
    require(v.isEmpty, s"not_null check failed on ${cols.mkString(",")}: ${v.mkString("; ")}")
  }
}
