package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `date` dimension generator (F8) — reference DDL
  * `airflow/include/sql/postgres/create_date.sql:1-10`: day / month /
  * year / day-of-week (+names) / holiday attributes keyed by date.
  *
  * Generated as `sequence + explode` (one narrow task, no input scan);
  * holiday names come from a broadcastable static map (fixed-date US
  * holidays — the reference leaves holiday population unspecified).
  * Intended use is a broadcast dim join (J3): tiny table, never
  * shuffled.
  */
object DateDim {

  /** Fixed-date holidays (month, day) → name. */
  val fixedHolidays: Map[(Int, Int), String] = Map(
    (1, 1)   -> "New Year's Day",
    (7, 4)   -> "Independence Day",
    (11, 11) -> "Veterans Day",
    (12, 25) -> "Christmas Day"
  )

  /** The holiday lookup as a SQL CASE over a date expression `d` —
    * shared by every DuckDB oracle twin that replicates the dim
    * (p02, j01), so a rendering change can't drift between them. */
  def holidayCaseSql(d: String = "d"): String =
    "CASE " + fixedHolidays.toSeq.sortBy(_._1)
      .map { case ((m, dd), name) => s"WHEN month($d) = $m AND day($d) = $dd THEN '${name.replace("'", "''")}'" }
      .mkString(" ") + " ELSE NULL END"

  def build(spark: SparkSession, start: String, end: String): DataFrame = {
    val holidayCase = fixedHolidays.toSeq.sortBy(_._1).foldRight(lit(null).cast("string")) {
      case (((m, d), name), rest) =>
        when(month(col("date")) === m && dayofmonth(col("date")) === d, lit(name)).otherwise(rest)
    }
    spark
      .range(1)
      .select(explode(sequence(lit(start).cast("date"), lit(end).cast("date"), expr("interval 1 day"))).as("date"))
      .select(
        col("date"),
        dayofmonth(col("date")).as("day"),
        month(col("date")).as("month"),
        year(col("date")).as("year"),
        dayofweek(col("date")).as("day_of_week"),
        date_format(col("date"), "MMMM").as("month_name"),
        date_format(col("date"), "EEEE").as("day_of_week_name"),
        holidayCase.as("holiday_name")
      )
  }
}
