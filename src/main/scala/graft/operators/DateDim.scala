package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `date` dimension generator (F8) — reference DDL
  * `airflow/include/sql/postgres/create_date.sql:1-10`: day / month /
  * year / day-of-week (+names) / holiday attributes keyed by date.
  *
  * Generated as `sequence + explode` (one narrow task, no input scan);
  * holiday names come from broadcastable static rules: fixed-date US
  * holidays plus the nth-weekday ("floating") ones — the reference
  * declares the `holiday_name` column but leaves population
  * unspecified, and a crime dashboard groups by exactly these.
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

  /** An nth-weekday-of-month holiday: the day of week `sparkDow`
    * (Spark convention, Sunday = 1) falling in `[firstDay,
    * firstDay+6]` — a 7-day window holds exactly one of each weekday,
    * so "3rd Monday" is the Monday in days 15–21 and "last Monday of
    * May" (31 days) the one in 25–31. */
  final case class FloatingRule(month: Int, sparkDow: Int, firstDay: Int, name: String)

  /** US floating holidays, calendar order. */
  val floatingHolidays: Seq[FloatingRule] = Seq(
    FloatingRule(1, 2, 15, "Martin Luther King Jr. Day"), // 3rd Mon Jan
    FloatingRule(2, 2, 15, "Presidents' Day"),            // 3rd Mon Feb
    FloatingRule(5, 2, 25, "Memorial Day"),               // last Mon May
    FloatingRule(9, 2, 1, "Labor Day"),                   // 1st Mon Sep
    FloatingRule(10, 2, 8, "Columbus Day"),               // 2nd Mon Oct
    FloatingRule(11, 5, 22, "Thanksgiving")               // 4th Thu Nov
  )

  /** The holiday lookup as a SQL CASE over a date expression `d` —
    * shared by every DuckDB oracle twin that replicates the dim
    * (p02, j01), so a rendering change can't drift between them.
    * DuckDB's `dayofweek` is Sunday = 0, Spark's Sunday = 1 — the
    * rendering subtracts 1 from the Spark-convention rule. */
  def holidayCaseSql(d: String = "d"): String = {
    def q(name: String) = name.replace("'", "''")
    val fixed = fixedHolidays.toSeq.sortBy(_._1)
      .map { case ((m, dd), name) => s"WHEN month($d) = $m AND day($d) = $dd THEN '${q(name)}'" }
    val floating = floatingHolidays.map { r =>
      s"WHEN month($d) = ${r.month} AND dayofweek($d) = ${r.sparkDow - 1} " +
        s"AND day($d) BETWEEN ${r.firstDay} AND ${r.firstDay + 6} THEN '${q(r.name)}'"
    }
    "CASE " + (fixed ++ floating).mkString(" ") + " ELSE NULL END"
  }

  def build(spark: SparkSession, start: String, end: String): DataFrame = {
    // same rule order as holidayCaseSql so the twins can never drift
    // (no date matches two rules today, but order is part of the contract)
    val fixedCases = fixedHolidays.toSeq.sortBy(_._1).map { case ((m, d), name) =>
      (month(col("date")) === m && dayofmonth(col("date")) === d, name)
    }
    val floatingCases = floatingHolidays.map { r =>
      (month(col("date")) === r.month && dayofweek(col("date")) === r.sparkDow &&
        dayofmonth(col("date")).between(r.firstDay, r.firstDay + 6), r.name)
    }
    val holidayCase = (fixedCases ++ floatingCases).foldRight(lit(null).cast("string")) {
      case ((cond, name), rest) => when(cond, lit(name)).otherwise(rest)
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
