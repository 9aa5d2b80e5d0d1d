package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for every left row, attach the payload of
  * the single latest right row whose time is `<=` the left row's time,
  * per join key — the canonical enrichment for event streams against a
  * slowly-changing source (prices, profile versions, last-seen events).
  *
  * The reference joins its crime facts to the closest date-dimension row
  * by exact key (`/root/reference/dbt/crime_dbt_postgres/models/example/
  * fact_crime.sql`); as-of is the generalization a training-data
  * pipeline needs when the dimension is versioned by time instead of
  * keyed exactly.
  *
  * Spark-first plan shape (what a dedicated as-of merge join would do):
  * tag both sides, UNION them, and run ONE window pass per key ordered
  * by (time, side) carrying the last non-null right payload forward.
  * That is a single Exchange + Sort over |L| + |R| rows — no range
  * explosion, no per-row subquery, and the sort is exactly the
  * partitioning a 1000-executor shuffle would use. Ties (right time ==
  * left time) sort the right row first, giving inclusive `<=` semantics
  * to match ANSI `ASOF JOIN ... ON l.t >= r.t`.
  *
  * Determinism: callers must ensure the right side is unique per
  * (keys, rightTime) — collapse duplicates first (e.g. keep the max id)
  * or the carried payload is order-dependent.
  */
object AsOf {

  /** Left-as-of join. `right`'s non-key columns (including `rightTime`)
    * are carried onto each left row from the latest right row with
    * `rightTime <= leftTime`; left rows with no prior right row keep
    * NULL payloads (LEFT ASOF semantics). Column names of the right
    * payload must not collide with left columns — rename before joining.
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String): DataFrame = {
    val lPay = left.columns.filterNot(keys.contains).toSeq
    val rPay = right.columns.filterNot(keys.contains).toSeq // incl. rightTime
    val clash = lPay.intersect(rPay)
    require(clash.isEmpty, s"as-of payload name clash: ${clash.mkString(", ")}")

    val rTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val lTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    def nullAs(name: String, t: Map[String, org.apache.spark.sql.types.DataType]): Column =
      lit(null).cast(t(name)).as(name)

    val lSide = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        lPay.map(col) ++ rPay.map(nullAs(_, rTypes)): _*)
    val rSide = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        lPay.map(nullAs(_, lTypes)) ++ rPay.map(col): _*)

    // One window, many last() calls: Catalyst collapses same-spec window
    // functions into a single Window operator → one Exchange + one Sort.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rPay.map(c => last(col(c), ignoreNulls = true).over(w).as(c))

    lSide.unionByName(rSide)
      .select(keys.map(col) ++ Seq(col("__side")) ++ lPay.map(col) ++ carried: _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
