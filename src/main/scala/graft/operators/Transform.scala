package graft.operators

import graft.core.Schemas
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed row of the warehouse `crime` table (SURVEY.md §1.2) — the
  * `Dataset[CrimeRecord]` surface for callers who want compile-time
  * column safety; the untyped [[Transform.crimeRecords]] frame remains
  * the primary (schema-driven) API. */
final case class CrimeRecord(
    crime_id: String,
    case_num: Option[String],
    date_of_occurrence: Option[java.sql.Timestamp],
    block: Option[String],
    iucr: Option[String],
    primary_description: Option[String],
    secondary_description: Option[String],
    location_description: Option[String],
    arrest: Option[Boolean],
    domestic: Option[Boolean],
    beat: Option[Int],
    district: Option[Int],
    ward: Option[Int],
    community_area: Option[Int],
    fbi_code: Option[String],
    x_coordinate: Option[Int],
    y_coordinate: Option[Int],
    latitude: Option[Double],
    longitude: Option[Double],
    source_updated_on: Option[java.sql.Timestamp]
)

/** The landing-zone → warehouse record transform (P1–P4).
  *
  * Reference semantics: `airflow/dags/crimeapi/transform.py:6-48` —
  * drop 15 raw columns, rename 6, NaN→NULL — plus the implicit typing
  * the reference delegates to the warehouse DDL
  * (`create_crime.sql:1-22`). Here the whole chain is one narrow
  * projection: no shuffle, fully codegen'd, malformed values become
  * NULL (PERMISSIVE), and Catalyst prunes the dropped columns out of
  * the scan entirely.
  */
object Transform {

  /** Raw Socrata frame (all-string) → typed `crime` frame. */
  def crimeRecords(raw: DataFrame): DataFrame = {
    val kept = raw.drop(Schemas.droppedCols.filter(raw.columns.contains): _*)
    val renamed = kept.withColumnsRenamed(Schemas.renames)
    // typed cast per target schema; timestamps arrive as
    // yyyy-MM-dd'T'HH:mm:ss.SSS (helper.py:12-16)
    // try_* variants keep the malformed→NULL contract even under Spark 4
    // ANSI mode (plain to_timestamp/cast would throw on bad input)
    val casts = Schemas.crime.fields.map { f =>
      val c = col(f.name)
      val cast = f.dataType match {
        case TimestampType => try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSS"))
        case BooleanType   => when(lower(c) === "true", true).when(lower(c) === "false", false)
        case dt            => c.try_cast(dt)
      }
      cast.as(f.name)
    }
    renamed.select(casts.toIndexedSeq: _*)
  }

  /** Typed variant: same transform, `Dataset[CrimeRecord]` out. The
    * encoder verifies the schema contract at conversion time, so a
    * drifted column name/type fails here instead of deep in a plan. */
  def crimeDataset(raw: DataFrame): Dataset[CrimeRecord] = {
    val spark = raw.sparkSession
    import spark.implicits._
    crimeRecords(raw).as[CrimeRecord]
  }
}
