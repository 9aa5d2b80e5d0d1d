package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata star schema (TESTDATA.md).
  *
  * Each table is one parquet file; reads stay lazy so Catalyst pushes
  * filters/projections into the scan (`PushedFilters`/`ReadSchema` in
  * `.explain("formatted")`). At 100 TB these would be multi-file
  * partitioned datasets — nothing here assumes single-file layout.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver-generated parquet stores naive timestamps
    // (isAdjustedToUTC=false), which Spark 4 would otherwise infer as
    // TIMESTAMP_NTZ — breaking timestamp arithmetic (`unix_micros`,
    // RANGE frames, stream-stream interval joins) that requires the
    // instant type. Read them as instants: the session timezone is
    // pinned to UTC (GraftSession), so the wall-clock values are
    // identical to what DuckDB's naive TIMESTAMP oracle sees.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The events table is written with TIMESTAMP(NANOS) parquet type,
    * which Spark 4 refuses to map to TimestampType; read it as a long
    * (legacy conf) and truncate ns → µs explicitly — the same
    * truncation DuckDB applies when casting TIMESTAMP_NS to TIMESTAMP,
    * so the oracle sees identical values. */
  private def eventsRead(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case _ => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsRead(s, d)
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

/** A named engine capability: the Spark program plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query used by
  * the correctness gate. `sql == None` → the driver records a weaker
  * rows-only check (used for approximate/stubbed operators only).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String]
)
