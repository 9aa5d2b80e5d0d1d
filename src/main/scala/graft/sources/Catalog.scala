package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Catalog DDL + listing (S7/S8).
  *
  * Reference: `db_postgres.py:93-111` — `create_table` executes
  * `CREATE TABLE IF NOT EXISTS` from a DDL template; `get_tables`
  * scans `pg_tables`. Spark-native: external parquet tables registered
  * in the session catalog over the warehouse paths, listed via
  * `spark.catalog` — the catalog is metadata only; data stays in the
  * partitioned parquet layout the upsert operator maintains.
  */
object Catalog {

  /** S7: idempotent CREATE TABLE IF NOT EXISTS ... USING PARQUET at an
    * explicit location. `partitionCols` (a subset of the schema) makes
    * the catalog entry partition-aware — callers must
    * `spark.catalog.recoverPartitions` after writing new partition
    * directories so the catalog discovers them. Note `IF NOT EXISTS`
    * semantics (matching the reference's `create_table`): an existing
    * entry is left untouched, including its location. */
  def createTableIfNotExists(
      spark: SparkSession,
      name: String,
      path: String,
      schema: StructType,
      partitionCols: Seq[String] = Nil
  ): Unit = {
    val partClause =
      if (partitionCols.isEmpty) "" else s" PARTITIONED BY (${partitionCols.mkString(", ")})"
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $name (${schema.toDDL}) USING PARQUET$partClause LOCATION '$path'"
    )
  }

  /** S8: table names visible in the current catalog/database. */
  def listTables(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq

  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)
}
