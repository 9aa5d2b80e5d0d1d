package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

import java.sql.DriverManager

/** JDBC warehouse sink (S6) — the reference's staging + MERGE load path
  * (`db_postgres.py:158-203`, `db_snowflake.py:173-207`) against any
  * JDBC warehouse: batched staging insert via Spark's JDBC writer, then
  * one server-side `MERGE INTO target USING staging ON keys` with the
  * update/insert clauses generated from the DataFrame's columns
  * (mirroring the dynamic clause building in `db_postgres.py:177-181`),
  * then staging drop (`db_postgres.py:196-203`).
  *
  * Scale: rows move through Spark's partitioned, batched JDBC writer
  * (`numPartitions`/`batchsize` bound txn size exactly like the
  * reference's `load_batchsize`); the merge itself is one set-based
  * server-side statement — no driver materialization. Tested against
  * embedded Derby; the SQL is ANSI MERGE, the staging writer is plain
  * Spark JDBC, so a Postgres/Snowflake URL drops in unchanged.
  */
object Jdbc {

  /** ANSI-ish DDL type for a Spark field (explicit, instead of dialect
    * defaults — e.g. Derby's default string mapping is CLOB, which
    * cannot be a merge key). */
  def sqlType(dt: DataType): String = dt match {
    case StringType    => "VARCHAR(1024)"
    case IntegerType   => "INTEGER"
    case LongType      => "BIGINT"
    case DoubleType    => "DOUBLE"
    case FloatType     => "REAL"
    case BooleanType   => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType      => "DATE"
    case t             => throw new IllegalArgumentException(s"no JDBC mapping for $t")
  }

  private def withConnection[A](url: String)(f: java.sql.Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn)
    finally conn.close()
  }

  private def tableExists(conn: java.sql.Connection, table: String): Boolean = {
    // identifier case folding differs per warehouse (Derby folds up,
    // Postgres folds down) — probe the common foldings
    Seq(table.toUpperCase, table.toLowerCase, table).distinct.exists { t =>
      val rs = conn.getMetaData.getTables(null, null, t, null)
      try rs.next()
      finally rs.close()
    }
  }

  /** S7-over-JDBC: idempotent CREATE TABLE from a Spark schema. */
  def createTableIfNotExists(url: String, table: String, schema: StructType): Unit =
    withConnection(url) { conn =>
      if (!tableExists(conn, table)) {
        val cols = schema.fields.map(f => s"${f.name} ${sqlType(f.dataType)}").mkString(", ")
        conn.createStatement().executeUpdate(s"CREATE TABLE $table ($cols)")
      }
    }

  /** Stage `df` into `staging` (created with explicit types, appended
    * with Spark's batched JDBC writer), MERGE into `target` on
    * `keyCols`, drop the staging table. Matched rows take every non-key
    * column from the staging row — the reference's MERGE shape.
    *
    * ANSI MERGE rejects multiple staging rows matching one target row,
    * so the batch is deduped first: exact duplicates collapse, then
    * keep-latest by `versionCol` when given (the parquet-upsert
    * contract) — with same-key-SAME-version conflicting payloads
    * rejected loudly (an arbitrary winner would make warehouse contents
    * nondeterministic). Without a version column, any same-key conflict
    * correctly fails loud in the MERGE itself. The staging table is
    * dropped even when the MERGE throws (without masking the MERGE's
    * own exception). */
  def upsert(
      df: DataFrame,
      url: String,
      target: String,
      keyCols: Seq[String],
      versionCol: Option[String] = None,
      batchSize: Int = 1000
  ): Unit = {
    val batch = versionCol match {
      case Some(v) =>
        val d = df.distinct()
        val ambiguous = d.groupBy((keyCols :+ v).map(org.apache.spark.sql.functions.col): _*)
          .count().filter(org.apache.spark.sql.functions.col("count") > 1).limit(5).collect()
        require(ambiguous.isEmpty,
          s"ambiguous batch: same (${keyCols.mkString(",")}, $v) with different payloads: ${ambiguous.mkString("; ")}")
        graft.operators.Dedup.keepLatest(d, keyCols, v, v)
      case None => df.distinct()
    }
    val staging = s"stg_$target"
    createTableIfNotExists(url, target, df.schema)
    withConnection(url) { conn =>
      if (tableExists(conn, staging)) conn.createStatement().executeUpdate(s"DROP TABLE $staging")
    }
    createTableIfNotExists(url, staging, df.schema)
    batch.write
      .mode(SaveMode.Append)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", staging)
      .option("batchsize", batchSize)
      .save()
    val dataCols = df.columns.filterNot(keyCols.contains)
    val on = keyCols.map(k => s"t.$k = s.$k").mkString(" AND ")
    val sets = dataCols.map(c => s"t.$c = s.$c").mkString(", ")
    val insertCols = df.columns.mkString(", ")
    val insertVals = df.columns.map(c => s"s.$c").mkString(", ")
    withConnection(url) { conn =>
      var mergeError: Throwable = null
      try
        conn.createStatement().executeUpdate(
          s"""MERGE INTO $target t USING $staging s ON $on
             |WHEN MATCHED THEN UPDATE SET $sets
             |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin)
      catch { case t: Throwable => mergeError = t }
      try conn.createStatement().executeUpdate(s"DROP TABLE $staging")
      catch { case d: Throwable => if (mergeError == null) throw d } // never mask the MERGE's error
      if (mergeError != null) throw mergeError
    }
  }

  /** Read a JDBC table back as a DataFrame. */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()
}
