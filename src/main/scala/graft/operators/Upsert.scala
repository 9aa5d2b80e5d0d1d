package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's upsert/merge operator (J1) — the reference's
  * staging-table + `MERGE INTO crime USING stg_crime ON crime_id`
  * (`airflow/dags/crimeapi/db/postgres/db_postgres.py:158-203`,
  * `db_snowflake.py:173-207`) re-expressed as a single lazy plan.
  *
  * Semantics: matched keys take ALL non-key columns from the update
  * side; unmatched inserts. With a version column, keep-latest wins and
  * the operation is idempotent and order-insensitive (property-tested).
  *
  * Scale design:
  *  - `merge` is one `unionByName` + one window over the key — a single
  *    hash-partitioned shuffle on the merge key, map-side combinable by
  *    AQE; no driver materialization, no staging table;
  *  - [[upsertIntoParquet]] is the storage-level variant: it rewrites
  *    ONLY the partitions that contain touched keys (mirroring the
  *    reference's per-`load_date` replay granularity,
  *    `crime_etl.py:426-444`), then swaps directories atomically-enough
  *    (temp dir + rename) — at 100 TB a merge touching one day's
  *    partitions rewrites one day, not the table.
  */
object Upsert {

  /** Merge updates into target, keep-latest per key by
    * (versionCol desc, tieBreak desc). Update rows win ties so a
    * re-applied batch is a no-op (idempotence). */
  def merge(target: DataFrame, updates: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame = {
    val t = target.withColumn("__src", lit(0))
    val u = updates.withColumn("__src", lit(1))
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc_nulls_last, col("__src").desc)
    t.unionByName(u)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** Full-outer-join merge variant — the literal `MERGE` shape
    * (`db_postgres.py:158-203`): on matched keys EVERY data column is
    * taken from the update row, including explicit NULLs (a per-column
    * coalesce would silently keep the target value when an update sets a
    * column to NULL — not what MERGE does). Useful when target and
    * updates have exactly one row per key already. */
  def mergeFullOuter(target: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    val dataCols = target.columns.filterNot(keyCols.contains)
    val t = target.as("t")
    val u = updates.withColumn("__matched", lit(true)).as("u")
    val cond = keyCols.map(k => t(k) <=> u(k)).reduce(_ && _)
    t.join(u, cond, "full_outer")
      .select(
        keyCols.map(k => coalesce(u(k), t(k)).as(k)) ++
          dataCols.map(c => when(u("__matched"), u(c)).otherwise(t(c)).as(c)): _*
      )
  }

  /** Spark's directory name for a null partition value. */
  val NullPartitionDir = "__HIVE_DEFAULT_PARTITION__"

  /** Directory segment for a partition value, escaped exactly the way
    * Spark's writer escapes it (spaces, ':', '%', … — a raw toString
    * would silently miss the rename for such values). */
  private def partitionDir(partitionCol: String, v: Any): String =
    s"$partitionCol=${
      if (v == null) NullPartitionDir
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v.toString)
    }"

  /** Predicate matching rows whose `partitionCol` is in `values`
    * (NULL-aware: an `isin` list alone never matches NULL). */
  def partitionFilter(partitionCol: String, values: Seq[Any]): Column = {
    val nonNull = values.filter(_ != null)
    ((if (nonNull.nonEmpty) Seq(col(partitionCol).isin(nonNull: _*)) else Nil) ++
      (if (values.contains(null)) Seq(col(partitionCol).isNull) else Nil))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
  }

  /** Partition-scoped parquet upsert: rewrite only the partitions this
    * batch touches; leave the rest untouched. Returns the touched
    * partition values (callers scope their post-load checks to them).
    *
    * With `trackPartitionMoves` (the default), "touched" covers two
    * sets: partitions of the update rows AND partitions still holding
    * an OLD version of an updated key (a key whose partition value
    * changed — e.g. a corrected occurrence date — must vanish from its
    * old partition or the table would carry duplicates). The second set
    * costs one key/partition-column semi-join scan of the
    * complement partitions per batch — column-pruned, and the price of
    * keeping the table keyed; the reference pays the same via its
    * global MERGE. Pass `trackPartitionMoves = false` ONLY when the
    * partition value of a key can never change (e.g. a constant
    * partition column) — it skips that scan entirely.
    *
    * Null partition values are first-class: the target filter matches
    * them with `isNull` and the directory swap uses Spark's
    * `__HIVE_DEFAULT_PARTITION__` name — Transform deliberately maps
    * malformed timestamps to NULL, so null-partition rows must merge,
    * not silently vanish. The bootstrap write (table doesn't exist yet)
    * runs the same keep-latest merge against an empty target so
    * duplicate keys in the very first batch (e.g. a retried load that
    * re-landed pages) collapse too. */
  def upsertIntoParquet(
      spark: SparkSession,
      tablePath: String,
      updates: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      partitionCol: String,
      trackPartitionMoves: Boolean = true
  ): Seq[Any] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val path = new org.apache.hadoop.fs.Path(tablePath)
    val updatedParts = updates.select(partitionCol).distinct().collect().map(_.get(0)).toSeq
    if (updatedParts.isEmpty) return Seq.empty // empty update batch
    // bootstrap also when the path is an EMPTY directory (catalog DDL
    // pre-creates external-table locations before the first load)
    if (!fs.exists(path) || fs.listStatus(path).isEmpty) {
      merge(updates.filter(lit(false)), updates, keyCols, versionCol)
        .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(tablePath)
      return updatedParts
    }
    // complement partitions holding stale versions of this batch's keys
    // (no broadcast hint: batches are usually small and AQE broadcasts
    // them; a huge backfill's key set must be free to sort-merge)
    val staleParts =
      if (!trackPartitionMoves) Seq.empty
      else {
        val updKeys = updates.select(keyCols.map(col): _*).distinct()
        spark.read.parquet(tablePath)
          .filter(!partitionFilter(partitionCol, updatedParts))
          .join(updKeys, keyCols, "left_semi")
          .select(partitionCol).distinct().collect().map(_.get(0)).toSeq
      }
    val touched = (updatedParts ++ staleParts).distinct
    val target = spark.read.parquet(tablePath).filter(partitionFilter(partitionCol, touched))
    val merged = merge(target, updates, keyCols, versionCol).cache()
    val tmp = tablePath + ".tmp-upsert"
    merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(tmp)
    merged.unpersist()
    // swap only the touched partition directories (a touched partition
    // absent from tmp lost all its rows — its stale directory is removed)
    touched.foreach { v =>
      val part = partitionDir(partitionCol, v)
      val dst = new org.apache.hadoop.fs.Path(s"$tablePath/$part")
      val src = new org.apache.hadoop.fs.Path(s"$tmp/$part")
      if (fs.exists(dst) && !fs.delete(dst, true))
        throw new java.io.IOException(s"upsert swap: failed to delete stale $dst")
      if (fs.exists(src) && !fs.rename(src, dst))
        throw new java.io.IOException(s"upsert swap: failed to rename $src -> $dst")
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    touched
  }
}
