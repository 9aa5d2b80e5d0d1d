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

  /** Path of a table's key→partition sidecar (the "keymap"): one row
    * per key holding the key columns and the key's CURRENT partition
    * value, partitioned like the table itself so its maintenance is
    * partition-scoped too. Size ∝ key count × (key width + partition
    * width) — orders of magnitude smaller than the table. */
  def keymapPath(tablePath: String): String = tablePath + ".keymap"

  /** Partitions OUTSIDE `updatedParts` that still hold an old version
    * of one of this batch's keys, computed against the keymap sidecar —
    * NOT the table. This is the query that used to be a per-batch
    * complement scan of the whole table; exposed so the spec can assert
    * its physical plan only ever reads `<table>.keymap`. */
  private[graft] def stalePartitionsFrame(
      spark: SparkSession,
      tablePath: String,
      updates: DataFrame,
      keyCols: Seq[String],
      partitionCol: String,
      updatedParts: Seq[Any]
  ): DataFrame = {
    // no broadcast hint: batches are usually small and AQE broadcasts
    // them; a huge backfill's key set must be free to sort-merge
    val updKeys = updates.select(keyCols.map(col): _*).distinct()
    // coalesce: for a null-partition keymap row the isin half of the
    // filter is NULL, and !NULL is NULL — which would silently drop the
    // row and leave a duplicate behind when a key moves OUT of the null
    // partition; NULL must read as "not an updated partition" instead
    spark.read.parquet(keymapPath(tablePath))
      .filter(!coalesce(partitionFilter(partitionCol, updatedParts), lit(false)))
      .join(updKeys, keyCols, "left_semi")
      .select(partitionCol).distinct()
  }

  /** Replace the `touched` partition directories of `basePath` with
    * their freshly-written counterparts under `tmpPath` (a touched
    * partition absent from tmp lost all its rows — its stale directory
    * is removed). */
  private[operators] def swapPartitions(
      fs: org.apache.hadoop.fs.FileSystem,
      basePath: String,
      tmpPath: String,
      partitionCol: String,
      touched: Seq[Any]
  ): Unit = touched.foreach { v =>
    val part = partitionDir(partitionCol, v)
    val dst = new org.apache.hadoop.fs.Path(s"$basePath/$part")
    val src = new org.apache.hadoop.fs.Path(s"$tmpPath/$part")
    if (fs.exists(dst) && !fs.delete(dst, true))
      throw new java.io.IOException(s"upsert swap: failed to delete stale $dst")
    if (fs.exists(src) && !fs.rename(src, dst))
      throw new java.io.IOException(s"upsert swap: failed to rename $src -> $dst")
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
    * is found by semi-joining the batch keys against the [[keymapPath
    * keymap sidecar]] — a per-key (key, partition) map maintained by
    * the same tmp-write + directory-swap as the table — NEVER by
    * scanning the table's complement partitions: at 100 TB a
    * complement scan per micro-batch is a full-table read, while the
    * keymap is proportional to the key count. Pass
    * `trackPartitionMoves = false` when the partition value of a key
    * can never change (e.g. a constant partition column) — it skips
    * stale detection; the sidecar is still maintained once it exists,
    * so later tracked calls stay correct across mixed-mode usage.
    *
    * Keymap lifecycle: built lazily from a one-time column-pruned table
    * scan when absent (legacy tables) — written under the tmp name and
    * renamed into place, so a half-built map is never visible under
    * `kmDir`; updated partition-scoped per batch. Write ordering is
    * data-tmp, keymap-tmp, data swap, keymap swap — a leftover keymap
    * tmp on entry therefore means a crash landed mid-build or between
    * the two swaps, and the keymap is rebuilt from the table (which is
    * always authoritative) before use.
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
    val kmDir = keymapPath(tablePath)
    val kmTmp = kmDir + ".tmp-upsert"
    val keymapCols = (keyCols :+ partitionCol).map(col)
    val updatedParts = updates.select(partitionCol).distinct().collect().map(_.get(0)).toSeq
    if (updatedParts.isEmpty) return Seq.empty // empty update batch
    // bootstrap also when the path is an EMPTY directory (catalog DDL
    // pre-creates external-table locations before the first load)
    if (!fs.exists(path) || fs.listStatus(path).isEmpty) {
      val merged = merge(updates.filter(lit(false)), updates, keyCols, versionCol).cache()
      merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(tablePath)
      if (trackPartitionMoves) {
        // tmp + rename, same as the legacy build below: a crash during
        // the keymap job's commit could otherwise leave a
        // partial-but-readable map directly under kmDir with no
        // leftover tmp, so the self-heal would never trigger and later
        // runs would trust an incomplete map (missed stale partitions
        // → duplicate keys). With the tmp protocol a half-written map
        // is never visible under kmDir.
        merged.select(keymapCols: _*)
          .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(kmTmp)
        // a keymap orphaned by an externally-deleted table would make
        // the rename nest kmTmp INSIDE it (Hadoop rename-into-dir)
        fs.delete(new org.apache.hadoop.fs.Path(kmDir), true)
        if (!fs.rename(new org.apache.hadoop.fs.Path(kmTmp), new org.apache.hadoop.fs.Path(kmDir)))
          throw new java.io.IOException(s"upsert: failed to rename bootstrap keymap $kmTmp -> $kmDir")
      }
      merged.unpersist()
      return updatedParts
    }
    // self-heal: a leftover keymap tmp means a prior run may have died
    // between the data swap and the keymap swap — drop the (possibly
    // half-swapped) keymap and rebuild from the authoritative table
    if (fs.exists(new org.apache.hadoop.fs.Path(kmTmp))) {
      fs.delete(new org.apache.hadoop.fs.Path(kmTmp), true)
      fs.delete(new org.apache.hadoop.fs.Path(kmDir), true)
    }
    if (trackPartitionMoves && !fs.exists(new org.apache.hadoop.fs.Path(kmDir))) {
      // one-time build for legacy/recovered tables: column-pruned scan.
      // Built under the tmp name and renamed into place — a direct
      // write could crash half-done and the next run would silently
      // trust the partial map (missed stale partitions → duplicate
      // keys); a leftover tmp instead trips the self-heal above.
      spark.read.parquet(tablePath).select(keymapCols: _*)
        .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(kmTmp)
      if (!fs.rename(new org.apache.hadoop.fs.Path(kmTmp), new org.apache.hadoop.fs.Path(kmDir)))
        throw new java.io.IOException(s"upsert: failed to rename keymap build $kmTmp -> $kmDir")
    }
    // keep an existing keymap current even on untracked batches, so a
    // later tracked call never consults a map missing these inserts
    val maintainKeymap =
      trackPartitionMoves || fs.exists(new org.apache.hadoop.fs.Path(kmDir))
    val staleParts =
      if (!trackPartitionMoves) Seq.empty
      else stalePartitionsFrame(spark, tablePath, updates, keyCols, partitionCol, updatedParts)
        .collect().map(_.get(0)).toSeq
    val touched = (updatedParts ++ staleParts).distinct
    val target = spark.read.parquet(tablePath).filter(partitionFilter(partitionCol, touched))
    val merged = merge(target, updates, keyCols, versionCol).cache()
    val tmp = tablePath + ".tmp-upsert"
    merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(tmp)
    if (maintainKeymap)
      merged.select(keymapCols: _*)
        .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(kmTmp)
    merged.unpersist()
    swapPartitions(fs, tablePath, tmp, partitionCol, touched)
    if (maintainKeymap) swapPartitions(fs, kmDir, kmTmp, partitionCol, touched)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    fs.delete(new org.apache.hadoop.fs.Path(kmTmp), true)
    touched
  }
}
