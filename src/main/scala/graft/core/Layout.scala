package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical-layout control for co-located joins (SURVEY.md §4).
  *
  * Bucketing pre-shuffles a table ONCE at write time: both sides of a
  * recurring equi-join written with the same bucket count and keys join
  * with NO runtime Exchange — at 100 TB that turns every fact⋈fact join
  * on the bucket key from a full-table shuffle into a local sort-merge.
  * The trade: bucket layout is fixed at write time, so pick keys by the
  * dominant join in the workload (for the crime model: crime_id for
  * upsert merges; for the star schema: orderkey).
  */
object Layout {

  /** Write `df` as a bucketed (and optionally sorted) external table at
    * `path`, registered as `name` in the session catalog. Joins between
    * tables bucketed the same way on `keyCols` plan without a shuffle
    * (asserted in LayoutSpec). */
  def writeBucketed(
      df: DataFrame,
      name: String,
      path: String,
      buckets: Int,
      keyCols: Seq[String],
      sortCols: Seq[String] = Nil
  ): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w).saveAsTable(name)
  }
}
