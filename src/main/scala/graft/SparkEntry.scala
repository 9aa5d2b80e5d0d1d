package graft

import graft.analytics.Queries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full declared inventory (SURVEY.md §2.8):
  * the relational surface Q01–Q22 plus dedup (d*), similarity (s*),
  * text analysis (t*), multimodal (m*), streaming batch-twins (st*) and
  * pipeline operators (p*). `oracleSql` carries the DuckDB twin for
  * every query in the inventory (q22's engine-specific HLL registers
  * are gated behind a checkable relative-error contract).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the big orders⋈lineitem revenue aggregation (Q06). */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_large_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.sql.map(q.name -> _)).toMap
}
