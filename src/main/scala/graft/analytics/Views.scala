package graft.analytics

import graft.core.Tables
import graft.operators.DataChecks
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL/temp-view layer (J4) — the reference's dbt model DAG
  * re-expressed on Spark's catalog.
  *
  * Reference: dbt materializes the example models as views in dependency
  * order, later models referencing earlier ones with `ref()`
  * (`dbt/crime_dbt_postgres/models/example/my_second_dbt_model.sql:1-6`,
  * `dbt_project.yml:33-37`). Here: source tables register as temp views
  * once, then [[runModelChain]] materializes each model's SQL as a temp
  * view in order — `spark.sql` resolves refs through the session
  * catalog exactly as dbt resolves `ref()`.
  *
  * Scale note: temp views are pure metadata — each downstream query
  * still compiles to one Catalyst plan over the base parquet scans, so
  * view chaining costs nothing at execution time (filters/projections
  * push through the whole chain).
  */
object Views {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  /** Register every testdata table as a temp view (the dbt "source"
    * layer). Idempotent. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t        => Tables(spark, dir, t).createOrReplaceTempView(t)
    }

  /** A dbt-style model: SQL plus the schema tests dbt attaches per
    * model (`models/example/schema.yml:10-21` declares `unique` and
    * `not_null` on each example model's id). `unique` entries are keys
    * (possibly composite); `notNull` lists columns that must never be
    * NULL. */
  case class Model(
      name: String,
      sql: String,
      unique: Seq[Seq[String]] = Nil,
      notNull: Seq[String] = Nil)

  /** dbt-style model chain: materialize each (name, sql) as a temp view
    * in dependency order; later models reference earlier ones by name.
    * Returns the final model. */
  def runModelChain(spark: SparkSession, models: Seq[(String, String)]): DataFrame =
    runModelChainChecked(spark, models.map { case (n, s) => Model(n, s) })

  /** Model chain with per-model schema tests (dbt `dbt test` run
    * inline after each materialization, as dbt does in DAG order):
    * after each model's view registers, its `unique`/`notNull` checks
    * run and throw on violation — halting the chain exactly where dbt
    * would fail the run. Checks on temp views are lazy plans over the
    * base scans; each check is one aggregation/filter job. */
  def runModelChainChecked(spark: SparkSession, models: Seq[Model]): DataFrame = {
    models.foreach { m =>
      spark.sql(m.sql).createOrReplaceTempView(m.name)
      val df = spark.table(m.name)
      m.unique.foreach(key => DataChecks.requireUnique(df, key))
      if (m.notNull.nonEmpty) DataChecks.requireNotNull(df, m.notNull)
    }
    spark.table(models.last.name)
  }
}
