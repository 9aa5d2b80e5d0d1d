package graft.analytics

import graft.SparkSpec

/** Per-model schema tests on the view chain — the dbt `unique`/
  * `not_null` tests (`models/example/schema.yml:10-21`) run inline
  * after each model materializes, halting the chain where dbt would
  * fail the run. */
class ViewsSpec extends SparkSpec {
  import spark.implicits._

  test("checked model chain runs schema tests per model in DAG order") {
    Seq((1, "a"), (2, "b"), (2, "b")).toDF("id", "v").createOrReplaceTempView("src_rows")
    val out = Views.runModelChainChecked(
      spark,
      Seq(
        Views.Model("vm1", "SELECT DISTINCT id, v FROM src_rows", unique = Seq(Seq("id")), notNull = Seq("id", "v")),
        Views.Model("vm2", "SELECT id, upper(v) AS v FROM vm1", unique = Seq(Seq("id")))
      )
    )
    assert(out.count() == 2)
  }

  test("a seeded duplicate fails that model's unique check") {
    Seq((1, "a"), (1, "b")).toDF("id", "v").createOrReplaceTempView("src_dup")
    val ex = intercept[IllegalArgumentException] {
      Views.runModelChainChecked(
        spark,
        Seq(Views.Model("vm_bad", "SELECT id, v FROM src_dup", unique = Seq(Seq("id")))))
    }
    assert(ex.getMessage.contains("unique check failed"))
  }

  test("a NULL in a not_null column fails through the view chain") {
    Seq((Some(1), "a"), (None, "b")).toDF("id", "v").createOrReplaceTempView("src_null")
    intercept[IllegalArgumentException] {
      Views.runModelChainChecked(
        spark,
        Seq(Views.Model("vm_nn", "SELECT id, v FROM src_null", notNull = Seq("id"))))
    }
  }

  test("unchecked runModelChain keeps its original behavior") {
    Seq((1, "a"), (1, "b")).toDF("id", "v").createOrReplaceTempView("src_dup2")
    assert(Views.runModelChain(spark, Seq(("vm_plain", "SELECT id FROM src_dup2"))).count() == 2)
  }
}
