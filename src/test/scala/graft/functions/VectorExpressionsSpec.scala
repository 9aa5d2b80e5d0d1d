package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd vector expressions: value contracts and the SQL
  * surface registration (the s01–s14 oracle rows exercise them at
  * corpus scale; these cases pin the per-element semantics and that
  * `graft_sub` reaches SQL like its siblings). */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("subF subtracts element-wise, truncating to the shorter input") {
    val df = Seq(
      (1L, Array(1.5f, -2.0f, 0.25f), Array(0.5f, 1.0f, 0.25f)),
      (2L, Array(3.0f, 4.0f), Array(1.0f, 1.0f, 99.0f)) // shorter left wins
    ).toDF("id", "a", "b")
    val out = df.select($"id", VectorExpressions.subF($"a", $"b").as("d"))
      .as[(Long, Array[Float])].collect().toMap
    assert(out(1L).toSeq == Seq(1.0f, -3.0f, 0.0f))
    assert(out(2L).toSeq == Seq(2.0f, 3.0f))
  }

  test("subF then dotF reproduces the L2 identity") {
    // ||a - b||^2 via the two expressions == expanded dot identity —
    // the exact shape the residual encoder runs
    val df = Seq((Array(1.0f, 2.0f, 3.0f, 4.0f), Array(0.5f, -1.0f, 2.0f, 0.0f)))
      .toDF("a", "b")
    val (viaSub, viaExpand) = df.select(
      VectorExpressions.dotF(
        VectorExpressions.subF($"a", $"b"), VectorExpressions.subF($"a", $"b")).as("s"),
      (VectorExpressions.dotF($"a", $"a") + VectorExpressions.dotF($"b", $"b")
        - lit(2.0) * VectorExpressions.dotF($"a", $"b")).as("e")
    ).as[(Double, Double)].collect().head
    assert(math.abs(viaSub - viaExpand) < 1e-9)
  }

  test("graft_sub is registered on the SQL surface and matches the column API") {
    graft.plans.GraftExtensions.install(spark)
    Seq((Array(1.0f, 2.0f), Array(0.25f, 5.0f))).toDF("a", "b")
      .createOrReplaceTempView("ve_sub_in")
    val sql = spark.sql("SELECT graft_sub(a, b) AS d FROM ve_sub_in")
      .as[Array[Float]].collect().head
    assert(sql.toSeq == Seq(0.75f, -3.0f))
  }
}
