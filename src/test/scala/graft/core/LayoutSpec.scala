package graft.core

import graft.SparkSpec

/** Bucketed-layout behavior: equally-bucketed tables join with no
  * runtime shuffle — the co-located-join posture for recurring large
  * joins at scale. */
class LayoutSpec extends SparkSpec {

  test("equally-bucketed tables sort-merge join without an Exchange") {
    val base = java.nio.file.Files.createTempDirectory("bucketed").toString
    val orders = Tables.orders(spark, sf0001)
    val lineitem = Tables.lineitem(spark, sf0001)
    Layout.writeBucketed(orders, "b_orders", s"$base/orders", 8, Seq("o_orderkey"), Seq("o_orderkey"))
    Layout.writeBucketed(lineitem, "b_lineitem", s"$base/lineitem", 8, Seq("l_orderkey"), Seq("l_orderkey"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), spark.table("b_orders")("o_orderkey") === spark.table("b_lineitem")("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      assert(n == lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
