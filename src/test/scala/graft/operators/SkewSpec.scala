package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain-join rows and partitions on (key, salt)") {
    // skewed fact side: 90% of rows share one key
    val big = (0 until 1000).map(i => (if (i < 900) "hot" else s"k$i", i)).toDF("key", "x")
    val dims = Seq(("hot", "H"), ("k950", "A"), ("k990", "B")).toDF("key", "label")

    val salted = Skew.saltedJoin(big, dims, "key", 8)
    val plain = big.join(dims, Seq("key"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // the shuffle key includes the salt — that's the whole point
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"expected salted partitioning in plan:\n$plan")
  }
}
