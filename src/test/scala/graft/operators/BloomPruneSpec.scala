package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom pruning must never drop a joinable row (no false negatives)
  * and should drop most non-joinable ones at the configured fpp. */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("long keys: every matching row survives; most non-matches pruned") {
    val big = spark.range(10000).toDF("k")
    val small = spark.range(0, 10000, 100).toDF("k") // 100 keys
    val pruned = BloomPrune.semiFilter(big, small, "k", "k", expectedKeys = 200L, fpp = 0.01)
    val kept = pruned.as[Long].collect().toSet
    val trueKeys = (0L until 10000L by 100L).toSet
    assert(trueKeys.subsetOf(kept), "false negative: a joinable key was pruned")
    // 9900 non-matches at fpp 0.01 → ~99 expected false positives
    assert(kept.size - trueKeys.size < 500, s"fpp far above configured: ${kept.size}")
  }

  test("string keys and nulls: nulls never join, so they are dropped") {
    val big = Seq(Some("a"), Some("b"), Some("zz"), None).toDF("k")
    val small = Seq("a", "b", "c").toDF("k")
    val kept = BloomPrune.semiFilter(big, small, "k", "k", 10L)
      .as[String].collect().toSet
    assert(Set("a", "b").subsetOf(kept) && !kept.contains(null) && !kept.contains("zz"))
  }

  test("pruned-then-joined equals plain join exactly") {
    val big = spark.range(5000).select($"id".as("k"), ($"id" * 2).as("v"))
    val small = spark.range(0, 5000, 7).select($"id".as("k"), lit("d").as("tag"))
    val plain = big.join(small, "k")
    val bloomed = BloomPrune.semiFilter(big, small, "k", "k", 1000L).join(small, "k")
    assert(bloomed.except(plain).isEmpty && plain.except(bloomed).isEmpty)
  }

  test("the probe is a codegen'd broadcast expression, not a UDF or a plan literal") {
    val big = spark.range(100).toDF("k")
    val small = spark.range(10).toDF("k")
    val p = BloomPrune.semiFilter(big, small, "k", "k", 10L)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_bloom_probe"), s"expected bloom probe in plan:\n$p")
    assert(!p.contains("UDF"), s"probe fell out of codegen into a UDF:\n$p")
    // '*(n)' prefixes mark operators fused into a WholeStageCodegen stage
    assert(p.contains("*(1) Filter graft_bloom_probe"), s"probe not inside codegen:\n$p")
    // the serialized filter must NOT appear as an inline literal — it
    // ships once per executor via broadcast, not per task in the plan
    assert(!p.contains("might_contain(0x"), s"filter bytes inlined into the plan:\n$p")
  }

  test("unsupported key types are rejected loudly") {
    val big = Seq((Seq(1, 2), 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      BloomPrune.semiFilter(big, big, "k", "v", 10L)
    }
  }
}
