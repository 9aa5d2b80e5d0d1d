package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // eval doc 0 shares a 3-gram run with doc 1 (contaminated), doc 2 is
  // clean, doc 3 is too short for any 3-gram, doc 4 is an exact copy of
  // the eval doc (fully contaminated).
  private def docs = Seq(
    (0L, "alpha beta gamma delta epsilon"),
    (1L, "alpha beta gamma zeta eta theta iota kappa lambda mu"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "xy zz"),
    (4L, "alpha beta gamma delta epsilon")
  ).toDF("doc_id", "text")

  private def run =
    Decontaminate
      .ngramContamination(docs, "doc_id", "text", n = 3, isEval = col("doc_id") === 0)
      .select("doc_id", "n_grams", "n_hit", "contam_e6", "contaminated")
      .as[(Long, Long, Long, Long, Int)]
      .collect()
      .map(r => r._1 -> r)
      .toMap

  test("eval docs are excluded from the output") {
    assert(!run.contains(0L))
  }

  test("overlapping doc counts its shared distinct grams and flags at >= 10%") {
    // doc 1: 8 distinct 3-grams, exactly one ("alpha beta gamma") in eval
    assert(run(1L) == ((1L, 8L, 1L, 125000L, 1)))
  }

  test("clean doc reports zero hits and no flag") {
    assert(run(2L) == ((2L, 8L, 0L, 0L, 0)))
  }

  test("doc shorter than n reports zero grams and clean") {
    assert(run(3L) == ((3L, 0L, 0L, 0L, 0)))
  }

  test("exact copy of an eval doc is fully contaminated") {
    assert(run(4L) == ((4L, 3L, 3L, 1000000L, 1)))
  }

  test("the eval-gram side is broadcast (train side never shuffles by gram)") {
    val plan = Decontaminate
      .ngramContamination(docs, "doc_id", "text", n = 3, isEval = col("doc_id") === 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"))
  }
}
