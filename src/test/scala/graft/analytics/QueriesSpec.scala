package graft.analytics

import graft.SparkSpec

/** Smoke for the full declared inventory at sf0.001: every query plans
  * and executes; the structural ones return rows. (Value-level
  * correctness is the driver's DuckDB gate at sf0.01 — see
  * tools/check_correctness.py for the local mimic.) */
class QueriesSpec extends SparkSpec {

  private val mayBeEmpty = Set("q19_exact_dedup", "d01_minhash_lsh", "d02_simhash_pairs",
    "d03_embedding_neardup", "d04_ngram_jaccard")

  Queries.all.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val df = q.fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("every query name is unique and oracle keys are a subset") {
    val names = Queries.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(graft.SparkEntry.queries.keySet))
  }

  test("the driver's entry contract returns rows (the flagship smoke)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
