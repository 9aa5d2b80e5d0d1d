package graft.operators

import graft.SparkSpec

class DataChecksSpec extends SparkSpec {
  import spark.implicits._

  test("uniqueViolations reports duplicate keys with counts") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("id", "x")
    val v = DataChecks.uniqueViolations(df, Seq("id")).as[(String, Long)].collect()
    assert(v.toSeq == Seq(("a", 2L)))
    assert(DataChecks.uniqueViolations(df.dropDuplicates("id"), Seq("id")).isEmpty)
  }

  test("notNullViolations reports rows with null keys") {
    val df = Seq((Some("a"), 1), (None, 2)).toDF("id", "x")
    val v = DataChecks.notNullViolations(df, Seq("id")).as[(Option[String], Int)].collect()
    assert(v.toSeq == Seq((None, 2)))
  }

  test("require* gate: throws on violation, passes on clean data") {
    val clean = Seq(("a", 1), ("b", 2)).toDF("id", "x")
    DataChecks.requireUnique(clean, Seq("id"))
    DataChecks.requireNotNull(clean, Seq("id"))
    val dup = Seq(("a", 1), ("a", 2)).toDF("id", "x")
    intercept[IllegalArgumentException](DataChecks.requireUnique(dup, Seq("id")))
  }
}
