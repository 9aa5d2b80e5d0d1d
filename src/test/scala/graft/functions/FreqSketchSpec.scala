package graft.functions

import graft.SparkSpec
import graft.plans.GraftExtensions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[FreqSketch]] — the mergeable Misra–Gries heavy-hitters aggregate.
  * Counter values are merge-order-dependent by design, so the assertions
  * pin (a) exactness below capacity, (b) the MG guarantee (presence +
  * error bound) across several partitionings, never raw estimates. */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, cap: Int): Map[String, Long] =
    df.agg(FreqSketchAgg.freqSketch(col("t"), cap).as("sk"))
      .select(explode(col("sk")).as("it"))
      .select("it.token", "it.est").as[(String, Long)].collect().toMap

  test("below capacity the sketch IS the exact count table") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("t")
    for (parts <- Seq(1, 3, 7)) {
      assert(sketch(df.repartition(parts), cap = 8) == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
    }
  }

  test("nulls are ignored") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("t")
    assert(sketch(df, 4) == Map("a" -> 2L))
  }

  test("the MG guarantee holds under every partitioning: presence + error bound") {
    // skewed stream: token i (1..40) appears 41-i times; n = 820
    val rows = (1 to 40).flatMap(i => Seq.fill(41 - i)(s"tok$i"))
    val df = rows.toDF("t")
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val cap = 8
    val bound = n / (cap + 1) // 91
    for (parts <- Seq(1, 2, 5, 13)) {
      val sk = sketch(df.repartition(parts), cap)
      assert(sk.size <= cap)
      exact.foreach { case (t, c) =>
        if (c > bound) assert(sk.contains(t), s"heavy token $t (n=$c) missing at parts=$parts")
        sk.get(t).foreach { est =>
          assert(est <= c, s"$t overestimated: $est > $c")
          assert(est >= c - bound, s"$t underestimated past the bound: $est < $c - $bound")
        }
      }
      // no phantom tokens
      assert(sk.keySet.subsetOf(exact.keySet))
    }
  }

  test("non-string children are implicitly cast, not ClassCastException'd") {
    // ImplicitCastInputTypes: an int child is cast to string at analysis
    // time, so the sketch counts the string forms instead of throwing a
    // raw ClassCastException from update()
    val df = Seq(7, 7, 9).toDF("t")
    assert(sketch(df, 4) == Map("7" -> 2L, "9" -> 1L))
  }

  test("the SQL surface serves the same sketch: graft_freq_sketch") {
    GraftExtensions.install(spark)
    Seq.fill(4)("x").toDF("t").createOrReplaceTempView("fs_in")
    val out = spark.sql("SELECT graft_freq_sketch(t, 4) AS sk FROM fs_in")
      .select(explode(col("sk")).as("it")).select("it.token", "it.est")
      .as[(String, Long)].collect().toList
    assert(out == List(("x", 4L)))
  }
}
