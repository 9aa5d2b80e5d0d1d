package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[KmvSketch]] — the mergeable KMV distinct aggregate. Unlike the
  * MG counters it is DETERMINISTIC in the input set, so the
  * assertions pin exact arrays (not just guarantees) across
  * partitionings — the property the st09 full-hash-match oracle row
  * stands on. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def minima(df: DataFrame, k: Int): Seq[Long] =
    df.agg(KmvSketchAgg.kmvSketch(col("h"), k).as("m"))
      .select(explode(col("m")).as("v")).as[Long].collect().toSeq

  test("below k the sketch IS the distinct hash set, ascending") {
    val df = Seq(5L, 3L, 5L, 9L, 3L, 9L).toDF("h")
    for (parts <- Seq(1, 3, 7))
      assert(minima(df.repartition(parts), k = 8) == Seq(3L, 5L, 9L))
  }

  test("above k it keeps exactly the k smallest distinct values under every partitioning") {
    // shuffled 1..100 with re-deliveries: the sketch must dedupe, not count
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle((1 to 100).flatMap(i => Seq.fill(1 + i % 3)(i.toLong)))
    val df = rows.toDF("h")
    for (parts <- Seq(1, 2, 5, 13))
      assert(minima(df.repartition(parts), k = 10) == (1L to 10L))
  }

  test("nulls are ignored") {
    val df = Seq[Option[Long]](Some(4L), None, Some(2L), None).toDF("h")
    assert(minima(df, k = 4) == Seq(2L, 4L))
  }

  test("the state is deterministic: every partitioning yields the identical array") {
    // 60-bit-scale hashes (the real input shape), exact array equality —
    // the shuffle between partial and final agg exercises
    // serialize/deserialize on every path
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(500)(rnd.nextLong() & ((1L << 60) - 1))
    val df = rows.toDF("h")
    val expected = rows.distinct.sorted.take(16)
    for (parts <- Seq(1, 4, 9, 32))
      assert(minima(df.repartition(parts), k = 16) == expected)
  }

  test("grouped: each group keeps its own k minima") {
    val df = (1L to 40L).map(i => (s"g${i % 2}", i)).toDF("g", "h")
    val out = df.groupBy("g")
      .agg(KmvSketchAgg.kmvSketch(col("h"), 3).as("m"))
      .as[(String, Seq[Long])].collect().toMap
    assert(out("g0") == Seq(2L, 4L, 6L) && out("g1") == Seq(1L, 3L, 5L))
  }

  test("the SQL surface serves the same sketch: graft_kmv_sketch") {
    graft.plans.GraftExtensions.install(spark)
    Seq(9L, 2L, 9L, 5L, 2L).toDF("h").createOrReplaceTempView("kmv_in")
    val out = spark.sql("SELECT graft_kmv_sketch(h, 2) AS m FROM kmv_in")
      .select(explode(col("m")).as("v")).as[Long].collect().toSeq
    assert(out == Seq(2L, 5L))
  }

  test("k >= 2 is required") {
    val df = Seq(1L).toDF("h")
    val e = intercept[IllegalArgumentException] {
      df.agg(KmvSketchAgg.kmvSketch(col("h"), 1)).collect()
    }
    assert(e.getMessage.contains("k >= 2"))
  }
}
