package graft.operators

import graft.SparkSpec

/** Property-style tests mirroring SURVEY.md §5.3: upsert idempotence and
  * order-insensitivity of keep-latest, over seeded random batches (plain
  * deterministic generation — the scalatest/scalacheck bridge artifact
  * is not on the offline classpath). */
class UpsertProps extends SparkSpec {
  import spark.implicits._

  private def randBatch(rnd: scala.util.Random, n: Int): Seq[(String, Int, String)] =
    Seq.fill(n)((s"k${rnd.nextInt(9)}", rnd.nextInt(100), s"p${rnd.nextInt(10000)}"))

  // one row per (key, version) with a deterministic payload so
  // keep-latest is well-defined
  private def mk(rows: Seq[(String, Int, String)]) =
    rows.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("id", "v", "payload")

  test("upsert(upsert(T,U),U) == upsert(T,U) over 10 random batches") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val t = mk(randBatch(rnd, 20))
      val u = mk(randBatch(rnd, 20))
      val once = Upsert.merge(t, u, Seq("id"), "v")
      val twice = Upsert.merge(once, u, Seq("id"), "v")
      assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
    }
  }

  test("keepLatest is insensitive to input row order") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      val rows = randBatch(rnd, 25).zipWithIndex
        .map { case ((k, v, p), i) => (k, v, s"$p-$i") }
      val df = rows.toDF("id", "v", "payload")
      val a = Dedup.keepLatest(df, Seq("id"), "v", "payload")
      val b = Dedup.keepLatest(df.orderBy($"payload".desc), Seq("id"), "v", "payload")
      assert(a.except(b).isEmpty && b.except(a).isEmpty)
    }
  }
}
