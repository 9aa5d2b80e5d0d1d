package graft.operators

import graft.SparkSpec
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** [[Sketch]] — mergeable KMV sketches and the cross-corpus overlap
  * estimator. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def elems(rows: (String, String)*) =
    rows.toDF("corp", "gram")

  test("kmvMinima keeps exactly the k smallest hashes per group") {
    val df = elems((1 to 40).map(i => ("A", s"e$i")) ++ (1 to 3).map(i => ("B", s"x$i")): _*)
    val sk = Sketch.kmvMinima(df, "gram", "corp", seed = 3, k = 5)
    // brute-force truth: hash every distinct element, sort, take 5
    val truth = (1 to 40).map(i => s"e$i").toDF("gram")
      .select(Hashing.md5Long(concat(lit("cap:"), col("gram")), 3).as("h"))
      .orderBy("h").limit(5).as[Long].collect().toSet
    val got = sk.filter($"corp" === "A").select("h").as[Long].collect()
    assert(got.toSet == truth && got.length == 5)
    // B has fewer than k distinct elements: the sketch IS the set
    assert(sk.filter($"corp" === "B").count() == 3)
  }

  test("a corpus overlapped with itself estimates Jaccard 1") {
    val df = elems((1 to 30).flatMap(i => Seq(("A", s"e$i"), ("B", s"e$i"))): _*)
    val sk = Sketch.kmvMinima(df, "gram", "corp", seed = 3, k = 16)
    val r = Sketch.kmvOverlap(sk, "corp", "A", "B", 16).head()
    assert(r.getAs[Long]("jaccard_e6") == 1000000L)
    assert(r.getAs[Long]("matches") == r.getAs[Long]("n_k"))
    assert(r.getAs[Long]("d_a") == r.getAs[Long]("d_b"))
  }

  test("a group absent from the sketch fails loudly, not with zero rows") {
    val df = elems((1 to 5).map(i => ("A", s"e$i")) ++ (1 to 5).map(i => ("B", s"x$i")): _*)
    val sk = Sketch.kmvMinima(df, "gram", "corp", seed = 3, k = 8)
    val e = intercept[IllegalArgumentException] {
      Sketch.kmvOverlap(sk, "corp", "A", "C", 8).head()
    }
    assert(e.getMessage.contains("'C'"))
  }

  test("disjoint corpora estimate Jaccard 0 and report exactly below k") {
    val df = elems((1 to 10).map(i => ("A", s"a$i")) ++ (1 to 12).map(i => ("B", s"b$i")): _*)
    val sk = Sketch.kmvMinima(df, "gram", "corp", seed = 5, k = 64)
    val r = Sketch.kmvOverlap(sk, "corp", "A", "B", 64).head()
    // everything below k: sketches are the sets, the estimate is exact
    assert(r.getAs[Long]("matches") == 0L && r.getAs[Long]("jaccard_e6") == 0L)
    assert(r.getAs[Long]("d_union") == 22L)
    assert(r.getAs[Long]("d_a") == 10L && r.getAs[Long]("d_b") == 12L)
    assert(r.getAs[Long]("inter_est") == 0L)
  }

  test("below k the overlap report is exact: half-shared corpora") {
    // A = s1..s20 ∪ a1..a20, B = s1..s20 ∪ b1..b20: J = 20/60, C = 1/2
    val df = elems(
      (1 to 20).flatMap(i => Seq(("A", s"s$i"), ("B", s"s$i"))) ++
        (1 to 20).map(i => ("A", s"a$i")) ++ (1 to 20).map(i => ("B", s"b$i")): _*)
    val sk = Sketch.kmvMinima(df, "gram", "corp", seed = 7, k = 128)
    val r = Sketch.kmvOverlap(sk, "corp", "A", "B", 128).head()
    assert(r.getAs[Long]("n_k") == 60L && r.getAs[Long]("matches") == 20L)
    assert(r.getAs[Long]("jaccard_e6") == 20L * 1000000L / 60L)
    assert(r.getAs[Long]("inter_est") == 20L)
    assert(r.getAs[Long]("contain_a_e6") == 500000L)
    assert(r.getAs[Long]("contain_b_e6") == 500000L)
  }

  test("the sketch is a servable stored artifact: cold parquet round trip") {
    val df = elems(
      (1 to 200).flatMap(i => Seq(("A", s"s$i"), ("B", s"s$i"))) ++
        (1 to 100).map(i => ("A", s"a$i")) ++ (1 to 100).map(i => ("B", s"b$i")): _*)
    val sk = Sketch.kmvMinima(df, "gram", "corp", seed = 13, k = 32)
    val dir = java.nio.file.Files.createTempDirectory("kmv_sketch").toString
    sk.write.mode("overwrite").parquet(dir)
    val cold = spark.read.parquet(dir)
    val live = Sketch.kmvOverlap(sk, "corp", "A", "B", 32).collect().toSeq
    val served = Sketch.kmvOverlap(cold, "corp", "A", "B", 32).collect().toSeq
    assert(live == served)
  }

  test("mg fold below capacity is exact and equals the one-shot sketch") {
    val batches = Seq(Seq("a", "a", "b"), Seq("a", "c"), Seq("b", "b", "c"))
    val folded = batches
      .map(ts => Sketch.mgSketch(ts.toDF("token"), "token", 8))
      .reduce((s, t) => Sketch.mgCombine(s, t, 8))
      .as[(String, Long)].collect().toMap
    assert(folded == Map("a" -> 3L, "b" -> 3L, "c" -> 2L))
  }

  test("a long mg fold chain stays analyzable (linear, not exponential, plan growth)") {
    // r15 regression: the crossJoin threshold form referenced the
    // merged table twice, so k chained folds embedded ~2^k copies of
    // the upstream plan — 24 folds would hang analysis. The window
    // form must compose a 24-deep lazy chain and still be exact.
    val folded = (1 to 24)
      .map(i => Sketch.mgSketch(Seq(s"w${i % 3}").toDF("token"), "token", 8))
      .reduce((s, t) => Sketch.mgCombine(s, t, 8))
      .as[(String, Long)].collect().toMap
    assert(folded == Map("w0" -> 8L, "w1" -> 8L, "w2" -> 8L))
  }

  test("a long quantile fold chain stays analyzable (linear, not exponential, plan growth)") {
    // the mgCombine lesson applied from day one: qsPrune references its
    // input exactly once (thresholds and error totals ride windows over
    // the same reference), so a 24-deep lazy qsCombine chain must
    // analyze and run — and stay exact: every batch value is 1..4, so
    // with k=8 nothing is ever pruned and the fold is the exact
    // weighted value table with err 0.
    val folded = (1 to 24)
      .map(i => Sketch.qsSummarize(
        Seq(("g", (i % 4 + 1).toLong)).toDF("grp", "v"), "v", "grp", k = 8, seed = 1, salts = 2))
      .reduce((a, b) => Sketch.qsCombine(a, b, "grp", 8))
      .select("value", "w", "carry").as[(Long, Long, Long)].collect()
    assert(folded.map(_._3).sum == 0L) // nothing pruned: err stays 0
    assert(folded.map(r => r._1 -> r._2).toMap == Map(1L -> 6L, 2L -> 6L, 3L -> 6L, 4L -> 6L))
  }

  test("cms never underestimates and is exact without collisions") {
    // wide sketch over a tiny vocab: no bucket collisions, so every
    // estimate equals the exact count; and the one-sided guarantee
    // (est >= exact) is deterministic, not probabilistic
    val stream = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val toks = stream.toDF("token")
    val sk = Sketch.cmsSketch(toks, "token", depth = 3, width = 4096)
    val est = Sketch.cmsEstimate(sk, Seq("a", "b", "c", "zz").toDF("token"), "token", 3, 4096)
      .as[(String, Long)].collect().toMap
    assert(est("a") == 5L && est("b") == 3L && est("c") == 1L)
    assert(est("zz") == 0L)
  }

  test("cms estimates bound the exact counts under heavy collision pressure") {
    // 200 distinct tokens through width 16: collisions everywhere, yet
    // est >= exact must hold for every probe (CMS one-sided error) and
    // est <= exact + N (trivial upper bound) sanity-checks the wiring
    val stream = (1 to 200).flatMap(i => Seq.fill(1 + i % 5)(s"tok$i"))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val toks = stream.toDF("token")
    val sk = Sketch.cmsSketch(toks, "token", depth = 4, width = 16)
    val est = Sketch.cmsEstimate(sk, exact.keys.toSeq.toDF("token"), "token", 4, 16)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t underestimated: ${est(t)} < $c")
      assert(est(t) <= n, s"$t overestimate above the stream size")
    }
  }

  test("cms probe dimensions that mismatch the build fail loudly, not by underestimating") {
    val sk = Sketch.cmsSketch(Seq("a", "b", "a").toDF("token"), "token", depth = 3, width = 64)
    val deep = intercept[IllegalArgumentException](
      Sketch.cmsEstimate(sk, Seq("a").toDF("token"), "token", depth = 5, width = 64))
    assert(deep.getMessage.contains("depth"))
    val narrow = intercept[IllegalArgumentException](
      Sketch.cmsEstimate(sk, Seq("a").toDF("token"), "token", depth = 3, width = 2))
    assert(narrow.getMessage.contains("width"))
  }

  test("cms combine of batch sketches equals the whole-stream sketch") {
    val stream = (1 to 120).map(i => s"w${i % 17}")
    val batches = stream.grouped(37).toSeq
    val whole = Sketch.cmsSketch(stream.toDF("token"), "token", depth = 4, width = 32)
      .as[(Int, Long, Long)].collect().toSet
    val folded = batches
      .map(b => Sketch.cmsSketch(b.toDF("token"), "token", depth = 4, width = 32))
      .reduce(Sketch.cmsCombine)
      .as[(Int, Long, Long)].collect().toSet
    assert(folded == whole)
  }

  test("the mg fold preserves the whole-stream guarantee across batches") {
    // token i appears 31-i times, split round-robin into 4 ingest batches
    val stream = (1 to 30).flatMap(i => Seq.fill(31 - i)(s"w$i"))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val cap = 6
    val bound = n / (cap + 1)
    val batches = stream.zipWithIndex.groupBy(_._2 % 4).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))
    val folded = batches
      .map(ts => Sketch.mgSketch(ts.toDF("token"), "token", cap))
      .reduce((s, t) => Sketch.mgCombine(s, t, cap))
      .as[(String, Long)].collect().toMap
    assert(folded.size <= cap)
    exact.foreach { case (t, c) =>
      if (c > bound) assert(folded.contains(t), s"heavy token $t (n=$c) missing after fold")
      folded.get(t).foreach { est =>
        assert(est <= c && est >= c - bound, s"$t estimate $est outside [${c - bound}, $c]")
      }
    }
    assert(folded.keySet.subsetOf(exact.keySet))
  }

  test("the sketch path approximates a large overlap within KMV error") {
    // 2000 shared + 1000 per side unique: J = 0.5, C = 2/3
    val df = elems(
      (1 to 2000).flatMap(i => Seq(("A", s"s$i"), ("B", s"s$i"))) ++
        (1 to 1000).map(i => ("A", s"a$i")) ++ (1 to 1000).map(i => ("B", s"b$i")): _*)
    val k = 256
    val sk = Sketch.kmvMinima(df, "gram", "corp", seed = 11, k = k)
    val r = Sketch.kmvOverlap(sk, "corp", "A", "B", k).head()
    val j = r.getAs[Long]("jaccard_e6") / 1e6
    assert(math.abs(j - 0.5) < 0.15, s"jaccard estimate $j too far from 0.5")
    val dU = r.getAs[Long]("d_union").toDouble
    assert(math.abs(dU - 4000) / 4000 < 0.25, s"union estimate $dU too far from 4000")
    val inter = r.getAs[Long]("inter_est").toDouble
    assert(math.abs(inter - 2000) / 2000 < 0.35, s"intersection estimate $inter too far from 2000")
  }

  test("kmvCombine: a fold over any batch split equals the whole-corpus build") {
    // the d10 gate property, pinned across seeds and split shapes: the
    // KMV merge is a set union re-trimmed to the k smallest distinct
    // hashes, so fold ≡ whole bit-for-bit
    val rnd = new scala.util.Random(41)
    val rows = (1 to 300).map(i => (s"g${i % 3}", s"e${rnd.nextInt(120)}"))
    val df = elems(rows: _*)
    for (seed <- Seq(3, 17, 29); nBatches <- Seq(2, 4)) {
      val whole = Sketch.kmvMinima(df, "gram", "corp", seed, k = 8)
        .as[(String, Long)].collect().sorted.toSeq
      val batches = (0 until nBatches).map(b =>
        df.filter(abs(hash(col("gram"))) % nBatches === b))
      val folded = batches.map(Sketch.kmvMinima(_, "gram", "corp", seed, k = 8))
        .reduce((a, c) => Sketch.kmvCombine(a, c, "corp", 8))
        .as[(String, Long)].collect().sorted.toSeq
      assert(folded == whole, s"seed=$seed batches=$nBatches")
    }
  }

  test("kmvCombine dedupes a member present in both legs (distinct, not count)") {
    val a = Sketch.kmvMinima(elems(("A", "x"), ("A", "y")), "gram", "corp", 3, 8)
    val merged = Sketch.kmvCombine(a, a, "corp", 8)
    assert(merged.count() == 2, "self-merge must be idempotent")
  }

  test("kmvEstimate off kmvMinima equals Packing.kmvDistinct (same recipe, same digits)") {
    val df = (1 to 200).map(i => (s"g${i % 2}", s"u${i % 90}")).toDF("grp", "id")
    val viaState = Sketch.kmvEstimate(
      Sketch.kmvMinima(df, "id", "grp", seed = 23, k = 16), "grp", 16)
      .as[(String, Long, Long)].collect().sorted.toSeq
    val direct = Packing.kmvDistinct(df, "id", "grp", seed = 23, k = 16)
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(viaState == direct && viaState.nonEmpty)
  }

  test("kmvCombine and kmvEstimate reject a raw (unsketched) DataFrame loudly") {
    val sk = Sketch.kmvMinima(elems(("A", "x")), "gram", "corp", 3, 8)
    val raw = elems(("A", "x"))
    for ((bad, who) <- Seq(
        (() => Sketch.kmvCombine(raw, sk, "corp", 8), "left leg"),
        (() => Sketch.kmvCombine(sk, raw, "corp", 8), "right leg"),
        (() => Sketch.kmvEstimate(raw, "corp", 8), "kmvEstimate"))) {
      val e = intercept[IllegalArgumentException](bad())
      assert(e.getMessage.contains("kmvMinima") && e.getMessage.contains(who.split(" ").head.take(4)),
        s"$who: ${e.getMessage}")
    }
  }

  test("kmvFoldInto: replay is a no-op and changed params fail loudly") {
    val base = java.nio.file.Files.createTempDirectory("kmvfold").toString
    val state = s"$base/state"
    val b0 = elems((1 to 40).map(i => ("A", s"e$i")): _*)
    val b1 = elems((20 to 60).map(i => ("A", s"e$i")): _*)
    Sketch.kmvFoldInto(spark, state, b0, "gram", "corp", seed = 3, k = 8, batchId = Some(0L))
    val after0 = spark.read.parquet(state).as[(String, Long)].collect().sorted.toSeq
    // replayed batch id: the applied-batch watermark short-circuits
    Sketch.kmvFoldInto(spark, state, b1, "gram", "corp", seed = 3, k = 8, batchId = Some(0L))
    assert(spark.read.parquet(state).as[(String, Long)].collect().sorted.toSeq == after0)
    // a real second batch folds, and equals the whole-corpus build
    Sketch.kmvFoldInto(spark, state, b1, "gram", "corp", seed = 3, k = 8, batchId = Some(1L))
    val whole = Sketch.kmvMinima(b0.unionByName(b1), "gram", "corp", 3, 8)
      .as[(String, Long)].collect().sorted.toSeq
    assert(spark.read.parquet(state).as[(String, Long)].collect().sorted.toSeq == whole)
    // params recorded by the first fold are enforced forever after
    for ((k, seed, grp, el) <- Seq((16, 3, "corp", "gram"), (8, 4, "corp", "gram"),
        (8, 3, "gram", "gram"), (8, 3, "corp", "corp"))) {
      val e = intercept[IllegalArgumentException] {
        Sketch.kmvFoldInto(spark, state, b1, el, grp, seed, k, batchId = Some(2L))
      }
      assert(e.getMessage.contains("kmvFoldInto"), s"($k,$seed,$grp,$el): ${e.getMessage}")
    }
  }
}
