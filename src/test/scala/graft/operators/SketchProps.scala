package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style tests of the sketch guarantee claims (seeded random
  * inputs, DedupProps style):
  *
  *  - KMV overlap is claimed EXACT whenever both corpora fit the
  *    sketch (the sketch IS the set) — verified against driver-side
  *    exact set arithmetic over random corpus pairs.
  *  - The KMV estimates are claimed within standard-error bounds at
  *    the configured k — verified loosely (4/√k) over random big
  *    corpora.
  *  - The table-level Misra–Gries fold is claimed to preserve the
  *    whole-stream guarantee for ANY batch split and capacity —
  *    verified against driver-side exact counts over random streams,
  *    splits, and caps.
  */
class SketchProps extends SparkSpec {
  import spark.implicits._

  test("kmvOverlap is exact below k over random corpus pairs (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val universe = (0 until 60).map(i => s"e$i")
      val setA = universe.filter(_ => rnd.nextBoolean()).toSet
      val setB = universe.filter(_ => rnd.nextBoolean()).toSet
      if (setA.nonEmpty && setB.nonEmpty) {
        val df = (setA.toSeq.map(("A", _)) ++ setB.toSeq.map(("B", _))).toDF("corp", "gram")
        val k = 128 // both sets fit: estimates must be exact
        val sk = Sketch.kmvMinima(df, "gram", "corp", seed = seed, k = k)
        val r = Sketch.kmvOverlap(sk, "corp", "A", "B", k).head()
        val inter = (setA & setB).size.toLong
        val union = (setA | setB).size.toLong
        assert(r.getAs[Long]("matches") == inter, s"seed $seed: matches")
        assert(r.getAs[Long]("n_k") == union)
        assert(r.getAs[Long]("d_union") == union)
        assert(r.getAs[Long]("d_a") == setA.size.toLong && r.getAs[Long]("d_b") == setB.size.toLong)
        assert(r.getAs[Long]("inter_est") == inter)
        assert(r.getAs[Long]("jaccard_e6") == inter * 1000000L / union)
      }
    }
  }

  test("kmv estimates stay within 4/sqrt(k) relative error over random big corpora (3 seeds)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(100 + seed)
      val shared = (0 until 1500).map(i => s"s$i")
      val onlyA = (0 until 500 + rnd.nextInt(1000)).map(i => s"a$i")
      val onlyB = (0 until 500 + rnd.nextInt(1000)).map(i => s"b$i")
      val df = ((shared ++ onlyA).map(("A", _)) ++ (shared ++ onlyB).map(("B", _))).toDF("corp", "gram")
      val k = 256
      val tol = 4.0 / math.sqrt(k) // ~0.25: loose enough to never flake, tight enough to mean something
      val sk = Sketch.kmvMinima(df, "gram", "corp", seed = seed, k = k)
      val r = Sketch.kmvOverlap(sk, "corp", "A", "B", k).head()
      val trueUnion = (shared.size + onlyA.size + onlyB.size).toDouble
      val trueJ = shared.size / trueUnion
      assert(math.abs(r.getAs[Long]("d_union") - trueUnion) / trueUnion < tol,
        s"seed $seed: d_union ${r.getAs[Long]("d_union")} vs $trueUnion")
      assert(math.abs(r.getAs[Long]("jaccard_e6") / 1e6 - trueJ) < tol,
        s"seed $seed: jaccard ${r.getAs[Long]("jaccard_e6") / 1e6} vs $trueJ")
    }
  }

  test("the MG fold preserves the guarantee for random streams, splits and caps (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(200 + seed)
      // zipf-ish stream over a small token universe
      val stream = (0 until 600).map { _ =>
        val r = rnd.nextDouble()
        if (r < 0.45) s"hot${rnd.nextInt(3)}"
        else if (r < 0.8) s"warm${rnd.nextInt(10)}"
        else s"cold${rnd.nextInt(60)}"
      }
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = stream.size.toLong
      val cap = 3 + rnd.nextInt(10)
      val nBatches = 1 + rnd.nextInt(5)
      val bound = n / (cap + 1)
      val folded = stream.zipWithIndex.groupBy(_._2 % nBatches).toSeq.sortBy(_._1)
        .map(_._2.map(_._1))
        .map(ts => Sketch.mgSketch(ts.toDF("token"), "token", cap))
        .reduce((a, b) => Sketch.mgCombine(a, b, cap))
        .as[(String, Long)].collect().toMap
      assert(folded.size <= cap, s"seed $seed: size ${folded.size} > cap $cap")
      assert(folded.keySet.subsetOf(exact.keySet))
      exact.foreach { case (t, c) =>
        if (c > bound)
          assert(folded.contains(t), s"seed $seed cap $cap batches $nBatches: heavy $t (n=$c) missing")
        folded.get(t).foreach { est =>
          assert(est <= c && est >= c - bound,
            s"seed $seed cap $cap: $t est $est outside [${c - bound}, $c]")
        }
      }
    }
  }

  test("quantile fold preserves the rank guarantee for random streams, splits, k and salts (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(400 + seed)
      val n = 300 + rnd.nextInt(500)
      // clustered values so equal-value merges are exercised
      val vals = (0 until n).map(_ => (rnd.nextInt(40) * 7 + rnd.nextInt(3)).toLong)
      val k = 4 + rnd.nextInt(29)
      val salts = 1 + rnd.nextInt(4)
      val nBatches = 1 + rnd.nextInt(5)
      val batches = vals.zipWithIndex.groupBy(_._2 % nBatches).toSeq.sortBy(_._1)
        .map(_._2.map(_._1))
      val folded = batches
        .map(b => Sketch.qsSummarize(b.map(v => ("g", v)).toDF("grp", "v"), "v", "grp",
          k, seed, salts))
        .reduce((a, b) => Sketch.qsCombine(a, b, "grp", k))
      val rows = folded.select("value", "w", "carry").as[(Long, Long, Long)].collect()
      val err = rows.map(_._3).sum
      assert(rows.map(_._2).sum == n, s"seed $seed: weight not conserved")
      assert(rows.length <= k + 1, s"seed $seed: ${rows.length} rows > k+1=${k + 1}")
      val sorted = vals.sorted
      def rExact(x: Long) = sorted.count(_ <= x).toLong
      def rSumm(x: Long) = rows.filter(_._1 <= x).map(_._2).sum
      (vals.distinct ++ Seq(vals.min - 1, vals.max + 1)).foreach { x =>
        assert(math.abs(rSumm(x) - rExact(x)) <= err,
          s"seed $seed k=$k salts=$salts batches=$nBatches: rank at $x is ${rSumm(x)} " +
            s"vs exact ${rExact(x)}, err=$err")
      }
      // bound honesty: the tracked err must sit inside the analytic
      // Σ(stride−1) ceiling — per batch < 2·n_b/k (salt prunes + pooled
      // prune), per fold < N_i/k — so an inflated carry column can't
      // buy a vacuous rank guarantee
      val foldTotals = (1 to nBatches).map(i => batches.take(i).map(_.size).sum.toLong)
      assert(err <= (2L * n + foldTotals.sum) / k + 1,
        s"seed $seed: err $err above the analytic ceiling")
    }
  }

  test("qsQuantiles estimates land inside the tracked rank interval (5 seeds, doubles)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(500 + seed)
      val groups = Seq("a", "b")
      val data = groups.flatMap { g =>
        val n = 200 + rnd.nextInt(400)
        (0 until n).map(_ => (g, math.rint(rnd.nextGaussian() * 50) / 4.0))
      }
      val k = 16 + rnd.nextInt(48)
      val nBatches = 2 + rnd.nextInt(3)
      val folded = data.zipWithIndex.groupBy(_._2 % nBatches).toSeq.sortBy(_._1)
        .map(_._2.map(_._1))
        .map(b => Sketch.qsSummarize(b.toDF("grp", "v"), "v", "grp", k, seed, salts = 2))
        .reduce((a, b) => Sketch.qsCombine(a, b, "grp", k))
      val phis = Seq(100000L, 500000L, 900000L, 1000000L)
      val est = Sketch.qsQuantiles(folded, "grp", phis)
        .as[(String, Long, Double, Long, Long)].collect()
      assert(est.length == groups.size * phis.size)
      val byG = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      est.foreach { case (g, phi, e, nn, err) =>
        val xs = byG(g)
        assert(nn == xs.size.toLong, s"seed $seed: n mismatch for $g")
        assert(xs.contains(e), s"seed $seed: estimate $e is not an actual data value")
        val r = math.max(1L, (phi * nn + 999999L) / 1000000L)
        val lt = xs.count(_ < e).toLong
        val le = xs.count(_ <= e).toLong
        assert(le >= r - err && lt + 1 <= r + err,
          s"seed $seed $g phi=$phi: est $e rank interval [$lt+1, $le] misses r=$r ± err=$err")
      }
    }
  }

  test("quantile fold is deterministic: identical fold trees yield identical state") {
    val vals = (0 until 500).map(i => ("g", (i * 37 % 97).toLong))
    def build() = Seq(0, 1, 2)
      .map(b => Sketch.qsSummarize(
        vals.zipWithIndex.filter(_._2 % 3 == b).map(_._1).toDF("grp", "v"),
        "v", "grp", 12, seed = 9, salts = 3))
      .reduce((a, c) => Sketch.qsCombine(a, c, "grp", 12))
      .select("grp", "value", "w", "carry").as[(String, Long, Long, Long)].collect().toSeq
    assert(build() == build())
  }

  test("chainCombine's periodic cut is bit-invisible: cut chains equal uncut chains") {
    // the depth-insurance contract: Reliability.cut materializes the
    // bounded state and restarts the plan, but the VALUES are exactly
    // the foldLeft's — for both the quantile and the k-minima algebra,
    // at a cut cadence (2) that fires mid-chain, twice, over 6 legs
    val vals = (0 until 900).map(i => (s"g${i % 3}", (i * 41 % 173).toLong))
    val qLegs = (0 until 6).map(b => Sketch.qsSummarize(
      vals.zipWithIndex.filter(_._2 % 6 == b).map(_._1).toDF("grp", "v"),
      "v", "grp", 12, seed = 7, salts = 3, single = true))
    def qKey(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "value", "w", "carry").as[(String, Long, Long, Long)]
        .collect().sorted.toSeq
    val qCombine = (a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =>
      Sketch.qsCombine(a, b, "grp", 12, single = true)
    assert(qKey(Sketch.chainCombine(qLegs, qCombine, cutEvery = 2)) ==
      qKey(qLegs.reduce(qCombine)))
    val toks = (0 until 900).map(i => (s"g${i % 2}", s"tok${i * 13 % 301}"))
    val kLegs = (0 until 6).map(b => Sketch.kmvMinima(
      toks.zipWithIndex.filter(_._2 % 6 == b).map(_._1).toDF("grp", "t"),
      "t", "grp", seed = 3, k = 16))
    def kKey(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "h").as[(String, Long)].collect().sorted.toSeq
    val kCombine = (a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =>
      Sketch.kmvCombine(a, b, "grp", 16)
    assert(kKey(Sketch.chainCombine(kLegs, kCombine, cutEvery = 2)) ==
      kKey(kLegs.reduce(kCombine)))
  }

  test("the single-partition quantile fold path is bit-equal and plans fewer exchanges") {
    // single = true changes ONLY the physical placement of the bounded
    // state (repartition(1) after the distributed local prune, narrow
    // coalesce on fold unions): the fold is a deterministic value
    // merge + prune, so the state must be bit-identical, and the plan
    // past the local prunes must carry strictly fewer shuffles.
    val vals = (0 until 800).map(i => (s"g${i % 3}", (i * 53 % 211).toLong))
    def build(single: Boolean) = Seq(0, 1, 2, 3)
      .map(b => Sketch.qsSummarize(
        vals.zipWithIndex.filter(_._2 % 4 == b).map(_._1).toDF("grp", "v"),
        "v", "grp", 16, seed = 5, salts = 3, single = single))
      .reduce((a, c) => Sketch.qsCombine(a, c, "grp", 16, single = single))
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect() // materialize so AQE finalizes the executed plan
      // AdaptiveSparkPlanExec is a leaf to TreeNode traversal, so
      // count shuffles off the rendered final plan instead
      "Exchange (hash|range|Single)".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    }
    val (sgl, dist) = (build(true), build(false))
    val nSingle = exchanges(sgl)
    val nDist = exchanges(dist)
    assert(nSingle < nDist, s"single=$nSingle exchanges vs distributed=$nDist")
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("grp", "value", "w", "carry").as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(key(sgl) == key(dist))
  }

  test("qsSummarizeCounted over a sliced shared base equals per-batch qsSummarize (5 seeds)") {
    // the t27 one-scan restructure's correctness seam: one
    // qsCountedBase with a batch extraKey, sliced per batch, must give
    // BIT-identical summaries to summarizing each raw batch directly —
    // including the null-drop and the salt assignment
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(600 + seed)
      val rows = (0 until 400).map { i =>
        val v = if (rnd.nextInt(12) == 0) None else Some((rnd.nextInt(60) * 5).toLong)
        (s"g${rnd.nextInt(3)}", v, (i % 3).toLong)
      }
      val df = rows.toDF("grp", "v", "batch")
      val k = 8 + rnd.nextInt(16)
      val salts = 1 + rnd.nextInt(3)
      val counted = Sketch.qsCountedBase(df, "v", "grp", seed, salts, extraKeys = Seq("batch"))
      val key = (d: org.apache.spark.sql.DataFrame) =>
        d.select("grp", "value", "w", "carry").as[(String, Long, Long, Long)].collect().sorted.toSeq
      for (b <- 0L until 3L) {
        val viaCounted = Sketch.qsSummarizeCounted(
          counted.filter(col("batch") === b).drop("batch"), "grp", k)
        val direct = Sketch.qsSummarize(
          df.filter(col("batch") === b).select("grp", "v"), "v", "grp", k, seed, salts)
        assert(key(viaCounted) == key(direct), s"seed $seed batch $b k=$k salts=$salts")
      }
    }
  }

  test("qsLocalPruneBatches sliced + qsFinalizeLocal equals per-slice qsSummarizeCounted (5 seeds)") {
    // the r21 t27 one-window restructure's correctness seam: the local
    // ε-prune of a batch-keyed counted base, run ONCE partitioned by
    // (batch, grp, salt) and then sliced per batch, must give
    // BIT-identical summaries to running qsSummarizeCounted on each
    // batch slice — windows are per-partition, so the batch key
    // separates them exactly. Checked in both `single` placements.
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(900 + seed)
      val rows = (0 until 400).map { i =>
        val v = if (rnd.nextInt(12) == 0) None else Some((rnd.nextInt(60) * 5).toLong)
        (s"g${rnd.nextInt(3)}", v, (i % 3).toLong)
      }
      val df = rows.toDF("grp", "v", "batch")
      val k = 8 + rnd.nextInt(16)
      val salts = 1 + rnd.nextInt(3)
      val single = rnd.nextBoolean()
      val counted = Sketch.qsCountedBase(df, "v", "grp", seed, salts, extraKeys = Seq("batch"))
      val local = Sketch.qsLocalPruneBatches(counted, "batch", "grp", k)
      val key = (d: org.apache.spark.sql.DataFrame) =>
        d.select("grp", "value", "w", "carry").as[(String, Long, Long, Long)].collect().sorted.toSeq
      for (b <- 0L until 3L) {
        val fused = Sketch.qsFinalizeLocal(
          local.filter(col("batch") === b).drop("batch"), "grp", k, single)
        val direct = Sketch.qsSummarizeCounted(
          counted.filter(col("batch") === b).drop("batch"), "grp", k, single)
        assert(key(fused) == key(direct), s"seed $seed batch $b k=$k salts=$salts single=$single")
      }
    }
  }

  test("binary-tree fold keeps the rank guarantee with a smaller tracked err than linear") {
    // the documented qsCombine bound: B batches folded linearly
    // accumulate ≈ B·n/2k of re-prune error, a binary tree ≈ n·log(B)/k
    // — both must keep the rank guarantee (errors ADD under any merge
    // tree), and the tree's tracked err must come out smaller
    val rnd = new scala.util.Random(777)
    val n = 1024
    val vals = (0 until n).map(_ => (rnd.nextInt(200) * 3).toLong)
    val k = 16
    val summs = vals.grouped(n / 8).toSeq
      .map(b => Sketch.qsSummarize(b.map(("g", _)).toDF("grp", "v"), "v", "grp", k, seed = 3, salts = 2))
    val linear = summs.reduce((a, b) => Sketch.qsCombine(a, b, "grp", k))
    def tree(xs: Seq[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame =
      if (xs.size == 1) xs.head
      else tree(xs.grouped(2).map(p =>
        if (p.size == 2) Sketch.qsCombine(p(0), p(1), "grp", k) else p(0)).toSeq)
    val treeFold = tree(summs)
    val sorted = vals.sorted
    def rExact(x: Long) = sorted.count(_ <= x).toLong
    def errOf(df: org.apache.spark.sql.DataFrame): Long = {
      val rows = df.select("value", "w", "carry").as[(Long, Long, Long)].collect()
      val err = rows.map(_._3).sum
      assert(rows.map(_._2).sum == n, "weight not conserved")
      def rSumm(x: Long) = rows.filter(_._1 <= x).map(_._2).sum
      vals.distinct.foreach { x =>
        assert(math.abs(rSumm(x) - rExact(x)) <= err, s"rank guarantee broken at $x (err=$err)")
      }
      err
    }
    val (errLinear, errTree) = (errOf(linear), errOf(treeFold))
    assert(errTree < errLinear,
      s"tree fold err $errTree should beat linear $errLinear (the documented log(B) vs B/2 bound)")
  }

  test("qsCombine rejects a raw (unsummarized) leg with a named loud failure") {
    val good = Sketch.qsSummarize(
      (0 until 50).map(i => ("g", i.toLong)).toDF("grp", "v"), "v", "grp", 8, seed = 1, salts = 2)
    val raw = (0 until 50).map(i => ("g", i.toLong)).toDF("grp", "value") // no w/carry
    for ((a, b, leg) <- Seq((raw, good, "left"), (good, raw, "right"))) {
      val e = intercept[IllegalArgumentException](Sketch.qsCombine(a, b, "grp", 8))
      assert(e.getMessage.contains("not a quantile summary") && e.getMessage.contains(leg),
        s"$leg: ${e.getMessage}")
    }
    // and a missing group column names the column, not a late analysis error
    val e2 = intercept[IllegalArgumentException](Sketch.qsCombine(good, good, "nope", 8))
    assert(e2.getMessage.contains("nope"))
  }

  test("CMS one-sided error and merge identity hold for random streams and splits (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(300 + seed)
      // skewed stream: quadratic pull toward low token ids, so a few
      // tokens are heavy and the rest are a colliding tail
      val vocabN = 30 + rnd.nextInt(120)
      val stream = (0 until 800 + rnd.nextInt(1200)).map { _ =>
        val u = rnd.nextDouble()
        s"tok${(vocabN * u * u).toInt}"
      }
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val depth = 2 + rnd.nextInt(3)
      val width = 8 << rnd.nextInt(4) // 8..64: collisions guaranteed
      val whole = Sketch.cmsSketch(stream.toDF("token"), "token", depth, width)
      // est >= exact for EVERY token - the deterministic CMS guarantee
      val est = Sketch.cmsEstimate(whole, exact.keys.toSeq.toDF("token"), "token", depth, width)
        .as[(String, Long)].collect().toMap
      exact.foreach { case (t, c) =>
        assert(est(t) >= c, s"seed $seed: $t underestimated (${est(t)} < $c)")
        assert(est(t) <= stream.size.toLong, s"seed $seed: $t above stream size")
      }
      // merge identity: any batch split folds to the whole-stream table
      val cut = 1 + rnd.nextInt(stream.size - 1)
      val folded = stream.grouped(cut).toSeq
        .map(b => Sketch.cmsSketch(b.toDF("token"), "token", depth, width))
        .reduce(Sketch.cmsCombine)
        .as[(Int, Long, Long)].collect().toSet
      assert(folded == whole.as[(Int, Long, Long)].collect().toSet, s"seed $seed: fold != whole")
    }
  }
}
