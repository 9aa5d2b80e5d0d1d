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
