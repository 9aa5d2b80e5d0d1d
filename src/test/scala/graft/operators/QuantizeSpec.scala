package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization scales by 127/max|x| and floors") {
    val emb = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)) // zero vector -> all zeros, no div-by-zero
    ).toDF("vec_id", "embedding")
    val q = Quantize.int8Long(emb, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).map(_._3).toSeq }
    // max|x| = 1.0: quantized = floor(127*x) = 127, -64, 31, 0
    assert(q(1L) == Seq(127L, -64L, 31L, 0L))
    assert(q(2L) == Seq(0L, 0L, 0L, 0L))
  }

  test("stats view aggregates the long form") {
    val emb = Seq((7L, Array(0.5f, -1.0f))).toDF("vec_id", "embedding")
    val r = Quantize.int8Stats(emb, "vec_id", "embedding")
      .as[(Long, Long, Long, Long)].collect().head
    // scale 127: floor(63.5) = 63, floor(-127) = -127
    assert(r == ((7L, -64L, -127L, 63L)))
  }

  test("pqEncode assigns codebook members to themselves at distance zero") {
    val emb = (0 until 6).map(i =>
      (i.toLong, Array.tabulate(8)(d => (math.sin(i * 3 + d) * 2).toFloat))).toDF("vec_id", "embedding")
    val own = Quantize.pqEncode(emb, "vec_id", "embedding", nSub = 2, subDim = 4, nCent = 6)
      .filter($"vec_id" < 6)
      .select("vec_id", "sub", "code", "dist").as[(Long, Long, Long, Double)].collect()
    // every vector is a codeword -> nearest codeword is itself, d = 0
    assert(own.forall { case (id, _, code, dist) => code == id && dist == 0.0 })
  }

  test("ADC over an exhaustive codebook reproduces the exact L2 ranking") {
    // nCent = corpus size: codes reconstruct every vector exactly, so
    // the asymmetric distance IS the true L2^2 and the top-k must equal
    // a brute-force L2 ranking - the identity the s11 approximation
    // degrades from when nCent shrinks
    val vecs = (0 until 12).map(i =>
      (i.toLong, Array.tabulate(8)(d => (math.cos(i * 1.3 + d * 0.7) * 3).toFloat)))
    val emb = vecs.toDF("vec_id", "embedding")
    val got = Quantize.pqAdcTopK(emb, "vec_id", "embedding",
        nSub = 2, subDim = 4, nCent = 12, queryMod = 5, k = 3)
      .select("query_id", "cand_id", "rk").as[(Long, Long, Long)].collect().toSet
    // driver-side brute force: exact L2^2 in the same e5 integer units
    val byId = vecs.toMap
    def l2e5(a: Array[Float], b: Array[Float]): Long = {
      // same per-subvector fold and per-sub e5 rounding as the operator
      (0 until 2).map { m =>
        def dot(x: Array[Float], y: Array[Float]) =
          (0 until 4).map(d => x(m * 4 + d).toDouble * y(m * 4 + d).toDouble).sum
        math.round((dot(a, a) + dot(b, b) - 2 * dot(a, b)) * 100000.0)
      }.sum
    }
    val want = (for {
      q <- vecs.map(_._1) if q % 5 == 0
      ranked = vecs.filter(_._1 != q)
        .map { case (c, v) => (c, l2e5(byId(q), v)) }
        .sortBy { case (c, d) => (d, c) }
        .take(3)
      ((c, _), i) <- ranked.zipWithIndex
    } yield (q, c, (i + 1).toLong)).toSet
    assert(got == want)
  }

  test("IVF+PQ with a single coarse cell degenerates to plain ADC search") {
    // nCoarse = 1: every vector lands in cell 0 and every query probes
    // it, so the IVF stage is a no-op and the composed search must
    // equal pqAdcTopK row-for-row — pins that composing the stages
    // changes WHERE candidates come from, never their arithmetic
    val emb = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(8)(d => (math.cos(i * 1.7 + d * 0.9) * 2).toFloat))).toDF("vec_id", "embedding")
    val flat = Quantize.pqAdcTopK(emb, "vec_id", "embedding",
        nSub = 2, subDim = 4, nCent = 5, queryMod = 7, k = 4)
      .select("query_id", "cand_id", "adc_e5", "rk").as[(Long, Long, Long, Long)].collect().toSet
    val composed = Quantize.ivfPqTopK(emb, "vec_id", "embedding",
        nCoarse = 1, nSub = 2, subDim = 4, nCent = 5, nProbe = 1, queryMod = 7, k = 4)
      .select("query_id", "cand_id", "adc_e5", "rk").as[(Long, Long, Long, Long)].collect().toSet
    assert(composed == flat)
  }

  test("IVF+PQ candidates come only from probed cells") {
    // two well-separated clusters around orthogonal axes: a query must
    // only ever rank candidates sharing its probed cell (nProbe = 1)
    val emb = (0 until 16).map { i =>
      val axis = i % 2 // even ids hug dim 0, odd ids hug dim 4
      (i.toLong, Array.tabulate(8)(d =>
        (if (d == axis * 4) 10.0 + (i / 2) * 0.1 else 0.01 * ((i + d) % 3)).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Quantize.ivfPqTopK(emb, "vec_id", "embedding",
        nCoarse = 2, nSub = 2, subDim = 4, nCent = 4, nProbe = 1, queryMod = 7, k = 8)
      .select("query_id", "cand_id").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    // ids 0/1 are the two coarse centroids (one per axis); with nProbe=1
    // a query's candidates must share its axis parity
    assert(out.forall { case (q, c) => q % 2 == c % 2 })
  }

  test("the stored PqIndex serves ADC identically, including through parquet") {
    val emb = (0 until 18).map(i =>
      (i.toLong, Array.tabulate(8)(d => (math.sin(i * 2.1 + d * 0.6) * 3).toFloat))).toDF("vec_id", "embedding")
    val inline = Quantize.pqAdcTopK(emb, "vec_id", "embedding",
        nSub = 2, subDim = 4, nCent = 5, queryMod = 7, k = 4)
      .select("query_id", "cand_id", "adc_e5", "rk").as[(Long, Long, Long, Long)].collect().toSet
    val idx = Quantize.preparePqIndex(emb, "vec_id", "embedding", nSub = 2, subDim = 4, nCent = 5)
    val queries = emb.filter($"vec_id" % 7 === 0)
    def served(i: Quantize.PqIndex) =
      Quantize.pqAdcTopKIndexed(queries, "vec_id", "embedding", i, k = 4)
        .select("query_id", "cand_id", "adc_e5", "rk").as[(Long, Long, Long, Long)].collect().toSet
    assert(served(idx) == inline)
    // the deployment shape: codebook + codes written to storage, read
    // back cold, served — still bit-identical
    val dir = java.nio.file.Files.createTempDirectory("pq-index").toString
    idx.codebook.write.parquet(s"$dir/codebook")
    idx.codes.write.parquet(s"$dir/codes")
    val cold = Quantize.PqIndex(
      spark.read.parquet(s"$dir/codebook"), spark.read.parquet(s"$dir/codes"), 2, 4)
    assert(served(cold) == inline)
  }

  // ---- maintained encoded corpus (pqAppend / pqFoldInto) -----------------

  private def pqEmb(n: Int) = {
    val rnd = new scala.util.Random(11)
    (0 until n).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
  }

  test("pqAppend: a fold over any batch split equals the whole-corpus encode") {
    val all = pqEmb(40)
    val cb = Quantize.pqCodebook(all, "vec_id", "embedding", 2, 4, 6)
    val whole = Quantize.pqEncode(all, "vec_id", "embedding", 2, 4, 6)
      .select("vec_id", "sub", "code").as[(Long, Long, Long)].collect().sorted.toSeq
    for (nBatches <- Seq(2, 5)) {
      val folded = (0 until nBatches)
        .map(b => Quantize.pqEncodeWith(
          all.filter($"vec_id" % nBatches === b), "vec_id", "embedding", cb, 2, 4)
          .select($"vec_id".as("cand_id"), $"sub", $"code"))
        .reduce(Quantize.pqAppend(_, _))
        .select($"cand_id".as("vec_id"), $"sub", $"code")
        .as[(Long, Long, Long)].collect().sorted.toSeq
      assert(folded == whole, s"nBatches=$nBatches")
    }
  }

  test("pqFoldInto: bucket-scoped writes, replay no-op, deletes, serving off the folded state") {
    val all = pqEmb(48)
    val cb = Quantize.pqCodebook(all, "vec_id", "embedding", 2, 4, 6)
    val base = java.nio.file.Files.createTempDirectory("pqf").toString
    val state = s"$base/state"
    (0 until 3).foreach { b =>
      Quantize.pqFoldInto(spark, state, all.filter($"vec_id" % 3 === b),
        "vec_id", "embedding", cb, 2, 4, Some(b.toLong), nBuckets = 8)
    }
    def rows() = spark.read.parquet(state).select("cand_id", "sub", "code")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val whole = Quantize.pqEncode(all, "vec_id", "embedding", 2, 4, 6)
      .select("vec_id", "sub", "code").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(rows() == whole, "stored fold == whole-corpus encode")
    // replayed batch id short-circuits on the watermark
    val before = rows()
    Quantize.pqFoldInto(spark, state, all.filter($"vec_id" % 3 === 1),
      "vec_id", "embedding", cb, 2, 4, Some(1L), nBuckets = 8)
    assert(rows() == before)
    // a re-ingest fold touches ONLY its ids' buckets (ids 2 and 10 are
    // both bucket 2 mod 8): write cost ~ batch, not corpus
    val files0 = stateFiles(state)
    Quantize.pqFoldInto(spark, state, all.filter($"vec_id".isin(2L, 10L)),
      "vec_id", "embedding", cb, 2, 4, Some(3L), nBuckets = 8)
    val files1 = stateFiles(state)
    val changed = (files0.keySet ++ files1.keySet).filter(k => files0.get(k) != files1.get(k))
    assert(changed.nonEmpty && changed.forall(_.contains("pbucket=2")),
      s"only bucket 2 may change, got: $changed")
    // a delete fold retires ALL nSub rows of the victims, rebuild-equal
    Quantize.pqFoldInto(spark, state, all.filter(lit(false)),
      "vec_id", "embedding", cb, 2, 4, Some(4L), nBuckets = 8,
      deletes = Some(Seq(7L, 9L).toDF("vec_id")))
    val survivors = Quantize.pqEncode(all, "vec_id", "embedding", 2, 4, 6)
      .filter($"vec_id" =!= 7L && $"vec_id" =!= 9L)
      .select("vec_id", "sub", "code").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(rows() == survivors)
    // ADC serving off the folded state == serving off a fresh prepare
    // (on the surviving corpus), bit for bit
    val corpus = all.filter($"vec_id" =!= 7L && $"vec_id" =!= 9L)
    val queries = all.filter($"vec_id" % 7 === 0)
    val servedFold = Quantize.pqAdcTopKIndexed(queries, "vec_id", "embedding",
      Quantize.PqIndex(cb, spark.read.parquet(state)
        .select($"cand_id", $"sub", $"code"), 2, 4), k = 4)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val servedFresh = Quantize.pqAdcTopKIndexed(queries, "vec_id", "embedding",
      Quantize.preparePqIndex(corpus, "vec_id", "embedding", 2, 4, 6).copy(codebook = cb), k = 4)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(servedFold == servedFresh && servedFold.nonEmpty)
  }

  test("pqFoldInto: a drifted codebook or changed geometry fails loudly") {
    val all = pqEmb(24)
    val base = java.nio.file.Files.createTempDirectory("pqd").toString
    val state = s"$base/state"
    val cb = Quantize.pqCodebook(all, "vec_id", "embedding", 2, 4, 6)
    Quantize.pqFoldInto(spark, state, all.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", cb, 2, 4, Some(0L), nBuckets = 8)
    // same geometry, different codebook content (7 codewords, not 6)
    val cb7 = Quantize.pqCodebook(all, "vec_id", "embedding", 2, 4, 7)
    val e = intercept[IllegalArgumentException] {
      Quantize.pqFoldInto(spark, state, all.filter($"vec_id" % 2 === 1),
        "vec_id", "embedding", cb7, 2, 4, Some(1L), nBuckets = 8)
    }
    assert(e.getMessage.contains("pqFoldInto"))
    // a changed bucket count scatters ids across incompatible layouts
    intercept[IllegalArgumentException] {
      Quantize.pqFoldInto(spark, state, all.filter($"vec_id" % 2 === 1),
        "vec_id", "embedding", cb, 2, 4, Some(1L), nBuckets = 16)
    }
    // the matching parameters still fold
    Quantize.pqFoldInto(spark, state, all.filter($"vec_id" % 2 === 1),
      "vec_id", "embedding", cb, 2, 4, Some(1L), nBuckets = 8)
    assert(spark.read.parquet(state).select("cand_id").distinct().count() == 24)
  }
}
