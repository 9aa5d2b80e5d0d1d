package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The residual IVF-PQ recall gate (the s09 harness shape): at EQUAL
  * code budget, residual-encoded ADC must match or beat the
  * raw-codebook variant against the exact brute-force truth on the
  * fixture corpus. This is the honest contract for an approximate
  * index — a hash oracle can't gate a float pipeline, a recall floor
  * can. */
class ResidualPqSpec extends SparkSpec {
  import spark.implicits._

  private val (nCoarse, nSub, subDim, nCent, nProbe, queryMod, k) =
    (8, 4, 16, 20, 4, 25, 10)

  /** The measured recall@10 at THIS spec's configuration, read from the
    * committed RECALL_CURVE.json (graft.RecallCurve's output — its
    * format is closed, so a two-regex parse is exact). The curve is the
    * deployment-facing artifact; the spec floors against its measured
    * operating point instead of a hand-pinned constant, so regenerating
    * the curve after an index change re-derives the gate. */
  private def curveOperatingPoint: Double = {
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("RECALL_CURVE.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val point = ("""\{"n_sub":""" + nSub + ""","n_probe":""" + nProbe +
      ""","all_cells":\w+,"recall10_residual":([0-9.]+)""").r
    point.findFirstMatchIn(s)
      .getOrElse(fail(s"RECALL_CURVE.json has no (n_sub=$nSub, n_probe=$nProbe) point"))
      .group(1).toDouble
  }

  private def recallAt10(approx: org.apache.spark.sql.DataFrame,
      truth: org.apache.spark.sql.DataFrame): Double = {
    val hits = approx.select("query_id", "cand_id")
      .join(truth.select("query_id", "cand_id"), Seq("query_id", "cand_id"), "left_semi")
      .count().toDouble
    hits / truth.count().toDouble
  }

  test("residual encoding recalls >= the raw codebook at equal code budget") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id")).as[Long].collect().sorted
    assert(queries.length >= 10, "fixture corpus must supply a real query sample")
    // exact truth per query: brute-force cosine is the s01/s09 truth
    // side; restrict to the sampled queries via the id convention
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        nQueries = Int.MaxValue, k = k)
      .join(queries.toSeq.toDF("query_id"), Seq("query_id"), "left_semi")
    val raw = Quantize.ivfPqTopK(emb, "vec_id", "embedding",
      nCoarse, nSub, subDim, nCent, nProbe, queryMod, k)
    val res = Quantize.ivfPqResidualTopK(emb, "vec_id", "embedding",
      nCoarse, nSub, subDim, nCent, nProbe, queryMod, k)
    val rRaw = recallAt10(raw, truth)
    val rRes = recallAt10(res, truth)
    // floor = the curve's measured value at this exact configuration,
    // minus slack for cross-platform IEEE variation only — the
    // arithmetic is deterministic, so a real index regression (bad
    // codebooks, broken residuals) undershoots by far more than 0.05
    val measured = curveOperatingPoint
    info(f"recall@10 raw=$rRaw%.3f residual=$rRes%.3f curve-floor=$measured%.3f")
    assert(rRes >= rRaw,
      f"residual recall $rRes%.3f fell below raw-codebook recall $rRaw%.3f")
    assert(rRes >= measured - 0.05,
      f"residual recall $rRes%.3f fell below the committed curve's $measured%.3f " +
        "(RECALL_CURVE.json) — regenerate via graft.RecallCurve if the index changed deliberately")
  }

  test("the stored ResidualPqIndex serves identically, including through parquet") {
    val emb = Tables.embeddings(spark, sf0001)
    val inline = Quantize.ivfPqResidualTopK(emb, "vec_id", "embedding",
        nCoarse, nSub, subDim, nCent, nProbe, queryMod, k)
      .select("query_id", "cand_id", "adc_e5", "rk")
      .as[(Long, Long, Long, Long)].collect().toSet
    val idx = Quantize.prepareResidualPqIndex(emb, "vec_id", "embedding",
      nCoarse, nSub, subDim, nCent)
    val queries = emb.filter(col("vec_id") % queryMod === 0)
    // deployment shape: all three index tables written to storage,
    // read back cold, served — must equal the inline search
    val dir = java.nio.file.Files.createTempDirectory("rpq-index").toString
    idx.coarse.write.parquet(s"$dir/coarse")
    idx.codebook.write.parquet(s"$dir/codebook")
    idx.codes.write.parquet(s"$dir/codes")
    val cold = Quantize.ResidualPqIndex(
      spark.read.parquet(s"$dir/coarse"),
      spark.read.parquet(s"$dir/codebook"),
      spark.read.parquet(s"$dir/codes"), nSub, subDim)
    val served = Quantize.ivfPqResidualTopKIndexed(
        queries, "vec_id", "embedding", cold, nProbe, k)
      .select("query_id", "cand_id", "adc_e5", "rk")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(served == inline)
  }

  test("residual and raw ADC agree on the candidate pool shape") {
    val emb = Tables.embeddings(spark, sf0001)
    val res = Quantize.ivfPqResidualTopK(emb, "vec_id", "embedding",
      nCoarse, nSub, subDim, nCent, nProbe, queryMod, k)
    // one rank list per query, ranks contiguous from 1, no self-matches
    val byQuery = res.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rk").as("lo"), max("rk").as("hi"))
      .as[(Long, Long, Long, Long)].collect()
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, n, lo, hi) =>
      assert(lo == 1L && hi == n && n <= k, s"query $q rank list malformed")
    }
    assert(res.filter(col("query_id") === col("cand_id")).count() == 0)
  }
}
