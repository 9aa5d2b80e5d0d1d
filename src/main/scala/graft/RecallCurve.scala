package graft

import graft.core.{GraftSession, Tables}
import graft.operators.{Quantize, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall/nProbe curve for the residual IVF-PQ index (the s09 harness
  * shape, swept): measures recall@10 of [[Quantize.ivfPqResidualTopK]]
  * and the raw-codebook [[Quantize.ivfPqTopK]] at the same code budget
  * against the exact brute-force truth, for every
  * `nProbe ∈ {1, 2, 4, 8 (=all cells)} × nSub ∈ {4, 8}` on the fixture
  * corpus (`sf0.001/embeddings`, 500 × 64-dim).
  *
  * Output: `RECALL_CURVE.json` — the artifact a deployment reads to
  * pick its nProbe operating point, and the source of truth for
  * `ResidualPqSpec`'s recall floor (the spec reads the measured
  * (nSub=4, nProbe=4) point instead of a hand-pinned constant). All
  * arithmetic in the index pipeline is deterministic (integer ADC
  * units, fixed seeds, fixed Lloyd rounds), so the curve is
  * reproducible bit-for-bit on one platform; cross-platform IEEE
  * variation is absorbed by the spec's slack, not by this artifact. */
object RecallCurve {

  private val (nCoarse, nCent, queryMod, k) = (8, 20, 25, 10)

  private def recallAt10(approx: DataFrame, truth: DataFrame): Double = {
    val hits = approx.select("query_id", "cand_id")
      .join(truth.select("query_id", "cand_id"), Seq("query_id", "cand_id"), "left_semi")
      .count().toDouble
    hits / truth.count().toDouble
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val out = args.headOption.getOrElse("RECALL_CURVE.json")
    val spark = GraftSession.builder(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") % queryMod === 0).select("vec_id")
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        nQueries = Int.MaxValue, k = k)
      .join(queries.withColumnRenamed("vec_id", "query_id"), Seq("query_id"), "left_semi")
      .cache()
    truth.count()

    val dim = 64
    val points = for {
      nSub <- Seq(4, 8)
      nProbe <- Seq(1, 2, 4, 8) // nCoarse = 8, so nProbe 8 IS "all"
    } yield {
      val subDim = dim / nSub
      val res = Quantize.ivfPqResidualTopK(emb, "vec_id", "embedding",
        nCoarse, nSub, subDim, nCent, nProbe, queryMod, k)
      val raw = Quantize.ivfPqTopK(emb, "vec_id", "embedding",
        nCoarse, nSub, subDim, nCent, nProbe, queryMod, k)
      val rRes = recallAt10(res, truth)
      val rRaw = recallAt10(raw, truth)
      System.err.println(f"[recall-curve] nSub=$nSub nProbe=$nProbe residual=$rRes%.3f raw=$rRaw%.3f")
      f"""  {"n_sub":$nSub,"n_probe":$nProbe,"all_cells":${nProbe == nCoarse},"recall10_residual":$rRes%.3f,"recall10_raw":$rRaw%.3f}"""
    }
    val json =
      s"""{
         | "harness": "recall@10 vs exact brute-force cosine, fixture corpus $sfDir (500x64), nCoarse=$nCoarse, nCent=$nCent, queryMod=$queryMod, k=$k",
         | "operating_point": {"n_sub": 4, "n_probe": 4},
         | "points": [
         |${points.mkString(",\n")}
         | ]
         |}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
