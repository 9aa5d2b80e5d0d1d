package graft.operators

import graft.functions.{Hashing, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: the exact baseline — a query⋈corpus join with
  *    per-query top-k. Correct at any scale when the QUERY side is small
  *    (broadcast) — the corpus is scanned once, never shuffled.
  *  - [[lshTopK]]: the scale path — sign-random-projection (SRP) LSH.
  *    Each vector gets a `numPlanes`-bit bucket code from md5-derived
  *    pseudo-random ±1 hyperplanes; candidates join on bucket prefix
  *    agreement, exact cosine re-ranks candidates. Replaces the full
  *    scan with a bucket-local join when the corpus is 100 TB.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector (id in `queryIds` mod
    * filter), the k nearest corpus vectors by (cosine desc, id asc). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String, nQueries: Int, k: Int): DataFrame = {
    val q = emb
      .filter(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = emb.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = q
      .join(c, col("query_id") =!= col("cand_id"))
      .withColumn("cosine", Vectors.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("cand_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), round(col("cosine"), 5).as("cosine"), col("rk"))
  }

  /** SRP-LSH bucket code: bit p = sign(dot(v, h_p)) where hyperplane
    * h_p[d] = +1 if md5(p:d) is odd else -1. Deterministic, data-free,
    * identical on every executor — no broadcast of plane matrices. */
  def srpCode(emb: DataFrame, idCol: String, vecCol: String, numPlanes: Int, dim: Int): DataFrame = {
    val signs: Seq[Seq[Int]] = (0 until numPlanes).map { p =>
      (0 until dim).map { d =>
        val md5hex = java.security.MessageDigest
          .getInstance("MD5")
          .digest(s"$p:$d".getBytes("UTF-8"))
        if ((md5hex.last & 1) == 1) 1 else -1
      }
    }
    val v = col(vecCol)
    val code = (0 until numPlanes)
      .map { p =>
        val proj = aggregate(
          zip_with(v, lit(signs(p).toArray), (x, s) => x.cast("double") * s.cast("double")),
          lit(0.0),
          (acc, x) => acc + x
        )
        when(proj > 0, lit(1L << p)).otherwise(lit(0L))
      }
      .reduce(_ + _)
    emb.select(col(idCol).as("id"), v.as("vec"), code.as("bucket"))
  }

  /** ANN top-k via SRP buckets: candidates = corpus vectors whose bucket
    * code is within hamming `probe` of the query's code (multi-probe via
    * banding on byte chunks), re-ranked by exact cosine. Approximate —
    * verified as rows-only by the driver; the exact baseline
    * [[bruteForceTopK]] is the hash-checked twin. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, nQueries: Int, k: Int, numPlanes: Int = 16, dim: Int = 64): DataFrame = {
    val coded = srpCode(emb, idCol, vecCol, numPlanes, dim)
    val chunks = 2 // 2 chunks of 8 bits: recall for bucket-hamming <= 1
    val banded = coded.select(
      col("id"),
      col("vec"),
      col("bucket"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"), shiftright(col("bucket"), c * 8).bitwiseAND(lit(0xffL)).as("key"))
      }: _*)).as("ck")
    )
    val q = banded
      .filter(col("id") < nQueries)
      .select(col("ck"), col("id").as("query_id"), col("vec").as("qv"))
    val c = banded.select(col("ck"), col("id").as("cand_id"), col("vec").as("cv"))
    val cand = q
      .join(c, q("ck") === c("ck") && col("query_id") =!= col("cand_id"))
      .dropDuplicates("query_id", "cand_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("cand_id").asc)
    cand
      .withColumn("cosine", Vectors.cosine(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), round(col("cosine"), 5).as("cosine"), col("rk"))
  }
}
