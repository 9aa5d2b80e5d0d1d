package graft.operators

import graft.functions.{Hashing, Text}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite for the training-data pipeline surface:
  * exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Scale design (the point of each variant):
  *  - exact: one map-side-combinable groupBy on a 128-bit content hash —
  *    a single shuffle keyed on the hash, no row text moves twice;
  *  - MinHash+LSH: signature is a per-row expression (linear scan), the
  *    only shuffle is the band-bucket self-join, whose fan-out is bounded
  *    by bucket size — this replaces the O(n²) all-pairs join at 100 TB;
  *  - SimHash: per-row 32-bit sketch + pigeonhole banding (4 × 8-bit
  *    chunks guarantee recall for hamming ≤ 3) — exact result, bounded
  *    candidate join;
  *  - n-gram Jaccard: the exact quadratic baseline, deliberately bounded
  *    to a query-document subset (dedup-against-corpus shape);
  *  - embedding cosine: brute-force pair scan over a (broadcastable)
  *    vector table; the LSH/IVF scale path lives in [[Similarity]].
  *
  * All sketches use md5-based hashing ([[Hashing]]) so the DuckDB oracle
  * reproduces them exactly.
  */
object Dedup {

  /** Exact dedup: group rows by md5 of a canonical content column, keep
    * the lowest id, report group size. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // --- MinHash + LSH --------------------------------------------------------
  // One md5 per shingle, then NUM_HASHES universal hashes
  //   g_j(h) = (A_j * (h mod P) + B_j) mod P,  P = 2^31 - 1
  // derived with deterministic constants — identical integer math in
  // DuckDB. Signature banding: NUM_BANDS bands of ROWS_PER_BAND values.
  val P = 2147483647L
  val numHashes = 64
  val numBands = 16
  val rowsPerBand: Int = numHashes / numBands // 4
  def hashA(j: Int): Long = (2654435761L * (j + 1)) % P
  def hashB(j: Int): Long = (40503L * (j + 7) + 1) % P

  /** Column: base shingle hashes (md5 once per shingle, mod P). */
  def minhashBase(shingleCol: Column): Column =
    transform(shingleCol, s => pmod(Hashing.md5Long(s, 3), lit(P)))

  /** Column: minhash signature (array of NUM_HASHES longs) from the
    * precomputed base-hash column — md5 runs once per shingle, not once
    * per hash function. Empty-shingle rows get P (= "inf"). */
  def minhashSignatureFromBase(baseCol: Column): Column =
    array((0 until numHashes).map { j =>
      coalesce(
        array_min(transform(baseCol, h => pmod(h * hashA(j) + hashB(j), lit(P)))),
        lit(P)
      )
    }: _*)

  /** Column: minhash signature from a distinct-shingle array column. */
  def minhashSignature(shingleCol: Column): Column =
    minhashSignatureFromBase(minhashBase(shingleCol))

  /** Near-duplicate pairs by MinHash-LSH candidates, verified with exact
    * shingle Jaccard >= `threshold`. Output: (id_a, id_b, jaccard).
    *
    * The band self-join is the only shuffle; exact verification happens
    * only on candidates, so the quadratic term never materializes.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String, threshold: Double): DataFrame = {
    val toks = Text.tokens(col(textCol))
    val withSig = docs
      .select(
        col(idCol).as("id"),
        Text.shingles(toks, 3).as("sh")
      )
      .withColumn("hs", minhashBase(col("sh")))
      .withColumn("sig", minhashSignatureFromBase(col("hs")))
      .drop("hs")

    // explode into (band, bandKey) — bandKey joins equal signatures slices
    val banded = withSig.select(
      col("id"),
      col("sh"),
      explode(
        array((0 until numBands).map { b =>
          struct(
            lit(b).as("band"),
            concat_ws(",", (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("key")
          )
        }: _*)
      ).as("bk")
    )
    val l = banded.select(col("bk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("bk"), col("id").as("id_b"), col("sh").as("sh_b"))
    val cand = l
      .join(r, l("bk") === r("bk") && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    cand
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))
      )
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // --- SimHash ---------------------------------------------------------------
  /** Per-doc 32-bit SimHash via explode + one aggregation pass (md5 once
    * per token; 32 conditional sums map-side-combine). */
  def simhashTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol).as("id"), explode(Text.tokens(col(textCol))).as("t"))
      .withColumn("h", Hashing.md5Long(col("t"), 11))
    val signSums = (0 until Text.simhashBits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"s$i")
    }
    tok
      .groupBy("id")
      .agg(signSums.head, signSums.tail: _*)
      .select(
        col("id"),
        (0 until Text.simhashBits)
          .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _)
          .as("simhash")
      )
  }

  /** Pairs with hamming(simhash) <= maxHamming, found via pigeonhole
    * banding: with 4 8-bit chunks, any pair within hamming 3 shares at
    * least one chunk — recall is exact, not probabilistic. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4-chunk pigeonhole guarantees recall only for hamming <= 3")
    val sh = simhashTable(docs, idCol, textCol)
    val chunks = 4
    val banded = sh.select(
      col("id"),
      col("simhash"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"), shiftright(col("simhash"), c * 8).bitwiseAND(lit(0xffL)).as("key"))
      }: _*)).as("ck")
    )
    val l = banded.select(col("ck"), col("id").as("id_a"), col("simhash").as("sh_a"))
    val r = banded.select(col("ck"), col("id").as("id_b"), col("simhash").as("sh_b"))
    l.join(r, l("ck") === r("ck") && col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming")
      )
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  // --- exact n-gram Jaccard (bounded quadratic baseline) ----------------------
  /** Exact 3-gram Jaccard of query docs (id % sampleMod == 0) against the
    * corpus; pairs with jaccard >= threshold. */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String, sampleMod: Int, threshold: Double): DataFrame = {
    val withSh = docs.select(col(idCol).as("id"), Text.shingles(Text.tokens(col(textCol)), 3).as("sh"))
    val q = withSh.filter(col("id") % sampleMod === 0).select(col("id").as("id_a"), col("sh").as("sh_a"))
    val c = withSh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    q.join(c, col("id_a") < col("id_b"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))
      )
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // --- embedding cosine near-dup ----------------------------------------------
  /** Pairs of vectors with cosine similarity >= threshold (brute force;
    * index-order double arithmetic for oracle parity). */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import graft.functions.Vectors.{cosine => cos}
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cos(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 5).as("cosine"))
  }

  /** Keep-latest-per-key dedup (J1/ST3 upsert semantics): one row per
    * key, the one with the greatest (orderCol, tieCol). */
  def keepLatest(df: DataFrame, keyCols: Seq[String], orderCol: String, tieCol: String): DataFrame = {
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieCol).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
