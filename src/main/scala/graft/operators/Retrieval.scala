package graft.operators

import graft.core.Par
import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: dense (embedding cosine) and lexical
  * (inverted-index term overlap) rankings fused by reciprocal-rank
  * fusion — the two-tower serving shape every RAG / retrieval
  * pipeline runs, with the fusion arithmetic kept in exact integers
  * so the oracle gate checks it bit-for-bit.
  *
  * Shape, and why it holds at 100 TB:
  *  - the lexical side is the classic IR inverted index: documents
  *    explode once to DISTINCT (doc, term) postings; the query side's
  *    postings (a tiny fraction, the query set) join on the term —
  *    the shuffle key is the term, and only (id, term) pairs move,
  *    never text. Document-frequency weights are one
  *    map-side-combined count per term; the corpus total joins in as
  *    a broadcast 1-row aggregate (no driver scalar);
  *  - rarity weighting is `N div df` — the integer-division IDF proxy
  *    (rarer terms weigh more, stopword-frequency terms round to
  *    weight 1). No logarithm crosses the oracle gate (log is the one
  *    piece of BM25 two engines won't reproduce bit-for-bit);
  *  - the dense side is whatever ANN ranking the caller supplies —
  *    [[Similarity.bruteForceTopK]] as the exact baseline here,
  *    [[Similarity.ivfTopKIndexed]] in production — only its
  *    (query_id, cand_id, rk) triples enter the fusion;
  *  - RRF is rank-only: `score = Σ_r 1e9 div (k0 + rank_r)`, a
  *    full-outer join of two top-k lists (both already ≤ queries × k
  *    rows — tiny), so fusing never touches the corpus again.
  */
object Retrieval {

  /** Lexical top-k by rarity-weighted distinct-term overlap: for each
    * query document (`idCol < nQueries`), candidates sharing terms
    * ranked by `Σ_{t ∈ q ∩ c} (N div df_t)` desc, id asc. The exact
    * integer cousin of a BM25 retriever: same inverted-index plan,
    * log-free weights.
    *
    * `maxDfPermille` caps the document frequency of terms that may
    * GENERATE candidates (df·1000 ≤ maxDfPermille·N): the posting
    * join's fan-out on a term is df², so one stopword-frequency term
    * is a quadratic blow-up at corpus scale — the reason every
    * production retriever drops or impact-orders high-df postings.
    * Capped terms contribute nothing (they carry weight ≈ 1 and no
    * discrimination); 1000 disables the cap.
    */
  def lexicalTopK(docs: DataFrame, idCol: String, textCol: String, nQueries: Int, k: Int,
      maxDfPermille: Int = 1000): DataFrame = {
    // three consumers (df counts, the query side, the candidate side)
    // — cut the distinct posting list once so the corpus is tokenized
    // and deduped once, not once per consumer (the r21 cut-once
    // rationale; this IS the stored inverted index of a production
    // retriever, materialized for the duration of the query)
    val postings = graft.core.Reliability.cut(
      Par.widen(docs.select(col(idCol).as("id"), col(textCol).as("txt")))
        .select(col("id"), explode(Text.tokens(lower(col("txt")))).as("term"))
        .distinct())
    val df = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_total"))
    val w = df.crossJoin(broadcast(n))
      .filter(expr(s"df * 1000 <= $maxDfPermille * n_total"))
      .select(col("term"), expr("n_total div df").as("wt"))
    val q = postings.filter(col("id") < nQueries).select(col("id").as("query_id"), col("term"))
    val scored = q
      .join(w, Seq("term")) // df cap prunes the query's terms BEFORE the posting fan-out
      .join(postings.select(col("id").as("cand_id"), col("term")), Seq("term"))
      .filter(col("cand_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("wt")).as("lex_score"))
    scored
      .withColumn("rk",
        row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("lex_score").desc, col("cand_id").asc)).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Reciprocal-rank fusion of two (query_id, cand_id, rk) rankings:
    * `score_e9 = Σ_r 1e9 div (k0 + rk_r)` (a list missing the pair
    * contributes 0), final order (score desc, cand_id asc), top `k`.
    * Integer division end-to-end — deterministic in any engine. */
  def rrfFuse(a: DataFrame, b: DataFrame, k0: Int, k: Int): DataFrame = {
    val ra = a.select(col("query_id"), col("cand_id"), col("rk").as("rk_a"))
    val rb = b.select(col("query_id"), col("cand_id"), col("rk").as("rk_b"))
    val fused = ra.join(rb, Seq("query_id", "cand_id"), "full_outer")
      .select(
        col("query_id"), col("cand_id"),
        (coalesce(expr(s"1000000000L div ($k0 + rk_a)"), lit(0L)) +
          coalesce(expr(s"1000000000L div ($k0 + rk_b)"), lit(0L))).as("rrf_e9"))
    fused
      .withColumn("rk",
        row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("rrf_e9").desc, col("cand_id").asc)).cast("long"))
      .filter(col("rk") <= k)
  }

  /** The fusion-agnostic hybrid retriever: ANY dense (query_id,
    * cand_id, rk) ranking — brute force, [[Similarity.ivfTopKIndexed]]
    * against a stored index, a PQ/ADC ranking — fused with the lexical
    * tower by RRF. This is the production serving shape: the dense
    * tower is computed (or served from an index) once and handed in;
    * the fusion never touches the corpus again. */
  def hybridTopKWith(
      denseRanking: DataFrame,
      docs: DataFrame,
      docIdCol: String,
      textCol: String,
      nQueries: Int,
      kEach: Int,
      k0: Int,
      k: Int,
      maxDfPermille: Int = 1000): DataFrame = {
    val dense = denseRanking.select(col("query_id"), col("cand_id"), col("rk"))
    val lex = lexicalTopK(docs, docIdCol, textCol, nQueries, kEach, maxDfPermille)
      .select(col("query_id"), col("cand_id"), col("rk"))
    rrfFuse(dense, lex, k0, k)
  }

  /** The composed hybrid retriever: dense cosine top-`kEach` (exact
    * brute force — swap in an IVF/PQ index via [[hybridTopKWith]] in
    * production, the fusion is ranking-agnostic) fused with lexical
    * top-`kEach` by RRF, serving the final top-`k`. Queries are ids <
    * `nQueries` on BOTH towers (documents and embeddings share the id
    * space). */
  def hybridTopK(
      docs: DataFrame,
      emb: DataFrame,
      docIdCol: String,
      textCol: String,
      vecIdCol: String,
      vecCol: String,
      nQueries: Int,
      kEach: Int,
      k0: Int,
      k: Int,
      maxDfPermille: Int = 1000): DataFrame =
    hybridTopKWith(
      Similarity.bruteForceTopK(emb, vecIdCol, vecCol, nQueries, kEach),
      docs, docIdCol, textCol, nQueries, kEach, k0, k, maxDfPermille)
}
