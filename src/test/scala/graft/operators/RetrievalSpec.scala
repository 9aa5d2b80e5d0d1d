package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("lexicalTopK ranks by rarity-weighted distinct-term overlap") {
    // 5 docs; terms engineered so doc 0 (the query) shares the RARE
    // term with doc 3 and only common terms with docs 1/2
    val docs = Seq(
      (0L, "zebra the the a"), // query: {zebra, the, a}
      (1L, "the a b"),         // shares {the, a}
      (2L, "the c"),           // shares {the}
      (3L, "zebra d"),         // shares {zebra} - rare, df 2
      (4L, "e f")              // shares nothing
    ).toDF("doc_id", "text")
    // df: the->3, a->2, zebra->2 ; N=5 ; wt: the->1, a->2, zebra->2
    val out = Retrieval.lexicalTopK(docs, "doc_id", "text", nQueries = 1, k = 3)
      .select("query_id", "cand_id", "lex_score", "rk").as[(Long, Long, Long, Long)].collect()
      .sortBy(_._4)
    // scores: doc1 = wt(the)+wt(a) = 3, doc3 = wt(zebra) = 2, doc2 = 1
    assert(out.toSeq == Seq((0L, 1L, 3L, 1L), (0L, 3L, 2L, 2L), (0L, 2L, 1L, 3L)))
  }

  test("the df cap bars stopword-frequency terms from generating candidates") {
    // "the" is in 3/5 docs (600 permille): with the cap at 500 it may
    // not generate candidates or contribute weight, so doc 2 (sharing
    // ONLY "the" with the query) disappears and doc 1 is scored by
    // "a" alone
    val docs = Seq(
      (0L, "zebra the the a"),
      (1L, "the a b"),
      (2L, "the c"),
      (3L, "zebra d"),
      (4L, "e f")
    ).toDF("doc_id", "text")
    val out = Retrieval.lexicalTopK(docs, "doc_id", "text", nQueries = 1, k = 3, maxDfPermille = 500)
      .select("query_id", "cand_id", "lex_score", "rk").as[(Long, Long, Long, Long)].collect()
      .sortBy(_._4)
    // wt: a -> 2, zebra -> 2 ("the" capped); ties break on cand_id asc
    assert(out.toSeq == Seq((0L, 1L, 2L, 1L), (0L, 3L, 2L, 2L)))
  }

  test("rrfFuse sums reciprocal ranks with integer division, absent list contributes 0") {
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("query_id", "cand_id", "rk")
    val b = Seq((0L, 11L, 1L), (0L, 12L, 2L)).toDF("query_id", "cand_id", "rk")
    val out = Retrieval.rrfFuse(a, b, k0 = 60, k = 3)
      .select("cand_id", "rrf_e9", "rk").as[(Long, Long, Long)].collect().sortBy(_._3)
    val r1 = 1000000000L / 61 // rank-1 contribution
    val r2 = 1000000000L / 62
    // 11 is in both lists (r2 + r1), 10 and 12 in one each
    assert(out.toSeq == Seq((11L, r1 + r2, 1L), (10L, r1, 2L), (12L, r2, 3L)))
  }

  test("hybridTopK surfaces a candidate strong on both towers first") {
    // doc/vec id spaces aligned; candidate 5 matches the query's rare
    // terms AND its embedding direction; candidate 6 matches only
    // lexically, 7 only densely
    val docs = Seq(
      (0L, "quark boson lepton"),
      (5L, "quark boson lepton"),
      (6L, "quark boson lepton"),
      (7L, "x y z"),
      (8L, "p q r")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (5L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (6L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (7L, Array(0.9f, 0.0f, 0.1f, 0.0f)),
      (8L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Retrieval.hybridTopK(docs, emb, "doc_id", "text", "vec_id", "embedding",
        nQueries = 1, kEach = 3, k0 = 60, k = 4)
      .select("cand_id", "rk").as[(Long, Long)].collect().sortBy(_._2)
    assert(out.head._1 == 5L) // both towers -> highest fused score
    assert(out.map(_._1).toSet.intersect(Set(6L, 7L)) == Set(6L, 7L)) // single-tower hits present
  }

  test("hybridTopKWith serves the dense tower from an IVF index, fusion unchanged") {
    // an exhaustive index probe (nProbe = nCentroids) is exact, so the
    // indexed dense tower must reproduce hybridTopK's brute-force
    // fusion bit-for-bit — the fusion-agnostic claim, proved on the
    // production serving path
    val docs = Seq(
      (0L, "quark boson lepton"),
      (5L, "quark boson lepton"),
      (6L, "quark boson lepton"),
      (7L, "x y z"),
      (8L, "p q r")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (5L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (6L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (7L, Array(0.9f, 0.0f, 0.1f, 0.0f)),
      (8L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val index = Similarity.prepareIvfIndex(emb, "vec_id", "embedding", nCentroids = 3)
    val dense = Similarity.ivfTopKIndexed(
      emb.filter($"vec_id" < 1), "vec_id", "embedding", index, nProbe = 3, k = 3)
    val indexed = Retrieval.hybridTopKWith(dense, docs, "doc_id", "text",
        nQueries = 1, kEach = 3, k0 = 60, k = 4)
      .select("cand_id", "rrf_e9", "rk").as[(Long, Long, Long)].collect().sortBy(_._3)
    val brute = Retrieval.hybridTopK(docs, emb, "doc_id", "text", "vec_id", "embedding",
        nQueries = 1, kEach = 3, k0 = 60, k = 4)
      .select("cand_id", "rrf_e9", "rk").as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(indexed.toSeq == brute.toSeq)
  }
}
