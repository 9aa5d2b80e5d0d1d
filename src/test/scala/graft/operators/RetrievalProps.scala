package graft.operators

import graft.SparkSpec

/** Property-style tests of the lexical retriever's exactness claims
  * (seeded random corpora, DedupProps style): the inverted-index plan
  * plus df cap must produce EXACTLY the rarity-weighted overlap
  * ranking a driver-side brute force computes — candidate generation,
  * weights, cap semantics and tie-breaks all at once. */
class RetrievalProps extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu")

  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until nDocs).map { i =>
      // low vocabulary + skewed term popularity: common terms appear
      // in most docs (exercising the df cap), rare ones in few
      val len = 2 + rnd.nextInt(6)
      val words = (0 until len).map { _ =>
        val r = rnd.nextInt(10)
        if (r < 5) vocab(rnd.nextInt(3)) // hot terms
        else vocab(3 + rnd.nextInt(vocab.size - 3))
      }
      (i.toLong, words.mkString(" "))
    }
  }

  private def brute(docs: Seq[(Long, String)], nQueries: Int, k: Int,
      maxDfPermille: Int): Set[(Long, Long, Long, Long)] = {
    val terms: Map[Long, Set[String]] =
      docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSet }.toMap
    val n = docs.size.toLong
    val df: Map[String, Long] =
      terms.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val kept = df.filter { case (_, d) => d * 1000 <= maxDfPermille * n }
    val out = for {
      q <- docs.map(_._1) if q < nQueries
      scored = docs.map(_._1).filter(_ != q).flatMap { c =>
        val shared = terms(q).intersect(terms(c)).filter(kept.contains)
        val s = shared.toSeq.map(t => n / df(t)).sum
        if (shared.nonEmpty) Some((c, s)) else None
      }
      ranked = scored.sortBy { case (c, s) => (-s, c) }.take(k)
      ((c, s), i) <- ranked.zipWithIndex
    } yield (q, c, s, (i + 1).toLong)
    out.toSet
  }

  for (seed <- Seq(11, 42); cap <- Seq(1000, 500)) {
    test(s"lexicalTopK equals driver-side brute force (seed $seed, cap $cap permille)") {
      val docs = corpus(seed, 60)
      val got = Retrieval.lexicalTopK(docs.toDF("doc_id", "text"), "doc_id", "text",
          nQueries = 8, k = 5, maxDfPermille = cap)
        .select("query_id", "cand_id", "lex_score", "rk")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == brute(docs, nQueries = 8, k = 5, maxDfPermille = cap))
    }
  }
}
