package graft.operators

import graft.SparkSpec

/** [[Tokenize.bpeMerges]] — distributed BPE merge training. */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) = texts.toDF("text")

  test("merges follow (count desc, pair asc) and apply before the next round") {
    // vocab: aa f=2, ab f=1 → round 1 merges (a,a) n=2; after applying,
    // only ab still has a pair → round 2 merges (a,b) n=1; then dry
    val out = Tokenize.bpeMerges(docs("aa ab", "aa"), "text", rounds = 5)
      .as[(Long, String, String, Long)].collect().toList
    assert(out == List((1L, "a", "a", 2L), (2L, "a", "b", 1L)))
  }

  test("equal counts tie-break to the lexicographically smallest pair") {
    val out = Tokenize.bpeMerges(docs("xy ab"), "text", rounds = 1)
      .as[(Long, String, String, Long)].collect().toList
    assert(out == List((1L, "a", "b", 1L)))
  }

  test("overlapping occurrences count per position and merge leftmost-greedy") {
    // 'aaa': two adjacent (a,a) positions → n=2; greedy application
    // yields [aa, a], so round 2 merges (aa, a), then the word is one
    // symbol and training stops early
    val out = Tokenize.bpeMerges(docs("aaa"), "text", rounds = 4)
      .as[(Long, String, String, Long)].collect().toList
    assert(out == List((1L, "a", "a", 2L), (2L, "aa", "a", 1L)))
  }

  test("word frequencies weight the pair counts") {
    // er appears in 3 distinct words with total frequency 5; the (e,r)
    // pair outweighs every pair of the single rarer word
    val out = Tokenize.bpeMerges(
      docs("er er her", "per xq", "er her per"), "text", rounds = 1)
      .as[(Long, String, String, Long)].collect().toList
    assert(out == List((1L, "e", "r", 7L)))
  }

  test("bpeApply replays the trained merges and counts subwords") {
    // vocab: low f=2, lower f=1. round 1: (l,o) and (o,w) tie at 3,
    // lexicographic pick (l,o); round 2: (lo,w) n=3. applying both:
    // low -> [low], lower -> [low, e, r]
    val d = docs("low low lower")
    val m = Tokenize.bpeMerges(d, "text", rounds = 2)
      .orderBy("merge_rank").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
    assert(m == Seq(("l", "o"), ("lo", "w")))
    val out = Tokenize.bpeApply(d, "text", m)
      .as[(String, Long)].collect().toMap
    assert(out == Map("low" -> 3L, "e" -> 1L, "r" -> 1L))
  }

  test("incremental pair counts match a full-recount reference over many rounds") {
    // r15: pair counts are delta-maintained after round 1 — replay the
    // exact Sennrich algorithm driver-side (full recount each round,
    // greedy leftmost application) and demand identical merge tables,
    // counts included, deep into training where every count is the sum
    // of many deltas
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quicker brown foxes jump over lazy dogs daily",
      "low lower lowest slow slower slowest",
      "banana bandana ban bananas and and and the the")
    def reference(rounds: Int): List[(Long, String, String, Long)] = {
      var vocab: Map[Vector[String], Long] = texts
        .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => (w.map(_.toString).toVector, ws.size.toLong) }
      val out = List.newBuilder[(Long, String, String, Long)]
      for (r <- 1 to rounds) {
        val counts = vocab.toSeq.flatMap { case (syms, f) =>
          syms.zip(syms.tail).map(p => (p, f))
        }.groupBy(_._1).map { case (p, fs) => (p, fs.map(_._2).sum) }
        if (counts.nonEmpty) {
          val ((l, rr), n) = counts.minBy { case ((l, rr), n) => (-n, l, rr) }
          out += ((r.toLong, l, rr, n))
          def merge(v: Vector[String]): Vector[String] = {
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < v.length) {
              if (i + 1 < v.length && v(i) == l && v(i + 1) == rr) { b += l + rr; i += 2 }
              else { b += v(i); i += 1 }
            }
            b.result()
          }
          vocab = vocab.toSeq.map { case (v, f) => (merge(v), f) }
            .groupBy(_._1).map { case (v, fs) => (v, fs.map(_._2).sum) }
        }
      }
      out.result()
    }
    val got = Tokenize.bpeMerges(docs(texts: _*), "text", rounds = 12)
      .orderBy("merge_rank")
      .as[(Long, String, String, Long)].collect().toList
    assert(got == reference(12))
  }

  test("the distributed fold path produces the same merges as the single-partition path") {
    // the small-working-set threshold routes every fixture through the
    // coalesce(1) fold; force the shuffled path and demand identical
    // output (partitioning must never change counts or tie-breaks)
    val d = docs("the quick brown fox", "the slow brown dog", "low lower lowest the")
    val small = Tokenize.bpeMerges(d, "text", rounds = 8)
      .as[(Long, String, String, Long)].collect().toList
    spark.conf.set(Tokenize.SmallFoldRowsKey, "0")
    try {
      val dist = Tokenize.bpeMerges(d, "text", rounds = 8)
        .as[(Long, String, String, Long)].collect().toList
      assert(dist == small)
    } finally spark.conf.unset(Tokenize.SmallFoldRowsKey)
  }

  test("words carrying the separator bytes are excluded by contract") {
    val out = Tokenize.bpeMerges(docs("ok ok bad\u001etok bad\u001ftok"), "text", rounds = 1)
      .as[(Long, String, String, Long)].collect().toList
    assert(out == List((1L, "o", "k", 2L)))
  }
}
