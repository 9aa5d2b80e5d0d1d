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

  test("words carrying the separator bytes are excluded by contract") {
    val out = Tokenize.bpeMerges(docs("ok ok bad\u001etok bad\u001ftok"), "text", rounds = 1)
      .as[(Long, String, String, Long)].collect().toList
    assert(out == List((1L, "o", "k", 2L)))
  }
}
