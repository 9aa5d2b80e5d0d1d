package graft.operators

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 0
    (2L, "completely different content about spark engines here"),
    (3L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (4L, "xy")                                             // shorter than one shingle
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content") {
    val out = Dedup.exact(docs, "doc_id", "text").filter($"n_copies" > 1)
      .select("keep_id", "n_copies").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 2L)))
  }

  test("minhash LSH finds the near-duplicate pair and the exact pair") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))  // identical → jaccard 1.0
    assert(pairs.contains((0L, 1L)))  // 8-of-9 tokens shared → high jaccard
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("simhash of identical docs is identical; pairs found within hamming 3") {
    val sh = Dedup.simhashTable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sh(0L) == sh(3L))
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("shingles guard short docs") {
    val sh = docs.select(Text.shingles(Text.tokens($"text"), 3).as("sh"))
      .filter(size($"sh") === 0).count()
    assert(sh == 1) // only the "xy" doc
  }

  test("embedding near-dup finds parallel vectors only") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(2.0f, 0.0f, 0.0f)),   // same direction as 0
      (2L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.99, numPlanes = 8, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 1L))) // parallel vectors share every SRP bucket

  }
}
