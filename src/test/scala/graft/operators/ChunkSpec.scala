package graft.operators

import graft.SparkSpec

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, size: Int, overlap: Int): Seq[(Long, Long, String)] =
    Packing.chunk(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", size, overlap)
      .select("chunk_idx", "n_tokens", "chunk")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq

  test("windows overlap by exactly `overlap` tokens and cover every token") {
    // 10 tokens, size 4, overlap 2 -> starts 0,2,4,6,8
    val out = run("a b c d e f g h i j", 4, 2)
    assert(out == Seq(
      (0L, 4L, "a b c d"), (1L, 4L, "c d e f"), (2L, 4L, "e f g h"),
      (3L, 4L, "g h i j"), (4L, 2L, "i j")))
  }

  test("a document shorter than one window is a single short chunk") {
    assert(run("x y", 8, 2) == Seq((0L, 2L, "x y")))
  }

  test("an exact-multiple document has no trailing sliver beyond coverage") {
    // 6 tokens, size 3, overlap 0 -> exactly 2 chunks
    assert(run("a b c d e f", 3, 0) == Seq((0L, 3L, "a b c"), (1L, 3L, "d e f")))
  }

  test("empty documents emit nothing; bad geometry is rejected") {
    assert(run("", 4, 2).isEmpty)
    assert(run("   ", 4, 2).isEmpty)
    intercept[IllegalArgumentException](Packing.chunk(
      Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "text", 4, 4))
  }
}
