package graft.operators

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "HEADER\nalpha beta\nuniq zero\nFOOTER"),
    (1L, "HEADER\ngamma delta\nuniq one\nFOOTER"),
    (2L, "HEADER\nepsilon\nuniq two\nFOOTER"),
    (3L, "HEADER\n\nuniq three\nFOOTER") // empty line preserved, never counted
  ).toDF("doc_id", "text")

  private lazy val out =
    Boilerplate.strip(docs, "doc_id", "text", maxDocFreq = 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap

  test("lines recurring in more docs than the bound are dropped everywhere") {
    assert(out(0L) == ((0L, "alpha beta\nuniq zero", 4L, 2L)))
    assert(out(1L) == ((1L, "gamma delta\nuniq one", 4L, 2L)))
    assert(out(2L) == ((2L, "epsilon\nuniq two", 4L, 2L)))
  }

  test("empty lines are preserved verbatim and never count as boilerplate") {
    assert(out(3L) == ((3L, "\nuniq three", 4L, 2L)))
  }

  test("a clean corpus round-trips byte-identical") {
    val clean = Seq((7L, "only\nunique\nlines")).toDF("doc_id", "text")
    val r = Boilerplate.strip(clean, "doc_id", "text", 2)
      .as[(Long, String, Long, Long)].collect().head
    assert(r == ((7L, "only\nunique\nlines", 3L, 0L)))
  }

  test("a document of pure boilerplate collapses to the empty string") {
    val all = (0 until 5).map(i => (i.toLong, "SAME\nSAME TOO")).toDF("doc_id", "text")
    val r = Boilerplate.strip(all, "doc_id", "text", 2)
      .as[(Long, String, Long, Long)].collect()
    assert(r.forall(x => x._2 == "" && x._3 == 2L && x._4 == 2L))
  }

  test("line order is restored from original positions") {
    val d = Seq((1L, "z last?\na first\nm middle"), (2L, "unrelated")).toDF("doc_id", "text")
    val r = Boilerplate.strip(d, "doc_id", "text", 5)
      .as[(Long, String, Long, Long)].collect().map(x => x._1 -> x._2).toMap
    assert(r(1L) == "z last?\na first\nm middle")
  }
}
