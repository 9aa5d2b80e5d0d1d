package graft.operators

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization scales by 127/max|x| and floors") {
    val emb = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)) // zero vector -> all zeros, no div-by-zero
    ).toDF("vec_id", "embedding")
    val q = Quantize.int8Long(emb, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).map(_._3).toSeq }
    // max|x| = 1.0: quantized = floor(127*x) = 127, -64, 31, 0
    assert(q(1L) == Seq(127L, -64L, 31L, 0L))
    assert(q(2L) == Seq(0L, 0L, 0L, 0L))
  }

  test("stats view aggregates the long form") {
    val emb = Seq((7L, Array(0.5f, -1.0f))).toDF("vec_id", "embedding")
    val r = Quantize.int8Stats(emb, "vec_id", "embedding")
      .as[(Long, Long, Long, Long)].collect().head
    // scale 127: floor(63.5) = 63, floor(-127) = -127
    assert(r == ((7L, -64L, -127L, 63L)))
  }
}
