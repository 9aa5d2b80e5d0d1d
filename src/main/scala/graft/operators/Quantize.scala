package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar (int8-style) quantization of an embedding corpus — the
  * storage/serving compression step of a vector pipeline: each vector
  * is scaled by 127 / max|x_i| and floored to integers in [-127, 127].
  *
  * Determinism contract: the only float ops are one multiply and one
  * divide in double precision (both correctly rounded under IEEE-754,
  * so identical in every engine) followed by `floor` — no
  * transcendentals, so the quantized integers are bit-identical in the
  * DuckDB oracle. Spark `floor` truncates toward -inf in both engines;
  * the zero-vector guard keeps the expression total.
  *
  * Scale shape: one explode pass, a map-side-combinable max-agg for
  * the per-vector scale, one equi-join back on vec_id (AQE-broadcast
  * for small corpora, shuffle join at scale), then map-side-combined
  * stats. Long-form (vec_id, dim, q) is the natural storage layout for
  * a columnar int8 store.
  */
object Quantize {

  /** Long form: (vec_id, dim, q) with q = floor(x * 127 / max|x|). */
  def int8Long(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val e = emb.select(col(idCol).as("vec_id"), posexplode(col(vecCol)).as(Seq("dim", "x")))
    val m = e.groupBy("vec_id").agg(max(abs(col("x"))).as("mx"))
    e.join(m, "vec_id")
      .select(
        col("vec_id"),
        col("dim").cast("long").as("dim"),
        when(col("mx") === 0.0, lit(0L))
          .otherwise(floor(col("x").cast("double") * 127.0 / col("mx").cast("double")).cast("long"))
          .as("q")
      )
  }

  /** Per-vector quantization stats (compact oracle-checkable view):
    * sum/min/max of the quantized values. */
  def int8Stats(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    int8Long(emb, idCol, vecCol)
      .groupBy("vec_id")
      .agg(sum("q").as("sum_q"), min("q").as("min_q"), max("q").as("max_q"))
}
