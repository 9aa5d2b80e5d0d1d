package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as Catalyst
  * column expressions (codegen-eligible built-ins; no UDFs).
  *
  * Determinism contract: all reductions fold left-to-right in index
  * order (`aggregate` over `zip_with`), and all arithmetic is double —
  * the DuckDB oracle reproduces the identical float sequence with
  * `list_aggregate(list_transform(...), 'sum')` in the same order.
  */
object Vectors {

  /** Left-to-right dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for zero-norm vectors (never occurs in the
    * testdata but keeps the expression total). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** Flat dot product for a statically-known dimension: `dim` element
    * products folded left-to-right from 0.0 — bit-identical to [[dot]]
    * (same IEEE order, same DuckDB twin) but a plain expression tree that
    * whole-stage codegen compiles, instead of an interpreted higher-order
    * fold. ~10× faster on the pair-scoring hot path; use whenever the
    * embedding dimension is known (it always is for a given table). */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim)
      .map(i => element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .foldLeft(lit(0.0))(_ + _)

  def normUnrolled(a: Column, dim: Int): Column = sqrt(dotUnrolled(a, a, dim))

  /** DuckDB SQL for [[dot]] with identical index-order summation. */
  def dotSql(a: String, b: String): String =
    s"list_aggregate(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')"

  def cosineSql(a: String, b: String): String = {
    val d = dotSql(a, b)
    val na = s"sqrt(${dotSql(a, a)})"
    val nb = s"sqrt(${dotSql(b, b)})"
    s"CASE WHEN $na * $nb = 0 THEN 0.0 ELSE $d / ($na * $nb) END"
  }
}
