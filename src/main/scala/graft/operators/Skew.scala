package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY.md §4, 100 TB posture).
  *
  * AQE's skew-join splitting handles most skew at runtime, but it can
  * only split what a sort-merge join already shuffled — a single giant
  * key still lands its probe rows in few tasks when the build side must
  * also co-locate. [[saltedJoin]] is the explicit remedy: spread each
  * key of the big side over `salts` sub-keys (deterministic hash of the
  * whole row — no `rand()`, so plans stay reproducible and retries
  * idempotent), replicate the dim side ×salts, and join on
  * (key, salt). Exactly the rows of `big ⋈ dims`, with per-key
  * parallelism multiplied by `salts` at the cost of a `salts`×dim-side
  * replication — use when the dim side is too big to broadcast but far
  * smaller than the skewed fact side.
  */
object Skew {

  /** Salted equi-join on `key` (same column name on both sides). */
  def saltedJoin(big: DataFrame, dims: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val b = big.withColumn("__salt", pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)))
    val d = dims.withColumn("__salt", explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    b.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
