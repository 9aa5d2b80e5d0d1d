package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing and deterministic-split operators for the
  * training-data pipeline surface: once a corpus is deduped and
  * quality-filtered, documents are (a) split reproducibly into
  * train/val/test and (b) packed into fixed token-budget batches for
  * sequence training.
  */
object Packing {

  /** Token-budget packing, sort-and-chunk form: within each shard,
    * documents in id order fill bins of `budget` tokens — a document
    * goes to the bin its cumulative START offset falls in. This is the
    * deterministic, distributed approximation of first-fit that
    * training pipelines use at scale (exact bin packing is NP-hard and
    * inherently sequential; sort-and-chunk wastes at most one
    * document's tokens per boundary).
    *
    * Scale shape: sharding makes the window partition-local —
    * `shards` independent cumulative sums, each a single sorted pass;
    * no global ordering bottleneck. Output: (id, shard, bin,
    * n_tokens). */
  def packByBudget(docs: DataFrame, idCol: String, nTokens: Column, budget: Int, shards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs
      .select(col(idCol), (col(idCol) % shards).as("shard"), nTokens.cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(
        col(idCol),
        col("shard"),
        expr(s"(cum - n_tokens) div $budget").as("bin"),
        col("n_tokens")
      )
  }

  /** Deterministic hash split: an md5-derived bucket in [0, 100)
    * computed from the id alone assigns each row to the first label
    * whose cumulative percentage covers the bucket. Stable across
    * runs, engines, and cluster layouts (no RNG, no sampling job), so
    * train/val/test membership is reproducible and join-free — the
    * property a training pipeline needs for leakage-proof splits.
    * `pcts` e.g. Seq("train" -> 80, "val" -> 10, "test" -> 10). */
  def hashSplit(df: DataFrame, idCol: String, seed: Int, pcts: Seq[(String, Int)]): DataFrame = {
    require(pcts.map(_._2).sum == 100, "split percentages must sum to 100")
    val bucket = pmod(
      graft.functions.Hashing.md5Long(concat(lit("split:"), col(idCol).cast("string")), seed),
      lit(100L))
    val cuts = pcts.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val assign = pcts.zip(cuts).foldRight(lit(pcts.last._1): Column) {
      case (((name, _), cut), rest) => when(bucket < cut, lit(name)).otherwise(rest)
    }
    df.withColumn("split", assign)
  }

  /** Deterministic domain-mixing sampler: keep each row with a
    * per-group probability (`ratesE6`, parts-per-million keyed by the
    * group column's value; `defaultE6` for unlisted groups), decided by
    * an md5 hash of the id — no RNG, so the sampled corpus is
    * reproducible across runs, engines, and cluster layouts, and the
    * same document is never in-sample for one epoch and out for the
    * next. This is the re-weighting step of training-data mixing
    * (up-/down-sampling sources to a target distribution), implemented
    * as a pure per-row filter: embarrassingly parallel, no shuffle. */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      seed: Int,
      ratesE6: Map[String, Long],
      defaultE6: Long): DataFrame = {
    require((ratesE6.values ++ Seq(defaultE6)).forall(r => r >= 0 && r <= 1000000),
      "rates are parts-per-million in [0, 1e6]")
    val h = pmod(
      graft.functions.Hashing.md5Long(concat(lit("mix:"), col(idCol).cast("string")), seed),
      lit(1000000L))
    val rate = ratesE6.toSeq.sortBy(_._1).foldLeft(lit(defaultE6): Column) {
      case (acc, (k, v)) => when(col(groupCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(h < rate)
  }
}
