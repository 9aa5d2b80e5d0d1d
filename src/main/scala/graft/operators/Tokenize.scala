package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.core.Reliability
import graft.functions.Text

/** Distributed BPE merge training — the tokenizer-construction pass of
  * an LLM data pipeline (Sennrich et al., "Neural Machine Translation
  * of Rare Words with Subword Units", ACL'16).
  *
  * Shape: the corpus is crossed EXACTLY ONCE, by the word-frequency
  * aggregation (map-side-combinable groupBy on the token — the only
  * corpus-sized shuffle). Every merge round after that runs on the
  * VOCABULARY table (distinct words × their frequencies) — the same
  * working-set reduction production BPE trainers (subword-nmt,
  * SentencePiece, HF tokenizers) rely on, and what makes the loop
  * viable at 100 TB: a trillion tokens still collapse to a
  * tens-of-millions-row vocab. Per round: one map-side-combinable pair
  * count over the vocab, one TakeOrdered(1) for the argmax pair (a
  * bounded driver scalar, like the A1 high-water-mark cursor — the
  * merge choice is inherently sequential), and one per-row literal
  * replace to apply it; the vocab table's lineage is cut per round
  * under the [[Reliability]] policy (the engine's iterative shape,
  * fourth instance).
  *
  * Symbol encoding: each word is held as a single string with every
  * symbol wrapped as `\u001e sym \u001f`. The full bracketing makes a
  * pair pattern `␞x␟␞y␟` unambiguous at symbol boundaries (a naive
  * space-separated form mis-merges across adjacent symbols whose
  * delimiters overlap), and the leftmost non-overlapping scan both
  * engines' literal `replace` performs IS greedy left-to-right BPE
  * application (`[x,x,x]` with merge (x,x) → `[xx,x]`). Words
  * containing the separator bytes themselves are filtered out
  * (documented contract; they cannot occur in whitespace tokens of
  * well-formed text).
  *
  * Determinism: pair counts are exact longs; the winning pair breaks
  * ties by (count desc, lhs asc, rhs asc) binary string order —
  * bit-identical cross-engine.
  */
object Tokenize {

  /** Train `rounds` BPE merges over the whitespace tokens of
    * `docs(textCol)` (lowercased). Returns one row per learned merge:
    * (merge_rank, lhs, rhs, pair_n) — the merge table a tokenizer is
    * built from, in training order. Stops early if the corpus runs out
    * of multi-symbol words. */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one merge round")
    val spark = docs.sparkSession
    val RS = "\u001e"
    val US = "\u001f"

    // corpus → vocab: the one corpus-sized pass
    var vocab = docs
      .select(explode(Text.tokens(lower(col(textCol)))).as("w"))
      .where(!col("w").contains(RS) && !col("w").contains(US))
      .groupBy("w").agg(count(lit(1)).cast("long").as("f"))
      .select(col("f"), regexp_replace(col("w"), "(.)", s"$RS$$1$US").as("sym"))
      .transform(Reliability.cut)

    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top: Array[Row] = vocab
        .select(col("f"),
          expr(s"transform(filter(split(sym, '$US'), x -> x != ''), x -> substring(x, 2))").as("a"))
        .where(size(col("a")) >= 2)
        .select(col("f"),
          explode(expr(
            "transform(sequence(0, size(a) - 2), " +
              "i -> named_struct('lhs', element_at(a, i + 1), 'rhs', element_at(a, i + 2)))")).as("pr"))
        .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
        .agg(sum(col("f")).as("n"))
        .orderBy(col("n").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .collect()
      top.headOption match {
        case None => exhausted = true
        case Some(row) =>
          val (l, rr, n) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((r.toLong, l, rr, n))
          vocab = vocab
            .withColumn("sym",
              replace(col("sym"), lit(s"$RS$l$US$RS$rr$US"), lit(s"$RS$l$rr$US")))
            .transform(Reliability.cut)
          r += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("merge_rank", "lhs", "rhs", "pair_n")
  }

  /** Apply a trained merge list — the SERVING half of [[bpeMerges]]
    * (the engine's prepare/serve discipline, tokenizer edition): every
    * word is segmented by replaying the merges in training order (the
    * same wrap encoding and leftmost-non-overlapping replace, so
    * applying right after training reproduces the training-time
    * segmentation exactly), then the corpus's subword-token frequency
    * table comes out of one map-side-combinable aggregation. The merge
    * list is a bounded driver-side artifact (what a tokenizer SHIPS);
    * the corpus is crossed once for word frequencies and every
    * replay + count runs on the vocab table.
    *
    * Returns (token, n) — subword occurrences weighted by word
    * frequency. */
  def bpeApply(
      docs: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val RS = "\u001e"
    val US = "\u001f"
    val vocab = docs
      .select(explode(Text.tokens(lower(col(textCol)))).as("w"))
      .where(!col("w").contains(RS) && !col("w").contains(US))
      .groupBy("w").agg(count(lit(1)).cast("long").as("f"))
      .select(col("f"), regexp_replace(col("w"), "(.)", s"$RS$$1$US").as("sym"))
    val applied = merges.foldLeft(col("sym")) { case (c, (l, r)) =>
      replace(c, lit(s"$RS$l$US$RS$r$US"), lit(s"$RS$l$r$US"))
    }
    vocab
      .withColumn("applied_sym", applied)
      .select(col("f"),
        explode(expr(s"transform(filter(split(applied_sym, '$US'), x -> x != ''), x -> substring(x, 2))"))
          .as("token"))
      .groupBy("token").agg(sum(col("f")).as("n"))
  }
}
