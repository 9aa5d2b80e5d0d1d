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
    * no global ordering bottleneck. Output: the input columns plus
    * (shard, n_tokens, bin) — carried columns ride through so a
    * composed pipeline (t28) keeps its per-doc attributes without a
    * join-back that would re-reference (and re-scan) the corpus. */
  def packByBudget(docs: DataFrame, idCol: String, nTokens: Column, budget: Int, shards: Int): DataFrame = {
    // carried-columns hazard: the generated names would silently
    // overwrite a caller's columns of the same name — fail loudly
    val clash = docs.columns.toSet.intersect(Set("shard", "n_tokens", "cum", "bin"))
    require(clash.isEmpty,
      s"packByBudget generates shard/n_tokens/cum/bin; input already has ${clash.mkString(", ")} — rename before packing")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs
      .withColumn("shard", col(idCol) % shards)
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("bin", expr(s"(cum - n_tokens) div $budget"))
      .drop("cum")
  }

  /** Sliding-window chunking: split each document's token stream into
    * overlapping context-window chunks — the pass that turns raw
    * documents into model-sized training/retrieval units. Chunk i
    * covers tokens [i·(size−overlap), i·(size−overlap)+size); chunks
    * start while their offset is inside the document, so every token
    * lands in at least one chunk and consecutive chunks share
    * `overlap` tokens. Documents with no tokens emit nothing.
    *
    * Scale shape: a pure per-row explode — no shuffle, no state; the
    * fan-out is bounded by n/(size−overlap)+1 chunks per document and
    * pipelines inside the feeding scan. Output: (id, chunk_idx,
    * n_tokens, chunk) with `chunk` re-joined as text. */
  def chunk(docs: DataFrame, idCol: String, textCol: String, size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val step = size - overlap
    val tk = graft.core.Par.widen(
      docs.select(col(idCol), graft.functions.Text.tokens(col(textCol)).as("tk")))
      .filter(size_(col("tk")) > 0)
    tk.select(
        col(idCol),
        col("tk"),
        explode(sequence(lit(0), floor((size_(col("tk")) - 1) / step).cast("int"))).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("tk"), col("chunk_idx") * step + 1, lit(size)).as("toks"))
      .select(
        col(idCol),
        col("chunk_idx"),
        size_(col("toks")).cast("long").as("n_tokens"),
        array_join(col("toks"), " ").as("chunk"))
  }
  // functions.size shadowed by the `size` parameter above
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

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

  /** Temperature-flattened domain resampling at τ = 0.5 — the
    * data-mixing recipe (multilingual / DoReMi-style) where the target
    * share of domain d is `√n_d / Σ√n_e`: big domains are downsampled,
    * the smallest keeps everything, and unlike [[weightedSample]] the
    * rates are DERIVED from the corpus's own domain statistics, not
    * hand-set. The keep rate reduces to `√(n_min / n_d)`, computed as
    * `floor(sqrt(n_min / n_d) · 1e6)` — IEEE division and square root
    * are both correctly rounded, so (unlike log-based weighting) the
    * rate is bit-identical in any engine at any corpus size, no
    * integer-overflow gymnastics.
    *
    * Scale shape: per-domain counts are one map-side-combined
    * aggregation (domains are driver-small by the same bound
    * [[weightedSample]] assumes); the rate table broadcasts; the keep
    * decision is the same pure per-row md5 filter — embarrassingly
    * parallel, reproducible across engines, runs and epochs.
    *
    * Output: the input columns plus `rate_e6` (kept rows only) —
    * carried columns ride through (the packByBudget convention), so a
    * composed pipeline keeps per-doc attributes without a join-back.
    * Note the rate table derives from THIS df: in a curation chain
    * the rates reflect the corpus as of this stage (post-gate,
    * post-dedup), which is what a mixing decision should see. */
  def temperatureMix(df: DataFrame, idCol: String, groupCol: String, seed: Int): DataFrame = {
    // the output carries a generated rate_e6; an input that already has
    // one would turn the rate join ambiguous — fail loudly instead
    require(!df.columns.contains("rate_e6"),
      "temperatureMix generates a rate_e6 column; input already has one — rename before mixing")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_d"))
    val ref = counts.agg(min(col("n_d")).as("n_m"))
    val rates = counts.crossJoin(broadcast(ref))
      .select(
        col(groupCol),
        floor(sqrt(col("n_m").cast("double") / col("n_d")) * 1000000.0).cast("long").as("rate_e6"))
    val h = pmod(
      graft.functions.Hashing.md5Long(concat(lit("mix:"), col(idCol).cast("string")), seed),
      lit(1000000L))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(h < col("rate_e6"))
      .select(df.columns.map(col) :+ col("rate_e6"): _*)
  }

  /** Deterministic stratified quota cap: keep at most `quota` rows per
    * `groupCol` stratum — the ones with the smallest md5 hash of the id
    * — i.e. an exact, reproducible uniform sample of K per group (the
    * per-domain cap step of corpus mixing; [[weightedSample]] is its
    * probabilistic cousin). Output adds `samp_rank` (1-based rank by
    * (hash, id) inside the stratum).
    *
    * Why not one big window: `row_number() over (partition by group)`
    * shuffles the ENTIRE corpus into as many partitions as there are
    * strata — with tens of sources and 100 TB that is a few-partition
    * sort of everything. Instead: (1) per-group counts (map-side
    * combined, tiny); (2) a pure map-side hash-threshold filter sized
    * so ~2×quota rows per stratum survive; (3) the exact rank window
    * over survivors only — the shuffle is O(strata × quota), not
    * O(corpus). A Chernoff-unlikely threshold shortfall (fewer than
    * `quota` survivors in an over-quota stratum) is detected by a
    * per-group recount and retried with 4× the margin, so the result
    * is always EXACTLY the quota smallest hashes — the thresholding is
    * invisible to semantics.
    *
    * Strata values must be non-null and driver-small in number (they
    * are sources/languages/domains by construction — the same bound
    * [[weightedSample]]'s rate map assumes).
    *
    * Input-size contract (r22, advice): the input is eagerly
    * MATERIALIZED once (three sequential consumers — see the cut note
    * in the body), so callers should feed a bounded/deduplicated
    * table (the kmv callers pass a distinct (group, elem) stream); a
    * raw corpus-sized input would turn three streamed scans into an
    * input-sized executor-storage materialization — prune or
    * pre-aggregate first. */
  def stratifiedCap(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      seed: Int,
      quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val MAX60 = 1L << 60 // md5Long is a 60-bit non-negative hash
    val h = graft.functions.Hashing.md5Long(concat(lit("cap:"), col(idCol).cast("string")), seed)
    // withH has three sequential consumers (the per-group count
    // collect, the survivor recount collect, and the returned plan's
    // own action) — without a cut each re-derives the INPUT from
    // source, which for the kmv callers means re-running a corpus-wide
    // distinct per consumer (r21, guide §2.4). One materialization;
    // the retry loop's re-filters also read the cut blocks.
    val withH = graft.core.Reliability.cut(df.withColumn("samp_h", h))
    val counts: Map[Any, Long] = withH.groupBy(col(groupCol)).count()
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    require(!counts.contains(null), s"stratifiedCap: NULL stratum in $groupCol")

    var margin = 2.0
    while (true) {
      val thr: Map[Any, Long] = counts.map { case (g, n) =>
        g -> (if (n <= quota) Long.MaxValue
              else math.min(MAX60.toDouble, MAX60.toDouble * margin * quota / n).toLong)
      }
      val thrCol = thr.foldLeft(lit(Long.MaxValue): Column) {
        case (acc, (g, t)) => when(col(groupCol) === lit(g), lit(t)).otherwise(acc)
      }
      val survivors = withH.filter(col("samp_h") < thrCol)
      val survCounts: Map[Any, Long] = survivors.groupBy(col(groupCol)).count()
        .collect().map(r => r.get(0) -> r.getLong(1)).toMap
      val short = counts.exists { case (g, n) =>
        n > quota && survCounts.getOrElse(g, 0L) < quota
      }
      if (!short) {
        val w = Window.partitionBy(col(groupCol)).orderBy(col("samp_h"), col(idCol))
        return survivors
          .withColumn("samp_rank", row_number().over(w).cast("long"))
          .filter(col("samp_rank") <= quota)
          .drop("samp_h")
      }
      margin *= 4
    }
    throw new IllegalStateException("unreachable")
  }

  /** KMV (k-minimum-values) distinct-count sketch — the approximate
    * counting shape that, unlike HLL (q22's engine-specific registers),
    * is EXACTLY reproducible in any engine: the estimate depends only
    * on the k-th smallest md5 of the distinct ids,
    * `est = floor((k-1) · 2⁶⁰ / h_k)`, and both engines compute the
    * same hashes, the same k-th minimum, and the same
    * correctly-rounded double division. A group with fewer than k
    * distinct ids reports its exact count (the sketch IS the set).
    *
    * Scale shape: one distinct on (group, id) — the only corpus-sized
    * shuffle — then [[stratifiedCap]]'s hash-threshold prefilter keeps
    * the per-group rank window O(strata × k), never a corpus sort; the
    * estimate is one map-side-combinable (count, max) aggregation over
    * strata × k rows. The 2⁶⁰ numerator and k−1 factor are exactly
    * representable doubles, h_k converts with one IEEE rounding, the
    * division rounds once — bit-identical cross-engine (the t21 sqrt
    * argument, division edition). */
  def kmvDistinct(df: DataFrame, idCol: String, groupCol: String, seed: Int, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val pairs = df.select(col(groupCol), col(idCol)).distinct()
    val capped = stratifiedCap(pairs, idCol, groupCol, seed, k)
      .withColumn("h",
        graft.functions.Hashing.md5Long(concat(lit("cap:"), col(idCol).cast("string")), seed))
    capped.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("h_k"))
      .select(
        col(groupCol),
        col("n_kept"),
        Sketch.kmvEstExpr(k, "n_kept", "h_k").as("est_distinct"))
  }
}
