package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.analytics.Queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Regenerates `PLANS.md`: the formatted physical plan of each headline
  * query, the artifact the 100 TB review reads — scans must show
  * PushedFilters/ReadSchema pruning, joins must be broadcast/equi (no
  * CartesianProduct/NestedLoop on the hot paths), aggregates must show
  * partial (map-side) modes, and WholeStageCodegen spans should cover
  * the row-wise work.
  *
  * Usage: `sbt "runMain graft.PlanDump [sfDir] [outFile]"`.
  */
object PlanDump {

  /** The queries whose plan shape carries the scale argument. */
  val headline: Seq[String] = Seq(
    "q02_filter",            // pushdown evidence
    "q05_broadcast_join",    // dim-join broadcast
    "q06_large_join",        // sort-merge equi-join
    "d01_minhash_lsh",       // fused signature agg + banded join
    "d02_simhash_pairs",     // fused bit-counter agg + pigeonhole banding
    "v04_sql_sketch_agg",    // the fused aggregate through spark.sql
    "d05_dedup_clusters",    // iterative component resolution (first round plan)
    "d08_canonical_docs",    // per-cluster argmax: one combinable agg, no corpus window
    "s04_ann_ivf",           // map-side argmax assignment
    "s05_quantize",          // explode + combine + join-back
    "t04_text_stats",        // exact-integer aggregation
    "t07_corpus_curation",   // composed anti-join pipeline
    "st04_interval_join",    // interval join (batch twin of the stream)
    "p01_upsert_merge",      // keep-latest merge core
    "j02_asof_join",         // union + single-window as-of shape
    "j03_range_join",        // bucketed non-equi → equi rewrite
    "q29_salted_join",       // salted skew join
    "p03_incremental_rollup", // state + batch combine (no history lineage)
    "q30_bloom_join",        // bloom probe filters before the join
    "d06_set_similarity_join", // prefix-filtered exact set-similarity join
    "t12_decontaminate",     // broadcast semi-join against the eval-gram set
    "s06_semantic_decontaminate", // broadcast eval scoring + map-side argmax
    "d07_incremental_dedup", // batch bands broadcast against corpus bands
    "s07_embedding_incremental_dedup", // batch SRP chunks broadcast vs stored corpus codes
    "s08_ann_ivf_indexed",   // query batch probes the stored quantizer + inverted file
    "t14_boilerplate_strip", // line-df shuffle carries hashes, text never moves twice
    "t16_top_ngram_mass",    // zero-shuffle codegen'd per-row gram counting
    "t17_stratified_cap",    // hash-threshold prefilter ahead of the rank window
    "t18_dup_spans",         // fixed-width (hash,id,pos) shuffle + seed-only window
    "s09_ann_recall",        // sample-bounded truth join vs the IVF path
    "t19_vocab_coverage",    // TakeOrdered top-K, window over 100 rows only
    "t20_lm_score",          // position stream joins two combinable count tables
    "s11_pq_adc",            // codes join the broadcast query distance table
    "s12_ivf_pq",            // probed cells bound candidates; ADC bounds per-candidate cost
    "s13_hybrid_rrf",        // inverted-index postings join + rank-only fusion
    "g01_graph_rank",        // iterative edge join + map-side-combined inflow (final round plan)
    "g02_graph_rank_weighted", // weighted twin: weights ride the same edge shuffle
    "st06_stream_neardup_ttl", // TTL near-dup batch twin: banded flatMapGroupsWithState shape
    "d09_corpus_overlap",    // k-row sketch merge; sketch cut once, corpus touched by distinct + cap
    // t23_bpe_merges is deliberately absent: its result is a driver-built
    // merge table (LocalTableScan) — the interesting per-round pair-count
    // plans run inside the loop and aren't visible from the final frame
    "t24_heavy_hitters",     // single MG sketch agg (map-side combined) + exact validation join
    "st07_stream_heavy_hitters", // windowed MG sketch (one state row per hour) + contract join
    "t25_bpe_apply",         // merge replay + subword count, all on the vocab table
    "j04_band_join_auto",    // LEFT OUTER band join through the rewrite rule (bucketed explode + copy-resolution window)
    "j05_band_join_full_outer", // FULL OUTER band join through the rewrite rule (union of the two proven constructions)
    "j06_band_join_right_outer", // RIGHT OUTER band join through the rewrite rule (mirrored LeftOuter construction)
    "q36_aqe_skew_join",     // AQE-planned skew split (the 100 TB answer; q29's salting is the fallback)
    "t26_cms_frequency",     // one-scan CMS counter build; probes join the broadcast bounded sketch
    "t27_quantile_maintenance", // 4-batch quantile-summary fold: bounded windows, no history rescan
    "t28_curation_chain",    // full curation pipeline as one program: per-signal scans join back by id
    "t29_cms_maintenance",   // 4-batch CMS counter fold == whole-stream build
    "t30_user_quantiles",    // single=false fold stays hash-partitioned: no single-partition exchange
    "st09_stream_distinct",  // windowed KMV: one bounded-blob agg per window, estimate read off the sketch
    "d10_kmv_maintenance",   // 4-batch k-minima fold == whole-corpus build; every fold stage ≤ 2k rows/group
    "s16_ivf_incremental",   // 4-batch posting fold == whole-corpus assignment; quantizer broadcast per batch, corpus cut once
    "s17_pq_incremental"     // 4-batch code fold == whole-corpus encode; codebook broadcast per batch, last fold retires deletes
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outFile = if (args.length > 1) args(1) else "PLANS.md"
    // withExtensions + the lowered band-join guard = PARITY with the
    // Verify/Bench gate sessions (r15 verdict ask 2): without them the
    // dumped j04/j05/j06 sections showed the STOCK SortMergeJoin the
    // gate sessions never actually run — the committed plans must be
    // the rewritten ones the annotations (and 100 TB review) describe.
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.plans.RangeJoinRewrite.SmallRightBytesKey, "65536")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val byName = Queries.all.map(q => q.name -> q).toMap
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` against `$sfDir`. Regenerate with\n")
    sb.append("`sbt \"runMain graft.PlanDump\"` after plan-shaping changes. What to\n")
    sb.append("look for: `PushedFilters`/`ReadSchema` on scans (pruning reaches the\n")
    sb.append("source), `BroadcastHashJoin` on dim joins, partial/final\n")
    sb.append("`HashAggregate` pairs (map-side combine), no `CartesianProduct` or\n")
    sb.append("`BroadcastNestedLoopJoin` on hot paths, and wide codegen spans.\n")
    sb.append("Declared exceptions: d04's bounded quadratic baseline, and the\n")
    sb.append("`BroadcastNestedLoopJoin`s in s04 (broadcast of <= nCentroids\n")
    sb.append("~sqrt N rows), s06 (broadcast of the small eval set), s09\n")
    sb.append("(inherits s01's broadcast of the 20-query eval sample and s04's\n")
    sb.append("centroid loop), s12 (the same coarse-centroid loop) and s13\n")
    sb.append("(inherits s01's dense tower; the lexical tower's 1-row corpus-\n")
    sb.append("total broadcast) and t28 (temperatureMix's 1-row min-count\n")
    sb.append("reference broadcast-crossed into the per-lang rate table) —\n")
    sb.append("per-row scored loops against a broadcast constant, not\n")
    sb.append("data-sized joins.\n")

    headline.foreach { name =>
      val q = byName(name)
      val plan = q.fn(spark, sfDir).queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    Files.write(Paths.get(outFile), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $outFile")
    spark.stop()
  }
}
