package graft.analytics

import graft.SparkSpec
import graft.sources.LandingZone

/** Physical-plan audits — the properties that decide 100 TB behavior,
  * asserted on `.explain`-level plan text so a regression that silently
  * turns a bucketed join into a cartesian product fails CI, not the
  * cluster.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val q = Queries.all.find(_.name == name).get
    q.fn(spark, sf0001).queryExecution.executedPlan.toString
  }

  test("q02: range + IN filters are pushed into the parquet scan") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("IsNotNull(l_shipdate"))
  }

  test("q01: column pruning — the scan reads only projected columns") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment") && !p.contains("l_shipinstruct"))
  }

  test("q05: dimension joins broadcast") {
    assert(plan("q05_broadcast_join").contains("BroadcastHashJoin"))
  }

  test("LSH operators never plan a cartesian or nested-loop join") {
    // the whole point of the banded candidate generation: every join is
    // an equi-join on a band/bucket key or an id
    Seq("d01_minhash_lsh", "d02_simhash_pairs", "d03_embedding_neardup", "s02_ann_lsh",
        "j02_asof_join", "j03_range_join", "d06_set_similarity_join").foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$n plans a nested-loop join")
    }
  }

  test("s04 IVF: assignment aggregates with map-side combine, no N×C window sort") {
    val p = plan("s04_ann_ivf")
    // the r3 shape ranked all N×C scored rows through one Window
    // (Exchange + Sort over the crossJoin output); the r4 shape is a
    // hash aggregation with partial (map-side) combine before the
    // shuffle, so no Window may consume a crossJoin anymore
    assert(!p.contains("CartesianProduct"), "IVF must broadcast the centroid side")
    assert(p.contains("max_by"), "assignment should be a max_by aggregation")
    // exactly one Window remains: the final per-query top-k ranking
    assert("(?m)Window".r.findAllIn(p).size <= 2, s"unexpected extra Window stages:\n$p")
  }

  test("d01 minhash: one fused signature aggregate, not 64 min-aggs") {
    val p = plan("d01_minhash_lsh")
    assert(p.contains("minhashsig") || p.contains("MinHashSig"), "fused TypedImperativeAggregate missing")
    assert(!p.contains("m63"), "the 64-column min-agg shape is back")
  }

  test("landing-zone read prunes load_date partitions in the scan") {
    val root = java.nio.file.Files.createTempDirectory("landing").toString + "/raw"
    Seq(("C1", "2024-01-05T10:00:00.000"), ("C2", "2024-02-06T10:00:00.000")).foreach { case (id, d) =>
      // go through the real writer so the layout matches production
      val raw = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row.fromSeq(
          graft.core.Schemas.rawCrime.fieldNames.map {
            case "id"   => id
            case "date" => d
            case _      => null
          }.toSeq))),
        graft.core.Schemas.rawCrime)
      LandingZone.write(raw, root, d.take(10))
    }
    val pruned = LandingZone.read(spark, root, Seq("2024-01-05"))
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("load_date"))
    assert(pruned.count() == 1)
  }
}
