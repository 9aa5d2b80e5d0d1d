package graft.sources

import graft.SparkSpec
import graft.core.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

/** A stand-in "live" transport: 3 fixed rows on page 0, empty pages
  * after — and it deliberately IGNORES the pushed range, proving the
  * reader's client-side re-check. Public no-arg ctor, instantiated by
  * the connector via reflection. */
class FixedPageTransport extends ApiTransport {
  override def fetchPage(req: ApiPageRequest): Iterator[Array[String]] =
    if (req.page == 0) Iterator.range(0, 3).map(i => ApiSimulator.genValues(i, "2031-07-09"))
    else Iterator.empty
}

/** DSv2 connector (S1 production path): pushdown of the `:updated_at`
  * CDC range into the source scan — the Spark twin of the reference's
  * SoQL `updated_on BETWEEN a AND b` (`extract.py:9-42`). */
class ApiConnectorSpec extends SparkSpec {

  private def read(): DataFrame =
    spark.read
      .format("graft-api")
      .option("totalRows", 500)
      .option("pageSize", 100)
      .option("baseDate", "2026-01-01")
      .option("nDays", 28)
      .load()

  private def apiScan(df: DataFrame): ApiScan =
    df.queryExecution.optimizedPlan
      .collect { case r: DataSourceV2ScanRelation => r.scan }
      .head
      .asInstanceOf[ApiScan]

  test("format is registered and serves the raw Socrata schema") {
    val df = read()
    assert(df.schema == Schemas.rawCrime)
    assert(df.count() == 500)
    // one InputPartition per API page
    assert(df.rdd.getNumPartitions == 5)
  }

  test("updated_at range pushes into the scan (no client-side filtering)") {
    val df = read().filter(col(":updated_at") >= "2026-01-05" && col(":updated_at") < "2026-01-10")
    val scan = apiScan(df)
    assert(scan.range.ge.contains("2026-01-05"))
    assert(scan.range.lt.contains("2026-01-10"))
    assert(scan.description().contains("2026-01-05"))
    // rows live on baseDate + (i % 28): i%28 in {4..8} -> 17 full cycles * 5 + 5
    assert(df.count() == 90)
    // and the values agree with the bounds
    val upd = df.select(":updated_at").distinct().as[String](org.apache.spark.sql.Encoders.STRING).collect()
    assert(upd.forall(v => v >= "2026-01-05" && v < "2026-01-10"))
  }

  test("equality and resume-shaped predicates push as a degenerate range") {
    val df = read().filter(col(":updated_at") === "2026-01-03T12:00:00.000")
    val scan = apiScan(df)
    assert(scan.range.ge.contains("2026-01-03T12:00:00.000"))
    assert(scan.range.le.contains("2026-01-03T12:00:00.000"))
    assert(df.count() == 18) // i%28 == 2: 17 cycles + 1 (500 = 17*28 + 24)
  }

  test("column pruning reaches the scan (SoQL $select analog)") {
    val df = read().select("id", "primary_type")
    val scan = apiScan(df)
    assert(scan.required.fieldNames.toSeq == Seq("id", "primary_type"))
    assert(df.distinct().count() == 500) // ids unique
  }

  test("limit pushes into the scan and prunes page partitions (page-cap analog)") {
    val df = read().limit(150)
    val scan = apiScan(df)
    assert(scan.limit.contains(150))
    assert(scan.planInputPartitions().length == 2) // ceil(150/100) pages instead of 5
    assert(df.count() == 150)
    // with a pushed filter, pages must NOT be pruned (a page can supply
    // fewer matching rows than generated), but the result stays correct
    val filtered = read().filter(col(":updated_at") >= "2026-01-20").limit(30)
    assert(apiScan(filtered).limit.contains(30))
    assert(filtered.count() == 30)
  }

  test("Runner runs end-to-end through the connector extract path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-runner-dsv2").toString
    val runner = new graft.pipeline.Runner(spark, dir, epochStart = "2026-01-01", tablePrefix = "dsv2t")
    val status = runner.runWithConnector(
      "run-dsv2", "2026-02-05",
      Map("totalRows" -> "400", "pageSize" -> "100", "baseDate" -> "2026-01-01", "nDays" -> "28"))
    assert(status == "SUCCESS")
    val crime = spark.read.parquet(s"$dir/warehouse_a/crime")
    assert(crime.count() == 400) // all 400 generated rows fall in the FULL window
    assert(crime.select("crime_id").distinct().count() == 400)
    assert(runner.logsA.read().filter(col("status") === "SUCCESS").count() == 1)
  }

  test("transport seam: a custom transport is selected by option, pushdown still enforced") {
    val df = spark.read
      .format("graft-api")
      .option("transport", classOf[FixedPageTransport].getName)
      .option("maxPages", 3)
      .option("pageSize", 100)
      .load()
    val scan = apiScan(df)
    assert(scan.transportClass == classOf[FixedPageTransport].getName)
    // 3 planned pages, only page 0 serves rows (empty-page end contract)
    assert(scan.planInputPartitions().length == 3)
    assert(df.count() == 3)
    assert(df.select(":updated_at").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().forall(_.startsWith("2031-07-09")))
    // a pushed limit must NOT prune pages for an unknown-fullness transport
    assert(apiScan(df.limit(2)).planInputPartitions().length == 3)
    // without maxPages a custom transport gets the reference's 50-page
    // cap, NOT a plan derived from the simulator's totalRows default
    // (that would silently truncate live data at ceil(5000/pageSize))
    val noCap = spark.read.format("graft-api")
      .option("transport", classOf[FixedPageTransport].getName)
      .option("pageSize", 100).load()
    assert(apiScan(noCap).planInputPartitions().length == 50)
    // the reader re-checks pushed predicates even if the transport
    // ignores the range (FixedPageTransport does)
    assert(df.filter(col(":updated_at") >= "2040-01-01").count() == 0)
    assert(df.filter(col(":updated_at") >= "2031-01-01").count() == 3)
  }

  test("the pushed range renders as the reference's SoQL WHERE clause") {
    val req = ApiPageRequest(0, 100,
      UpdatedRange(ge = Some("2026-01-05"), lt = Some("2026-01-10")), Map.empty)
    assert(req.soqlWhere == ":updated_at >= '2026-01-05' AND :updated_at < '2026-01-10'")
    assert(ApiPageRequest(0, 100, UpdatedRange(), Map.empty).soqlWhere == "")
  }

  test("non-range predicates stay client-side, results still correct") {
    val df = read().filter(col("primary_type") === "THEFT" && col(":updated_at") >= "2026-01-20")
    val scan = apiScan(df)
    assert(scan.range.ge.contains("2026-01-20"))
    // primary_type is NOT in the pushed range — evaluated post-scan
    assert(scan.range.le.isEmpty && scan.range.lt.isEmpty)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("primary_type") == "THEFT"))
  }
}
