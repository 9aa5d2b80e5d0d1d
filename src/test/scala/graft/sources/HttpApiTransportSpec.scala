package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import graft.core.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

/** [[HttpApiTransport]] end-to-end against an in-process HTTP server
  * (no network): the DSv2 connector drives real POSTs with the
  * reference's body shape, the server records what arrived, and the
  * reader's client-side re-check is proven by a server that ignores
  * the pushed range. */
class HttpApiTransportSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  /** Serves the simulator's deterministic rows (250 rows, 28-day
    * spread) WITHOUT applying the SoQL WHERE — pushdown must arrive in
    * the body, but correctness must not depend on the server honoring
    * it. Nulls are omitted from the JSON objects (the Socrata shape:
    * absent key = null). */
  private final class PageHandler extends com.sun.net.httpserver.HttpHandler {
    val seenQueries = new ConcurrentLinkedQueue[String]()
    val seenTokens = new ConcurrentLinkedQueue[String]()
    val failFirst = new AtomicInteger(0) // requests to fail before serving
    val failStatus = new AtomicInteger(503) // status those failures return
    val totalRows = 250

    override def handle(ex: HttpExchange): Unit = {
      val body = mapper.readTree(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      seenQueries.add(body.get("query").asText())
      Option(ex.getRequestHeaders.getFirst("X-App-Token")).foreach(seenTokens.add)
      if (failFirst.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        ex.sendResponseHeaders(failStatus.get(), -1); ex.close(); return
      }
      val page = body.get("page").get("pageNumber").asInt() // 1-based
      val pageSize = body.get("page").get("pageSize").asInt()
      val start = (page - 1) * pageSize
      val end = math.min(start + pageSize, totalRows)
      val arr = mapper.createArrayNode()
      val base = java.time.LocalDate.parse("2026-01-01")
      (start until math.max(start, end)).foreach { i =>
        val obj = arr.addObject()
        Schemas.rawCrime.fieldNames
          .zip(ApiSimulator.genValues(i, base.plusDays(i % 28).toString))
          .foreach { case (f, v) => if (v != null) obj.put(f, v) }
      }
      val out = mapper.writeValueAsBytes(arr)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    }
  }

  private val handler = new PageHandler
  private val server = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/query.json", handler)
    s.createContext("/missing.json", (ex: HttpExchange) => { ex.sendResponseHeaders(404, -1); ex.close() })
    s.start()
    s
  }
  override def afterAll(): Unit = { server.stop(0); super.afterAll() }

  private def endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/query.json"

  private def read(extra: (String, String)*): DataFrame = {
    var r = spark.read
      .format("graft-api")
      .option("transport", classOf[HttpApiTransport].getName)
      .option("endpoint", endpoint)
      .option("pageSize", 100)
      .option("maxPages", 5)
      .option("httpbackoffms", 10)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  private def apiScan(df: DataFrame): ApiScan =
    df.queryExecution.optimizedPlan
      .collect { case r: DataSourceV2ScanRelation => r.scan }
      .head.asInstanceOf[ApiScan]

  test("the connector reads every page through real POSTs, stopping on the empty page") {
    handler.seenQueries.clear()
    val df = read()
    assert(df.count() == 250) // 3 data pages of 100/100/50 + 2 empty (maxPages 5)
    assert(df.schema == Schemas.rawCrime)
    // every page carried the reference body shape; no WHERE was pushed
    assert(handler.seenQueries.size() == 5)
    handler.seenQueries.forEach(q => assert(q == "SELECT *"))
  }

  test("pushdown reaches the server as SoQL WHERE and the reader still re-checks") {
    handler.seenQueries.clear()
    val df = read().filter(col(":updated_at") >= "2026-01-05" && col(":updated_at") < "2026-01-10")
    val scan = apiScan(df)
    assert(scan.range.ge.contains("2026-01-05") && scan.range.lt.contains("2026-01-10"))
    // 250 rows on a 28-day wheel: 8 full cycles x 5 matching days + 5
    // in the 26-day remainder — the SERVER ignored the WHERE, so this
    // count is the client-side re-check working
    assert(df.count() == 45)
    val qs = {
      val b = Seq.newBuilder[String]; handler.seenQueries.forEach(q => { b += q; () }); b.result()
    }
    assert(qs.nonEmpty && qs.forall(q =>
      q == "SELECT * WHERE :updated_at >= '2026-01-05' AND :updated_at < '2026-01-10'"))
  }

  test("the app token option rides the X-App-Token header, like the reference") {
    handler.seenTokens.clear()
    assert(read("appToken" -> "sekret-token").count() == 250)
    assert(handler.seenTokens.size() == 5)
    handler.seenTokens.forEach(t => assert(t == "sekret-token"))
  }

  test("transient 5xx responses retry with backoff and the read succeeds") {
    handler.failStatus.set(503)
    handler.failFirst.set(2) // first two requests 503, then healthy
    assert(read("httpretries" -> "3").count() == 250)
    assert(handler.failFirst.get() == 0)
  }

  test("429 rate-limit responses retry with backoff and the read succeeds") {
    // the Socrata throttle answer: 429 is retryable exactly like 5xx —
    // back off and re-POST the same page, no typed failure
    handler.failStatus.set(429)
    handler.failFirst.set(2)
    try assert(read("httpretries" -> "3").count() == 250)
    finally handler.failStatus.set(503)
    assert(handler.failFirst.get() == 0)
  }

  test("exhausted retries surface the typed page error with the last status") {
    handler.failFirst.set(50) // outlasts every transport retry and task attempt
    try {
      val e = intercept[Exception](read("httpretries" -> "1", "maxPages" -> "1").count())
      def causes(t: Throwable): Seq[Throwable] = if (t == null) Nil else t +: causes(t.getCause)
      val pageErr = causes(e).collectFirst { case a: ApiPageFetchException => a }
      assert(pageErr.isDefined)
      assert(pageErr.get.getMessage.contains("503") && pageErr.get.page == 0)
    } finally handler.failFirst.set(0)
  }

  test("a connect failure retries then carries the IOException as the cause") {
    // nothing listens on the endpoint: client.send throws IOException,
    // the transport retries, then wraps the last one in the typed error
    val closed = spark.read
      .format("graft-api")
      .option("transport", classOf[HttpApiTransport].getName)
      .option("endpoint", "http://127.0.0.1:1/query.json")
      .option("pageSize", 100)
      .option("maxPages", 1)
      .option("httpretries", 1)
      .option("httpbackoffms", 1)
      .option("httptimeoutms", 2000)
      .load()
    val e = intercept[Exception](closed.count())
    def causes(t: Throwable): Seq[Throwable] = if (t == null) Nil else t +: causes(t.getCause)
    val pageErr = causes(e).collectFirst { case a: ApiPageFetchException => a }
    assert(pageErr.isDefined)
    assert(pageErr.get.getCause.isInstanceOf[java.io.IOException])
  }

  test("a page failure past the transport budget is healed by Spark task retry") {
    // the contract the class doc claims — "task retry IS page retry":
    // with ZERO transport retries, the first request 503s, that task
    // attempt dies with ApiPageFetchException, and the local[4, 2]
    // scheduler's second attempt re-POSTs the same page and succeeds
    handler.failFirst.set(1)
    assert(read("httpretries" -> "0").count() == 250)
    assert(handler.failFirst.get() == 0)
  }

  test("a non-retryable status fails fast with the typed page error") {
    val df = read().filter(lit(true)) // fresh plan
    val bad = spark.read
      .format("graft-api")
      .option("transport", classOf[HttpApiTransport].getName)
      .option("endpoint", endpoint.replace("query.json", "missing.json"))
      .option("pageSize", 100)
      .option("maxPages", 1)
      .load()
    val e = intercept[Exception](bad.count())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    val pageErr = causes(e).collectFirst { case a: ApiPageFetchException => a }
    assert(pageErr.isDefined, s"expected ApiPageFetchException in ${causes(e).map(_.getClass.getName)}")
    assert(pageErr.get.getMessage.contains("404") && pageErr.get.page == 0)
    assert(df.count() == 250) // and the healthy endpoint still serves
  }

  test("ConfigMain drives the whole pipeline through the live HTTP transport") {
    // deployment-is-config, demonstrated end to end: a properties file
    // selects the HTTP transport, the Runner's CDC month buckets push
    // into the DSv2 scan, and the scan POSTs real SoQL pages to the
    // server — no code change anywhere on the path
    handler.seenQueries.clear()
    val dir = java.nio.file.Files.createTempDirectory("cfg-http").toString
    val props = new java.util.Properties()
    props.setProperty("workDir", dir)
    props.setProperty("runId", "http-run-1")
    props.setProperty("loadDate", "2026-02-05")
    props.setProperty("epochStart", "2026-01-01")
    props.setProperty("tablePrefix", "thttp")
    props.setProperty("api.transport", classOf[HttpApiTransport].getName)
    props.setProperty("api.endpoint", endpoint)
    props.setProperty("api.pageSize", "100")
    props.setProperty("api.maxPages", "5")
    props.setProperty("api.httpbackoffms", "10")
    assert(graft.pipeline.ConfigMain.run(spark, props) == "SUCCESS")
    // all 250 server rows live in January; the Jan month bucket ingests them
    assert(spark.read.parquet(s"$dir/warehouse_a/crime").count() == 250)
    // every page request carried a pushed CDC range, none were bare
    assert(handler.seenQueries.size() >= 5)
    handler.seenQueries.forEach(q => assert(q.contains(":updated_at >=")))
  }

  test("a missing endpoint option is rejected up front") {
    val noEndpoint = spark.read
      .format("graft-api")
      .option("transport", classOf[HttpApiTransport].getName)
      .option("maxPages", 1)
      .load()
    val e = intercept[Exception](noEndpoint.count())
    def causes(t: Throwable): Seq[Throwable] = if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null && c.getMessage.contains("endpoint")))
  }
}
