package graft.sources

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.core.Schemas

/** Typed page-fetch failure — the twin of the reference's
  * `APIPageFetchError` (`airflow/dags/crimeapi/utils/custom_exceptions
  * .py`, raised at `extract.py:28-33`): carries the failing page so the
  * caller's checkpoint/resume (ST2) can restart there. Spark surfaces
  * it as the task failure cause; the page-per-partition layout means
  * task retry IS page retry. */
final class ApiPageFetchException(message: String, val page: Int, cause: Throwable = null)
    extends RuntimeException(message, cause)

/** Live [[ApiTransport]]: the reference's page fetch
  * (`extract.py:9-42`) on `java.net.http` — a POST per page with the
  * SoQL query body
  * `{"query": ..., "page": {"pageNumber", "pageSize"}, "includeSynthetic": true}`
  * and the `X-App-Token` header, expecting a JSON array of flat
  * objects (one page, FIXTURES.md §1). Selected per-read with
  * `.option("transport", classOf[HttpApiTransport].getName)` — the
  * planner surface (schema, pushdown, pagination, client-side
  * re-check) is identical to the simulator path, so swapping this in
  * really is deployment configuration.
  *
  * Options (connector options, lower-cased keys):
  *  - `endpoint` (required): the query URL
  *  - `apptoken`: `X-App-Token` value; falls back to the `APP_TOKEN`
  *    env var (the reference's `os.getenv`, `extract.py:13`)
  *  - `httpretries` (default 3): extra attempts on connect/timeout
  *    IOExceptions and retryable statuses (429/5xx), exponential
  *    backoff from `httpbackoffms` (default 500); any other non-200 is
  *    a fail-fast [[ApiPageFetchException]], like the reference's
  *    immediate raise on a bad status
  *  - `httptimeoutms` (default 30000): per-request and connect timeout
  *
  * Beyond the reference: pages fetch in PARALLEL (one partition each)
  * instead of a serial generator loop, and transient failures retry
  * with backoff before the typed error — the semantics the serial loop
  * gets from rerunning the whole task.
  *
  * Scale posture: one short-lived client per partition, one buffered
  * page per reader (pageSize-bounded), zero driver-side state.
  */
final class HttpApiTransport extends ApiTransport {

  private val mapper = new ObjectMapper()

  override def fetchPage(req: ApiPageRequest): Iterator[Array[String]] = {
    val endpoint = req.options.getOrElse("endpoint",
      throw new IllegalArgumentException(
        "HttpApiTransport requires .option(\"endpoint\", <query url>)"))
    val timeoutMs = req.options.getOrElse("httptimeoutms", "30000").toLong
    val retries = req.options.getOrElse("httpretries", "3").toInt
    val backoffMs = req.options.getOrElse("httpbackoffms", "500").toLong
    val token = req.options.get("apptoken").orElse(sys.env.get("APP_TOKEN"))

    // the reference's body shape, verbatim (extract.py:18-25); SoQL
    // pages are 1-based where partitions are 0-based
    val body = mapper.createObjectNode()
    val where = req.soqlWhere
    body.put("query", if (where.isEmpty) "SELECT *" else s"SELECT * WHERE $where")
    body.putObject("page").put("pageNumber", req.page + 1).put("pageSize", req.pageSize)
    body.put("includeSynthetic", true)

    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .build()
    val builder = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
    token.foreach(builder.header("X-App-Token", _))
    val request = builder
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
      .build()

    def attempt(remaining: Int, backoff: Long): JsonNode = {
      val res: Either[IOException, HttpResponse[String]] =
        try Right(client.send(request, HttpResponse.BodyHandlers.ofString()))
        catch { case e: IOException => Left(e) }
      res match {
        case Right(r) if r.statusCode() == 200 =>
          mapper.readTree(r.body())
        case Right(r) if remaining > 0 && (r.statusCode() == 429 || r.statusCode() >= 500) =>
          Thread.sleep(backoff)
          attempt(remaining - 1, backoff * 2)
        case Right(r) =>
          throw new ApiPageFetchException(
            s"API returned status ${r.statusCode()} at page ${req.page + 1}", req.page)
        case Left(e) if remaining > 0 =>
          Thread.sleep(backoff)
          attempt(remaining - 1, backoff * 2)
        case Left(e) =>
          throw new ApiPageFetchException(
            s"Request failed at page ${req.page + 1}: ${e.getMessage}", req.page, e)
      }
    }

    val root = attempt(retries, backoffMs)
    if (root == null || !root.isArray || root.isEmpty) Iterator.empty
    else {
      val fields = Schemas.rawCrime.fieldNames
      // materialized: the page is already in memory as parsed JSON and
      // is pageSize-bounded; value arrays are what the reader projects
      val rows = (0 until root.size()).map { i =>
        val obj = root.get(i)
        fields.map { f =>
          val v = obj.get(f)
          if (v == null || v.isNull) null else v.asText()
        }
      }
      rows.iterator
    }
  }
}
