package graft.sources

import java.util

import graft.core.Schemas
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the Socrata-shaped paginated API (S1),
  * production path: `spark.read.format("graft-api")`.
  *
  * Reference: the extract pushes the CDC range into the source query
  * itself — SoQL `updated_on BETWEEN start AND end` with `pageNumber`/
  * `pageSize` pagination (`airflow/dags/crimeapi/extract.py:9-42`).
  * This connector reproduces that contract on Spark's connector API:
  *
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): comparison
  *    predicates on `:updated_at` become the server-side range — the
  *    rows never leave the "API" (here: are never generated), exactly
  *    as SoQL's WHERE clause keeps them out of the HTTP response.
  *    Pushed filters disappear from the post-scan Filter node and show
  *    up in `PushedFilters` in explain output.
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *    SoQL `$select` list — a projection-only query reads just those
  *    fields.
  *  - **Limit pushdown** ([[SupportsPushDownLimit]]): the reference's
  *    page cap (`etl/main.py:57` stops at 50 pages) — a pushed LIMIT
  *    truncates the page plan to ceil(limit/pageSize) partitions and
  *    caps rows inside the reader, so capped exploratory reads never
  *    touch the rest of the "API".
  *  - **Pagination → partitions**: one [[InputPartition]] per API page,
  *    so page fetches run in parallel across executors and a failed
  *    page retries alone (the task-retry analog of the reference's
  *    page-level checkpoint/resume, `crime_etl.py:132-168`).
  *
  * The page fetch itself sits behind the [[ApiTransport]] seam, chosen
  * by the `transport` OPTION (a class name) — deployment against the
  * live API is configuration, not code: point `transport` at
  * [[HttpApiTransport]] (the shipped `java.net.http` POST
  * implementation of the reference's fetch, integration-tested against
  * an in-process server) and every planner-visible surface (schema,
  * pushdown, pagination, retries) stays exactly as tested here. The default [[SimulatorTransport]]
  * serves the same deterministic rows as [[ApiSimulator]]
  * ([[ApiSimulator.genValues]]), with row i's `:updated_at` spread
  * over `nDays` days from `baseDate` so range pushdown has
  * selectivity to exercise. The reader re-checks every pushed
  * predicate client-side, so a transport whose server-side filter is
  * approximate (or absent) is still correct.
  *
  * Options: `totalRows` (default 5000), `pageSize` (1000),
  * `baseDate` (2026-01-01), `nDays` (28) — consumed by the simulator
  * transport; `transport` (class name, default [[SimulatorTransport]]),
  * `maxPages` (page-plan cap for transports without a known row count —
  * the reference stops at 50 pages, `etl/main.py:57`).
  */
class ApiTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-api"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Schemas.rawCrime
  override def getTable(schema: StructType, partitioning: Array[Transform], properties: util.Map[String, String]): Table =
    new ApiTable(new CaseInsensitiveStringMap(properties))
}

final class ApiTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_api"
  override def schema(): StructType = Schemas.rawCrime
  override def capabilities(): util.Set[TableCapability] = util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(opts)
    new ApiScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

/** Inclusive/exclusive string bounds on `:updated_at` — the pushed SoQL
  * range — plus the pushed IS NOT NULL flag. ISO-8601 strings compare
  * lexicographically, so plain string comparison is the correct
  * timestamp order. The reader enforces every pushed predicate itself
  * (a null value fails any bound and the notNull flag), so the
  * guarantee does not rest on the row generator never emitting null —
  * a live-API adapter behind this planner surface stays correct. */
final case class UpdatedRange(
    ge: Option[String] = None,
    gt: Option[String] = None,
    le: Option[String] = None,
    lt: Option[String] = None,
    notNull: Boolean = false
) extends Serializable {
  def accepts(v: String): Boolean =
    if (v == null) !notNull && ge.isEmpty && gt.isEmpty && le.isEmpty && lt.isEmpty
    else ge.forall(v >= _) && gt.forall(v > _) && le.forall(v <= _) && lt.forall(v < _)
}

/** One SoQL-shaped page request — everything a transport needs: the
  * pushed `$where` range, the page geometry, and the connector options
  * (a live transport reads its endpoint/credentials alias from them;
  * the simulator its `totalRows`/`baseDate`/`nDays`). Option keys are
  * lower-cased. */
final case class ApiPageRequest(
    page: Int,
    pageSize: Int,
    range: UpdatedRange,
    options: Map[String, String]) {
  /** The pushed range rendered as the SoQL WHERE clause the reference
    * sends (`extract.py:21-24`) — what a live transport puts in
    * `$where`. Empty string when nothing was pushed. */
  def soqlWhere: String =
    (range.ge.map(v => s":updated_at >= '$v'").toSeq ++
      range.gt.map(v => s":updated_at > '$v'") ++
      range.le.map(v => s":updated_at <= '$v'") ++
      range.lt.map(v => s":updated_at < '$v'")).mkString(" AND ")
}

/** The S1 transport seam: how a page of rows is actually obtained.
  * Selected per-read with `.option("transport", className)` — swapping
  * in the live HTTP POST is deployment configuration, not a code
  * change. Implementations need a public no-arg constructor: one
  * instance is created PER PARTITION on the executor via reflection
  * (never serialized, so non-serializable fields like an HTTP client
  * are fine). Rows come back as rawCrime-ordered value arrays, nulls
  * allowed; an exhausted page is an empty iterator. Applying
  * `req.range`/[[ApiPageRequest.soqlWhere]] server-side is the point
  * of pushdown but is OPTIONAL for correctness — the reader re-checks
  * every pushed predicate on every row. */
trait ApiTransport {
  def fetchPage(req: ApiPageRequest): Iterator[Array[String]]
}

/** Default transport: the deterministic offline generator — same rows
  * as [[ApiSimulator]]. Pages are full (`pageSize` rows) up to
  * `totalRows`, which is what lets the scan prune whole pages under a
  * pushed LIMIT. */
final class SimulatorTransport extends ApiTransport {
  override def fetchPage(req: ApiPageRequest): Iterator[Array[String]] = {
    val totalRows = req.options.getOrElse("totalrows", "5000").toInt
    val nDays = req.options.getOrElse("ndays", "28").toInt
    val base = java.time.LocalDate.parse(req.options.getOrElse("basedate", "2026-01-01"))
    val start = req.page * req.pageSize
    val end = math.min(start + req.pageSize, totalRows)
    Iterator.range(start, math.max(start, end)).map { i =>
      // row i "lives" on baseDate + (i % nDays) — the server-side value
      ApiSimulator.genValues(i, base.plusDays(i % nDays).toString)
    }
  }
}

final class ApiScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var range = UpdatedRange()
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = Schemas.rawCrime
  private var limit: Option[Int] = None

  /** Partial push: the per-partition reader stops after the cap, but
    * Spark still applies the global LIMIT across partitions. */
  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    false // partial: rows are capped at the source, Spark finishes the job
  }

  // the planner backtick-quotes attribute names needing escaping
  // (":updated_at" contains ':'), so normalize before matching
  private def isUpdatedAt(name: String): Boolean =
    name.stripPrefix("`").stripSuffix("`") == ":updated_at"

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (acc, residual) = filters.partition {
      case GreaterThanOrEqual(a, _: String) => isUpdatedAt(a)
      case GreaterThan(a, _: String)        => isUpdatedAt(a)
      case LessThanOrEqual(a, _: String)    => isUpdatedAt(a)
      case LessThan(a, _: String)           => isUpdatedAt(a)
      case EqualTo(a, _: String)            => isUpdatedAt(a)
      // the API never emits a null updated_on — absorbing the planner's
      // inferred IsNotNull leaves no residual Filter, which in turn
      // lets the planner push LIMIT down to the scan
      case IsNotNull(a)                     => isUpdatedAt(a)
      case _                                => false
    }
    acc.foreach {
      case GreaterThanOrEqual(_, v: String) => range = range.copy(ge = maxOf(range.ge, v))
      case GreaterThan(_, v: String)        => range = range.copy(gt = maxOf(range.gt, v))
      case LessThanOrEqual(_, v: String)    => range = range.copy(le = minOf(range.le, v))
      case LessThan(_, v: String)           => range = range.copy(lt = minOf(range.lt, v))
      case EqualTo(_, v: String)            => range = range.copy(ge = maxOf(range.ge, v), le = minOf(range.le, v))
      case IsNotNull(_)                     => range = range.copy(notNull = true)
      case _                                => ()
    }
    pushed = acc
    residual // the connector applies pushed bounds exactly; nothing re-evaluated post-scan
  }
  private def maxOf(a: Option[String], v: String) = Some(a.filter(_ > v).getOrElse(v))
  private def minOf(a: Option[String], v: String) = Some(a.filter(_ < v).getOrElse(v))

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    import scala.jdk.CollectionConverters._
    // CaseInsensitiveStringMap stores lower-cased keys; freeze them into
    // a plain serializable Map for the partitions/transport
    val opts = options.asScala.toMap.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    new ApiScan(
      totalRows = options.getInt("totalRows", 5000),
      pageSize = options.getInt("pageSize", 1000),
      range = range,
      required = required,
      limit = limit,
      transportClass = options.getOrDefault("transport", classOf[SimulatorTransport].getName),
      opts = opts
    )
  }
}

final class ApiScan(
    val totalRows: Int,
    val pageSize: Int,
    val range: UpdatedRange,
    val required: StructType,
    val limit: Option[Int] = None,
    val transportClass: String = classOf[SimulatorTransport].getName,
    val opts: Map[String, String] = Map.empty
) extends Scan
    with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-api totalRows=$totalRows pageSize=$pageSize range=$range limit=$limit transport=$transportClass"

  private def isSimulator = transportClass == classOf[SimulatorTransport].getName

  override def planInputPartitions(): Array[InputPartition] = {
    // the simulator's row count is known; other transports page up to
    // an explicit maxPages cap. A custom transport WITHOUT maxPages
    // must not inherit the simulator's totalRows default — that knob
    // has no meaning for it and would silently truncate live data at
    // ceil(5000/pageSize) pages; it gets the reference's own page cap
    // (50, `etl/main.py:57`) and a loud warning instead.
    val nPages = opts.get("maxpages").map(_.toInt).getOrElse {
      if (isSimulator) (totalRows + pageSize - 1) / pageSize
      else {
        System.err.println(
          s"[graft-api] transport=$transportClass has no maxPages option; " +
            s"defaulting to the reference's 50-page cap — set maxPages explicitly")
        50
      }
    }
    // A pushed limit prunes whole pages ONLY when no filter is pushed
    // AND pages are known full (simulator) — with a filter or an
    // unknown-fullness transport, a page may contribute fewer rows, so
    // later pages must stay reachable to supply the limit. Each reader
    // additionally caps its own output at `limit`.
    val pages = limit match {
      case Some(n) if range == UpdatedRange() && isSimulator =>
        math.min(nPages, (n + pageSize - 1) / pageSize)
      case _ => nPages
    }
    Array.tabulate(pages)(pg => ApiPagePartition(pg, pageSize, range, limit, transportClass, opts))
  }

  override def createReaderFactory(): PartitionReaderFactory = new ApiReaderFactory(
    required.fieldNames.map(Schemas.rawCrime.fieldIndex))
}

final case class ApiPagePartition(
    page: Int,
    pageSize: Int,
    range: UpdatedRange,
    limit: Option[Int],
    transportClass: String,
    opts: Map[String, String]
) extends InputPartition

/** `ordinals`: for each required output column, its index in the full
  * rawCrime record — the pruned projection. */
final class ApiReaderFactory(ordinals: Array[Int]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ApiPagePartition]
    val updIdx = Schemas.rawCrime.fieldIndex(":updated_at")
    new PartitionReader[InternalRow] {
      // context classloader first: on a real cluster graft may sit on
      // the executor system classpath while the transport class ships
      // in the application jar, visible only to the context loader
      private val transport = Class.forName(
        part.transportClass, true,
        Option(Thread.currentThread().getContextClassLoader)
          .getOrElse(getClass.getClassLoader))
        .getDeclaredConstructor().newInstance().asInstanceOf[ApiTransport]
      private val rows = transport.fetchPage(
        ApiPageRequest(part.page, part.pageSize, part.range, part.opts))
      private var emitted = 0
      private var current: Array[String] = _

      override def next(): Boolean = {
        if (part.limit.exists(emitted >= _)) return false
        while (rows.hasNext) {
          val vals = rows.next()
          // pushed predicates re-checked per row: correctness never
          // rests on the transport's server-side filter being exact
          if (part.range.accepts(vals(updIdx))) { current = vals; emitted += 1; return true }
        }
        false
      }

      override def get(): InternalRow =
        new GenericInternalRow(
          ordinals.map(o => if (current(o) == null) null else UTF8String.fromString(current(o)): Any))

      override def close(): Unit = ()
    }
  }
}
