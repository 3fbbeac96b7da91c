package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for a paginated REST-style orders API — the
  * production shape of [[graft.sources.PagedSource]] (SURVEY.md §2.1 S1:
  * "at scale a DataSource V2 TableProvider with SupportsPushDownFilters +
  * partitioned page ranges").
  *
  * What is REAL here — and carries to any paged HTTP backend:
  *   - `planInputPartitions` carves the page space `[0, pages)` into one
  *     contiguous page RANGE per task, so a 10⁶-page backfill fans out
  *     over the cluster instead of looping on the driver;
  *   - `SupportsPushDownFilters` turns `order_date > X` predicates into
  *     page-range pruning (the API serves date-ascending pages, so a
  *     date cutoff is a page cutoff — the connector fetches nothing
  *     before it, the analogue of the reference's `after=since_iso`
  *     param, reference `src/etl/extract/orders.py:11-18`);
  *   - `SupportsPushDownRequiredColumns` projects rows to the query's
  *     columns before they enter Spark.
  *
  * What is FAKE: the remote endpoint. `PageClient.fetch` deterministically
  * generates the rows a fixture server would return (this container has no
  * network); a real backend swaps that one function for an HTTP GET.
  *
  * Usage: `spark.read.format("graft.sources.v2.PagedOrdersProvider")
  *   .option("pages", n).option("pageSize", k).option("parallelism", p)
  *   .load()`
  */
class PagedOrdersProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedOrders.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedOrdersTable(
      properties.getOrDefault("pages", "8").toInt,
      properties.getOrDefault("pageSize", "100").toInt,
      properties.getOrDefault("parallelism", "4").toInt,
      // Reference flow.py:44-46: retries=2, retry_delay_seconds=30.
      properties.getOrDefault("retries", "2").toInt,
      properties.getOrDefault("retryDelayMs", "30000").toLong)
}

object PagedOrders {
  val schema: StructType = StructType(Seq(
    StructField("order_id", LongType, nullable = false),
    StructField("order_date", TimestampType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("total", DoubleType, nullable = false)))

  /** Epoch micros of the synthetic API's first order; orders are spaced
    * one minute apart in date-ascending page order (the reference's
    * `orderby=date&order=asc`). */
  val BaseMicros: Long = 1704067200L * 1000000L // 2024-01-01T00:00:00Z
  val MicrosPerOrder: Long = 60L * 1000000L

  /** The deterministic stand-in for the remote endpoint. */
  object PageClient {
    /** Pages fetched across the JVM — lets tests PROVE pruning happened. */
    val fetched = new java.util.concurrent.atomic.AtomicLong(0)

    /** Test hooks: pages that fail with a transient error on their first
      * fetch only (retry succeeds), and pages that fail every fetch
      * (permanent — retries exhaust and the error propagates, S2). */
    val failOnce: java.util.Set[Integer] =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()
    val failAlways: java.util.Set[Integer] =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()

    def fetch(page: Int, pageSize: Int): Seq[(Long, Long, String, Double)] = {
      fetched.incrementAndGet()
      if (failAlways.contains(page))
        throw new java.io.IOException(s"permanent 500 on page $page")
      if (failOnce.remove(page))
        throw new java.io.IOException(s"transient 503 on page $page")
      (0 until pageSize).map { i =>
        val id = page.toLong * pageSize + i
        (id, BaseMicros + id * MicrosPerOrder,
          if (id % 7 == 0) "refunded" else "completed",
          (id % 500) / 10.0 + 5.0)
      }
    }
  }

  /** First page that can contain order_date > / >= the cutoff (dates are
    * monotone in page order, so earlier pages are provably empty). */
  def minPageFor(cutoffMicros: Long, pageSize: Int): Int = {
    val firstId = math.max(0L, (cutoffMicros - BaseMicros) / MicrosPerOrder)
    (firstId / pageSize).toInt
  }
}

class PagedOrdersTable(
    pages: Int, pageSize: Int, parallelism: Int,
    retries: Int = 2, retryDelayMs: Long = 30000L)
    extends Table with SupportsRead {
  override def name(): String = s"paged_orders($pages x $pageSize)"
  override def schema(): StructType = PagedOrders.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedOrdersScanBuilder(pages, pageSize, parallelism, retries, retryDelayMs)
}

class PagedOrdersScanBuilder(
    pages: Int, pageSize: Int, parallelism: Int,
    retries: Int = 2, retryDelayMs: Long = 30000L)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var minPage = 0
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PagedOrders.schema
  private var limitPages: Option[Int] = None
  private var aggPushed: Option[Seq[StructField]] = None

  /** Timestamp cutoff → epoch micros, for BOTH timestamp object models:
    * Spark passes java.sql.Timestamp by default and java.time.Instant
    * when spark.sql.datetime.java8API.enabled=true — matching only one
    * silently no-ops the page pruning for the other (correct rows, dead
    * pushdown). */
  private def cutoffMicros(v: Any): Option[Long] = v match {
    case ts: java.sql.Timestamp =>
      Some(ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("order_date", v)        => cutoffMicros(v).isDefined
      case GreaterThanOrEqual("order_date", v) => cutoffMicros(v).isDefined
      case _                                   => false
    }
    accepted.foreach {
      case GreaterThan("order_date", v) =>
        cutoffMicros(v).foreach(m =>
          minPage = math.max(minPage, PagedOrders.minPageFor(m, pageSize)))
      case GreaterThanOrEqual("order_date", v) =>
        cutoffMicros(v).foreach(m =>
          minPage = math.max(minPage, PagedOrders.minPageFor(m, pageSize)))
      case _ => ()
    }
    pushed = accepted
    // Page pruning is conservative (whole pages only) — Spark must still
    // re-apply the predicates row-level, so return ALL filters as residual.
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT pushdown — the reference's `per_page` short-stop
    * (`wc_client.py:36-49`: stop requesting once enough rows arrived) as
    * a declarative contract: a pushed LIMIT caps the page span at
    * ceil(limit / pageSize), so `df.limit(5)` fetches ONE page of a
    * million-page backfill. Partial push (whole-page granularity):
    * Spark re-applies the exact row limit on top. */
  override def pushLimit(limit: Int): Boolean = {
    // Long arithmetic: limit near Int.MaxValue must not wrap negative
    // (a wrapped value would cap the span at ONE page and silently drop
    // rows); the page count itself is capped at the table's page space
    limitPages = Some(math.min(pages.toLong,
      math.max(1L, (limit.toLong + pageSize - 1) / pageSize)).toInt)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  /** MIN/MAX/COUNT pushdown for the monotone columns: order ids and
    * dates ascend in page order (the API's `orderby=date&order=asc`
    * contract), so date bounds and the total count are PAGE ARITHMETIC —
    * an a4_date_bounds-shaped probe answers from the pagination metadata
    * and fetches ZERO pages, the way a REST client would read
    * `X-WP-Total` instead of walking every page. Complete pushdown
    * (single row, no re-aggregation); Spark only offers it when every
    * filter was fully pushed, and this source always reports its filters
    * as residual, so a filtered probe falls back to the pruned scan. */
  import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
  private def monotoneField(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference
        if nr.fieldNames.length == 1 &&
          (nr.fieldNames()(0) == "order_id" || nr.fieldNames()(0) == "order_date") =>
        Some(nr.fieldNames()(0))
      case _ => None
    }
  private def aggField(f: AggregateFunc): Option[StructField] = f match {
    // min/max nullable: an EMPTY page span must answer NULL, not a
    // fabricated bound (SQL aggregate semantics over zero rows)
    case m: Min => monotoneField(m.column).map(c => StructField(s"min($c)",
      PagedOrders.schema(c).dataType, nullable = true))
    case m: Max => monotoneField(m.column).map(c => StructField(s"max($c)",
      PagedOrders.schema(c).dataType, nullable = true))
    case _: CountStar => Some(StructField("count(*)", LongType, nullable = false))
    case _ => None
  }
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.forall(aggField(_).isDefined)
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (!supportCompletePushDown(aggregation)) return false
    aggPushed = Some(aggregation.aggregateExpressions.toSeq.map(aggField(_).get))
    true
  }

  override def build(): Scan = new Scan with Batch with SupportsReportStatistics {
    private val effSpan: Int = {
      val s = math.max(0, pages - minPage)
      limitPages.map(math.min(s, _)).getOrElse(s)
    }
    override def readSchema(): StructType =
      aggPushed.map(fs => StructType(fs)).getOrElse(required)
    override def toBatch: Batch = this

    /** Page arithmetic IS the statistics: the span is exact (the API's
      * X-WP-Total), so the optimizer sees the post-pushdown row count
      * and can pick a broadcast join for a pruned span on its own — no
      * hint needed at call sites joining against the paged source. */
    override def estimateStatistics(): Statistics = new Statistics {
      private val rows = aggPushed.fold(effSpan.toLong * pageSize)(_ => 1L)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows * math.max(1, readSchema().defaultSize))
    }
    override def description(): String =
      s"PagedOrdersScan(pages=[$minPage,${minPage + effSpan}), " +
        s"pushed=${pushed.mkString(",")}, limitPages=$limitPages, agg=$aggPushed)"

    override def planInputPartitions(): Array[InputPartition] = {
      aggPushed match {
        case Some(fields) =>
          // zero-fetch statistics row over [minPage, minPage+effSpan);
          // an empty span answers NULL bounds and count 0, like a scan
          val firstId = minPage.toLong * pageSize
          val lastId = (minPage + effSpan).toLong * pageSize - 1
          val values: Seq[Any] = fields.map { f =>
            f.name match {
              case "count(*)" => effSpan.toLong * pageSize
              case _ if effSpan == 0 => null
              case "min(order_id)" => firstId
              case "max(order_id)" => lastId
              case "min(order_date)" => PagedOrders.BaseMicros + firstId * PagedOrders.MicrosPerOrder
              case "max(order_date)" => PagedOrders.BaseMicros + lastId * PagedOrders.MicrosPerOrder
            }
          }
          Array(StatsRow(values): InputPartition)
        case None =>
          val span = effSpan
          val tasks = math.min(parallelism, math.max(1, span))
          (0 until tasks).map { t =>
            val start = minPage + (span * t) / tasks
            val end = minPage + (span * (t + 1)) / tasks
            PageRange(start, end, pageSize, required.fieldNames,
              retries, retryDelayMs): InputPartition
          }.toArray
      }
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new PagedReaderFactory
  }
}

/** Single pre-computed statistics row for a completely-pushed
  * aggregation — no page fetches. NULL entries answer empty-span
  * min/max. */
case class StatsRow(values: Seq[Any]) extends InputPartition

case class PageRange(
    start: Int, end: Int, pageSize: Int, columns: Array[String],
    retries: Int = 2, retryDelayMs: Long = 30000L)
    extends InputPartition

class PagedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = partition match {
    case StatsRow(values) =>
      new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val n = !emitted; emitted = true; n }
        override def get(): InternalRow = InternalRow.fromSeq(values)
        override def close(): Unit = ()
      }
    case pr: PageRange => createPageReader(pr)
  }

  private def createPageReader(pr: PageRange): PartitionReader[InternalRow] = {
    new PartitionReader[InternalRow] {
      // Per-PAGE retry (reference flow.py:44-46): a transient failure on
      // one page refetches that page only — Spark's task retry would
      // refetch the whole range.
      private val retry = graft.sources.RetryPolicy(pr.retries, pr.retryDelayMs,
        retryOn = graft.sources.HttpApiClient.transientOnly)
      private val rows = (pr.start until pr.end).iterator
        .flatMap(p => retry(PagedOrders.PageClient.fetch(p, pr.pageSize)))
      private var current: (Long, Long, String, Double) = _
      override def next(): Boolean = { val h = rows.hasNext; if (h) current = rows.next(); h }
      override def get(): InternalRow = {
        val values = pr.columns.map {
          case "order_id"   => current._1
          case "order_date" => current._2
          case "status"     => UTF8String.fromString(current._3)
          case "total"      => current._4
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
