package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** The HTTP boundary of the reference's ingest (api_fetcher.py:46-57),
  * pluggable because this environment has zero egress: production wires a
  * real HTTP client; tests register deterministic / flaky fakes. A page
  * fetch returns (totalPages, records-as-JSON-strings) or throws. */
trait IndicatorTransport extends Serializable {
  def fetchPage(country: String, indicator: String, page: Int,
                perPage: Int): (Int, Seq[String])
}

/** In-JVM transport registry (DSv2 options are strings, so transports are
  * referenced by key; fine for local[*], a cluster deployment constructs
  * its transport from options instead). */
object IndicatorTransports {
  private val registry = mutable.Map[String, IndicatorTransport]()
  def register(key: String, t: IndicatorTransport): Unit =
    synchronized { registry(key) = t }
  def get(key: String): IndicatorTransport =
    synchronized { registry(key) }
}

/** DataSource V2 re-expression of the reference's fetch pipeline
  * (SURVEY.md §2.1 S1-S5):
  *
  *  - S5 fan-out: ONE InputPartition per (country, indicator) unit — the
  *    54×2 serial loop of api_fetcher.py:86-113 becomes task parallelism.
  *  - S2 pagination: each PartitionReader pages until meta.pages
  *    (api_fetcher.py:62-83).
  *  - S3 retry: per-page attempts with exponential backoff
  *    (api_fetcher.py:46-57: 3 tries, 2^attempt). A unit that exhausts a
  *    page's budget stops paginating but KEEPS the pages already fetched
  *    — exactly the reference's behavior (fetch_indicator breaks out and
  *    returns the accumulated records, api_fetcher.py:71-77; a unit whose
  *    FIRST page fails therefore yields no rows). Spark's own task
  *    retries remain the outer layer.
  *  - S4 rate limit: configurable sleep between page fetches
  *    (api_fetcher.py:106).
  *
  * Output schema is a thin (country, indicator, page, json) row; parsing +
  * validation stay declarative downstream (from_json + the Ingest flatten
  * semantics), keeping the connector free of schema logic.
  *
  * Usage:
  *   spark.read.format("graft.sources.IndicatorSource")
  *     .option("countries", "ZAF,KEN").option("indicators", "GDP,UNEMP")
  *     .option("transport", "<registry key>").load()
  */
class IndicatorSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IndicatorSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new IndicatorTable(new CaseInsensitiveStringMap(properties))
}

object IndicatorSource {
  val schema: StructType = StructType(Seq(
    StructField("country", StringType),
    StructField("indicator", StringType),
    StructField("page", IntegerType),
    StructField("json", StringType)))
}

private[sources] case class SourceConf(countries: Seq[String],
    indicators: Seq[String], perPage: Int, maxRetries: Int,
    rateLimitMs: Long, backoffBaseMs: Long, transportKey: String)

private[sources] object SourceConf {
  def apply(o: CaseInsensitiveStringMap): SourceConf = SourceConf(
    o.get("countries").split(",").toSeq.map(_.trim).filter(_.nonEmpty),
    o.get("indicators").split(",").toSeq.map(_.trim).filter(_.nonEmpty),
    o.getInt("perPage", 1000),
    o.getInt("maxRetries", 3),
    o.getLong("rateLimitMs", 0L),
    o.getLong("backoffBaseMs", 1L),
    o.get("transport"))
}

private[sources] class IndicatorTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "indicator_source"
  override def schema(): StructType = IndicatorSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new IndicatorScan(SourceConf(options))
}

private[sources] class IndicatorScan(conf: SourceConf) extends Scan with Batch {
  override def readSchema(): StructType = IndicatorSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    (for (c <- conf.countries; i <- conf.indicators)
      yield UnitPartition(c, i): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new UnitReaderFactory(conf)
}

private[sources] case class UnitPartition(country: String, indicator: String)
    extends InputPartition

private[sources] class UnitReaderFactory(conf: SourceConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new UnitReader(conf, p.asInstanceOf[UnitPartition])
}

private[sources] class UnitReader(conf: SourceConf, unit: UnitPartition)
    extends PartitionReader[InternalRow] {
  private val transport = IndicatorTransports.get(conf.transportKey)
  private var page = 0
  private var totalPages = 1
  private var buffer: Iterator[String] = Iterator.empty
  private var current: InternalRow = _

  /** S3: per-page retry with exponential backoff; None after budget. */
  private def fetchWithRetry(p: Int): Option[(Int, Seq[String])] = {
    var attempt = 0
    while (attempt < conf.maxRetries) {
      try return Some(
        transport.fetchPage(unit.country, unit.indicator, p, conf.perPage))
      catch {
        case _: java.io.IOException =>
          attempt += 1
          // 2^(failures-1): waits base, 2*base, ... — the reference's
          // 2.0**attempt with a 0-based attempt counter
          // (api_fetcher.py:46-57)
          if (attempt < conf.maxRetries)
            Thread.sleep(conf.backoffBaseMs * (1L << (attempt - 1)))
      }
    }
    None
  }

  override def next(): Boolean = {
    while (!buffer.hasNext && page < totalPages) {
      if (page > 0 && conf.rateLimitMs > 0) Thread.sleep(conf.rateLimitMs) // S4
      fetchWithRetry(page + 1) match {
        case Some((pages, records)) =>
          totalPages = pages
          buffer = records.iterator
        case None =>
          totalPages = 0 // give up on this unit (api_fetcher.py:57)
      }
      page += 1
    }
    if (!buffer.hasNext) return false
    current = InternalRow(
      UTF8String.fromString(unit.country),
      UTF8String.fromString(unit.indicator),
      page,
      UTF8String.fromString(buffer.next()))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
