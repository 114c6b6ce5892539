package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 form of the XMLA cube source (A1 at scale) — the
  * reference's per-FY/period chunking
  * (`/root/reference/modules/olap_sync.py:111-151`,
  * `backfill_sales_channel_by_period.sh:5-22`) expressed as connector
  * input partitioning: ONE InputPartition per slicer chunk, each task
  * rendering its own MDX (`{slicer}` substituted), POSTing its own SOAP
  * Execute via [[XmlaHttpClient]], and decoding its own mddataset
  * response executor-side. A 39-chunk backfill that serialized through
  * the reference's driver becomes 39 parallel tasks.
  *
  * Filter pushdown prunes chunks: an `EqualTo`/`In` predicate on the
  * slicer column drops non-matching partitions before any HTTP call —
  * the connector-level analogue of partition pruning, so
  * `df.filter($"slicer" === "FY2024")` fetches exactly one chunk.
  * Column pruning is honored too (the reader only materializes the
  * required columns).
  *
  * Usage:
  * {{{
  * spark.read.format("xmla")
  *   .option("server", "https://host")   .option("catalog", "OARS")
  *   .option("username", u)              .option("password", p)
  *   .option("mdx", "SELECT ... WHERE ([Calendar].[Fiscal_Year].&[{slicer}])")
  *   .option("chunks", "FY2023,FY2024,FY2025")
  *   .option("measures", "TY Net Sales USD,TY Orders")
  *   .option("dims", "\\[Franchise\\]\tStoreNumber\n\\[Calendar\\]\tCalendarDate")
  *   .load()
  * }}}
  *
  * All columns are strings (the wire format); the mapping layer
  * (`graft.etl.Pipeline`) coerces — the reference's own two-stage schema
  * (SURVEY.md §1.3).
  */
class XmlaDataSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "xmla"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    XmlaDataSourceV2.confOf(options).schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new XmlaTable(XmlaDataSourceV2.confOf(new CaseInsensitiveStringMap(properties)))
}

object XmlaDataSourceV2 {

  final case class Conf(
      server: String, catalog: String, username: String, password: String,
      mdxTemplate: String, chunks: Seq[String],
      dims: Seq[XmlaSource.DimMapping], measures: Seq[String],
      slicerCol: String, timeoutMs: Int,
      maxRetries: Int, retryBackoffMs: Long) {
    def schema: StructType = StructType(
      StructField(slicerCol, StringType) +:
        (dims.map(d => StructField(d.field, StringType)) ++
          measures.map(StructField(_, StringType))))
  }

  def confOf(o: CaseInsensitiveStringMap): Conf = {
    def req(k: String): String = {
      val v = o.get(k)
      require(v != null && v.nonEmpty, s"xmla source: missing option '$k'")
      v
    }
    Conf(
      server = req("server"),
      catalog = req("catalog"),
      username = o.getOrDefault("username", ""),
      password = o.getOrDefault("password", ""),
      mdxTemplate = req("mdx"),
      chunks = req("chunks").split(',').toSeq.map(_.trim).filter(_.nonEmpty),
      dims = Option(o.get("dims")).filter(_.nonEmpty).toSeq
        .flatMap(_.linesIterator).filter(_.nonEmpty).map { line =>
          line.split('\t') match {
            case Array(p, f) => XmlaSource.DimMapping(p, f)
            case _ => sys.error(s"xmla source: dims line needs 'pattern<TAB>field': $line")
          }
        },
      measures = req("measures").split(',').toSeq.map(_.trim).filter(_.nonEmpty),
      slicerCol = o.getOrDefault("slicerCol", "slicer"),
      timeoutMs = o.getOrDefault("timeoutMs", "300000").toInt,
      maxRetries = o.getOrDefault("maxRetries", "4").toInt,
      retryBackoffMs = o.getOrDefault("retryBackoffMs", "500").toLong)
  }
}

class XmlaTable(conf: XmlaDataSourceV2.Conf)
    extends Table with SupportsRead {
  override def name(): String = s"xmla(${conf.catalog})"
  override def schema(): StructType = conf.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XmlaScanBuilder(conf)
}

class XmlaScanBuilder(conf: XmlaDataSourceV2.Conf)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var chunks: Seq[String] = conf.chunks
  private var required: StructType = conf.schema

  /** Slicer predicates prune input partitions (no HTTP call for a pruned
    * chunk); everything else stays a post-scan filter.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo(c, _: String) => c == conf.slicerCol
      case In(c, _) => c == conf.slicerCol
      case IsNotNull(c) => c == conf.slicerCol
      case _ => false
    }
    supported.foreach {
      case EqualTo(_, v: String) => chunks = chunks.filter(_ == v)
      case In(_, vs) =>
        val keep = vs.map(String.valueOf).toSet
        chunks = chunks.filter(keep)
      case _ => () // IsNotNull: the slicer column is never null
    }
    pushed = supported
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new XmlaScan(conf, chunks, required, pushed)
}

class XmlaScan(
    val conf: XmlaDataSourceV2.Conf, val chunks: Seq[String],
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"XmlaScan chunks=[${chunks.mkString(",")}] " +
      s"PushedFilters: [${pushed.mkString(", ")}], ReadSchema: ${required.simpleString}"
  override def planInputPartitions(): Array[InputPartition] =
    chunks.map(c => XmlaInputPartition(c): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new XmlaReaderFactory(conf, required)
}

final case class XmlaInputPartition(slicer: String) extends InputPartition

class XmlaReaderFactory(
    conf: XmlaDataSourceV2.Conf, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new XmlaPartitionReader(conf, required,
      partition.asInstanceOf[XmlaInputPartition].slicer)
}

/** One task = one slicer chunk: render the MDX, POST, decode. The
  * response is bounded by the cube's cell limits (the reason the
  * reference chunks at all), so a per-task in-memory decode is the
  * design point — parallelism comes from the number of chunks.
  */
class XmlaPartitionReader(
    conf: XmlaDataSourceV2.Conf, required: StructType, slicer: String)
    extends PartitionReader[InternalRow] {

  private var it: Iterator[InternalRow] = _
  private var current: InternalRow = _

  /** Bounded in-task retry with Retry-After honor (mirrors
    * `DataverseBatchUploader`/`BatchSink`'s loop): at 39-chunk fan-out a
    * transient 429/503 on one chunk is routine, and burning a whole Spark
    * task attempt (re-POST + re-decode + scheduler round-trip) on it is
    * the wrong granularity. Non-retryable statuses (4xx auth/syntax)
    * still fail the task immediately.
    */
  private def executeWithRetry(mdx: String): String = {
    var attempt = 0
    while (true) {
      try {
        return XmlaHttpClient.execute(conf.server, conf.catalog,
          conf.username, conf.password, mdx, conf.timeoutMs)
      } catch {
        case e: XmlaHttpClient.HttpError
            if (e.status == 429 || e.status >= 500) && attempt < conf.maxRetries =>
          Thread.sleep(e.retryAfterMs.getOrElse(conf.retryBackoffMs * (1L << attempt)))
          attempt += 1
        case e: java.io.IOException if attempt < conf.maxRetries =>
          Thread.sleep(conf.retryBackoffMs * (1L << attempt))
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  private def fetch(): Iterator[InternalRow] = {
    val mdx = conf.mdxTemplate.replace("{slicer}", slicer)
    val xml = executeWithRetry(mdx)
    val parsed = XmlaSource.parse(xml, conf.dims)
    val n = parsed.measures.size
    val cellAt: Map[Long, String] = parsed.cells.toMap
    val measureIdx: Map[String, Int] = parsed.measures.zipWithIndex.toMap
    val slicerUtf = UTF8String.fromString(slicer)
    parsed.tuples.zipWithIndex.iterator.map { case (tuple, rowIdx) =>
      // first mapping for a field wins (reference regex fall-through order)
      val dimVals = tuple.foldLeft(Map.empty[String, String]) {
        case (m, (f, v)) => if (m.contains(f)) m else m.updated(f, v)
      }
      InternalRow.fromSeq(required.fields.toIndexedSeq.map { f =>
        if (f.name == conf.slicerCol) slicerUtf
        else dimVals.get(f.name).map(UTF8String.fromString).getOrElse {
          measureIdx.get(f.name) match {
            case Some(mi) =>
              cellAt.get(rowIdx.toLong * n + mi).map(UTF8String.fromString).orNull
            case None => null
          }
        }
      })
    }
  }

  override def next(): Boolean = {
    if (it == null) it = fetch()
    if (it.hasNext) { current = it.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
