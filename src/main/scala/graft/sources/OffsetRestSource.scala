package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 realization of the reference's OFFSET-paginated list
  * endpoints (S9 analog — ref: config/hubspot/hubspotoop.py:350-383:
  * GET `?offset=N&limit=M`, looping while the server reports has-more;
  * same shape at :385-416 for owners).
  *
  * The mapping, made concrete:
  *  - one offset window -> one `InputPartition` (windows fetch in
  *    parallel across executors instead of the reference's serial
  *    offset loop);
  *  - the client stopping the loop early -> `SupportsPushDownLimit`:
  *    a query LIMIT caps how many windows are planned at all, so
  *    `df.limit(n)` fetches ceil(n/pageSize) pages instead of the whole
  *    collection (partial push: Spark still trims to the exact n);
  *  - the HTTP GET is stubbed with a deterministic generator (no egress
  *    here) — `OffsetPartitionReader` is the single client seam.
  *
  * Usage: `spark.read.format("graft.sources.OffsetRestSource")
  *   .option("pages", 10).option("pageSize", 100).load()`.
  */
class OffsetRestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OffsetRestSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // user-facing reader options arrive with original casing here
    val opts = new CaseInsensitiveStringMap(properties)
    new OffsetTable(opts.getInt("pages", 10), opts.getInt("pageSize", 100))
  }
}

object OffsetRestSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false)))

  /** Windows actually planned by the last scan — observable pushdown proof. */
  val lastPlannedPages = new AtomicInteger(0)
}

private class OffsetTable(pages: Int, pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"offset_rest(pages=$pages, pageSize=$pageSize)"
  override def schema(): StructType = OffsetRestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OffsetScanBuilder(pages, pageSize)
}

private class OffsetScanBuilder(pages: Int, pageSize: Int)
    extends ScanBuilder with SupportsPushDownLimit {

  private var limit: Int = Int.MaxValue

  override def pushLimit(l: Int): Boolean = {
    limit = l
    true // pushed, but partial — Spark still applies the exact trim
  }

  override def build(): Scan = new OffsetScan(pages, pageSize, limit)
}

private class OffsetScan(pages: Int, pageSize: Int, limit: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = OffsetRestSource.schema
  override def toBatch: Batch = this

  override def description(): String =
    if (limit == Int.MaxValue) "offset_rest"
    else s"offset_rest PushedLimit: [$limit]"

  override def planInputPartitions(): Array[InputPartition] = {
    val needed =
      if (limit == Int.MaxValue) pages
      else math.min(pages.toLong, (limit.toLong + pageSize - 1) / pageSize).toInt
    val planned = (0 until needed)
      .map(p => OffsetWindow(p.toLong * pageSize, pageSize): InputPartition).toArray
    OffsetRestSource.lastPlannedPages.set(planned.length)
    planned
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new OffsetPartitionReader(partition.asInstanceOf[OffsetWindow])
    }
}

private case class OffsetWindow(offset: Long, limit: Int) extends InputPartition

/** One "HTTP fetch" per window; deterministic stub records. */
private class OffsetPartitionReader(w: OffsetWindow)
    extends PartitionReader[InternalRow] {

  // A real implementation would GET `?offset=${w.offset}&limit=${w.limit}`
  // here (hubspotoop.py:360-367).
  private val rows: Iterator[InternalRow] =
    (0 until w.limit).iterator.map { i =>
      val id = w.offset + i
      InternalRow(id, UTF8String.fromString(s"record_$id"))
    }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
