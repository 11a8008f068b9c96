package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1/S2 — the paginated catalog scan as a DataSourceV2 (the Spark-first
  * re-expression of taar_amodump.py:86-124's thread-pooled page fan-out).
  *
  * One `InputPartition` PER PAGE: executor tasks fetch pages in parallel
  * (the reference's 100-thread pool becomes executor parallelism, X3),
  * Spark task retry replaces the hand-rolled retry-once loop (X4), and
  * reader-level timeouts replace per-request timeouts (X5).
  *
  * The source emits RAW payload rows `(page INT, value STRING)` — one per
  * JSON line — and the typed projection happens downstream with
  * `from_json` (the P4 marshal pattern), keeping ingestion and schema
  * concerns separate. This fixture-backed implementation reads
  * `page-<n>.jsonl` files from `path`; a production variant swaps the
  * reader's open() for an HTTP GET of the page URL — the plumbing
  * (planning, partitioning, retry) is identical.
  *
  * Usage:
  *   spark.read.format("graft.sources.PagedJsonSource")
  *     .option("path", fixtureDir).load()
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedTable(properties.get("path"))
}

object PagedJsonSource {
  val Schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("value", StringType, nullable = false)))

  def pageFiles(path: String): Seq[(Int, String)] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("page-\\d+\\.jsonl"))
      .map(f => f.getName.stripPrefix("page-").stripSuffix(".jsonl").toInt -> f.getPath)
      .sortBy(_._1).toSeq
  }
}

class PagedTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"paged_json($path)"
  override def schema(): StructType = PagedJsonSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new PagedScan(path)
}

class PagedScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = PagedJsonSource.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    PagedJsonSource.pageFiles(path)
      .map { case (page, file) => PagePartition(page, file): InputPartition }.toArray
  override def createReaderFactory(): PartitionReaderFactory = PageReaderFactory
}

case class PagePartition(page: Int, file: String) extends InputPartition

object PageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      // production variant: HTTP GET of the page URL happens here, once
      // per task, inside the executor (retried by Spark on task failure)
      private val lines = java.nio.file.Files
        .readAllLines(java.nio.file.Paths.get(p.file)).iterator()
      private var current: String = _
      override def next(): Boolean = {
        if (!lines.hasNext) return false
        current = lines.next(); true
      }
      override def get(): InternalRow =
        InternalRow(p.page, UTF8String.fromString(current))
      override def close(): Unit = ()
    }
  }
}
