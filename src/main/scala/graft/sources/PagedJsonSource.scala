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
  * Spark task retry replaces the hand-rolled outer retry loop, and the
  * inner HTTP layer carries the reference's per-request timeout (X5) and
  * retry-once (X4) — see graft.sources.Http.
  *
  * The source emits RAW payload rows `(page INT, value STRING)` — one per
  * JSON line — and the typed projection happens downstream with
  * `from_json` (the P4 marshal pattern), keeping ingestion and schema
  * concerns separate.
  *
  * Two modes:
  *  - fixture: `.option("path", dir)` reads `page-<n>.jsonl` files;
  *  - live:    `.option("url", "http://host/x?page={page}")
  *              .option("pages", n)` GETs each page URL inside the
  *              executor task ({page} is 1-based), with
  *              `.option("timeoutMs", ...)` per request.
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
    new PagedTable(
      Option(properties.get("path")),
      Option(properties.get("url")),
      Option(properties.get("pages")).map(_.toInt),
      Option(properties.get("timeoutMs")).map(_.toInt).getOrElse(10000))
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

class PagedTable(path: Option[String], url: Option[String], pages: Option[Int],
    timeoutMs: Int) extends Table with SupportsRead {
  require(path.isDefined || (url.isDefined && pages.isDefined),
    "PagedJsonSource needs option 'path', or options 'url' + 'pages'")
  override def name(): String = s"paged_json(${path.orElse(url).get})"
  override def schema(): StructType = PagedJsonSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new PagedScan(path, url, pages, timeoutMs)
}

class PagedScan(path: Option[String], url: Option[String], pages: Option[Int],
    timeoutMs: Int) extends Scan with Batch {
  override def readSchema(): StructType = PagedJsonSource.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = path match {
    case Some(dir) =>
      PagedJsonSource.pageFiles(dir)
        .map { case (page, file) =>
          PagePartition(page, file, isUrl = false, timeoutMs): InputPartition }
        .toArray
    case None =>
      (1 to pages.get).map { p =>
        PagePartition(p, url.get.replace("{page}", p.toString),
          isUrl = true, timeoutMs): InputPartition
      }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = PageReaderFactory
}

case class PagePartition(page: Int, location: String, isUrl: Boolean,
    timeoutMs: Int) extends InputPartition

object PageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      // the fetch happens here, once per task, inside the executor —
      // Http.get carries timeout (X5) + retry-once (X4); Spark task
      // retry is the outer loop beyond that
      private val lines: Iterator[String] =
        if (p.isUrl)
          Http.get(p.location, p.timeoutMs).linesIterator.filter(_.nonEmpty)
        else {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.readAllLines(
            java.nio.file.Paths.get(p.location)).asScala.iterator
        }
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
