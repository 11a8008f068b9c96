package graft.sources

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** K4 as a real DataSourceV2 CONNECTOR: the wide-row KV store behind the
  * full V2 write protocol (WriteBuilder → BatchWrite → DataWriter with
  * task commit messages and a driver-side commit), plus batch read-back.
  *
  * This is the shape a Bigtable/HBase connector has (the reference loads
  * via a Beam pipeline, taar_profile_bigtable.py:231-258): executor tasks
  * write their partition of rows to uncommitted temp files; only files
  * named in COMMITTED task messages are published by the driver's
  * `commit` — so speculative or retried tasks (X4 at the task level)
  * can never double-publish, and an aborted job leaves no partial data.
  *
  * Record format (one file per task): 4-byte key length + key bytes +
  * 4-byte payload length + payload bytes, repeated. Dead simple, seekless
  * streaming on both sides.
  *
  * Usage:
  *   kvDf.write.format("graft.sources.KvStoreSource")
  *     .mode("overwrite").option("path", dir).save()
  *   spark.read.format("graft.sources.KvStoreSource").option("path", dir).load()
  */
class KvStoreSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvStoreSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvStoreTable(properties.get("path"))
}

object KvStoreSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  private[sources] def fs(path: String): FileSystem =
    FileSystem.get(new java.net.URI(path),
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  private[sources] def fsLocal(path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), new org.apache.hadoop.conf.Configuration())

  def dataFiles(path: String): Seq[String] = {
    val f = fsLocal(path)
    val dir = new Path(path)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(s => s.getPath.getName.endsWith(".kv"))
      .map(_.getPath.toString).sorted
  }
}

class KvStoreTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "KvStoreSource needs option 'path'")
  override def name(): String = s"kvstore($path)"
  override def schema(): StructType = KvStoreSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new KvScan(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new KvBatchWrite(path, info.queryId(), overwrite)
      }
    }
}

// ---- write path ----

case class KvCommitMessage(file: String) extends WriterCommitMessage

class KvBatchWrite(path: String, queryId: String, overwrite: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    KvWriterFactory(path, queryId)

  /** Driver-side publish: ONLY files named by committed tasks move from
    * the temp dir to the store — the rename is the commit point. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = KvStoreSource.fs(path)
    val dir = new Path(path)
    if (overwrite && f.exists(dir))
      f.listStatus(dir).filter(_.getPath.getName.endsWith(".kv"))
        .foreach(s => f.delete(s.getPath, false))
    f.mkdirs(dir)
    messages.foreach { case KvCommitMessage(tmp) =>
      val src = new Path(tmp)
      f.rename(src, new Path(dir, src.getName.stripSuffix(".tmp")))
    }
    f.delete(new Path(path, s"_temp_$queryId"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    KvStoreSource.fs(path).delete(new Path(path, s"_temp_$queryId"), true)
}

case class KvWriterFactory(path: String, queryId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(path, queryId, partitionId, taskId)
}

/** One temp file per TASK ATTEMPT (taskId in the name): concurrent
  * speculative attempts write distinct files; only the attempt whose
  * commit message reaches the driver gets published. */
class KvDataWriter(path: String, queryId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val fs = KvStoreSource.fsLocal(path)
  private val tmpPath = new Path(path,
    s"_temp_$queryId/part-$partitionId-$taskId.kv.tmp")
  private val out = new java.io.DataOutputStream(
    new java.io.BufferedOutputStream(fs.create(tmpPath, true)))

  override def write(row: InternalRow): Unit = {
    val key = row.getUTF8String(0).getBytes
    val payload = row.getBinary(1)
    out.writeInt(key.length); out.write(key)
    out.writeInt(payload.length); out.write(payload)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    KvCommitMessage(tmpPath.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tmpPath, false)
  }

  override def close(): Unit = ()
}

// ---- read path ----

class KvScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = KvStoreSource.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    KvStoreSource.dataFiles(path).map(f => KvFilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = KvReaderFactory
}

case class KvFilePartition(file: String) extends InputPartition

object KvReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KvFilePartition]
    new PartitionReader[InternalRow] {
      private val fs = KvStoreSource.fsLocal(p.file)
      private val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(fs.open(new Path(p.file))))
      private var key: Array[Byte] = _
      private var payload: Array[Byte] = _
      override def next(): Boolean = {
        val kLen = try in.readInt() catch { case _: java.io.EOFException => return false }
        key = in.readNBytes(kLen)
        payload = in.readNBytes(in.readInt())
        true
      }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromBytes(key), payload)
      override def close(): Unit = in.close()
    }
  }
}
