package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for a training-data pipeline: media as
  * opaque `binary` columns + typed metadata, with decode / feature
  * extraction as a partition-wise batch operator.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in
  * this environment): `decodeStub` derives deterministic fake
  * width/height/format from the payload bytes. Everything AROUND the stub
  * is the real thing a production pipeline needs and is tested:
  *  - schema: payload BinaryType + metadata struct + feature struct
  *  - partition-wise batched execution (`mapPartitions` with a
  *    per-partition "model/codec init" — the Scala analogue of a Pandas
  *    UDF's per-batch state)
  *  - batch shape: features emitted 1:1 with input rows, null-safe
  *
  * Scale: decode is map-only (no shuffle); partitioning carries over from
  * the scan, so 100 TB of media shards across executors with per-partition
  * codec reuse. Feature extraction keeps only (id, features) — the heavy
  * binary column is pruned immediately after decode.
  */
object Multimodal {

  val FeatureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Wrap a text/doc table into the multimodal layout: payload bytes +
    * metadata struct (media_type, source, declared length). */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("image/fake").as("media_type"),
        col("source"),
        col("n_chars").as("declared_len")).as("meta"))

  /** STUB decoder — deterministic fake features from the payload bytes.
    * A real deployment swaps this body for an image/audio codec call;
    * the signature (bytes => features) and everything around it stay. */
  def decodeStub(payload: Array[Byte]): (Int, Int, String, Long, Long) = {
    val n = payload.length
    var cs = 0L
    var i = 0
    while (i < n) { cs = cs * 31 + (payload(i) & 0xff); i += 1 }
    val width = 16 + (math.abs(cs) % 1024).toInt
    val height = 16 + (math.abs(cs / 7) % 1024).toInt
    val format = if (n % 2 == 0) "png" else "jpg"
    (width, height, format, n.toLong, cs)
  }

  /** Partition-wise feature extraction: one "codec" init per partition,
    * rows streamed through in batches (the mapInPandas analogue). */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", FeatureSchema, nullable = false)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    val idIdx = media.schema.fieldIndex("media_id")
    val out: Dataset[Row] = media.mapPartitions { rows =>
      // per-partition init (a real codec/model handle would be opened
      // HERE, once per partition, and reused for every row below)
      rows.map { r =>
        val (w, h, f, nb, cs) = decodeStub(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), Row(w, h, f, nb, cs))
      }
    }
    out.toDF()
  }

  /** Full pipeline: wrap → decode → flat feature columns (binary pruned). */
  def mediaFeatures(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(spark, toMediaTable(docs))
      .select(col("media_id"), col("features.*"))
}
