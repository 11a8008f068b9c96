package graft.operators

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for a training-data pipeline: media as
  * opaque `binary` columns + typed metadata, with decode / feature
  * extraction as a partition-wise batch operator.
  *
  * The decode step is REAL, using the JDK's in-process codecs (no native
  * deps, nothing beyond the JRE):
  *  - `image/...` → ImageIO header read (PNG/JPEG/BMP/GIF): width, height,
  *    container format — header-only, the pixel planes are never
  *    materialized;
  *  - `audio/...` → javax.sound AudioSystem file format (WAV/AIFF/AU):
  *    sample rate, channels, frame count;
  *  - `video/...` → real container parse for MJPEG (per-frame JPEG via
  *    the same ImageIO path) and Y4M (uncompressed planar YUV): width,
  *    height, frame count — compressed codec formats (MP4 etc.) have no
  *    JRE decoder and degrade per the stub note at the bottom;
  *  - `text/...` → byte stats (the synthetic corpus is text, so q42's
  *    features take this branch honestly);
  *  - undecodable bytes → kind "unknown", format "corrupt" (PERMISSIVE,
  *    X6 — a bad blob must not kill a 100 TB scan).
  *
  * Everything around the decode is the production shape and is tested:
  *  - schema: payload BinaryType + metadata struct + a UNION feature
  *    struct (image and audio fields nullable by kind);
  *  - partition-wise batched execution (`mapPartitions`, per-partition
  *    codec/dispatch init — the Scala analogue of a Pandas UDF's
  *    per-batch state);
  *  - features emitted 1:1 with input rows, null-safe.
  *
  * Scale: decode is map-only (no shuffle); partitioning carries over from
  * the scan, so 100 TB of media shards across executors with per-partition
  * codec reuse. Feature extraction keeps only (id, features) — the heavy
  * binary column is pruned immediately after decode; image decode reads
  * headers only.
  */
object Multimodal {

  val FeatureSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),        // image|audio|video|text|unknown
    StructField("width", IntegerType, nullable = true),       // image
    StructField("height", IntegerType, nullable = true),      // image
    StructField("sample_rate", IntegerType, nullable = true), // audio
    StructField("channels", IntegerType, nullable = true),    // audio
    StructField("frames", LongType, nullable = true),         // audio
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
        lit("text/plain").as("media_type"),
        col("source"),
        col("n_chars").as("declared_len")).as("meta"))

  /** Deterministic 64-bit payload checksum (order-sensitive polynomial). */
  def checksum64(payload: Array[Byte]): Long = {
    var cs = 0L
    var i = 0
    while (i < payload.length) { cs = cs * 31 + (payload(i) & 0xff); i += 1 }
    cs
  }

  /** Header-only image probe via ImageIO: (width, height, format).
    * None when no installed reader recognizes the bytes. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, String)] = {
    val in = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
        } catch { case _: Exception => None }
        finally r.dispose()
      }
    } finally in.close()
  }

  /** Audio container probe via javax.sound: (sampleRate, channels,
    * frameCount, format). None for unrecognized bytes. */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Long, String)] =
    try {
      val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(payload))
      Some((aff.getFormat.getSampleRate.toInt, aff.getFormat.getChannels,
        aff.getFrameLength.toLong, aff.getType.toString.toLowerCase))
    } catch { case _: Exception => None }

  /** Type-dispatched decode: ONE row of [[FeatureSchema]] per payload.
    * Never throws — corrupt media degrades to kind "unknown". */
  def decode(mediaType: String, payload: Array[Byte]): Row = {
    val n = payload.length.toLong
    val cs = checksum64(payload)
    val mt = if (mediaType == null) "" else mediaType
    if (mt.startsWith("image/"))
      decodeImage(payload) match {
        case Some((w, h, f)) => Row("image", w, h, null, null, null, f, n, cs)
        case None => Row("unknown", null, null, null, null, null, "corrupt", n, cs)
      }
    else if (mt.startsWith("audio/"))
      decodeAudio(payload) match {
        case Some((sr, ch, fr, f)) => Row("audio", null, null, sr, ch, fr, f, n, cs)
        case None => Row("unknown", null, null, null, null, null, "corrupt", n, cs)
      }
    else if (mt.startsWith("video/"))
      probeVideo(payload) match {
        case Some((w, h, fr, f)) => Row("video", w, h, null, null, fr, f, n, cs)
        case None => Row("unknown", null, null, null, null, null, "corrupt", n, cs)
      }
    else if (mt.startsWith("text/"))
      Row("text", null, null, null, null, null, "utf-8", n, cs)
    else
      Row("unknown", null, null, null, null, null, "unknown", n, cs)
  }

  /** Partition-wise feature extraction: codec dispatch initialized once
    * per partition, rows streamed through (the mapInPandas analogue). */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", FeatureSchema, nullable = false)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    val idIdx = media.schema.fieldIndex("media_id")
    val metaIdx = media.schema.fieldIndex("meta")
    val out: Dataset[Row] = media.mapPartitions { rows =>
      // per-partition init: ImageIO's reader registry lookup and any
      // model/codec handles are amortized across the partition here
      rows.map { r =>
        val mediaType = r.getStruct(metaIdx).getAs[String]("media_type")
        Row(r.getLong(idIdx), decode(mediaType, r.getAs[Array[Byte]](payloadIdx)))
      }
    }
    out.toDF()
  }

  /** Full pipeline: wrap → decode → flat feature columns (binary pruned). */
  def mediaFeatures(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(spark, toMediaTable(docs))
      .select(col("media_id"), col("features.*"))

  // ---- resize / frame-sample (the preprocessing pair after decode) ----

  /** REAL image resize via the JDK: full ImageIO decode → area-averaging
    * scale → PNG re-encode. Returns None when no reader recognizes the
    * bytes (corrupt media degrades, never throws — X6). */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(payload))).map { img =>
        val scaled = img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING)
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(scaled, 0, 0, null) finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    } catch { case _: Exception => None }

  /** REAL audio frame sampling via javax.sound: decode the container to
    * PCM, pick `n` evenly-spaced frames, return the first channel's
    * 16-bit sample of each (the waveform thumbnail a curation UI or an
    * audio-dedup fingerprint wants). The stream is first CONVERTED to
    * canonical signed-16-bit little-endian PCM, so big-endian (AIFF/AU)
    * and 8-bit sources sample correctly instead of byte-swapping or
    * spanning frames (review finding, round 10). The converted stream is
    * SAMPLED BY skip(), never fully materialized: decoded 16-bit PCM can
    * be several times the compressed payload, and buffering it turned the
    * never-throws contract into an executor-OOM hazard on long blobs
    * (ADVICE r10) — memory here is one frame, independent of duration.
    * The frame count comes from the converted stream (WAV/AIFF/AU carry
    * it through same-rate PCM conversion); an unknown-length stream falls
    * back to buffered decode. None for unrecognized bytes. */
  def sampleAudioFrames(payload: Array[Byte], n: Int): Option[Array[Long]] =
    try {
      val raw = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val src = raw.getFormat
        val canonical = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, /*bigEndian=*/ false)
        val ais = AudioSystem.getAudioInputStream(canonical, raw)
        try {
          val frameSize = canonical.getFrameSize
          val total = ais.getFrameLength
          if (n <= 0) Some(Array.empty[Long])
          else if (total > 0) {
            val out = new Array[Long](n)
            val buf = new Array[Byte](frameSize)
            var pos = 0L        // next unread frame
            var lastFrame = -1L // sample offsets are non-decreasing
            var lastSample = 0L
            var ok = true
            var i = 0
            while (i < n && ok) {
              val f = (i.toLong * total / n).min(total - 1L)
              if (f == lastFrame) out(i) = lastSample
              else {
                var toSkip = (f - pos) * frameSize
                while (toSkip > 0 && ok) {
                  val sk = ais.skip(toSkip)
                  if (sk <= 0) ok = false else toSkip -= sk
                }
                var got = 0
                while (got < frameSize && ok) {
                  val r = ais.read(buf, got, frameSize - got)
                  if (r <= 0) ok = false else got += r
                }
                if (ok) {
                  pos = f + 1
                  lastFrame = f
                  // first channel, canonical 16-bit little-endian signed
                  lastSample = ((buf(1) << 8) | (buf(0) & 0xff)).toLong
                  out(i) = lastSample
                }
              }
              i += 1
            }
            if (ok) Some(out) else None
          } else if (total == 0) Some(Array.empty[Long])
          else {
            // length unknown after conversion: buffered fallback (rare —
            // none of the JRE's built-in readers take this branch)
            val pcm = ais.readAllBytes()
            val tot = pcm.length / frameSize
            if (tot <= 0) Some(Array.empty[Long])
            else Some((0 until n).map { i =>
              val o = ((i.toLong * tot / n).min(tot - 1L) * frameSize).toInt
              ((pcm(o + 1) << 8) | (pcm(o) & 0xff)).toLong
            }.toArray)
          }
        } finally ais.close()
      } finally raw.close()
    } catch { case _: Exception => None }

  // ---- video decode: REAL for the two pure-JVM containers ----
  //
  // MJPEG (concatenated baseline JPEGs — each frame decodes through the
  // same ImageIO path the image branch uses) and Y4M (YUV4MPEG2:
  // uncompressed planar YUV — a header parse plus plane arithmetic, no
  // codec at all). Compressed codec containers (MP4/H.264, VP9, AV1...)
  // have no JRE decoder and keep the stride stub below.

  private[graft] def isY4m(p: Array[Byte]): Boolean =
    p.length >= 10 && new String(p, 0, 9, "US-ASCII") == "YUV4MPEG2" &&
      p(9) == ' '.toByte

  private[graft] def isMjpeg(p: Array[Byte]): Boolean =
    p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 &&
      (p(2) & 0xff) == 0xff

  /** Frame boundaries of an MJPEG stream via a real segment-level JPEG
    * parse — not a naive FFD8/FFD9 byte scan, which an embedded EXIF
    * thumbnail or an unstuffed 0xFFD9 in ancillary data would fool:
    * length-prefixed segments are skipped by their declared length, and
    * entropy-coded scan data is walked honoring 0xFF00 byte stuffing and
    * RST markers. Returns (start, endExclusive) per frame; None when the
    * stream is structurally malformed (truncated frame, bad marker). */
  def mjpegFrameOffsets(p: Array[Byte]): Option[IndexedSeq[(Int, Int)]] = {
    val frames = IndexedSeq.newBuilder[(Int, Int)]
    var pos = 0
    while (pos < p.length) {
      if (pos + 1 >= p.length || (p(pos) & 0xff) != 0xff ||
          (p(pos + 1) & 0xff) != 0xd8) return None
      val start = pos
      pos += 2
      var inFrame = true
      while (inFrame) {
        if (pos + 1 >= p.length || (p(pos) & 0xff) != 0xff) return None
        // JPEG permits runs of 0xFF fill bytes before a marker (common
        // in camera MJPEG); treating the second 0xFF as the marker id
        // read a bogus length and rejected conformant frames (review
        // finding). Consume the run, keeping one 0xFF as the prefix.
        while (pos + 1 < p.length && (p(pos + 1) & 0xff) == 0xff) pos += 1
        if (pos + 1 >= p.length) return None
        val m = p(pos + 1) & 0xff
        pos += 2
        if (m == 0xd9) { frames += ((start, pos)); inFrame = false }
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) () // standalone
        else {
          if (pos + 1 >= p.length) return None
          val len = ((p(pos) & 0xff) << 8) | (p(pos + 1) & 0xff)
          if (len < 2 || pos + len > p.length) return None
          pos += len
          if (m == 0xda) {
            // entropy-coded data: skip to the next true marker
            var scanning = true
            while (scanning) {
              if (pos >= p.length) return None
              if ((p(pos) & 0xff) == 0xff && pos + 1 < p.length) {
                val nm = p(pos + 1) & 0xff
                if (nm == 0x00 || (nm >= 0xd0 && nm <= 0xd7)) pos += 2
                else scanning = false
              } else pos += 1
            }
          }
        }
      }
    }
    val out = frames.result()
    if (out.isEmpty) None else Some(out)
  }

  /** Chroma plane size per Y4M colourspace tag (420 family default).
    * Long arithmetic: header-declared dims are attacker-controlled and
    * w·h overflows Int at 65536² (review finding — the overflow made
    * frameBytes negative, stepping the frame cursor BACKWARD into an
    * infinite loop the never-throws contract can't catch). */
  private def y4mChromaSize(w: Long, h: Long, c: String): Long =
    if (c.startsWith("444")) w * h
    else if (c.startsWith("422")) ((w + 1) / 2) * h
    else if (c.startsWith("mono")) 0L
    else ((w + 1) / 2) * ((h + 1) / 2) // 420jpeg/420mpeg2/420paldv

  /** Parse a YUV4MPEG2 stream: (width, height, Y-plane offset per frame).
    * Header params W/H/C are honored (C defaults to 420jpeg per spec);
    * each FRAME marker may carry its own ignored params. None on a
    * malformed header or a truncated frame. */
  def y4mFrames(p: Array[Byte]): Option[(Int, Int, IndexedSeq[Int])] = {
    if (!isY4m(p)) return None
    val nl = p.indexOf('\n'.toByte)
    if (nl < 0) return None
    var w = -1; var h = -1; var c = "420jpeg"
    new String(p, 0, nl, "US-ASCII").split(' ').drop(1).foreach { t =>
      if (t.startsWith("W")) w = t.drop(1).toIntOption.getOrElse(-1)
      else if (t.startsWith("H")) h = t.drop(1).toIntOption.getOrElse(-1)
      else if (t.startsWith("C")) c = t.drop(1)
    }
    if (w <= 0 || h <= 0) return None
    // a frame that can't fit the payload (or overflowed the declared
    // dims) is malformed — bounding here keeps every later offset and
    // the w*h plane walks safely inside Int/array range
    val frameBytesL = w.toLong * h + 2L * y4mChromaSize(w, h, c)
    if (frameBytesL <= 0 || frameBytesL > p.length) return None
    val frameBytes = frameBytesL.toInt
    val offs = IndexedSeq.newBuilder[Int]
    var pos = nl + 1
    while (pos < p.length) {
      if (pos + 5 > p.length ||
          new String(p, pos, 5, "US-ASCII") != "FRAME") return None
      var e = pos + 5
      while (e < p.length && p(e) != '\n'.toByte) e += 1
      if (e >= p.length || e.toLong + 1 + frameBytes > p.length) return None
      offs += (e + 1)
      pos = e + 1 + frameBytes
    }
    val o = offs.result()
    if (o.isEmpty) None else Some((w, h, o))
  }

  // ---- MP4 (ISO BMFF) container METADATA parse ----
  //
  // Frame PIXELS of compressed codecs stay stubbed (no JRE codec), but
  // the container structure is a pure byte parse — the same class of
  // work as the Y4M header walk: length-prefixed boxes
  // [u32 size][4cc type][payload], nested. Dims come from the video
  // track's stsd visual sample entry (pixel dims; tkhd's 16.16
  // presentation dims are the fallback), frame count from stsz's
  // sample_count (stts sum as fallback), duration from the video
  // track's mdhd (media timescale) with mvhd as fallback.

  private[graft] def isMp4(p: Array[Byte]): Boolean =
    p.length >= 12 && new String(p, 4, 4, "US-ASCII") == "ftyp"

  private def u16(p: Array[Byte], o: Int): Int =
    ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
  private def u32(p: Array[Byte], o: Int): Long =
    ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
  private def u64(p: Array[Byte], o: Int): Long =
    (u32(p, o) << 32) | u32(p, o + 4)

  /** Child boxes of the byte range [from, to): (type, payloadFrom,
    * payloadTo). Malformed sizes (backward, overflowing, truncated
    * header) end the walk rather than throw — never-throws contract. */
  private def mp4Boxes(p: Array[Byte], from: Int, to: Int): List[(String, Int, Int)] = {
    val out = List.newBuilder[(String, Int, Int)]
    var pos = from
    var ok = true
    while (ok && pos + 8 <= to) {
      val size32 = u32(p, pos)
      val typ = new String(p, pos + 4, 4, "US-ASCII")
      val (hdr, end) =
        if (size32 == 1L && pos + 16 <= to) (16, pos + u64(p, pos + 8))
        else if (size32 == 0L) (8, to.toLong)
        else (8, pos + size32)
      if (size32 == 1L && pos + 16 > to) ok = false
      else if (end < pos + hdr || end > to) ok = false
      else { out += ((typ, pos + hdr, end.toInt)); pos = end.toInt }
    }
    out.result()
  }

  private def mp4Find(p: Array[Byte], from: Int, to: Int, typ: String): Option[(Int, Int)] =
    mp4Boxes(p, from, to).collectFirst { case (`typ`, a, b) => (a, b) }

  /** MP4 metadata: (width, height, frame count, duration in ms) of the
    * first VIDEO track (mdia/hdlr handler `vide`). None when the moov
    * structure is absent or malformed. */
  def mp4Meta(payload: Array[Byte]): Option[(Int, Int, Long, Long)] =
    try {
      if (!isMp4(payload)) return None
      val (moovA, moovB) = mp4Find(payload, 0, payload.length, "moov").getOrElse(return None)
      // the first trak whose handler is 'vide'
      val vtrak = mp4Boxes(payload, moovA, moovB).collectFirst {
        case ("trak", a, b) if mp4Find(payload, a, b, "mdia").exists { case (ma, mb) =>
          mp4Find(payload, ma, mb, "hdlr").exists { case (ha, _) =>
            ha + 12 <= payload.length &&
              new String(payload, ha + 8, 4, "US-ASCII") == "vide"
          }
        } => (a, b)
      }.getOrElse(return None)
      val (mdiaA, mdiaB) = mp4Find(payload, vtrak._1, vtrak._2, "mdia").get
      val stbl = for {
        minf <- mp4Find(payload, mdiaA, mdiaB, "minf")
        st <- mp4Find(payload, minf._1, minf._2, "stbl")
      } yield st
      // dims: stsd's first visual sample entry (width/height u16 at
      // entry offsets 32/34: 8 hdr + 6 reserved + 2 dataref + 16
      // predefined/reserved), tkhd's 16.16 presentation dims fallback
      val stsdDims = stbl.flatMap { case (sa, sb) =>
        mp4Find(payload, sa, sb, "stsd").flatMap { case (a, b) =>
          if (a + 8 > b || u32(payload, a + 4) < 1) None
          else mp4Boxes(payload, a + 8, b).headOption.collect {
            case (_, ea, eb) if ea + 28 <= eb =>
              (u16(payload, ea + 24), u16(payload, ea + 26))
          }
        }
      }
      val tkhdDims = mp4Find(payload, vtrak._1, vtrak._2, "tkhd").flatMap { case (a, b) =>
        val off = if ((payload(a) & 0xff) == 1) a + 88 else a + 76
        if (off + 8 <= b) Some(((u32(payload, off) >> 16).toInt,
          (u32(payload, off + 4) >> 16).toInt))
        else None
      }
      val (w, h) = stsdDims.orElse(tkhdDims).getOrElse(return None)
      // frame count: stsz sample_count, else the stts entry sum
      val nFrames = stbl.flatMap { case (sa, sb) =>
        mp4Find(payload, sa, sb, "stsz").collect {
          case (a, b) if a + 12 <= b => u32(payload, a + 8)
        }.orElse(mp4Find(payload, sa, sb, "stts").collect {
          case (a, b) if a + 8 <= b =>
            val n = u32(payload, a + 4).toInt
            (0 until n).iterator.map(i => a + 8 + 8 * i)
              .takeWhile(_ + 8 <= b).map(o => u32(payload, o)).sum
        })
      }.getOrElse(return None)
      // duration: media timescale (mdhd) preferred, movie (mvhd) fallback
      def scaled(a: Int, b: Int, tsOff0: Int): Option[Long] = {
        val v1 = (payload(a) & 0xff) == 1
        val (tsOff, dur) =
          if (v1) (a + tsOff0 + 8, if (a + tsOff0 + 20 <= b) Some(u64(payload, a + tsOff0 + 12)) else None)
          else (a + tsOff0, if (a + tsOff0 + 8 <= b) Some(u32(payload, a + tsOff0 + 4)) else None)
        for (d <- dur; ts = u32(payload, tsOff) if ts > 0) yield d * 1000L / ts
      }
      val durMs = mp4Find(payload, mdiaA, mdiaB, "mdhd")
        .flatMap { case (a, b) => scaled(a, b, 12) }
        .orElse(mp4Find(payload, moovA, moovB, "mvhd")
          .flatMap { case (a, b) => scaled(a, b, 12) })
        .getOrElse(0L)
      if (w <= 0 || h <= 0) None else Some((w, h, nFrames, durMs))
    } catch { case _: Exception => None }

  /** Container probe without decoding pixels: (width, height, nFrames,
    * container). MJPEG reads the first frame's header only; MP4 is a
    * pure box-structure parse (pixels stay undecodable on the JVM). */
  def probeVideo(payload: Array[Byte]): Option[(Int, Int, Long, String)] =
    try {
      if (isY4m(payload))
        y4mFrames(payload).map { case (w, h, offs) => (w, h, offs.size.toLong, "y4m") }
      else if (isMjpeg(payload))
        mjpegFrameOffsets(payload).flatMap { offs =>
          decodeImage(java.util.Arrays.copyOfRange(payload, offs.head._1, offs.head._2))
            .map { case (w, h, _) => (w, h, offs.size.toLong, "mjpeg") }
        }
      else if (isMp4(payload))
        mp4Meta(payload).map { case (w, h, n, _) => (w, h, n, "mp4") }
      else None
    } catch { case _: Exception => None }

  /** Integer mean luma of one decoded JPEG frame (BT.601 integer weights,
    * floor division — deterministic). */
  private def jpegMeanLuma(p: Array[Byte], a: Int, b: Int): Option[Long] =
    Option(ImageIO.read(new ByteArrayInputStream(
      java.util.Arrays.copyOfRange(p, a, b)))).map { img =>
      var s = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          s += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          x += 1
        }
        y += 1
      }
      s / (img.getWidth.toLong * img.getHeight)
    }

  /** REAL video frame sampling: `n` evenly-spaced frames, each reduced to
    * its integer mean luma — the per-frame brightness signature a shot-
    * boundary detector or a video-dedup fingerprint builds on. Only the
    * SELECTED frames are decoded (MJPEG) or summed (Y4M) — cost is O(n)
    * frames regardless of clip length, and duplicate sample indices
    * (n > frame count) reuse the computed value. None for unrecognized or
    * structurally corrupt containers. */
  def sampleVideoFrames(payload: Array[Byte], n: Int): Option[Array[Long]] =
    try {
      if (n <= 0) {
        if (isY4m(payload) || isMjpeg(payload)) Some(Array.empty[Long]) else None
      } else if (isY4m(payload))
        y4mFrames(payload).map { case (w, h, offs) =>
          val ySize = w * h
          val cache = scala.collection.mutable.Map.empty[Int, Long]
          (0 until n).map { i =>
            val f = (i.toLong * offs.size / n).min(offs.size - 1L).toInt
            cache.getOrElseUpdate(f, {
              val off = offs(f)
              var s = 0L
              var j = 0
              while (j < ySize) { s += (payload(off + j) & 0xff); j += 1 }
              s / ySize
            })
          }.toArray
        }
      else if (isMjpeg(payload))
        mjpegFrameOffsets(payload).flatMap { offs =>
          val cache = scala.collection.mutable.Map.empty[Int, Option[Long]]
          val vals = (0 until n).map { i =>
            val f = (i.toLong * offs.size / n).min(offs.size - 1L).toInt
            cache.getOrElseUpdate(f, jpegMeanLuma(payload, offs(f)._1, offs(f)._2))
          }
          if (vals.forall(_.isDefined)) Some(vals.map(_.get).toArray) else None
        }
      else None
    } catch { case _: Exception => None }

  // ---- image perceptual hash (aHash) — the multimodal DEDUP face ----
  //
  // The corpus pipeline dedups text four ways (exact / shingle /
  // substring / semantic) but images only byte-exact (q24's md5): a
  // re-encoded, re-containered, or resized duplicate image sails
  // through an md5. aHash (average hash — the classic pHash-family
  // baseline) closes that: decode pixels for real, reduce to an 8×8
  // grayscale area-average, threshold each cell against the mean — a
  // 64-bit signature invariant to container, lossless re-encoding, and
  // scaling, which then rides the EXACT Hamming band-LSH machinery the
  // text side already has (q86/q128).

  /** 64-bit average hash of an encoded image, as TWO 32-bit words
    * (hi = cells 32..63, lo = cells 0..31 — the q128 two-word form,
    * which also keeps every value positive for the SQL oracle). REAL
    * ImageIO decode; then exact integer arithmetic end to end so the
    * hash is bit-reproducible by any engine: per-pixel integer luma
    * (BT.601 weights, floor — [[jpegMeanLuma]]'s convention), 8×8
    * area-average with floor-division block boundaries (bx·w/8), cell
    * bit set iff cell > floor(mean of the 64 cells). None for
    * undecodable bytes or images smaller than the 8×8 grid (corrupt
    * media degrades, never throws — X6). */
  def aHash64(payload: Array[Byte]): Option[(Long, Long)] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(payload))).flatMap { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        if (w < 8 || h < 8) None
        else {
          val cells = new Array[Long](64)
          var by = 0
          while (by < 8) {
            var bx = 0
            while (bx < 8) {
              val (x0, x1) = (bx * w / 8, (bx + 1) * w / 8)
              val (y0, y1) = (by * h / 8, (by + 1) * h / 8)
              var s = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = img.getRGB(x, y)
                  s += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                    114 * (rgb & 0xff)) / 1000
                  x += 1
                }
                y += 1
              }
              cells(by * 8 + bx) = s / ((x1 - x0).toLong * (y1 - y0))
              bx += 1
            }
            by += 1
          }
          val avg = cells.sum / 64
          var (hi, lo) = (0L, 0L)
          var i = 0
          while (i < 64) {
            if (cells(i) > avg) {
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
            i += 1
          }
          Some((hi, lo))
        }
      }
    } catch { case _: Exception => None }

  /** 60-bit value of the repo's portable md5-prefix convention
    * ([[graft.functions.Md5Prefix64]] / DedupQueries.sqlH60) on a plain
    * JVM string — the fixture generator below must hash EXACTLY like
    * the DuckDB oracle recomputing it. */
  private def md5Long60(s: String): Long = java.lang.Long.parseLong(
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s).substring(0, 15), 16)

  /** Deterministic PNG fixture for `docId` — the q42 fixture pattern
    * lifted to the perceptual-hash oracle: a 16×16 grayscale image of
    * 8×8 uniform 2×2 blocks whose gray levels (200/50) are a CLOSED-FORM
    * md5 function of the doc id, so a SQL oracle can recompute the
    * decoded cells (and therefore the hash) without any image codec,
    * while the Spark side runs the REAL render → PNG encode → ImageIO
    * decode → aHash path. Docs share a base pattern per group of 10
    * (`docId / 10`) — the "duplicates" — and each doc flips each cell
    * with probability 1/64 — the "re-encode noise", so within-group
    * Hamming distances are small and cross-group ones are ~32. Every
    * 17th-ish doc (docId % 17 == 3) gets CORRUPT bytes instead: the
    * permissive-degrade row the operator must survive. */
  def phashFixturePng(docId: Long): Array[Byte] =
    if (docId % 17 == 3)
      s"notanimage:$docId:deliberately-undecodable".getBytes("UTF-8")
    else {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < 64) {
        val base = md5Long60(s"phb|${docId / 10}|$i") % 2 == 1
        val flip = md5Long60(s"phf|$docId|$i") % 64 == 0
        val v = if (base ^ flip) 200 else 50
        val rgb = (v << 16) | (v << 8) | v
        val (bx, by) = (i % 8, i / 8)
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            img.setRGB(bx * 2 + dx, by * 2 + dy, rgb)
            dx += 1
          }
          dy += 1
        }
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

  /** Partition-wise fixture-render + perceptual-hash of a corpus:
    * (doc_id) → (doc_id, hi, lo), null words for corrupt media — the
    * q170 ingest leg. Map-only (no shuffle); the image bytes never
    * leave the task that rendered them, only the 16-byte signature
    * rides on. At 100 TB of real images this is the same shape with
    * the render replaced by the payload column read. */
  def phashCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("hi", LongType, nullable = true),
      StructField("lo", LongType, nullable = true)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    val out: Dataset[Row] = docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        aHash64(phashFixturePng(id)) match {
          case Some((hi, lo)) => Row(id, hi, lo)
          case None => Row(id, null, null)
        }
      }
    }
    out.toDF()
  }

  // ---- audio perceptual fingerprint (q171) --------------------------
  // q170 closed the image modality gap; this is the same gap for audio:
  // q24's md5 catches only byte-identical blobs, so a re-containered
  // (WAV→AIFF), re-sampled, or losslessly re-encoded duplicate track
  // sails through. The classic fix (Haitsma & Kalker's energy
  // fingerprint family) reduces the decoded waveform to a per-segment
  // energy profile and thresholds it — invariant to container,
  // endianness, and sample-rate duplication — then rides the EXACT
  // Hamming band-LSH machinery the text and image sides already share
  // (q86/q128/q170).

  /** 64-bit audio energy fingerprint, as TWO 32-bit words (the q128 /
    * [[aHash64]] two-word form — positive values for the SQL oracle).
    * REAL `javax.sound` decode, canonicalized to signed-16-bit
    * little-endian PCM exactly like [[sampleAudioFrames]] (so AIFF/AU
    * big-endian and 8-bit sources fingerprint identically to their WAV
    * twins); then exact integer arithmetic end to end so the value is
    * bit-reproducible by any engine: the stream is split into 64
    * equal-duration segments with floor boundaries (i·frames/64 — the
    * time-axis analogue of [[aHash64]]'s bx·w/8 blocks, which is what
    * makes a duplicated-sample 2× "resample" fingerprint identically),
    * per-segment mean ABSOLUTE amplitude of the first channel (floor
    * division), and segment bit set iff its mean > floor(mean of the 64
    * segment means). Decoding is STREAMING — one read buffer, never the
    * whole decoded waveform ([[sampleAudioFrames]]'s OOM lesson, ADVICE
    * r10) — when the converted stream knows its frame count; an
    * unknown-length stream falls back to a buffered decode like the
    * frame sampler. None for undecodable bytes or streams shorter than
    * 64 frames (corrupt media degrades, never throws — X6). */
  def afp64(payload: Array[Byte]): Option[(Long, Long)] =
    try {
      val raw = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val src = raw.getFormat
        val canonical = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, /*bigEndian=*/ false)
        val ais = AudioSystem.getAudioInputStream(canonical, raw)
        try {
          val frameSize = canonical.getFrameSize
          val known = ais.getFrameLength
          val bytes: Either[Long, Array[Byte]] =
            if (known > 0) Left(known)
            else Right(readFully(ais)) // unknown length: buffered fallback
          val total = bytes.fold(identity, b => (b.length / frameSize).toLong)
          if (total < 64) None
          else {
            val segSum = new Array[Long](64)
            val segCnt = new Array[Long](64)
            val buf = bytes.fold(_ => new Array[Byte](frameSize * 1024), identity)
            var f = 0L
            var seg = 0
            var nextBoundary = total / 64 // b(i) = i*total/64, i = seg+1
            var avail = bytes.fold(_ => 0, _.length) // buffered: all; streaming: filled below
            var off = 0
            while (f < total) {
              if (off >= avail) { // refill (streaming path only)
                avail = ais.read(buf, 0, buf.length)
                off = 0
                if (avail <= 0) { f = total } // truncated stream: stop
              }
              if (off < avail) {
                while (f >= nextBoundary && seg < 63) {
                  seg += 1; nextBoundary = (seg + 1).toLong * total / 64
                }
                // first channel, canonical 16-bit little-endian signed
                val s = ((buf(off + 1) << 8) | (buf(off) & 0xff)).toLong
                segSum(seg) += math.abs(s)
                segCnt(seg) += 1
                off += frameSize
                f += 1
              }
            }
            if (segCnt.exists(_ == 0L)) None // truncated before 64 segments
            else {
              val means = Array.tabulate(64)(i => segSum(i) / segCnt(i))
              val avg = means.sum / 64
              var (hi, lo) = (0L, 0L)
              var i = 0
              while (i < 64) {
                if (means(i) > avg) {
                  if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
                }
                i += 1
              }
              Some((hi, lo))
            }
          }
        } finally ais.close()
      } finally raw.close()
    } catch { case _: Exception => None }

  private def readFully(in: java.io.InputStream): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var r = in.read(buf)
    while (r > 0) { bos.write(buf, 0, r); r = in.read(buf) }
    bos.toByteArray
  }

  /** Deterministic WAV fixture for `docId` — [[phashFixturePng]]'s
    * pattern lifted to audio: 8 kHz mono 16-bit PCM, 64 segments of 100
    * alternating-sign samples whose AMPLITUDE (18000/2000) is a
    * CLOSED-FORM md5 function of the doc id, so a SQL oracle recomputes
    * the per-segment mean |amplitude| (= the amplitude exactly — the
    * alternation has even period), the threshold, both hash words and
    * every pair verdict without an audio codec, while the Spark side
    * runs the REAL render → WAV encode → javax.sound decode → [[afp64]]
    * path. Docs share a base profile per group of 10 (`docId / 10`) —
    * the "duplicates" — and each doc flips each segment with
    * probability 1/64 — the "re-encode noise". Every 19th-ish doc
    * (docId % 19 == 5) gets CORRUPT bytes instead: the
    * permissive-degrade row the operator must survive (a different
    * modulus than the image fixture's %17, so the two corrupt
    * populations don't shadow each other in shared-corpus tests). */
  def afpFixtureWav(docId: Long): Array[Byte] =
    if (docId % 19 == 5)
      s"notaudio:$docId:deliberately-undecodable".getBytes("UTF-8")
    else {
      val segLen = 100
      val pcm = new Array[Byte](64 * segLen * 2)
      var i = 0
      while (i < 64) {
        val base = md5Long60(s"aub|${docId / 10}|$i") % 2 == 1
        val flip = md5Long60(s"auf|$docId|$i") % 64 == 0
        val a = if (base ^ flip) 18000 else 2000
        var j = 0
        while (j < segLen) {
          val v = if (j % 2 == 0) a else -a
          val off = (i * segLen + j) * 2
          pcm(off) = (v & 0xff).toByte
          pcm(off + 1) = ((v >> 8) & 0xff).toByte
          j += 1
        }
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
        /*signed=*/ true, /*bigEndian=*/ false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, 64L * segLen)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

  /** Partition-wise fixture-render + audio-fingerprint of a corpus:
    * (doc_id) → (doc_id, hi, lo), null words for corrupt media — the
    * q171 ingest leg, shaped exactly like [[phashCorpus]]: map-only, the
    * audio bytes never leave the task that rendered them, only the
    * 16-byte signature rides on. */
  def afpCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("hi", LongType, nullable = true),
      StructField("lo", LongType, nullable = true)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    val out: Dataset[Row] = docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        afp64(afpFixtureWav(id)) match {
          case Some((hi, lo)) => Row(id, hi, lo)
          case None => Row(id, null, null)
        }
      }
    }
    out.toDF()
  }

  /** Stride STUB for COMPRESSED CODEC frame PIXELS only (H.264, VP9,
    * AV1, ...): no video codec ships with the JRE or this container, so
    * the deterministic placeholder strides the raw payload. MJPEG and Y4M
    * never reach this — [[sampleVideoFrames]] decodes them for real — and
    * MP4 container METADATA (dims, frame count, duration) is parsed for
    * real by [[mp4Meta]]; only the pixel decode remains stubbed. The
    * Spark-side plumbing (schema, batching, null degradation) is
    * identical for both paths, so swapping in a codec changes only this
    * function. */
  def sampleVideoFramesStub(payload: Array[Byte], n: Int): Array[Long] =
    if (payload.isEmpty || n <= 0) Array.empty[Long]
    else (0 until n).map { i =>
      (payload(((i.toLong * payload.length / n).min(payload.length - 1)).toInt) & 0xffL)
    }.toArray

  /** Partition-wise preprocess: resize every image to (w, h) and sample
    * `n` frames from audio/video — one output row per input, corrupt
    * media degrading to nulls. The resized payload rides out as binary
    * (the downstream training-shard write); non-image rows carry null
    * there, and the original payload is PRUNED either way. */
  def preprocess(spark: SparkSession, media: DataFrame,
      w: Int, h: Int, n: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("resized_png", BinaryType, nullable = true),
      StructField("frame_samples", ArrayType(LongType), nullable = true)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    val idIdx = media.schema.fieldIndex("media_id")
    val metaIdx = media.schema.fieldIndex("meta")
    val out: Dataset[Row] = media.mapPartitions { rows =>
      rows.map { r =>
        // null payload or null meta degrade like corrupt bytes — the
        // never-throws contract holds on every branch (review finding:
        // the video stub would NPE on a null payload and kill the scan)
        val meta = if (r.isNullAt(metaIdx)) null else r.getStruct(metaIdx)
        val mt = if (meta == null) null else meta.getAs[String]("media_type")
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val mediaType = if (mt == null) "" else mt
        if (payload == null) Row(r.getLong(idIdx), null, null)
        else if (mediaType.startsWith("image/"))
          Row(r.getLong(idIdx), resizeImage(payload, w, h).orNull, null)
        else if (mediaType.startsWith("audio/"))
          Row(r.getLong(idIdx), null, sampleAudioFrames(payload, n).orNull)
        else if (mediaType.startsWith("video/"))
          // dispatch on the container SIGNATURE, not the subtype string:
          // MJPEG/Y4M decode for real; a recognized-but-corrupt container
          // degrades to null (the image branch's contract); only codec
          // formats the JRE cannot decode take the stride stub
          Row(r.getLong(idIdx), null, sampleVideoFrames(payload, n) match {
            case Some(v) => v
            case None if isMjpeg(payload) || isY4m(payload) => null
            case None => sampleVideoFramesStub(payload, n)
          })
        else Row(r.getLong(idIdx), null, null)
      }
    }
    out.toDF()
  }
}
